"""F1/F2 entity text modeling — byte-exact vs hand-transcribed reference
output (`tokenization.py:27-184`); Catalyst columns == python kernels."""

import json

from pyspark.sql import functions as F

from wdel_spark.functions.entity_text import (
    entity_text_en_first,
    entity_text_zh_first,
    title_desc_columns,
)
from wdel_spark.sources.kb_io import ENTITY_SCHEMA

# the reference's own docstring example (tokenization.py:117-147)
_FISH = {
    "qid": "Q3061828",
    "label": {"en": "Micralestes fodori", "zh": "福氏小鲑脂鲤"},
    "desc": {"en": "species of fish", "zh": None},
    "alt": {"en": [], "zh": []},
    "P31": {
        "qid": [["Q16521", "Q24017414", "Q24017465"]],
        "en": [["taxon", "second-order class", "third-order class"]],
        "zh": [["生物分类单元", "二阶类", "三阶类"]],
    },
    "P279": {"qid": [], "en": [], "zh": []},
}


def test_zh_first_hand_transcribed():
    qid, title, desc = entity_text_zh_first(_FISH)
    assert qid == "Q3061828"
    assert title == "福氏小鲑脂鲤/micralestes fodori"
    assert desc == (
        "名称：福氏小鲑脂鲤；"
        "name: micralestes fodori;"
        "description: species of fish;"
        "是以下实体的实例：生物分类单元/二阶类/三阶类；"
        "instance_of: taxon/second-order class/third-order class;"
    )


def test_en_first_hand_transcribed():
    qid, title, desc = entity_text_en_first(_FISH)
    assert title == "micralestes fodori/福氏小鲑脂鲤"
    assert desc == (
        "name: micralestes fodori;"
        "description: species of fish;"
        "instance_of: taxon/second-order class/third-order class;"
        "名称：福氏小鲑脂鲤；"
        "是以下实体的实例：生物分类单元/二阶类/三阶类；"
    )


def test_serializer_quirks():
    # empty record -> qid for BOTH title and desc, lowercased
    empty = {
        "qid": "Q99X",
        "label": {"en": None, "zh": None},
        "desc": {"en": None, "zh": None},
        "alt": {"en": [], "zh": []},
        "P31": {"qid": [], "en": [], "zh": []},
        "P279": {"qid": [], "en": [], "zh": []},
    }
    assert entity_text_zh_first(empty) == ("Q99X", "q99x", "q99x")
    assert entity_text_en_first(empty) == ("Q99X", "q99x", "q99x")

    # en-only entity: zh-first title keeps the reference's leading "/"
    en_only = dict(empty, qid="Q7",
                   label={"en": "Widget", "zh": None})
    _, t, d = entity_text_zh_first(en_only)
    assert t == "/widget"
    assert d == "name: widget;"
    _, t, _ = entity_text_en_first(en_only)
    assert t == "widget"

    # empty path is skipped; empty alias join is skipped
    with_empty_path = dict(
        empty, qid="Q8", label={"en": "A", "zh": None},
        alt={"en": [], "zh": []},
        P31={"qid": [[]], "en": [[]], "zh": [[]]})
    _, _, d = entity_text_zh_first(with_empty_path)
    assert d == "name: a;"


def test_catalyst_columns_match_kernels(spark):
    cases = [_FISH,
             {"qid": "Q2",
              "label": {"en": None, "zh": "仅中文"},
              "desc": {"en": "only en desc", "zh": None},
              "alt": {"en": ["a", "b"], "zh": None},
              "P31": {"qid": [], "en": [], "zh": []},
              "P279": {"qid": [["Q1"]], "en": [["thing"]], "zh": [[]]}},
             {"qid": "Q3",
              "label": {"en": None, "zh": None},
              "desc": {"en": None, "zh": None},
              "alt": {"en": None, "zh": None},
              "P31": {"qid": [], "en": [], "zh": []},
              "P279": {"qid": [], "en": [], "zh": []}}]
    # ENTITY_SCHEMA uses lowercase p31/p279 field names
    to_schema = [
        {**c, "p31": c["P31"], "p279": c["P279"]} for c in cases
    ]
    df = spark.createDataFrame(
        [json.dumps(c) for c in to_schema], "string"
    ).select(F.from_json("value", ENTITY_SCHEMA).alias("e"))
    for variant, kernel in (("zh_first", entity_text_zh_first),
                            ("en_first", entity_text_en_first)):
        t_col, d_col = title_desc_columns(F.col("e"), variant)
        got = df.select(F.col("e.qid").alias("qid"),
                        t_col.alias("t"), d_col.alias("d")).collect()
        want = {c["qid"]: kernel(_with_alt_lists(c)) for c in cases}
        for r in got:
            _, wt, wd = want[r["qid"]]
            assert (r["t"], r["d"]) == (wt, wd), (variant, r["qid"])


def _with_alt_lists(c):
    # kernels expect alt arrays (reference hydrate always provides lists)
    alt = {k: (v or []) for k, v in c["alt"].items()}
    return {**c, "alt": alt}
