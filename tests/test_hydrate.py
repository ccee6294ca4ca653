"""KB hydrate: relational -> nested ENTITY_SCHEMA (J1+A1+A6, F9 codec)."""

import json

from pyspark.sql import functions as F

from wdel_spark.sources.kb_io import ENTITY_SCHEMA
from wdel_spark.plans.hydrate import (
    MAX_PATHS,
    encode_entity_cells,
    encode_relation_cells,
    hydrate_entities,
)


def _nested_fixture(spark):
    rows = [
        {  # full record, 13 p31 paths (cap binds at 11), 1 p279 path
            "qid": "Q1",
            "label": {"en": "human", "zh": "人类"},
            "desc": {"en": "a person", "zh": None},
            "alt": {"en": ["person", "homo sapiens"], "zh": ["人"]},
            "p31": {
                "qid": [[f"Q{i}", f"Q{i+100}"] for i in range(13)],
                "en": [[f"c{i}"] for i in range(13)],
                "zh": [[] for _ in range(13)],
            },
            "p279": {"qid": [["Q5"]], "en": [["organism"]], "zh": [["生物"]]},
        },
        {  # no relations at all, null zh label, null alt
            "qid": "Q2",
            "label": {"en": "widget", "zh": None},
            "desc": {"en": None, "zh": None},
            "alt": {"en": None, "zh": None},
            "p31": {"qid": [], "en": [], "zh": []},
            "p279": {"qid": [], "en": [], "zh": []},
        },
    ]
    return spark.createDataFrame(
        [json.dumps(r) for r in rows], "string"
    ).select(F.from_json("value", ENTITY_SCHEMA).alias("e")).select("e.*")


def test_encode_hydrate_roundtrip_with_cap(spark):
    nested = _nested_fixture(spark)
    entity = encode_entity_cells(nested)
    p31 = encode_relation_cells(nested, "p31")
    p279 = encode_relation_cells(nested, "p279")
    out = hydrate_entities(entity, p31, p279)

    # exact field names + types (nullability flags are Catalyst-derived)
    assert out.schema.simpleString() == ENTITY_SCHEMA.simpleString()

    got = {r["qid"]: r.asDict(recursive=True)
           for r in out.orderBy("qid").collect()}

    q1 = got["Q1"]
    assert q1["label"] == {"en": "human", "zh": "人类"}
    assert q1["desc"] == {"en": "a person", "zh": None}
    assert q1["alt"] == {"en": ["person", "homo sapiens"], "zh": ["人"]}
    # path cap: merge_info.py:110 appends at len==10 -> 11 paths survive
    assert len(q1["p31"]["qid"]) == MAX_PATHS == 11
    assert q1["p31"]["qid"][0] == ["Q0", "Q100"]
    assert q1["p31"]["qid"][10] == ["Q10", "Q110"]
    assert q1["p31"]["en"][3] == ["c3"]
    assert q1["p31"]["zh"][0] == []
    assert q1["p279"] == {
        "qid": [["Q5"]], "en": [["organism"]], "zh": [["生物"]]}

    q2 = got["Q2"]
    assert q2["label"] == {"en": "widget", "zh": None}
    # null alt cell hydrates to [] (pipeline.py:198 initialization)
    assert q2["alt"] == {"en": [], "zh": []}
    assert q2["p31"] == {"qid": [], "en": [], "zh": []}
    assert q2["p279"] == {"qid": [], "en": [], "zh": []}


def test_hydrate_without_relation_tables(spark):
    nested = _nested_fixture(spark)
    out = hydrate_entities(encode_entity_cells(nested))
    assert out.schema.simpleString() == ENTITY_SCHEMA.simpleString()
    for r in out.collect():
        d = r.asDict(recursive=True)
        assert d["p31"] == {"qid": [], "en": [], "zh": []}
        assert d["p279"] == {"qid": [], "en": [], "zh": []}


def test_empty_string_cells_hydrate_as_absent(spark):
    """The reference fills fields through truthiness checks (`if label_en:`
    pipeline.py:213-230), so an empty-string MySQL cell must hydrate
    exactly like NULL — not to "" (ADVICE r2: "" labels leaked 'name: ;'
    segments into the entity text serialization)."""
    entity = spark.createDataFrame(
        [("Q9", "", "", "", "", "", "")],
        "qid string, label_en string, label_zh string, desc_en string, "
        "desc_zh string, alt_en string, alt_zh string",
    )
    got = hydrate_entities(entity).collect()[0].asDict(recursive=True)
    assert got["label"] == {"en": None, "zh": None}
    assert got["desc"] == {"en": None, "zh": None}
    assert got["alt"] == {"en": [], "zh": []}

    # and the downstream serializer emits the qid-fallback form, never
    # 'name: ;' segments or bare-'/' titles (tokenization.py truthiness)
    from wdel_spark.functions.entity_text import title_desc_columns
    nested = hydrate_entities(entity)
    e = F.struct(*[F.col(c) for c in nested.columns])
    title, desc = title_desc_columns(e)
    row = nested.select(title.alias("t"), desc.alias("d")).collect()[0]
    assert row["t"] == "q9" and row["d"] == "q9"


def test_json_cells_match_mysql_shape(spark):
    """The encoded cells are the reference's MySQL cell format: JSON
    arrays (mysql_build.py:122-150) — one relation row per path."""
    nested = _nested_fixture(spark)
    ent = encode_entity_cells(nested).orderBy("qid").collect()
    assert ent[0]["alt_en"] == '["person","homo sapiens"]'
    assert ent[1]["alt_en"] is None
    p31 = encode_relation_cells(nested, "p31")
    rows = p31.where(F.col("qid") == "Q1").orderBy("ord").collect()
    assert len(rows) == 13          # encode keeps all; hydrate caps
    assert rows[0]["p31_qid"] == '["Q0","Q100"]'
    assert rows[0]["p31_zh"] == "[]"
