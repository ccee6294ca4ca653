"""KB IO sources (JSONL schema scan, TSV, upsert) + context kernels."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wdel_spark.sources.kb_io import (
    ENTITY_SCHEMA,
    read_entity_jsonl,
    write_entity_jsonl,
    read_sparql_tsv,
    strip_entity_uri,
    upsert_snapshot,
)
from wdel_spark.functions.context import (
    context_split,
    char_budget_window,
    token_budget_window,
)


def test_entity_jsonl_roundtrip(spark, tmp_path):
    rows = [
        {"qid": "Q1", "label": {"en": "alpha", "zh": "甲"},
         "desc": {"en": None, "zh": "描述"},
         "alt": {"en": ["a", "b"], "zh": []},
         "p31": {"qid": [["Q5"]], "en": [["human"]], "zh": [["人"]]},
         "p279": None},
        {"qid": "Q2", "label": {"en": None, "zh": None}, "desc": None,
         "alt": None, "p31": None, "p279": None},
    ]
    df = spark.createDataFrame(rows, ENTITY_SCHEMA)
    path = str(tmp_path / "wk_info_0.jsonl")
    write_entity_jsonl(df, path, shards=2)
    back = read_entity_jsonl(spark, path)
    assert back.count() == 2
    got = {r["qid"]: r for r in back.collect()}
    assert got["Q1"]["label"]["zh"] == "甲"
    assert got["Q1"]["p31"]["qid"] == [["Q5"]]
    assert got["Q2"]["label"] is None or got["Q2"]["label"]["en"] is None
    # P5 empty-entity filter semantics work against this schema
    nonempty = back.where(
        F.coalesce("label.en", "label.zh", "desc.en", "desc.zh").isNotNull())
    assert [r["qid"] for r in nonempty.collect()] == ["Q1"]


def test_tsv_scan_and_uri_strip(spark, tmp_path):
    p = tmp_path / "labels.tsv"
    p.write_text(
        "item\tlabel\n"
        "<http://www.wikidata.org/entity/Q42>\tDouglas Adams\n"
        "<http://www.wikidata.org/entity/Q1>\tuniverse\n"
    )
    df = read_sparql_tsv(spark, str(p))
    out = df.select(strip_entity_uri(F.col("item")).alias("qid"), "label")
    got = {r["qid"]: r["label"] for r in out.collect()}
    assert got == {"Q42": "Douglas Adams", "Q1": "universe"}


def test_upsert_last_wins(spark):
    existing = spark.createDataFrame(
        [("Q1", "old", 1), ("Q2", "keep", 1)], "qid string, v string, ver int")
    updates = spark.createDataFrame(
        [("Q1", "new", 2), ("Q3", "ins", 2)], "qid string, v string, ver int")
    out = {r["qid"]: (r["v"], r["ver"])
           for r in upsert_snapshot(existing, updates, ["qid"], "ver").collect()}
    assert out == {"Q1": ("new", 2), "Q2": ("keep", 1), "Q3": ("ins", 2)}


def test_context_split():
    assert context_split("hello world", 6, 11) == ("hello ", "world", "")


def test_char_budget_window_serving_formula():
    """Byte-exact vs the reference (pipeline.py:120-126), including its
    always-negative right quota: right[:max_len - mlen - left_quota]."""
    left, m, right = "L" * 300, "abcde", "R" * 300
    out = char_budget_window(left, m, right, max_len=128)
    # left_quota = 128 - 9//2 = 124; right_quota = 128 - 9 - 124 = -5
    # -> right keeps all but its last 5 chars
    assert out == "L" * 124 + "<<abcde>>" + "R" * 295
    # short right context: right[:-5] of 3 chars -> empty
    out_short = char_budget_window(left, m, "RRR", max_len=128)
    assert out_short == "L" * 124 + "<<abcde>>"
    # huge mention: left_quota = 128 - 304//2 = -24 -> reference's
    # left[-(-24):] DROPS the first 24 chars; right_quota = 128 - 304 -
    # (-24) = -152 -> right[:-152] keeps the first 148 of 300
    out2 = char_budget_window(left, "x" * 300, right, max_len=128)
    assert out2 == "L" * (300 - 24) + "<<" + "x" * 300 + ">>" + "R" * 148


def test_token_budget_window_spillover():
    out = token_budget_window(
        ["l1", "l2"], ["m"], ["r%d" % i for i in range(200)], max_tokens=12)
    # budget = 12-1-2 = 9; left takes 2 (all), right gets 4+spare 3 = 7
    assert out[:3] == ["l1", "l2", "[L]"]
    assert out[3:5] == ["m", "[R]"]
    assert len(out) == 2 + 1 + 1 + 1 + 7
    # symmetric case
    out2 = token_budget_window(["a"] * 50, ["m"], ["b"] * 50, max_tokens=11)
    assert len(out2) == 11
