"""KB ingestion sources/sinks (SURVEY.md §2.1).

S1  JSONL KB scan   — nested entity records with an explicit schema (no
                      inference), mirroring `load_entity_dict`
                      (`/root/reference/src/candidate_generation/encode_item.py:34-53`).
S2  Sharded files   — glob paths (`wk_info_*.jsonl`); explicit keys make
                      shard order irrelevant.
S3  TSV scan        — tab-separated SPARQL dumps w/ header
                      (`/root/reference/src/wikidata_process/merge_info.py:100-101`).
S5  JSONL sink      — `df.write.json`, shard = partition.
S6  Upsert          — MySQL ``ON DUPLICATE KEY UPDATE``
                      (`mysql_build.py:105-152`) becomes a key-wise
                      last-wins merge snapshot (Iceberg ``MERGE INTO`` in
                      production; parquet rewrite here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

# Nested WDEL entity record (FIXTURES.md §2; reference docstring
# `tokenization.py:113-133`).  label/desc/alt nest per language; P31/P279
# are arrays of ≤3-hop class paths.
_LANG_STRUCT = T.StructType([
    T.StructField("en", T.StringType(), True),
    T.StructField("zh", T.StringType(), True),
])
_LANG_ARR_STRUCT = T.StructType([
    T.StructField("en", T.ArrayType(T.StringType()), True),
    T.StructField("zh", T.ArrayType(T.StringType()), True),
])
_PATHS = T.ArrayType(T.ArrayType(T.StringType()))
_REL_STRUCT = T.StructType([
    T.StructField("qid", _PATHS, True),
    T.StructField("en", _PATHS, True),
    T.StructField("zh", _PATHS, True),
])

ENTITY_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType(), False),
    T.StructField("label", _LANG_STRUCT, True),
    T.StructField("desc", _LANG_STRUCT, True),
    T.StructField("alt", _LANG_ARR_STRUCT, True),
    T.StructField("p31", _REL_STRUCT, True),
    T.StructField("p279", _REL_STRUCT, True),
])


def read_entity_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: sharded nested-entity JSONL -> DataFrame, schema pinned
    (`spark.read.schema(...).json(glob)`); no sampling pass, nulls
    preserved (null-handling is semantic: P5 drops all-null entities)."""
    return spark.read.schema(ENTITY_SCHEMA).json(path)


def write_entity_jsonl(df: DataFrame, path: str, shards: int | None = None
                       ) -> None:
    """S5: JSONL sink; ``shards`` controls output partition count (the
    reference writes one shard per 10M-entity chunk — C1)."""
    if shards:
        df = df.repartition(shards)
    df.write.mode("overwrite").json(path)


def read_sparql_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S3: TSV scan with header row (SPARQL result dumps)."""
    return (
        spark.read.option("sep", "\t").option("header", True).csv(path)
    )


def strip_entity_uri(col) -> F.Column:
    """P1: `<http://www.wikidata.org/entity/Q42>` -> `Q42` via regexp —
    replicates the reference's *intent*; its `lstrip` char-set strip is a
    latent bug we do not copy (`process_string.py:5-8`)."""
    return F.regexp_extract(col, r"entity/(Q\d+)", 1)


def upsert_snapshot(
    existing: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """S6: key-wise last-wins merge (upsert).  ``order_col`` breaks
    conflicts (highest wins — e.g. a version/timestamp column).  In
    production this is Iceberg ``MERGE INTO``; semantics here are
    identical and deterministic."""
    all_rows = updates if existing is None else existing.unionByName(updates)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
