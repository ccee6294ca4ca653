"""Checkpoint-resumable stage snapshots: parquet + Iceberg-style manifest.

Mirrors the reference's try-load-else-compute resumability
(`/root/reference/src/candidate_generation/encode_item.py:121-131`) and
resume-from-checkpoint (`/root/reference/src/entity_disambiguation/train.py:283-302`)
as a pipeline-level layer (SURVEY.md §4 "checkpoint/lineage"):

- each stage writes its output DataFrame as parquet plus a
  ``_manifest.json`` carrying {stage, input_hash, row_count,
  per-partition row counts, stage counters, schema};
- a stage is *skipped on resume* iff its manifest exists, is complete, and
  its ``input_hash`` matches the hash of the stage's inputs+config;
- counters (candidates_generated, pairs_scored, edges_kept, ...) live in
  the manifest — the per-stage lineage record the north rule requires.

In production this layer writes to an Iceberg table
(``df.writeTo(tbl).createOrReplace()`` with a snapshot-properties map
carrying the same manifest keys); the sandbox has no Iceberg jars, so the
same API writes parquet + sidecar JSON.  Swap is config-only.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "_manifest.json"


def write_snapshot(
    df: DataFrame,
    path: str,
    stage: str,
    input_hash: str,
    counters: dict[str, Any] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Materialize ``df`` at ``path`` and write its manifest.

    Returns the manifest dict.  Row counts come from one pass over the
    *written* files (so the manifest describes what is actually on disk).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    per_part = (
        written.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .collect()
    )
    partition_counts = {int(r["partition"]): int(r["count"]) for r in per_part}
    manifest = {
        "stage": stage,
        "input_hash": input_hash,
        "row_count": int(sum(partition_counts.values())),
        "partition_counts": partition_counts,
        "counters": counters or {},
        "schema": written.schema.jsonValue(),
        "format": "parquet",
        "complete": True,
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def snapshot_is_valid(path: str, stage: str, input_hash: str) -> bool:
    m = read_manifest(path)
    return (
        m is not None
        and m.get("complete") is True
        and m.get("stage") == stage
        and m.get("input_hash") == input_hash
    )


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
