"""Structured Streaming variant of the ER pipeline.

The reference serves requests through Flask micro-batches
(`/root/reference/src/pipeline.py:263-338`); the Spark-native analog is a
``readStream`` of document files driven through the SAME stage functions
via ``foreachBatch`` — one code path for batch and streaming (the
kill-resume story also carries over: file-source + checkpointLocation give
exactly-once sink appends).

Clustering stays a periodic batch job over the accumulated edge log:
iterative CC is not expressible inside a streaming trigger, and incremental
CC (merging new edges into existing components) is a planned operator —
today we re-run CC over the full edge snapshot, which is correct and
idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wdel_spark.datagen.corpus import DOCUMENTS_SCHEMA
from wdel_spark.plans.pipeline import (
    PipelineParams,
    extract_mentions,
    block_candidates,
    score_pairs,
)
from pyspark.sql import functions as F


def run_streaming_assignments(
    spark: SparkSession,
    input_path: str,
    kb: DataFrame,
    output_path: str,
    checkpoint_path: str,
    params: PipelineParams = PipelineParams(),
    available_now: bool = True,
):
    """Stream documents -> per-mention entity assignments (parquet sink).

    ``kb``: prepared alias table (prepare_kb output).  Each micro-batch runs
    extract -> block -> score -> top-1 threshold; results append to
    ``output_path``.  ``available_now`` drains existing files then stops
    (test/backfill mode); otherwise runs continuously.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        mentions = extract_mentions(batch_df)
        cands = block_candidates(mentions, kb, params)
        scored = score_pairs(cands)
        per_pair = scored.groupBy("doc_id", "span_idx", "qid").agg(
            F.max("score").alias("score"))
        from wdel_spark.operators.topk import top_k_per_group

        ranked = top_k_per_group(
            per_pair, ["doc_id", "span_idx"],
            [F.desc("score"), F.asc("qid")], 1)
        (
            ranked.where(F.col("score") >= params.score_threshold)
            .select("doc_id", "span_idx", "qid", "score")
            .write.mode("append").parquet(output_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
