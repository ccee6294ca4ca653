"""Structured Streaming windowed aggregation + stateful dedup.

SURVEY.md §2.10: the reference has no true streaming (Flask micro-batches)
— these are the Spark-native extensions a production deployment needs:

- ``windowed_event_counts``: tumbling-window counts with a watermark for
  late data (the standard readStream -> withWatermark -> window -> agg
  shape);
- ``streaming_exact_dedup``: drop duplicate documents by content hash
  across micro-batches with ``dropDuplicatesWithinWatermark`` — bounded
  state, the streaming analog of the batch exact-dedup operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(ts, event_type, value) stream -> per-window per-type counts/sums.

    Watermark bounds state: windows older than max(event time) - watermark
    are finalized and dropped from the state store."""
    # Testdata parquet stores ts as TIMESTAMP_NTZ; withWatermark requires
    # TIMESTAMP — cast is a no-op when the column is already TIMESTAMP.
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type", "n", "sum_value",
        )
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on content hash with watermark-bounded state."""
    hashed = docs_stream.withColumn("content_hash", F.md5(F.col("text")))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
