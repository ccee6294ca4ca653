"""Streaming windowed agg + stateful dedup (availableNow drains)."""

import pandas as pd
from pyspark.sql import functions as F

from wdel_spark.streaming.windowed import (
    windowed_event_counts,
    streaming_exact_dedup,
)


def _drain(stream_df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_windowed_counts_match_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    # Append mode only emits windows older than max(event time) - watermark.
    # Push a sentinel event far past the end of input so every real window
    # finalizes; the sentinel's own window stays pending and is never emitted.
    sentinel_ts = events.agg(F.max("ts")).first()[0] + pd.Timedelta(hours=10)
    sentinel = pd.DataFrame([{
        "event_id": -1, "ts": sentinel_ts, "user_id": -1,
        "event_type": "__sentinel__", "value": 0.0, "props": "{}",
    }])[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    spark.createDataFrame(sentinel, schema=events.schema) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = _drain(windowed_event_counts(stream), tmp_path, "winagg")
    got = spark.read.parquet(out).toPandas()

    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.date_format("win.start", "yyyy-MM-dd HH:mm")
                .alias("win_start"), "event_type", "n", "sum_value")
        .toPandas()
    )
    key = ["win_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_streaming_dedup_keeps_one_per_hash(spark, tmp_path):
    rows = [
        ("d1", "same text", "2024-01-01 10:00:00"),
        ("d2", "same text", "2024-01-01 10:05:00"),
        ("d3", "other text", "2024-01-01 10:10:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "docs_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = _drain(streaming_exact_dedup(stream), tmp_path, "dedup")
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 2
    assert set(got["text"]) == {"same text", "other text"}
