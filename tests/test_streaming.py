"""Streaming variant: same assignments as the batch pipeline."""

from pyspark.sql import functions as F

from wdel_spark.plans import (
    prepare_kb,
    extract_mentions,
    block_candidates,
    score_pairs,
    PipelineParams,
)
from wdel_spark.operators import top_k_per_group
from wdel_spark.streaming import run_streaming_assignments


def test_streaming_matches_batch(spark, corpus_spark, tmp_path):
    docs_path = str(tmp_path / "docs_in")
    out_path = str(tmp_path / "assign_out")
    ckpt = str(tmp_path / "ckpt")
    corpus_spark["documents"].write.parquet(docs_path)

    kb = prepare_kb(
        corpus_spark["kb_aliases"],
        corpus_spark["entity_vectors"],
        corpus_spark["redirects"],
        corpus_spark["wikimedia_filter"],
    )
    run_streaming_assignments(spark, docs_path, kb, out_path, ckpt)
    got = spark.read.parquet(out_path).toPandas()

    params = PipelineParams()
    mentions = extract_mentions(corpus_spark["documents"])
    scored = score_pairs(block_candidates(mentions, kb, params))
    per_pair = scored.groupBy("doc_id", "span_idx", "qid").agg(
        F.max("score").alias("score"))
    want = (
        top_k_per_group(per_pair, ["doc_id", "span_idx"],
                        [F.desc("score"), F.asc("qid")], 1)
        .where(F.col("score") >= params.score_threshold)
        .select("doc_id", "span_idx", "qid", "score")
        .toPandas()
    )
    key = ["doc_id", "span_idx"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    assert (got_s["qid"] == want_s["qid"]).all()


def test_streaming_sink_idempotent_on_batch_replay(spark, corpus_spark,
                                                   tmp_path):
    """A retried micro-batch must replace its own partition, not append
    duplicates (foreachBatch is at-least-once; the sink makes it
    effectively-once via _batch_id dynamic partition overwrite)."""
    docs_path = str(tmp_path / "docs_in2")
    out_path = str(tmp_path / "assign_out2")
    corpus_spark["documents"].write.parquet(docs_path)
    kb = prepare_kb(
        corpus_spark["kb_aliases"],
        corpus_spark["entity_vectors"],
        corpus_spark["redirects"],
        corpus_spark["wikimedia_filter"],
    )
    # run the same stream twice with FRESH checkpoints: the second run
    # replays batch 0 against an output dir that already has it — the
    # harshest at-least-once scenario
    run_streaming_assignments(spark, docs_path, kb, out_path,
                              str(tmp_path / "ckpt_a"))
    n1 = spark.read.parquet(out_path).count()
    run_streaming_assignments(spark, docs_path, kb, out_path,
                              str(tmp_path / "ckpt_b"))
    n2 = spark.read.parquet(out_path).count()
    assert n1 == n2 > 0  # replay replaced, not duplicated
