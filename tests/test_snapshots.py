"""Checkpoint-resume: stage snapshots, manifests, lineage counters."""

import json
import os

from wdel_spark.plans import run_pipeline, PipelineParams
from wdel_spark.sources import read_manifest, snapshot_is_valid


def test_pipeline_resumes_from_snapshots(spark, corpus_spark, tmp_path):
    wd = str(tmp_path / "run1")
    res1 = run_pipeline(spark, corpus_spark, workdir=wd)

    # manifests written for every materialized stage with lineage counters
    for stage in ("s1_mentions", "s2_pair_sigs", "s4_sig_scores",
                  "s5_ranked", "s6_clusters"):
        m = read_manifest(os.path.join(wd, stage))
        assert m is not None and m["complete"], stage
        assert m["row_count"] > 0
        assert m["partition_counts"], stage

    counters = json.load(open(os.path.join(wd, "_counters.json")))
    assert counters["candidates_generated"] > 0
    assert counters["pairs_scored"] > 0
    assert counters["edges_kept"] > 0

    # collect run-1 output before the rerun overwrites its snapshot files
    c1 = res1["clusters"].toPandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)

    # simulate kill-after-S2: invalidate later stages, keep S1/S2
    for stage in ("s4_sig_scores", "s5_ranked", "s6_clusters"):
        os.remove(os.path.join(wd, stage, "_manifest.json"))

    res2 = run_pipeline(spark, corpus_spark, workdir=wd)
    c2 = res2["clusters"].toPandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    assert c1.equals(c2)


def test_snapshot_invalidated_by_param_change(spark, corpus_spark, tmp_path):
    wd = str(tmp_path / "run2")
    run_pipeline(spark, corpus_spark, workdir=wd)
    p1 = PipelineParams()
    path = os.path.join(wd, "s2_pair_sigs")
    assert snapshot_is_valid(path, "s2_pair_sigs", f"s1:{p1.digest()}")
    p2 = PipelineParams(top_k=5)
    assert not snapshot_is_valid(path, "s2_pair_sigs", f"s1:{p2.digest()}")


def test_span_sequence_invariant_roundtrip(spark, corpus_spark, tmp_path):
    """Write documents through the snapshot layer, read back, and verify the
    per-row span sequence (kind, text, media_ref, order) is intact — the
    driver's per-row invariant."""
    from wdel_spark.sources import write_snapshot, read_snapshot
    from wdel_spark.plans import verify_span_invariant

    path = str(tmp_path / "docs_roundtrip")
    docs = corpus_spark["documents"]
    write_snapshot(docs, path, "docs", "h")
    back = read_snapshot(spark, path)
    assert verify_span_invariant(docs, back) == 0
    assert back.count() == docs.count()
