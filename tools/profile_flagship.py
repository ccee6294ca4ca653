"""Stage-level profile of the flagship ER pipeline (guide §1): times each
pinned stage of ``er_over_testdata`` separately so the e2e seconds can be
attributed to derivation / KB build / scoring / fan-out / CC.

Usage: python tools/profile_flagship.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wdel_spark.session import get_spark
from wdel_spark.entry_pipeline import (
    _pin_mem, derive_mention_tokens, derive_vocab_kb_df)
from wdel_spark.plans.pipeline import PipelineParams

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
spark = get_spark("profile_flagship")
sc = spark.sparkContext

T: dict[str, float] = {}


def timed(name, fn):
    sc.setJobDescription(name)
    t0 = time.perf_counter()
    out = fn()
    T[name] = round(time.perf_counter() - t0, 3)
    print(f"  {name:28s} {T[name]:8.3f}s", flush=True)
    return out


# warm-up on the smallest sf (JIT), same as bench.py
import bench as _b
warm = _b._warmup_dir(sf_dir)
if warm:
    from wdel_spark.entry_pipeline import er_over_testdata
    er_over_testdata(spark, warm).count()
    spark.catalog.clearCache()

params = PipelineParams()
t_all = time.perf_counter()
mt = timed("pin:mention_tokens", lambda: _pin_mem(
    derive_mention_tokens(spark, sf_dir)))
kb = timed("pin:vocab_kb", lambda: _pin_mem(
    derive_vocab_kb_df(spark, mt)))

from wdel_spark.plans.pipeline import (
    _fanout_join, candidate_signatures, entity_node,
    mention_node, rank_signature_scores, score_pair_sigs)
from wdel_spark.functions.textnorm import block_key_col, normalize_col

wide = params.wide_ids
raw_id = lambda: F.xxhash64(F.lit("raw"), "raw")
nm_id = lambda c: F.xxhash64(F.lit("nm"), c)
spans = mt.select("doc_id", "span_idx", "raw")
raws = timed("pin:raws(normalize)", lambda: _pin_mem(
    spans.select("raw").distinct()
    .select(raw_id().alias("raw_id"),
            normalize_col(F.col("raw")).alias("norm_mention"))
    .withColumn("nm_id", nm_id(F.col("norm_mention")))))
occ = spans.select(
    "doc_id", "span_idx",
    mention_node(F.col("doc_id"), F.col("span_idx"), wide).alias("node"),
    raw_id().alias("raw_id"))
norms = (
    raws.select("norm_mention").distinct()
    .withColumn("block_key", block_key_col(F.col("norm_mention")))
)
sig_scores = timed("pin:score_sigs", lambda: _pin_mem(score_pair_sigs(
    candidate_signatures(norms, kb, params, assume_unique=True), kb)))
sig_ranked = rank_signature_scores(sig_scores, params)
n_sigs = sig_scores.count()
best = sig_ranked.where(
    (F.col("rank") == 1) & (F.col("score") >= params.score_threshold)
).select(
    nm_id(F.col("norm_mention")).alias("nm_id"),
    entity_node(F.col("qid"), wide).alias("dst"),
)
raw_best = timed("pin:raw_best", lambda: _pin_mem(_fanout_join(
    raws.select("raw_id", "nm_id"), best,
    "nm_id", "auto", n_sigs, 10_000_000, 16, 1_000_000,
    probe_salt_cols=["raw_id"]).select("raw_id", "dst")))
edges = _fanout_join(
    occ.select("node", "raw_id"), raw_best,
    "raw_id", "auto", raw_best.count(), 10_000_000, 16, 1_000_000,
    probe_salt_cols=["node"],
).select(F.col("node").alias("src"), "dst")

from wdel_spark.operators.cc import connected_components
comps = timed("cc", lambda: connected_components(
    edges, params.cc_max_iterations,
    emit_isolated=False).localCheckpoint(eager=True))
n = timed("final_join_count", lambda: (
    occ.select("doc_id", "span_idx", "node")
    .join(comps, "node", "left")
    .select("doc_id", "span_idx",
            F.coalesce("component", "node").alias("cluster_id"))
).count())
total = round(time.perf_counter() - t_all, 3)
print(f"  {'TOTAL':28s} {total:8.3f}s   rows={n}")
print({"stages": T, "total": total})
spark.stop()
