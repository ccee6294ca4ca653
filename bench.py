#!/usr/bin/env python
"""Headline benchmark.  Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _warmup_dir(sf_dir: str) -> str | None:
    """Smallest sibling sf* dataset of ``sf_dir`` (for JIT warm-up), or
    None when the layout doesn't provide one."""
    parent = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    best: tuple[float, str] | None = None
    try:
        names = os.listdir(parent)
    except OSError:
        return None
    for name in names:
        m = re.fullmatch(r"sf(\d+(?:\.\d+)?)", name)
        path = os.path.join(parent, name)
        if not m or os.path.abspath(path) == os.path.abspath(sf_dir):
            continue
        if not os.path.exists(os.path.join(path, "documents.parquet")):
            continue
        size = float(m.group(1))
        if best is None or size < best[0]:
            best = (size, path)
    return best[1] if best else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from wdel_spark.session import get_spark
    from wdel_spark.queries import REGISTRY
    from wdel_spark.entry_pipeline import er_over_testdata

    spark = get_spark("wdel_bench", cores=cpus, shuffle_partitions=cpus)

    timings: dict[str, float] = {}

    # JIT warm-up on a small same-shape job (same protocol as
    # scaling_bench.py): the first execution of a plan shape on this host
    # pays a multi-second C2-compilation storm that would otherwise be
    # billed to the flagship number.  The warm-up data root derives from
    # sf_dir (ADVICE r3: a hardcoded /root/testdata broke when
    # SPARK_GRAFT_SF_DIR pointed elsewhere) — smallest sibling sf* dir
    # that isn't sf_dir itself; skipped when none exists.
    warm_dir = _warmup_dir(sf_dir)
    if warm_dir:
        er_over_testdata(spark, warm_dir).count()
        spark.catalog.clearCache()

    # flagship: full ER pipeline (blocking + scoring + CC clustering)
    t0 = time.perf_counter()
    clusters = er_over_testdata(spark, sf_dir)
    n_mentions = clusters.count()
    timings["er_pipeline_e2e"] = round(time.perf_counter() - t0, 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs_per_sec = round(n_docs / timings["er_pipeline_e2e"], 2)

    headline = [
        "pricing_summary",
        "topk_orders_per_customer",
        "revenue_by_nation",
        "minmax_normalize",
        "softmax_per_user",
        "exact_dedup",
        "minhash_lsh_neardup",
        "simhash_neardup",
        "token_count",
        "token_window",
        "entity_hydrate_nested",
        "cosine_topk",
        "embedding_class_centroids",
        "embedding_neardup_banded",
        "er_recall_at_k",
    ]
    for name in headline:
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec_e2e": docs_per_sec,
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
