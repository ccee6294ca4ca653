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
    # billed to the flagship number
    er_over_testdata(spark, "/root/testdata/sf0.001").count()
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
