#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).  NOT the frozen
driver bench — ``bench.py`` stays untouched; this file exists so the
round's before/after numbers can be produced with noop-sink isolation
(guide §1.4), per-query job labels (§1.5), and plan dumps (§7.2).

Usage:
  python bench_extra.py [--sf-dir D] [--queries a,b,c|all|headline]
                        [--reps N] [--noop] [--explain-dir DIR]
                        [--skip-flagship]

Prints one JSON line per rep with per-query seconds (same methodology as
bench.py: count() by default; ``--noop`` switches the sink to
``write.format("noop")`` which computes every column of every row).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

HEADLINE = [
    "pricing_summary", "topk_orders_per_customer", "revenue_by_nation",
    "minmax_normalize", "softmax_per_user", "exact_dedup",
    "minhash_lsh_neardup", "simhash_neardup", "token_count", "token_window",
    "entity_hydrate_nested", "cosine_topk", "embedding_class_centroids",
    "embedding_neardup_banded", "er_recall_at_k",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="headline")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--skip-flagship", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from wdel_spark.session import get_spark
    from wdel_spark.queries import REGISTRY
    from wdel_spark.entry_pipeline import er_over_testdata

    spark = get_spark("wdel_bench_extra", cores=cpus,
                      shuffle_partitions=cpus)
    sc = spark.sparkContext

    if args.queries == "all":
        names = list(REGISTRY)
    elif args.queries == "headline":
        names = list(HEADLINE)
    else:
        names = [q for q in args.queries.split(",") if q]

    def sink(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            fn, _ = REGISTRY[name]
            try:
                df = fn(spark, args.sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.explain_dir, f"{name}.txt"),
                          "w") as f:
                    f.write(buf.getvalue())
            except Exception as e:  # noqa: BLE001
                print(f"explain {name} failed: {e}", file=sys.stderr)

    if not args.no_warmup:
        # same JIT warm-up protocol as bench.py (smallest sibling sf dir)
        import bench as _b
        warm = _b._warmup_dir(args.sf_dir)
        if warm and not args.skip_flagship:
            sc.setJobDescription("warmup: flagship on smallest sf")
            er_over_testdata(spark, warm).count()
            spark.catalog.clearCache()

    for rep in range(args.reps):
        timings: dict[str, float] = {}
        if not args.skip_flagship:
            sc.setJobDescription("er_pipeline_e2e")
            t0 = time.perf_counter()
            er_over_testdata(spark, args.sf_dir).count()
            timings["er_pipeline_e2e"] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        for name in names:
            fn, _ = REGISTRY[name]
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            sink(fn(spark, args.sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        print(json.dumps({
            "rep": rep,
            "total": round(sum(timings.values()), 3),
            "queries": timings,
            "sf_dir": args.sf_dir,
            "noop": args.noop,
            "cpus": cpus,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
