#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-node cluster exists in the sandbox, so the N-vs-4N-executors
criterion is evidenced as the SAME job on the SAME stored input at
local[8] vs local[32] (4x cores):

  1. the synthetic interleaved corpus + KB is materialized to parquet ONCE
     (the stand-in for the production Iceberg table — generation is not
     part of the measured pipeline, reading the table is);
  2. each level runs in its own subprocess (fresh JVM, warmed with a small
     same-shape job before measuring);
  3. the measured phase is the full ER pipeline: columnar scan -> mention
     extraction -> blocking -> signature scoring -> top-k -> iterative CC;
  4. min over N_REPS runs per level absorbs host noise.

Efficiency = (T_8 / T_32) / 4.

Usage:  python scaling_bench.py            # orchestrates both levels
        python scaling_bench.py --cores N  # one measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("WDEL_SCALING_DOCS", "1000000"))
N_ENTITIES = int(os.environ.get("WDEL_SCALING_ENTITIES", "20000"))
N_REPS = int(os.environ.get("WDEL_SCALING_REPS", "2"))
CORPUS_DIR = os.environ.get(
    "WDEL_SCALING_CORPUS",
    f"/tmp/wdel_scaling_corpus_{N_DOCS}_{N_ENTITIES}")


def run_one(cores: int) -> None:
    from wdel_spark.session import get_spark
    from wdel_spark.entry_pipeline import (
        materialize_corpus, run_er_from_parquet)

    # identical task granularity at both levels: partition count fixed,
    # only executor-thread concurrency differs (the N-vs-4N proxy)
    spark = get_spark(f"wdel_scaling_{cores}", cores=cores,
                      shuffle_partitions=128)
    materialize_corpus(spark, N_DOCS, N_ENTITIES, CORPUS_DIR)  # idempotent
    # warm-up: JVM JIT + Arrow + python workers on a small same-shape job
    warm_dir = CORPUS_DIR + "_warm"
    materialize_corpus(spark, 2000, 2000, warm_dir, n_partitions=16)
    run_er_from_parquet(spark, warm_dir).count()
    t0 = time.perf_counter()
    n = run_er_from_parquet(spark, CORPUS_DIR).count()
    print(json.dumps({"cores": cores,
                      "sec": round(time.perf_counter() - t0, 3),
                      "rows": n}))
    spark.stop()


def main() -> None:
    if "--cores" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--cores") + 1]))
        return
    results: dict[int, list] = {8: [], 32: []}
    for _rep in range(N_REPS):
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cores", str(cores)],
                capture_output=True, text=True, check=True,
                env=dict(os.environ),
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            results[cores].append(json.loads(line))
    t8 = min(r["sec"] for r in results[8])
    t32 = min(r["sec"] for r in results[32])
    eff = (t8 / t32) / 4.0
    summary = {
        "job": f"ER pipeline over stored corpus n_docs={N_DOCS} "
               f"n_entities={N_ENTITIES} (datagen excluded)",
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "all_runs": {k: [r["sec"] for r in v] for k, v in results.items()},
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "mentions": results[32][0]["rows"],
        "docs_per_sec_local32": round(N_DOCS / t32, 1),
    }
    print(json.dumps(summary))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
