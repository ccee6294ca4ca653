#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-node cluster exists in the sandbox, so the N-vs-4N-executors
criterion is evidenced as the same job on the same input at local[8] vs
local[32] (4x cores).  Each level runs in its own subprocess (fresh JVM);
job wall time excludes session startup.  Efficiency = (T_8 / T_32) / 4.

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


def run_one(cores: int, sf_dir: str) -> None:
    from wdel_spark.session import get_spark
    from wdel_spark.entry_pipeline import run_er_synthetic

    # identical task granularity at both levels: partition count fixed,
    # only executor-thread concurrency differs (the N-vs-4N proxy)
    spark = get_spark(f"wdel_scaling_{cores}", cores=cores,
                      shuffle_partitions=128)
    # warm-up: JVM JIT + Arrow + python workers before measuring
    run_er_synthetic(spark, 2000, 2000, n_partitions=16).count()
    t0 = time.perf_counter()
    n = run_er_synthetic(spark, N_DOCS, N_ENTITIES, n_partitions=128).count()
    print(json.dumps({"cores": cores,
                      "sec": round(time.perf_counter() - t0, 3),
                      "rows": n}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--cores" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--cores") + 1]), sf_dir)
        return
    # fresh JVM per (level, rep): within-session reps degrade (accumulated
    # block-manager state); min-of-reps is robust to host noise
    results: dict[int, list] = {8: [], 32: []}
    for rep in range(N_REPS):
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cores", str(cores)],
                capture_output=True, text=True, check=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            results[cores].append(json.loads(line))
    t8 = min(r["sec"] for r in results[8])
    t32 = min(r["sec"] for r in results[32])
    eff = (t8 / t32) / 4.0
    summary = {
        "job": f"ER pipeline, synthetic corpus n_docs={N_DOCS} "
               f"n_entities={N_ENTITIES}",
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "all_runs": {k: [r["sec"] for r in v] for k, v in results.items()},
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "mentions": results[32][0]["rows"],
    }
    print(json.dumps(summary))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
