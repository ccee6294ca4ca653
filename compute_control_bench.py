#!/usr/bin/env python
"""Compute-bound CONTROL job for the scaling evidence.

The ER pipeline measures 0.42 efficiency 2->8 cores on this host
(BENCH_SCALING.json) with uniform per-stage CPU inflation;
HOST_EVIDENCE.json + CONTENTION_EVIDENCE.json attribute the inflation to
the shared memory system.  This control closes the argument from the
other side: the SAME engine, session config, task shapes and measurement
protocol, but a workload whose cost is arithmetic (JVM codegen
levenshtein + Arrow-batched numpy Jaro-Winkler over generated string
pairs, negligible shuffle/scan) — if Spark itself were the scaling
limiter, this job would cap the same way; if the memory system is, this
job should scale near HOST_EVIDENCE's pure-CPU 0.99.

Usage:  python compute_control_bench.py            # orchestrates
        python compute_control_bench.py --cores N  # one run (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_PAIRS = int(os.environ.get("WDEL_CONTROL_PAIRS", "8000000"))
N_REPS = int(os.environ.get("WDEL_CONTROL_REPS", "2"))
LEVELS = tuple(int(x) for x in os.environ.get(
    "WDEL_CONTROL_LEVELS", "2,8").split(","))


def run_one(cores: int) -> None:
    import pandas as pd
    from pyspark.sql import functions as F
    from wdel_spark.session import get_spark
    from wdel_spark.functions.scoring import jaro_winkler_batch

    spark = get_spark(f"control_{cores}", cores=cores,
                      shuffle_partitions=128)

    def job(n):
        df = spark.range(n, numPartitions=64).select(
            F.concat(F.lit("entity name "),
                     (F.col("id") % 100000).cast("string")).alias("a"),
            F.concat(F.lit("entty nmae "),
                     ((F.col("id") + 7) % 100000).cast("string")).alias("b"),
        ).withColumn("lev", F.levenshtein("a", "b"))

        def scorer(batches):
            for pdf in batches:
                s = jaro_winkler_batch(pdf["a"].tolist(), pdf["b"].tolist())
                yield pd.DataFrame({"s": s + pdf["lev"].to_numpy()})

        return df.mapInPandas(scorer, "s double").agg(
            F.sum("s")).collect()[0][0]

    job(50_000)  # JIT + python-worker warm-up, same shape
    t0 = time.perf_counter()
    chk = job(N_PAIRS)
    wall = time.perf_counter() - t0
    print("WDEL_RESULT " + json.dumps(
        {"cores": cores, "sec": round(wall, 3), "checksum": round(chk, 2)}))
    spark.stop()


def main() -> None:
    if "--cores" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--cores") + 1]))
        return
    results: dict[int, list] = {c: [] for c in LEVELS}
    first = True
    for rep in range(N_REPS):
        order = LEVELS if rep % 2 == 0 else tuple(reversed(LEVELS))
        for cores in order:
            if not first:
                time.sleep(60)
            first = False
            out = subprocess.run(
                [sys.executable, __file__, "--cores", str(cores)],
                capture_output=True, text=True, check=True,
                env=dict(os.environ))
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("WDEL_RESULT ")][-1]
            rec = json.loads(line[len("WDEL_RESULT "):])
            results[cores].append(rec)
            print(json.dumps(rec))
    lo, hi = LEVELS
    t_lo = min(r["sec"] for r in results[lo])
    t_hi = min(r["sec"] for r in results[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    summary = {
        "job": f"compute-bound control: {N_PAIRS} generated string pairs, "
               "JVM levenshtein + Arrow numpy Jaro-Winkler, one scalar agg",
        "method": "interleaved order, fresh JVM per run, JIT warm-up, "
                  "min over reps — identical protocol to BENCH_SCALING",
        "levels": list(LEVELS),
        f"t_local{lo}_sec": t_lo,
        f"t_local{hi}_sec": t_hi,
        "all_runs": {str(c): results[c] for c in LEVELS},
        "scaling_efficiency": round(eff, 3),
        "contrast": "ER pipeline on the same host/protocol: 0.42 "
                    "(BENCH_SCALING.json) — the gap between this control "
                    "and the ER job is the memory system's share",
    }
    print(json.dumps(summary))
    with open(os.environ.get("WDEL_CONTROL_OUT",
                             "BENCH_SCALING_CONTROL.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
