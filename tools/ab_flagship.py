"""Interleaved A/B of the two flagship bench queries (er_pipeline_e2e +
er_recall_at_k) with the exact bench.py methodology (fresh session per
run, warm-up on smallest sibling sf, count() sink).  Prints one line per
run; compare MINIMA across interleaved reps to cancel host phases.

Usage: python tools/ab_flagship.py [sf_dir] [reps]
"""
import json
import subprocess
import sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

SNIPPET = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from wdel_spark.session import get_spark
from wdel_spark.queries import REGISTRY
from wdel_spark.entry_pipeline import er_over_testdata
import bench as _b
sf_dir = %(sf)r
spark = get_spark("ab", cores=32, shuffle_partitions=32)
warm = _b._warmup_dir(sf_dir)
if warm:
    er_over_testdata(spark, warm).count()
    spark.catalog.clearCache()
t0 = time.perf_counter()
er_over_testdata(spark, sf_dir).count()
t_e2e = round(time.perf_counter() - t0, 3)
fn, _ = REGISTRY["er_recall_at_k"]
t0 = time.perf_counter()
fn(spark, sf_dir).count()
t_rec = round(time.perf_counter() - t0, 3)
print("RESULT", t_e2e, t_rec)
spark.stop()
"""

for rep in range(reps):
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET % {"sf": sf_dir}],
        capture_output=True, text=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    print(json.dumps({"rep": rep, "line": line, "rc": out.returncode}),
          flush=True)
