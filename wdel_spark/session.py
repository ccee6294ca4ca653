"""SparkSession factory with scale-aware defaults.

Local sandbox = ``local[N]`` (one JVM); the same config block is what we'd
ship via ``spark-submit --py-files`` on a real cluster — AQE (runtime
re-plan + skew-join splitting + partition coalescing) and Arrow are the
load-bearing settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_BLAS_VARS = (
    "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS",
)


def get_spark(
    app_name: str = "wdel_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # one BLAS thread per python worker: N workers × multi-threaded
    # OpenBLAS oversubscribes the box N× and *reverses* core scaling —
    # parallelism comes from Spark tasks, not intra-op math threads
    for var in _BLAS_VARS:
        os.environ.setdefault(var, "1")
    # shuffle/spill on tmpfs: the sandbox block device throttles after
    # sustained IO (burst credits), stalling shuffle writes at ~1 MB/s and
    # idling every core; RAM-backed local dirs sidestep it.  On a real
    # cluster this maps to NVMe-backed spark.local.dir.
    local_dir = os.environ.get("WDEL_SPARK_LOCAL_DIR", "/dev/shm/wdel-spark")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for var in _BLAS_VARS:
        b = b.config(f"spark.executorEnv.{var}", "1")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
