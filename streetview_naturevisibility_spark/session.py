"""SparkSession factory with scale-oriented defaults.

The engine targets multi-executor clusters over ~100 TB inputs; in this
sandbox it runs on local[N]. All settings below are cluster-safe:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on for every pandas UDF crossing (the only Python in the engine),
- bounded Arrow batches so wide ``html:binary`` rows can't blow the
  Python worker heap,
- shuffle partitions default to a sandbox-friendly value; on a real
  cluster set ``spark.sql.shuffle.partitions`` ~ 2-3x total cores (AQE
  coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bound Arrow batch size: pages rows carry html:binary payloads.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic session timezone for timestamp round-trips vs DuckDB.
    "spark.sql.session.timeZone": "UTC",
    # 100 TB scans want larger split sizes; harmless locally.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # r7 (guide §3.1/§9): allow shuffled-hash joins when a side fits a
    # per-partition hash map instead of always sorting both sides —
    # the funnel's digest semi-join sorts a text-carrying frame
    # otherwise (interleaved A/B: 4.9 -> 4.5 s warm per action). The
    # AQE threshold bounds the build side per post-shuffle partition,
    # so the OOM risk the guide notes stays capped on any cluster.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "256m",
    # Quieter driver logs in the sandbox.
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "streetview-naturevisibility-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the
    sandbox); on a real cluster pass None and let spark-submit decide.
    """
    # One BLAS thread per Python worker. local[N] runs N workers forked
    # from a daemon that inherits this environment; without the pin,
    # every worker's OpenBLAS spawns a full core-count thread pool and
    # N x N spin-waiting threads drive the box into >95% SYSTEM time
    # (measured: the 1M x 4096-centroid SemDeDup assignment matmul sat
    # at 20+ min of sys-thrash vs ~1 min pinned). Must run BEFORE the
    # JVM starts so the env reaches the workers; pre-set values win.
    # On a real cluster do the same via spark.executorEnv.*.
    for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_v, "1")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
