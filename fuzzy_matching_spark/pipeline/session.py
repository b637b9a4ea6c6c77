"""SparkSession builder with the engine's standard configuration.

Tuned for the execution model described in SURVEY.md §4.2: AQE on (runtime
re-planning + skew-join splitting matters for LSH band joins over
boilerplate-heavy corpora), Arrow on (every scorer crosses the Python
boundary in batches, never per row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["build_session"]


def build_session(
    master: str | None = None,
    app_name: str = "fuzzy-matching-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a session with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit provide it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32

    # glibc returns mmap'd allocations (>=128 KB) to the OS on free, so
    # numpy-heavy UDF workers re-fault the same pages on every Arrow batch —
    # at this sandbox's ~0.13 ms/page first-touch cost that multiplied some
    # kernel batches 5-10x.  Raising the thresholds makes workers retain
    # and reuse arena memory (bounded by their steady-state footprint).
    malloc_env = {
        "MALLOC_MMAP_THRESHOLD_": "1073741824",
        "MALLOC_TRIM_THRESHOLD_": "1073741824",
    }
    os.environ.update(malloc_env)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # workers fork from a daemon that has already imported
        # numpy/pandas/pyarrow + our kernels: the pages are shared COW, so
        # the first Python stage doesn't pay N_workers x (import + first-
        # touch page faults) — see worker_daemon.py
        .config(
            "spark.python.daemon.module",
            "fuzzy_matching_spark.pipeline.worker_daemon",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in malloc_env.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
