"""SparkSession factory with scale-oriented defaults.

Single place where engine-relevant Spark configs are set, so tests, bench,
and spark-submit entry points agree. Designed for a multi-executor cluster;
the sandbox runs local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "geeflow-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Builds (or returns) the configured SparkSession.

    Defaults:
      - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
      - Arrow on for pandas UDF exchange, capped batch size so vectorized
        kernels stay within executor memory at any scale (the analog of the
        reference's adaptive request splitting, ee_export_utils.py:151-232)
      - broadcast threshold raised: region/polygon sets are small and must
        broadcast (BASELINE.json north_star)
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = master or os.environ.get("SPARK_MASTER",
                                      f"local[{cpus}]" if cpus else "local[*]")
    if shuffle_partitions is None:
        try:
            n = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(2 * n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # Wrapping 64-bit integer arithmetic (splitmix64 mixing, hash-derived
        # columns) requires non-ANSI overflow semantics.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
