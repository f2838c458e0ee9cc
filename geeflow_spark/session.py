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
        # NOTE (r7): spark.sql.files.minPartitionNum was evaluated for
        # scan parallelism on the small test tables and rejected: the
        # test parquet files hold ONE row group, so extra splits are
        # empty (63 of 64 tasks read nothing) while the inflated
        # partition COUNT defeats the _spread "only widen
        # under-partitioned inputs" heuristic the operators rely on.
        # Under-partitioned inputs are widened explicitly at the query
        # entry points instead (dedup._spread - a no-op on any real
        # at-scale table).
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
