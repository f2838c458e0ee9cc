"""Iceberg table seam: bind pipelines to real Iceberg tables when the
runtime is present, parquet-directory layout otherwise.

BASELINE.json's north rule targets "Iceberg tables of 10^12 interleaved
documents". This container ships no Iceberg Spark runtime jar
(`org.apache.iceberg.spark.SparkCatalog` is absent), so the repo's
default storage is the parquet + per-partition manifest layout of
plans/checkpoint.py — Iceberg-compatible partition semantics without
the catalog. This module is the single seam where a real deployment
swaps in Iceberg proper:

  - `iceberg_available(spark)`: runtime-jar probe (JVM class lookup).
  - `read_table` / `write_table`: catalog identifiers (`cat.db.tbl`)
    route through the Iceberg catalog when available; filesystem paths
    always use parquet. Both return/accept plain DataFrames, so every
    operator in this repo is storage-agnostic.

At 100 TB the Iceberg path buys partition-pruned scans (partition
transforms like `bucket(N, doc_id)` or `truncate`/`days(ts)`),
snapshot-isolated resume (the checkpoint manifests' role), and
schema evolution. The spans column (array<struct>) round-trips both
storages - parquet nested types are the Iceberg physical format too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 - py4j raises wrapped JVM errors
        return False


def _is_path(identifier: str) -> bool:
    return "/" in identifier or identifier.startswith("file:") \
        or identifier.startswith("s3:") or identifier.startswith("hdfs:")


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Reads an Iceberg catalog identifier (`catalog.db.table`) or a
    parquet directory path into a DataFrame."""
    if _is_path(identifier):
        return spark.read.parquet(identifier)
    if not iceberg_available(spark):
        raise ValueError(
            f"`{identifier}` looks like a catalog identifier but no "
            "Iceberg runtime is on the classpath; pass a parquet path "
            "or add the iceberg-spark-runtime jar")
    return spark.table(identifier)


def write_table(df: DataFrame, identifier: str, *, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Writes to an Iceberg table (catalog identifier) or a parquet
    directory (path), with identical partition semantics."""
    if _is_path(identifier):
        w = df.write.mode("overwrite" if mode == "replace" else mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(identifier)
        return
    if not iceberg_available(df.sparkSession):
        raise ValueError(
            f"`{identifier}` looks like a catalog identifier but no "
            "Iceberg runtime is on the classpath")
    wt = df.writeTo(identifier)
    if partition_by:
        from pyspark.sql import functions as F
        wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "replace":
        wt.createOrReplace()
    elif mode == "create":
        wt.create()
    else:
        wt.append()
