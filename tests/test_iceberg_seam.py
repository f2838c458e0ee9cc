"""Iceberg seam: parquet fallback works end-to-end; catalog identifiers
fail loudly (not silently) when the runtime jar is absent (it is, in
this container - the probe documents that honestly)."""

import pandas as pd
import pytest

from geeflow_spark.sources import iceberg


def test_runtime_probe_and_fallback(spark, tmp_path):
    assert iceberg.iceberg_available(spark) is False  # no jar in env
    p = str(tmp_path / "t")
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3], "part": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]}))
    iceberg.write_table(df, p, mode="replace", partition_by=["part"])
    got = iceberg.read_table(spark, p)
    assert got.count() == 3
    assert sorted(got.columns) == ["doc_id", "part", "v"]
    # partitioned layout on disk
    import os
    assert any(d.startswith("part=") for d in os.listdir(p))
    # append mode
    iceberg.write_table(df, p, mode="append", partition_by=["part"])
    assert iceberg.read_table(spark, p).count() == 6


def test_catalog_identifier_fails_loudly(spark):
    with pytest.raises(ValueError, match="Iceberg runtime"):
        iceberg.read_table(spark, "cat.db.tbl")
