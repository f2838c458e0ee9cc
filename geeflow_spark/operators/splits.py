"""Geographic train/val/test split assignment.

Exact semantics of the reference's split logic
(/root/reference/geeflow/export_beam_tfds.py:91-111):
  - if a split column exists: equality filter, with "val"=="validation"
    aliasing (:95-97);
  - else: S2 cell at `level` (default 9, ~14-20 km), bucket =
    int(md5(str(cell_id)).hexdigest(), 16) % 10; 9 -> test, 8 -> val,
    the rest -> train (:99-109).

The md5 runs over the DECIMAL STRING of the python int cell id - we keep
that exactly (uint64 rendering), computed batch-wise in a pandas UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from geeflow_spark.functions import s2
from geeflow_spark.operators.spatial_join import with_cell


@pandas_udf(IntegerType())
def _md5_mod10(cell: pd.Series) -> pd.Series:
    ids = cell.to_numpy(np.int64).astype(np.uint64)
    out = np.empty(len(ids), dtype=np.int32)
    for i, c in enumerate(ids):
        out[i] = int(hashlib.md5(str(int(c)).encode("utf-8")).hexdigest(),
                     16) % 10
    return pd.Series(out)


def with_split_bucket(df: DataFrame, level: int = 9, lat_col: str = "lat",
                      lon_col: str = "lon",
                      out_col: str = "split_bucket") -> DataFrame:
    """Adds the 0..9 geographic split bucket column."""
    enc = with_cell(df, level, lat_col, lon_col, out_col="_s2split")
    return enc.withColumn(out_col, _md5_mod10(F.col("_s2split"))) \
              .drop("_s2split")


def with_split(df: DataFrame, level: int = 9, lat_col: str = "lat",
               lon_col: str = "lon", out_col: str = "split") -> DataFrame:
    """Adds split in {train, val, test}: bucket 9 test, 8 val, rest train."""
    b = with_split_bucket(df, level, lat_col, lon_col, "_bucket")
    return b.withColumn(
        out_col,
        F.when(F.col("_bucket") == 9, "test")
         .when(F.col("_bucket") == 8, "val")
         .otherwise("train")).drop("_bucket")


def filter_split(df: DataFrame, split: str,
                 split_col: str = "split") -> DataFrame:
    """Split equality filter with the val/validation alias
    (export_beam_tfds.py:95-97)."""
    if split in ("val", "validation"):
        return df.filter(F.col(split_col).isin("val", "validation"))
    return df.filter(F.col(split_col) == split)
