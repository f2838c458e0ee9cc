"""Labels pipeline: read labels table, project metadata, synthesize ids,
derive per-item ROIs.

Port of /root/reference/geeflow/pipelines.py:70-179 onto Spark:
  - read_labels / save_labels: csv or parquet by extension
    (pipelines.py:70-101);
  - num_max_samples head (:108-109) -> limit;
  - pipeline_labels: meta-key projection with validation + synthetic
    `id = range(n)` when absent (:113-126). The synthetic id requires a
    DETERMINISTIC total order; we pin the file row order via
    row_number() over the original order (single-file labels) so ids
    match the reference row-for-row;
  - item -> ROI derivation (:129-162): UTM-addressed variants
    (utm_x_min/max or utm_x/y + zone) or from_latlon_center fallback,
    with the same asserts; lat/lon rectangle when use_utm=False.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geeflow_spark.functions import coords as coords_lib


def read_labels(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    if path.endswith(".parquet"):
        return spark.read.parquet(path)
    raise ValueError("Not supported labels file format for file " + path)


def save_labels(df: DataFrame, path: str,
                max_driver_rows: int = 5_000_000) -> None:
    """Labels tables are driver-sized by contract (the reference reads
    them wholesale into pandas, pipelines.py:104-110); the cap guards
    the accidental \"write a 100 TB table through the driver\" misuse -
    beyond it, write distributed parquet instead."""
    if path.endswith(".parquet") and df.isStreaming is False:
        n = df.limit(max_driver_rows + 1).count()
        if n > max_driver_rows:
            df.write.mode("overwrite").parquet(path + ".d")
            raise ValueError(
                f"save_labels: > {max_driver_rows} rows is not a labels "
                f"table; wrote distributed parquet to {path}.d instead")
    if path.endswith(".csv"):
        df.toPandas().to_csv(path, index=False)
    elif path.endswith(".parquet"):
        df.toPandas().to_parquet(path, index=False)
    else:
        raise ValueError("Not supported labels file format for file " + path)


def pipeline_labels(df: DataFrame, meta_keys: list[str] | None = None,
                    num_max_samples: int | None = None) -> DataFrame:
    """Meta projection + synthetic id (pipelines.py:113-126)."""
    if num_max_samples:
        df = df.limit(int(num_max_samples))
    meta_keys = list(meta_keys or df.columns)
    missing = set(meta_keys) - set(df.columns)
    if missing:
        raise ValueError(f"Some meta keys ({meta_keys}) are not in data "
                         f"columns ({df.columns}).")
    df = df.select(*meta_keys)
    if "id" not in df.columns:
        # Deterministic: id = 0-based row number in the file's order.
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn("id", F.row_number().over(w) - 1)
    return df


def item_to_roi(item: dict[str, Any], *, img_width_m: float,
                max_cell_size_m: float, use_utm: bool = True,
                img_width_deg: float | None = None
                ) -> coords_lib.UtmGridMapping | tuple:
    """One label item -> ROI (pipelines.py:129-162). Returns a
    UtmGridMapping (use_utm) or a lat/lon bounds tuple."""
    if use_utm:
        img_size = int(img_width_m // max_cell_size_m)
        if all(x in item and item[x] is not None
               for x in ["utm_x_min", "utm_x_max", "utm_y_min",
                         "utm_y_max", "utm_zone"]):
            assert item["utm_x_max"] - item["utm_x_min"] == img_width_m
            assert item["utm_y_max"] - item["utm_y_min"] == img_width_m
            return coords_lib.UtmGridMapping(
                item["utm_zone"], max_cell_size_m, img_size, img_size,
                item["utm_x_min"], item["utm_y_min"])
        if all(x in item and item[x] is not None
               for x in ["utm_x", "utm_y", "utm_zone"]):
            return coords_lib.UtmGridMapping(
                item["utm_zone"], max_cell_size_m, img_size, img_size,
                item["utm_x"] - img_width_m / 2,
                item["utm_y"] - img_width_m / 2)
        return coords_lib.UtmGridMapping.from_latlon_center(
            item["lat"], item["lon"], max_cell_size_m, img_size)
    return coords_lib.get_lat_lon_roi_bounds(
        item["lat"], item["lon"], width_m=img_width_m,
        width_deg=img_width_deg)


def with_roi_columns(labels: DataFrame, *, img_width_m: float,
                     max_cell_size_m: float) -> DataFrame:
    """Vectorized ROI derivation for the common from_latlon_center path:
    adds (utm_zone, roi_x_min, roi_y_min, roi_size) columns via one
    Arrow-batched kernel (≙ per-item pipeline_item_to_roi)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                                   StructField, StructType)

    from geeflow_spark.functions import utm as utm_lib

    img_size = int(img_width_m // max_cell_size_m)
    cell = float(max_cell_size_m)
    schema = StructType([
        StructField("utm_zone", StringType()),
        StructField("roi_x_min", DoubleType()),
        StructField("roi_y_min", DoubleType()),
        StructField("roi_size", IntegerType()),
    ])

    @pandas_udf(schema)
    def _roi(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        e, n, zn, zl = utm_lib.from_latlon(la, lo)
        x0 = np.round((e - cell * img_size / 2) / cell) * cell
        y0 = np.round((n - cell * img_size / 2) / cell) * cell
        zone = pd.Series(zn).astype(str) + pd.Series(zl).astype(str)
        return pd.DataFrame({
            "utm_zone": zone, "roi_x_min": x0, "roi_y_min": y0,
            "roi_size": np.full(len(la), img_size, dtype=np.int32)})

    return labels.withColumn("_roi", _roi(F.col("lat"), F.col("lon"))) \
        .select("*", "_roi.*").drop("_roi")
