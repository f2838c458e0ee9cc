"""Flagship end-to-end plan: documents -> spatial join -> tiles -> splits.

The Spark restatement of the reference's dataset-generation lifecycle
(/root/reference/geeflow/export_beam_tfds.py:218-252 +
geeflow/pipelines.py:292-424), over the interleaved-document table of
BASELINE.json input_hint:

  docs(doc_id, spans, lat, lon)
    -> S2 cell encode (Arrow-batched)
    -> broadcast PIP join against region polygons (filterBounds + fc_get
       first-match semantics)
    -> UTM tile assignment (UtmGridMapping.from_latlon_center grid math)
    -> geographic split (md5(s2_cell) % 10)
  preserving the span-sequence (kind, text, media_ref, order) row-for-row.

One narrow stage end-to-end on the document side: scan -> encode -> BHJ
-> PIP -> tile math -> split hash. The only shuffle is the final
first-match aggregation (map-side partials shrink it to output size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from geeflow_spark.functions import coords as coords_lib
from geeflow_spark.functions import utm as utm_lib
from geeflow_spark.operators import spatial_join, splits

_TILE_SCHEMA = StructType([
    StructField("utm_zone", StringType()),
    StructField("tile_x", DoubleType()),
    StructField("tile_y", DoubleType()),
])


def tile_udf(cell_size: float, width: int, height: int | None = None,
             use_floor: bool = False):
    """(lat, lon) -> (utm_zone, tile_x, tile_y): the snapped origin of the
    UtmGridMapping.from_latlon_center ROI (reference coords.py:90-99,
    75-78). Batch-vectorized through our numpy UTM kernels."""
    h = width if height is None else height

    @pandas_udf(_TILE_SCHEMA)
    def _tile(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        e, n, zn, zl = utm_lib.from_latlon(la, lo)
        x0 = e - cell_size * width / 2.0
        y0 = n - cell_size * h / 2.0
        fn = np.floor if use_floor else np.round
        x0 = fn(x0 / cell_size) * cell_size
        y0 = fn(y0 / cell_size) * cell_size
        zone = pd.Series(zn).astype(str) + pd.Series(zl).astype(str)
        return pd.DataFrame({"utm_zone": zone, "tile_x": x0, "tile_y": y0})

    return _tile


def generate_examples(docs: DataFrame, regions: pd.DataFrame, *,
                      cell_level: int = 8, split_level: int = 9,
                      tile_cell_size: float = 10.0, tile_width: int = 96
                      ) -> DataFrame:
    """The flagship query. Returns one row per (doc, containing region):
    doc_id, spans, lat, lon, region_id, gridcode, class_name,
    utm_zone, tile_x, tile_y, split.
    """
    joined = spatial_join.join_points_regions(
        docs, regions, level=cell_level,
        region_cols=("region_id", "gridcode", "class_name"))
    tiled = joined.withColumn(
        "tile", tile_udf(tile_cell_size, tile_width)(F.col("lat"),
                                                     F.col("lon")))
    tiled = tiled.select("*", "tile.utm_zone", "tile.tile_x",
                         "tile.tile_y").drop("tile")
    return splits.with_split(tiled, level=split_level)


def first_region_per_doc(examples: DataFrame) -> DataFrame:
    """fc_get semantics on the flagship output: first (min region_id)
    region per document, payload columns carried through."""
    return spatial_join.first_match(
        examples,
        key_cols=["doc_id"],
        order_col="region_id",
        payload_cols=["gridcode", "class_name"])
