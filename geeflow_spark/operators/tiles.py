"""Raster <-> vector tile assignment: plots -> UTM-zone split tiles.

Spark-native re-expression of the reference's export_rasters pipeline
(/root/reference/geeflow/export_rasters.py:221-289 `read_and_split_data`),
the path BASELINE.json requires to match row-for-row:

  - predictions join cells_metadata on `id` (export_rasters.py:207)
  - per-zone split boundaries x_splits/y_splits (num_splits+1 monotone UTM
    coords; the reference's `export_utils.get_info` is absent from the
    open-source release - re-derived here, see `get_split_boundaries`)
  - home split: first boundary strictly greater than the coord, minus one
    (export_rasters.py:255-256)
  - plot extent:   x in [utm_x + dx*cell - plot_size//2, start + W*cell)
                   y in [y_end - H*cell, utm_y - dy*cell + plot_size//2)
    (export_rasters.py:264-277; note the floor-div `plot_size_m // 2` and
    the inverted y axis)
  - a plot is assigned to every overlapping split in the 3x3 neighborhood
    of its home split, clamped to [0, num_splits)
    (export_rasters.py:261-282), and must get >= 1 assignment (:287)

Everything below is pure Spark column arithmetic + one explode of the 3x3
candidate grid - whole-stage-codegen friendly, no Python in the row path.
The grouping key for downstream mosaicking is (utm_zone, xs, ys), exactly
the reference's GroupByKey key (export_rasters.py:494).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geeflow_spark.functions import coords as coords_lib


def get_split_boundaries(utm_x_min: float, utm_y_min: float,
                         utm_x_max: float, utm_y_max: float,
                         plot_size_m: float,
                         num_splits: int) -> tuple[list[float], list[float]]:
    """Monotone split boundary arrays (len num_splits+1) for a zone bbox.

    Re-derivation of the missing `export_utils.get_info`: the constraints
    recoverable from its call sites (export_rasters.py:239-256, 287) are
      (a) len == num_splits + 1, strictly increasing;
      (b) for every plot anchor inside the zone, some boundary is strictly
          greater than the coordinate (home-split lookup never raises);
      (c) every plot overlaps >= 1 split interval (the :287 assert), even
          with the +-1-cell dy/dx jitter and plot_size//2 extension.
    We take uniform interior boundaries over the bbox and pad the two outer
    boundaries by plot_size_m so border plots always land inside.
    """
    def axis(lo: float, hi: float) -> list[float]:
        b = np.linspace(lo, hi, num_splits + 1)
        b[0] = lo - plot_size_m
        b[-1] = hi + plot_size_m
        return [float(v) for v in b]

    return axis(utm_x_min, utm_x_max), axis(utm_y_min, utm_y_max)


def zone_bbox_utm(start_lat: float, start_lon: float, end_lat: float,
                  end_lon: float, grid_spacing_m: float
                  ) -> tuple[str, float, float, float, float]:
    """Zone-level UTM bbox via the reference's grid construction
    (export_rasters.py:125-142 generate_utm_metadata).
    """
    x_num, y_num = coords_lib.get_utm_grid_size(
        start_lat, start_lon, end_lat, end_lon, grid_spacing_m)
    roi = coords_lib.UtmGridMapping.from_latlon_center(
        (start_lat + end_lat) / 2, (start_lon + end_lon) / 2,
        grid_spacing_m, x_num, y_num)
    x0, y0, x1, y1 = roi.bbox
    return roi.utm_zone, float(x0), float(y0), float(x1), float(y1)


def assign_tiles(plots: DataFrame, *, zone_bboxes: dict,
                 grid_spacing_m: float = 960.0, cell_size: float = 10.0,
                 plot_size_m: float = 960.0, num_splits: int = 4,
                 pred_h: int = 4, pred_w: int = 4) -> DataFrame:
    """plots(id, utm_x, utm_y, dx, dy, utm_zone, ...) -> one row per
    (plot, assigned split tile), columns + (xs int, ys int).

    `zone_bboxes`: {utm_zone: (x_min, y_min, x_max, y_max)} - the zone
    worklist, small, embedded as literals (the reference reads it on the
    master, export_rasters.py:97-101).
    """
    spark = plots.sparkSession
    rows = []
    for zone, (x0, y0, x1, y1) in zone_bboxes.items():
        xsb, ysb = get_split_boundaries(x0, y0, x1, y1, plot_size_m,
                                        num_splits)
        rows.append((zone, xsb, ysb))
    bounds = spark.createDataFrame(
        rows, "utm_zone string, x_splits array<double>, y_splits array<double>")

    df = plots.join(F.broadcast(bounds), "utm_zone", "inner")

    # Home split: (first index with boundary > coord) - 1
    # (export_rasters.py:255-256). With uniform interior boundaries this is
    # closed-form; use array filtering to stay faithful to ANY boundary
    # layout (still pure column ops).
    def home(coord, splits):
        return (F.size(F.filter(splits, lambda b: b <= coord)) - 1)

    df = df.withColumn("_x_home", home(F.col("utm_x"), F.col("x_splits")))
    df = df.withColumn("_y_home", home(F.col("utm_y"), F.col("y_splits")))

    half = float(plot_size_m // 2)  # floor-div semantics of the reference
    x_start = F.col("utm_x") + F.col("dx") * cell_size - half
    x_stop = x_start + pred_w * cell_size
    y_end = F.col("utm_y") - F.col("dy") * cell_size + half
    y_start = y_end - pred_h * cell_size

    # 3x3 candidate splits around home, clamped (export_rasters.py:261-262).
    cand = F.sequence(F.lit(-1), F.lit(1))
    df = (df
          .withColumn("_cx", F.explode(cand))
          .withColumn("xs", F.col("_x_home") + F.col("_cx"))
          .filter((F.col("xs") >= 0) & (F.col("xs") < num_splits))
          .withColumn("_cy", F.explode(cand))
          .withColumn("ys", F.col("_y_home") + F.col("_cy"))
          .filter((F.col("ys") >= 0) & (F.col("ys") < num_splits)))

    xs_lo = F.element_at(F.col("x_splits"), F.col("xs") + 1)
    xs_hi = F.element_at(F.col("x_splits"), F.col("xs") + 2)
    ys_lo = F.element_at(F.col("y_splits"), F.col("ys") + 1)
    ys_hi = F.element_at(F.col("y_splits"), F.col("ys") + 2)

    # Interval overlap, half-open exactly as the reference's slice test
    # (export_rasters.py:268-282): skip iff stop <= lo or start >= hi.
    overlap = ~((x_stop <= xs_lo) | (x_start >= xs_hi) |
                (y_end <= ys_lo) | (y_start >= ys_hi))
    out = df.filter(overlap).drop("_cx", "_cy", "_x_home", "_y_home",
                                  "x_splits", "y_splits")
    return out


def tile_assign_pandas_oracle(plots_pdf, zone_bboxes: dict,
                              grid_spacing_m: float = 960.0,
                              cell_size: float = 10.0,
                              plot_size_m: float = 960.0,
                              num_splits: int = 4, pred_h: int = 4,
                              pred_w: int = 4):
    """Row-for-row oracle: verbatim port of the reference's assignment
    loop (export_rasters.py:250-289) in plain python over pandas rows.
    Used only in tests to diff against `assign_tiles`.
    """
    out = []
    for _, row in plots_pdf.iterrows():
        zone = row["utm_zone"]
        if zone not in zone_bboxes:
            continue
        x0, y0, x1, y1 = zone_bboxes[zone]
        x_splits, y_splits = get_split_boundaries(x0, y0, x1, y1,
                                                  plot_size_m, num_splits)
        utm_x, utm_y, dx, dy = (row["utm_x"], row["utm_y"], row["dx"],
                                row["dy"])
        try:
            x_split = next(i - 1 for i, xx in enumerate(x_splits)
                           if xx > utm_x)
            y_split = next(i - 1 for i, yy in enumerate(y_splits)
                           if yy > utm_y)
        except StopIteration:
            continue
        assignments = []
        for xs in range(max(0, x_split - 1), min(num_splits, x_split + 2)):
            for ys in range(max(0, y_split - 1),
                            min(num_splits, y_split + 2)):
                x_start = utm_x + dx * cell_size - plot_size_m // 2
                x_stop = x_start + pred_w * cell_size
                if x_stop <= x_splits[xs] or x_start >= x_splits[xs + 1]:
                    continue
                y_end = utm_y - dy * cell_size + plot_size_m // 2
                y_start = y_end - pred_h * cell_size
                if y_end <= y_splits[ys] or y_start >= y_splits[ys + 1]:
                    continue
                assignments.append((zone, xs, ys, row["id"]))
        assert assignments, f"Plot {row['id']} has not been assigned"
        out.extend(assignments)
    import pandas as pd
    return pd.DataFrame(out, columns=["utm_zone", "xs", "ys", "id"])
