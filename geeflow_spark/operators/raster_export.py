"""Raster-export mosaic stage: grouped plot tensors -> split-tile rasters.

Spark form of the reference's per-split mosaic (export_rasters.py:309-388
`process_one_split` + the per-zone GroupByKey :494-498): after
`tiles.assign_tiles` produces (utm_zone, xs, ys) keyed plot rows, a
groupBy(zone, xs, ys).applyInPandas mosaics each split's plots into one
raster and emits (zone, xs, ys, geotransform, raster, mask).

The mosaic function itself (`export_utils.get_numpy_data`) is ABSENT from
the open-source reference - behavior re-derived from its call site
(export_rasters.py:318-368):
  - duplicate plot keys (xp, yp, dx, dy) are grouped into lists
    (:318-322) -> contributions of duplicates are averaged;
  - raster covers the split slice [x_splits[xs], x_splits[xs+1]) x
    [y_splits[ys], y_splits[ys+1]) at cell_size, geotransform
    (x_lo, cell, 0, y_lo, 0, +cell) (:333-342) - y axis UP;
  - plot placement math identical to the assignment overlap test
    (:264-277): x_start = xp + dx*cell - plot_size//2,
    y_end = yp - dy*cell + plot_size//2;
  - border_mode in {none, uniform_avg, l2_dist_avg, l1_border_dist_avg,
    any} (:70-73) aggregates overlapping pixels: `none` = last plot in
    deterministic key order wins, `any` = first non-masked wins,
    `uniform_avg` = unweighted mean, `l2_dist_avg` = mean weighted by
    1/(1+distance from plot center), `l1_border_dist_avg` = mean
    weighted by (1 + L1 distance to the plot border);
  - post-ops (:78-85): normalize across last dim, clip, discretization
    (round(x * factor)), optional argmax channel (+ shift);
  - fully-masked rasters are dropped (:368).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, FloatType,
                               IntegerType, StringType, StructField,
                               StructType)

from geeflow_spark.operators.tiles import get_split_boundaries

BORDER_MODES = ("none", "uniform_avg", "l2_dist_avg",
                "l1_border_dist_avg", "any")

_OUT_SCHEMA = StructType([
    StructField("utm_zone", StringType()),
    StructField("xs", IntegerType()),
    StructField("ys", IntegerType()),
    StructField("geotransform", ArrayType(DoubleType())),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("raster", ArrayType(FloatType())),
    StructField("mask", ArrayType(IntegerType())),
])


def _plot_weights(h: int, w: int, mode: str) -> np.ndarray:
    if mode == "uniform_avg":
        return np.ones((h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    if mode == "l2_dist_avg":
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        return 1.0 / (1.0 + d)
    if mode == "l1_border_dist_avg":
        d = np.minimum(np.minimum(yy, h - 1 - yy),
                       np.minimum(xx, w - 1 - xx))
        return 1.0 + d
    return np.ones((h, w))


def mosaic_split(plots: pd.DataFrame, *, x_lo: float, x_hi: float,
                 y_lo: float, y_hi: float, cell_size: float,
                 plot_size_m: float, pred_h: int, pred_w: int, pred_c: int,
                 border_mode: str = "uniform_avg", normalize: bool = False,
                 clip_min: float | None = None,
                 clip_max: float | None = None,
                 discretization_factor: int | None = None,
                 add_argmax: bool = False, shift_argmax: int = 0):
    """One split's plots -> (raster (H,W,C), mask (H,W)). Pure numpy."""
    height = int(round((y_hi - y_lo) / cell_size))
    width = int(round((x_hi - x_lo) / cell_size))
    # Guard against accidental multi-GB rasters: the caller controls
    # num_splits exactly so each split raster fits in executor memory
    # (the reference's num_splits flag exists for the same reason,
    # export_rasters.py:91-94 "performance optimization and to avoid
    # OOMs").
    if height * width > 64_000_000:
        raise ValueError(
            f"split raster {height}x{width} too large; increase "
            f"num_splits or cell_size")
    acc = np.zeros((height, width, pred_c))
    wacc = np.zeros((height, width))
    filled = np.zeros((height, width), dtype=bool)
    weights = _plot_weights(pred_h, pred_w, border_mode)
    half = plot_size_m // 2

    # Duplicate plot keys averaged first (export_rasters.py:318-322);
    # deterministic order: sort by key.
    grouped = plots.groupby(["utm_x", "utm_y", "dx", "dy"], sort=True)
    for (xp, yp, dx, dy), grp in grouped:
        t = np.mean([np.asarray(v, dtype=np.float64).reshape(
            pred_h, pred_w, pred_c) for v in grp["tensor"]], axis=0)
        x_start = xp + dx * cell_size - half
        y_end = yp - dy * cell_size + half
        y_start = y_end - pred_h * cell_size
        # Raster row 0 at y_lo (y axis UP, geotransform +cell :335-342).
        col0 = int(round((x_start - x_lo) / cell_size))
        row0 = int(round((y_start - y_lo) / cell_size))
        # Plot rows: tensor row 0 is the TOP of the plot (y_end side).
        for r in range(pred_h):
            rr = row0 + (pred_h - 1 - r)
            if rr < 0 or rr >= height:
                continue
            c0, c1 = max(0, col0), min(width, col0 + pred_w)
            if c0 >= c1:
                continue
            tc0, tc1 = c0 - col0, c1 - col0
            if border_mode == "none":
                acc[rr, c0:c1] = t[r, tc0:tc1]
                wacc[rr, c0:c1] = 1.0
            elif border_mode == "any":
                new = ~filled[rr, c0:c1]
                acc[rr, c0:c1][new] = t[r, tc0:tc1][new]
                wacc[rr, c0:c1][new] = 1.0
            else:
                wrow = weights[r, tc0:tc1]
                acc[rr, c0:c1] += t[r, tc0:tc1] * wrow[:, None]
                wacc[rr, c0:c1] += wrow
            filled[rr, c0:c1] = True

    mask = wacc > 0
    out = np.zeros_like(acc)
    if border_mode in ("none", "any"):
        out[mask] = acc[mask]
    else:
        out[mask] = acc[mask] / wacc[mask][:, None]

    if normalize:
        s = out.sum(axis=-1, keepdims=True)
        np.divide(out, s, out=out, where=s != 0)
    if clip_min is not None or clip_max is not None:
        out = np.clip(out, clip_min, clip_max)
    if discretization_factor:
        out = np.round(out * discretization_factor)
    if add_argmax:
        am = out.argmax(axis=-1)[..., None].astype(np.float64) + shift_argmax
        out = np.concatenate([out, am], axis=-1)
    return out, mask


def mosaic_assigned_tiles(assigned: DataFrame, *, zone_bboxes: dict,
                          cell_size: float = 10.0,
                          plot_size_m: float = 960.0, num_splits: int = 4,
                          pred_h: int = 4, pred_w: int = 4, pred_c: int = 2,
                          border_mode: str = "uniform_avg",
                          **post_ops) -> DataFrame:
    """assigned(utm_zone, xs, ys, utm_x, utm_y, dx, dy, tensor) ->
    one raster row per (utm_zone, xs, ys); empty (fully-masked) splits
    dropped (export_rasters.py:368)."""
    if border_mode not in BORDER_MODES:
        raise ValueError(f"unknown border_mode {border_mode}")
    bounds = {z: get_split_boundaries(*bb, plot_size_m, num_splits)
              for z, bb in zone_bboxes.items()}

    def _one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        zone, xs, ys = key
        xsb, ysb = bounds[zone]
        x_lo, x_hi = xsb[xs], xsb[xs + 1]
        y_lo, y_hi = ysb[ys], ysb[ys + 1]
        out, mask = mosaic_split(
            pdf, x_lo=x_lo, x_hi=x_hi, y_lo=y_lo, y_hi=y_hi,
            cell_size=cell_size, plot_size_m=plot_size_m, pred_h=pred_h,
            pred_w=pred_w, pred_c=pred_c, border_mode=border_mode,
            **post_ops)
        if mask.sum() == 0:
            return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA])
        gt = [float(x_lo), cell_size, 0.0, float(y_lo), 0.0, cell_size]
        return pd.DataFrame([{
            "utm_zone": zone, "xs": int(xs), "ys": int(ys),
            "geotransform": gt,
            "height": out.shape[0], "width": out.shape[1],
            "channels": out.shape[2],
            "raster": out.astype(np.float32).ravel().tolist(),
            "mask": mask.astype(np.int32).ravel().tolist(),
        }])

    return (assigned.groupBy("utm_zone", "xs", "ys")
            .applyInPandas(_one, _OUT_SCHEMA))


# ---------------------------------------------------------------------------
# einops.rearrange analog (export_rasters.py:236-237: predictions of
# shape (n, ..., y, x, c) pass through `einops.rearrange(pred, spec)`
# before split assignment). Pure-numpy subset parser: named axes,
# transposition, and parenthesized merge/split groups - the operations
# a layout spec string uses. No einops dependency in this container.
# ---------------------------------------------------------------------------

def _parse_axes(side: str) -> list[list[str]]:
    """'a (b c) d' -> [['a'], ['b', 'c'], ['d']]."""
    groups, i, toks = [], 0, side.split()
    while i < len(toks):
        t = toks[i]
        if t.startswith("("):
            grp = []
            t = t[1:]
            while True:
                done = t.endswith(")")
                t = t[:-1] if done else t
                if t:
                    grp.append(t)
                if done:
                    break
                i += 1
                t = toks[i]
            groups.append(grp)
        else:
            groups.append([t])
        i += 1
    return groups


def einops_rearrange(arr: np.ndarray, spec: str, **sizes) -> np.ndarray:
    """numpy equivalent of einops.rearrange for reshape/transpose specs.

    Supports named axes, '(a b)' merge/split groups on either side; every
    axis name must appear exactly once per side; split-group sizes come
    from `sizes` (all but one axis per input group may be inferred).
    """
    lhs, rhs = (s.strip() for s in spec.split("->"))
    lg, rg = _parse_axes(lhs), _parse_axes(rhs)
    lflat = [a for g in lg for a in g]
    rflat = [a for g in rg for a in g]
    if sorted(lflat) != sorted(rflat):
        raise ValueError(f"axes mismatch in `{spec}`")
    if len(lg) != arr.ndim:
        raise ValueError(f"`{spec}` lhs has {len(lg)} dims, "
                         f"input has {arr.ndim}")
    # resolve elementary axis sizes from input shape + sizes kwargs
    dim = dict(sizes)
    for g, n in zip(lg, arr.shape):
        known = [a for a in g if a in dim]
        unknown = [a for a in g if a not in dim]
        prod = int(np.prod([dim[a] for a in known])) if known else 1
        if len(unknown) > 1:
            raise ValueError(f"cannot infer sizes of {unknown} in `{spec}`")
        if unknown:
            if n % prod:
                raise ValueError(f"dim {n} not divisible by {prod}")
            dim[unknown[0]] = n // prod
        elif prod != n:
            raise ValueError(f"group {g} sizes {prod} != input dim {n}")
    expanded = arr.reshape([dim[a] for a in lflat])
    perm = [lflat.index(a) for a in rflat]
    out = expanded.transpose(perm)
    return out.reshape([int(np.prod([dim[a] for a in g])) for g in rg])


def rearrange_predictions(df: DataFrame, spec: str,
                          shape: tuple[int, ...],
                          tensor_col: str = "tensor",
                          **sizes) -> tuple[DataFrame, tuple[int, ...]]:
    """Applies a rearrange spec to every row's flat tensor (known common
    `shape`), Arrow-batched; returns (df, new_shape). The per-row batch
    axis is implicit - the spec addresses the ROW shape, exactly like
    the reference's FLAGS.rearrange addresses (..., y, x, c) with n
    riding along (export_rasters.py:236-237)."""
    probe = einops_rearrange(np.zeros(shape, dtype=np.float32), spec,
                             **sizes)
    new_shape = probe.shape
    n_spec = "n " + spec.replace("->", "-> n ", 1)

    def _apply(it):
        for pdf in it:
            if len(pdf):
                arr = np.stack([np.asarray(v, dtype=np.float32)
                                for v in pdf[tensor_col]])
                arr = arr.reshape((len(pdf),) + tuple(shape))
                got = einops_rearrange(arr, n_spec, **sizes)
                pdf[tensor_col] = [r.ravel().tolist()
                                   for r in got.reshape(len(pdf), -1)]
            yield pdf

    return df.mapInPandas(_apply, df.schema), new_shape


# ---------------------------------------------------------------------------
# columns_to_export DSL (export_rasters.py:153-189 `_extract_data`)
# ---------------------------------------------------------------------------

def parse_column_spec(column: str) -> dict:
    """Parses one columns_to_export entry.

    Modifier grammar, applied in the reference's exact order
    (export_rasters.py:156-169):
      "name@T"          -> temperature scaling with T
      "name/D"          -> divide by D
      "name_i"          -> time index i (select timestep)
      "name:c1:c2:..."  -> channel selection
    Modifiers compose, e.g. "probs:0:2/255@1.5_3".
    """
    temperature, divide_by, time_index, channels = 1.0, 1.0, None, None
    if "@" in column:
        column, t = column.split("@")
        temperature = float(t)
    if "/" in column:
        column, d = column.split("/")
        divide_by = float(d)
    if "_" in column:
        column, ti = column.split("_")
        time_index = int(ti)
    if ":" in column:
        column, *ch = column.split(":")
        channels = [int(x) for x in ch]
    return {"name": column, "temperature": temperature,
            "divide_by": divide_by, "time_index": time_index,
            "channels": channels}


def extract_column(arrays: dict, column: str) -> np.ndarray:
    """npz-analog extraction with the DSL applied (export_rasters.py
    `_extract_data`): channel slice -> time slice -> float32 -> divide
    -> temperature scaling -> dim normalization to (B, H, W, C)."""
    from geeflow_spark.functions import masks

    spec = parse_column_spec(column)
    preds = np.array(arrays[spec["name"]])
    if spec["channels"]:
        preds = preds[..., spec["channels"]]
    if spec["time_index"] is not None:
        preds = preds[:, spec["time_index"]]
    if preds.dtype.kind == "f":
        preds = preds.astype(np.float32)
    if spec["divide_by"] != 1:
        preds = preds / spec["divide_by"]
    if spec["temperature"] != 1:
        preds = masks.temp_scaling(preds, spec["temperature"])
    if len(preds.shape) == 3:  # (B, H, W) -> add C
        preds = np.expand_dims(preds, axis=-1)
    if len(preds.shape) == 2:  # (B, C) -> add (H, W)
        preds = np.expand_dims(preds, axis=(1, 2))
    return preds


def select_export_column(df: DataFrame, column: str,
                         tensor_cols: dict | None = None) -> DataFrame:
    """columns_to_export entry -> mosaic-ready (tensor, h, w, c) columns.

    The Spark form of the reference's per-column export loop
    (export_rasters.py:408-419 iterates columns_to_export and runs the
    whole mosaic per column): the named prediction head is selected and
    the DSL modifiers (channel slice / time index / divide /
    temperature) are applied, emitting the canonical `tensor` column
    `mosaic_assigned_tiles` consumes.

    `tensor_cols` maps head name -> (array_col, t_col|None); default:
    the head name IS the array column, no time axis. Rows are processed
    as one stacked numpy batch when shapes agree (the export contract -
    pred_h/w/c are constants per table), falling back to per-row numpy
    otherwise.
    """
    spec = parse_column_spec(column)
    arr_col, t_col = (tensor_cols or {}).get(spec["name"],
                                             (spec["name"], None))

    def _apply(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            hs = pdf["h"].to_numpy()
            ws = pdf["w"].to_numpy()
            cs = pdf["c"].to_numpy()
            uniform = len(set(hs)) == 1 and len(set(ws)) == 1 \
                and len(set(cs)) == 1
            out_rows = []
            if uniform:
                h, w, c = int(hs[0]), int(ws[0]), int(cs[0])
                mat = np.stack([np.asarray(x, dtype=np.float32)
                                for x in pdf[arr_col]])
                if t_col:
                    t = int(pdf[t_col].iloc[0])
                    mat = mat.reshape(len(pdf), t, h, w, c)
                else:
                    mat = mat.reshape(len(pdf), h, w, c)
                got = extract_column({spec["name"]: mat}, column)
                out = pdf.copy()
                out["tensor"] = [r.ravel().tolist() for r in got]
                out["c"] = got.shape[-1]
                out_rows.append(out)
            else:
                for i in range(len(pdf)):
                    h, w, c = int(hs[i]), int(ws[i]), int(cs[i])
                    mat = np.asarray(pdf[arr_col].iloc[i],
                                     dtype=np.float32)
                    mat = mat.reshape(1, h, w, c)
                    got = extract_column({spec["name"]: mat}, column)
                    row = pdf.iloc[[i]].copy()
                    row["tensor"] = [got[0].ravel().tolist()]
                    row["c"] = got.shape[-1]
                    out_rows.append(row)
            yield pd.concat(out_rows, ignore_index=True)

    fields = [f for f in df.schema.fields if f.name != "tensor"]
    names = {f.name for f in fields}
    out_fields = list(fields)
    if "tensor" not in names:
        out_fields.append(StructField("tensor", ArrayType(FloatType())))
    else:
        out_fields = [f if f.name != "tensor"
                      else StructField("tensor", ArrayType(FloatType()))
                      for f in df.schema.fields]
    return df.mapInPandas(_apply, StructType(out_fields))
