"""Tests: example assembly rules, labels pipeline, raster-export mosaic."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geeflow_spark.operators import raster_export, tiles
from geeflow_spark.plans import assemble, labels
from geeflow_spark.sources import synth


# --- assemble (ee_export_utils.py exact rules) -----------------------------

def test_stack_channels_and_timesteps():
    px = {"s2#0/B1": np.ones((2, 2)), "s2#0/B2": np.zeros((2, 2)),
          "s2#1/B1": np.full((2, 2), 2.0), "s2#1/B2": np.full((2, 2), 3.0),
          "dem/alt": np.full((2, 2), 7.0)}
    stacked = assemble.stack_channels(px)
    assert stacked["s2#0"].shape == (2, 2, 2)
    out = assemble.stack_timesteps(stacked)
    assert out["s2"].shape == (2, 2, 2, 2)  # (T, H, W, C)
    assert out["dem"].shape == (2, 2, 1)
    # timestep order by numeric index, not arrival order
    assert out["s2"][0, 0, 0, 0] == 1.0 and out["s2"][1, 0, 0, 0] == 2.0


def test_stack_timesteps_numeric_sort():
    px = {f"s#{i}": np.full((1, 1, 1), float(i)) for i in [10, 2, 0, 11]}
    out = assemble.stack_timesteps(px)
    assert out["s"][:, 0, 0, 0].tolist() == [0.0, 2.0, 10.0, 11.0]


def test_pad_missing_source():
    px = assemble.pad_missing_source({}, ["s1"], {"s1"})
    assert px["s1"].size == 0 and px["s1_mask"].size == 0
    assert px["s1_timestamps"].size == 0


def test_center_crop():
    # s+1 -> s around center, exact index math (:367-371)
    d = np.arange(5 * 5).reshape(1, 5, 5, 1)
    out = assemble.center_crop(d, 4)
    assert out.shape == (1, 4, 4, 1)
    assert out[0, 0, 0, 0] == d[0, 5 // 2 - 2, 5 // 2 - 2, 0]
    assert assemble.center_crop(np.zeros((2, 4, 4, 1)), 4).shape == \
        (2, 4, 4, 1)
    with pytest.raises(AssertionError):
        assemble.center_crop(np.zeros((1, 7, 7, 1)), 4)


def test_grid_cells_for_width():
    assert assemble.grid_cells_for_width(960, 10) == 96
    assert assemble.grid_cells_for_width(960, 10.0) == 96
    with pytest.raises(AssertionError):
        assemble.grid_cells_for_width(955, 10)  # not divisible (utm)
    assert assemble.grid_cells_for_width(955, 10, use_utm=False) == 96


def test_coerce_dtype_rules():
    # masks -> uint8 (:382-383)
    assert assemble.coerce_dtype("x_mask", [1, 0]).dtype == np.uint8
    assert assemble.coerce_dtype("hr", [1, 0]).dtype == np.uint8
    # timestamps -> int64 (:384-385)
    assert assemble.coerce_dtype("s_timestamps", [1000]).dtype == np.int64
    # ints and float64 -> float32 (:388-399)
    assert assemble.coerce_dtype("a", [1, 2]).dtype == np.float32
    assert assemble.coerce_dtype("a", np.array([1.0, 2.0])).dtype == \
        np.float32
    # float32 input stays float32
    assert assemble.coerce_dtype(
        "a", np.array([1.0], dtype=np.float32)).dtype == np.float32
    # exception list
    assert assemble.coerce_dtype("a", [1, 2],
                                 ignore_for_float_conversion=("a",)
                                 ).dtype == np.int64
    # explicit source dtype
    assert assemble.coerce_dtype("a", [1], source_dtype=np.int16).dtype \
        == np.int16
    # empty arrays convert (:389 "even if array is empty")
    assert assemble.coerce_dtype("a", []).dtype == np.float32
    # scalars kept as python scalars (:400-404)
    assert assemble.coerce_dtype("a", 5) == 5


def test_filter_example():
    f = {"hansen": np.zeros((2, 2, 2)), "seq": np.array([])}
    assert not assemble.filter_example(f, filter_empty_forest_loss=True)
    f["hansen"][0, 0, 1] = 1
    assert assemble.filter_example(f, filter_empty_forest_loss=True)
    assert not assemble.filter_example(f, filter_empty_sequences="seq")
    f["seq"] = np.array([1])
    assert assemble.filter_example(f, filter_empty_sequences=["seq"])


def test_tfds_key():
    assert assemble.tfds_key({"id": 3, "split": "t"}) == "3"
    assert assemble.tfds_key({"a": 1, "b": "x"}, ("a", "b")) == "1-x"


# --- labels pipeline --------------------------------------------------------

def test_pipeline_labels(spark, tmp_path):
    pdf = pd.DataFrame({"index": [0, 1, 2], "lat": [47.1, 47.2, 51.0],
                        "lon": [8.5, 8.6, -0.1],
                        "label_name": ["apple", "prune", "apple"],
                        "label": [1, 0, 1], "split": ["train", "val",
                                                      "test"]})
    csv = str(tmp_path / "labels.csv")
    pdf.to_csv(csv, index=False)
    df = labels.read_labels(spark, csv)
    out = labels.pipeline_labels(df, ["lat", "lon", "label"]).toPandas()
    assert list(out.columns) == ["lat", "lon", "label", "id"]
    assert sorted(out["id"]) == [0, 1, 2]
    with pytest.raises(ValueError):
        labels.pipeline_labels(df, ["nope"])
    assert labels.pipeline_labels(df, num_max_samples=2).count() == 2


def test_item_to_roi_variants():
    # utm_x/utm_y variant (pipelines.py:147-151)
    roi = labels.item_to_roi(
        {"utm_x": 500480.0, "utm_y": 1000480.0, "utm_zone": "32T"},
        img_width_m=960, max_cell_size_m=10)
    assert roi.utm_x_min == 500000.0 and roi.width == 96
    # min/max variant with the equality assert (:140-146)
    roi2 = labels.item_to_roi(
        {"utm_x_min": 500000.0, "utm_x_max": 500960.0,
         "utm_y_min": 1000000.0, "utm_y_max": 1000960.0,
         "utm_zone": "32T"}, img_width_m=960, max_cell_size_m=10)
    assert roi2.utm_x_min == 500000.0
    with pytest.raises(AssertionError):
        labels.item_to_roi(
            {"utm_x_min": 0.0, "utm_x_max": 500.0, "utm_y_min": 0.0,
             "utm_y_max": 960.0, "utm_zone": "32T"},
            img_width_m=960, max_cell_size_m=10)
    # lat/lon fallback
    roi3 = labels.item_to_roi({"lat": 1.17, "lon": -77.4916575059},
                              img_width_m=10000, max_cell_size_m=10)
    assert roi3.utm_zone == "18N"
    # non-utm: lat/lon rectangle (coords.py:34-39 semantics)
    w, s, e, n = labels.item_to_roi({"lat": 10.0, "lon": 20.0},
                                    img_width_m=111111.111,
                                    max_cell_size_m=10, use_utm=False)
    assert pytest.approx(n - s, rel=1e-6) == 1.0


def test_with_roi_columns_matches_scalar(spark):
    lab = synth.labels(spark, 50)
    out = labels.with_roi_columns(lab, img_width_m=960,
                                  max_cell_size_m=10).toPandas()
    for _, r in out.head(5).iterrows():
        roi = labels.item_to_roi({"lat": r["lat"], "lon": r["lon"]},
                                 img_width_m=960, max_cell_size_m=10)
        assert roi.utm_zone == r["utm_zone"]
        assert roi.utm_x_min == r["roi_x_min"]
        assert roi.utm_y_min == r["roi_y_min"]


# --- raster export mosaic ----------------------------------------------------

def _assigned(spark, n=120):
    # Small zone (19.2 km x 19.2 km -> 480x480 px per split at 4 splits)
    # so per-split rasters stay tiny in tests.
    zb = {"32T": (200000., 1000000., 219200., 1019200.)}
    rng = np.random.default_rng(11)
    rows = []
    for i in range(n):
        rows.append({
            "id": i,
            "utm_x": float(200000 + rng.integers(0, 2000) * 9.6),
            "utm_y": float(1000000 + rng.integers(0, 2000) * 9.6),
            "dx": int(rng.integers(-1, 2)), "dy": int(rng.integers(-1, 2)),
            "utm_zone": "32T",
            "tensor": rng.uniform(0, 1, 32).astype(np.float32).tolist(),
        })
    plots = spark.createDataFrame(pd.DataFrame(rows))
    return tiles.assign_tiles(plots, zone_bboxes=zb, num_splits=4), zb


def test_mosaic_rasters(spark):
    assigned, zb = _assigned(spark)
    out = raster_export.mosaic_assigned_tiles(
        assigned, zone_bboxes=zb, num_splits=4, pred_c=2,
        border_mode="uniform_avg").toPandas()
    assert len(out) > 0
    r0 = out.iloc[0]
    assert len(r0["raster"]) == r0["height"] * r0["width"] * r0["channels"]
    assert len(r0["mask"]) == r0["height"] * r0["width"]
    # geotransform y-up per export_rasters.py:335-342
    assert r0["geotransform"][5] == 10.0
    # every assigned plot's pixels landed somewhere: total mask > 0
    assert sum(sum(m) for m in out["mask"]) > 0


def test_mosaic_border_modes_agree_on_disjoint(spark):
    """With no overlaps, all border modes give identical rasters."""
    pdf = pd.DataFrame([
        {"utm_zone": "32T", "xs": 0, "ys": 0, "utm_x": 201000.0,
         "utm_y": 1001000.0, "dx": 0, "dy": 0,
         "tensor": list(np.arange(32, dtype=np.float32))},
        {"utm_zone": "32T", "xs": 0, "ys": 0, "utm_x": 203000.0,
         "utm_y": 1001000.0, "dx": 0, "dy": 0,
         "tensor": list(np.arange(32, 64).astype(np.float32))},
    ])
    zb = {"32T": (200000., 1000000., 219200., 1019200.)}
    df = None
    results = {}
    for mode in raster_export.BORDER_MODES:
        out = raster_export.mosaic_assigned_tiles(
            spark.createDataFrame(pdf), zone_bboxes=zb, num_splits=4,
            pred_c=2, border_mode=mode).toPandas()
        results[mode] = np.array(out.iloc[0]["raster"])
    base = results["none"]
    for mode, r in results.items():
        np.testing.assert_allclose(r, base, err_msg=mode)


def test_mosaic_overlap_average():
    """Two identical-footprint plots with values 0 and 2 -> uniform_avg 1."""
    pdf = pd.DataFrame([
        {"utm_x": 300000.0, "utm_y": 1100000.0, "dx": 0, "dy": 0,
         "tensor": [0.0] * 32},
        {"utm_x": 300000.0, "utm_y": 1100000.0, "dx": 1, "dy": 0,
         "tensor": [2.0] * 32},
    ])
    out, mask = raster_export.mosaic_split(
        pdf, x_lo=290000, x_hi=310000, y_lo=1090000, y_hi=1110000,
        cell_size=10.0, plot_size_m=960.0, pred_h=4, pred_w=4, pred_c=2,
        border_mode="uniform_avg")
    vals = out[mask]
    # overlap columns average to 1.0; non-overlap keep 0 or 2
    assert set(np.unique(vals)) <= {0.0, 1.0, 2.0}
    assert (vals == 1.0).any()


def test_mosaic_post_ops():
    pdf = pd.DataFrame([
        {"utm_x": 300000.0, "utm_y": 1100000.0, "dx": 0, "dy": 0,
         "tensor": ([1.0, 3.0] * 16)},
    ])
    out, mask = raster_export.mosaic_split(
        pdf, x_lo=290000, x_hi=310000, y_lo=1090000, y_hi=1110000,
        cell_size=10.0, plot_size_m=960.0, pred_h=4, pred_w=4, pred_c=2,
        border_mode="none", normalize=True, add_argmax=True,
        shift_argmax=1)
    assert out.shape[-1] == 3  # 2 channels + argmax
    v = out[mask]
    np.testing.assert_allclose(v[:, 0] + v[:, 1], 1.0)  # normalized
    assert set(np.unique(v[:, 2])) == {2.0}  # argmax 1 + shift 1
