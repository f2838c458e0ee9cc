"""Spark-level tests: spatial join vs numpy oracle, tile assignment
row-for-row vs the verbatim reference-loop oracle, kNN vs brute force,
splits, span-sequence preservation through every shuffle-bearing op."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geeflow_spark.functions import geometry
from geeflow_spark.operators import knn, spatial_join, splits, tiles
from geeflow_spark.plans import generate
from geeflow_spark.sources import synth

N_DOCS = 1500


def _docs(spark):
    return synth.docs(spark, N_DOCS).cache()


def test_join_points_regions_matches_numpy_oracle(spark):
    docs = _docs(spark)
    regs = synth.regions_pdf(25)
    got = spatial_join.join_points_regions(docs, regs, level=7) \
        .select("doc_id", "region_id").toPandas()
    got_set = set(map(tuple, got.itertuples(index=False)))

    pdf = docs.select("doc_id", "lat", "lon").toPandas()
    mat = geometry.points_in_polygon_batch(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
        [np.asarray(r, dtype=np.float64) for r in regs["ring"]])
    exp = {(pdf["doc_id"].iloc[i], int(regs["region_id"].iloc[k]))
           for i, k in zip(*np.nonzero(mat))}
    assert got_set == exp
    assert len(got_set) > 0


def test_smj_path_matches_broadcast_path(spark):
    docs = _docs(spark)
    regs = synth.regions_pdf(25)
    bc = spatial_join.join_points_regions(docs, regs, level=7) \
        .select("doc_id", "region_id").toPandas()
    regs_df = spark.createDataFrame(regs)
    smj = spatial_join.join_points_regions_smj(docs, regs_df, level=7) \
        .select("doc_id", "region_id").toPandas()
    assert set(map(tuple, bc.itertuples(index=False))) == \
        set(map(tuple, smj.itertuples(index=False)))


def test_first_match_deterministic_min_region(spark):
    docs = _docs(spark)
    regs = synth.regions_pdf(25)
    j = spatial_join.join_points_regions(
        docs, regs, level=7, region_cols=("region_id", "gridcode"))
    fm = spatial_join.first_match(j, ["doc_id"],
                                  payload_cols=["gridcode"]).toPandas()
    full = j.select("doc_id", "region_id").toPandas()
    exp = full.groupby("doc_id")["region_id"].min()
    got = fm.set_index("doc_id")["region_id"]
    assert got.sort_index().equals(exp.sort_index())


def test_tile_assignment_row_for_row(spark):
    cm = synth.cells_metadata(spark, 300)
    pr = synth.predictions(spark, 300)
    plots = pr.join(cm, "id").select("id", "utm_x", "utm_y", "dx", "dy",
                                     "utm_zone")
    zb = {"32T": (200000., 1000000., 1160000., 1960000.),
          "18N": (200000., 1000000., 1160000., 1960000.)}
    got = tiles.assign_tiles(plots, zone_bboxes=zb, num_splits=4) \
        .select("utm_zone", "xs", "ys", "id").toPandas()
    exp = tiles.tile_assign_pandas_oracle(plots.toPandas(), zb, num_splits=4)
    assert set(map(tuple, got.itertuples(index=False))) == \
        set(map(tuple, exp.itertuples(index=False)))
    # every plot assigned at least once (reference assert :287)
    assert got["id"].nunique() == 300


def test_tile_boundary_multi_assignment(spark):
    # A plot exactly on a split boundary must land in multiple splits.
    zb = {"32T": (200000., 1000000., 1160000., 1960000.)}
    xsb, ysb = tiles.get_split_boundaries(*zb["32T"], 960.0, 4)
    # Plot pixel extent is pred_w*cell = 40 m at x_start = utm_x - 480;
    # place it straddling the interior boundaries.
    bx, by = xsb[2], ysb[2]
    pdf = pd.DataFrame([{"id": 0, "utm_x": bx + 460.0, "utm_y": by - 460.0,
                         "dx": 0, "dy": 0, "utm_zone": "32T"}])
    plots = spark.createDataFrame(pdf)
    got = tiles.assign_tiles(plots, zone_bboxes=zb, num_splits=4) \
        .select("xs", "ys").toPandas()
    exp = tiles.tile_assign_pandas_oracle(pdf, zb, num_splits=4)
    assert len(got) == len(exp) >= 2
    assert set(map(tuple, got.itertuples(index=False))) == \
        set((r.xs, r.ys) for r in exp.itertuples())


def test_knn_matches_brute_force(spark):
    docs = _docs(spark)
    q = docs.limit(15).select(F.col("doc_id").alias("query_id"),
                              "lat", "lon")
    d = docs.select(F.col("doc_id").alias("data_id"), "lat", "lon")
    got = knn.knn(q, d, k=4, level=6).select(
        "query_id", "data_id", "rank").toPandas()
    exp = knn.knn_brute_force(q, d, k=4).select(
        "query_id", "data_id", "rank").toPandas()
    assert set(map(tuple, got.itertuples(index=False))) == \
        set(map(tuple, exp.itertuples(index=False)))


def test_split_semantics(spark):
    import hashlib
    from geeflow_spark.functions import s2 as s2f
    docs = _docs(spark).limit(200)
    out = splits.with_split(docs, level=9).select("doc_id", "lat", "lon",
                                                  "split").toPandas()
    cells = s2f.latlon_to_cell_id(out["lat"].to_numpy(),
                                  out["lon"].to_numpy(), 9)
    for i, c in enumerate(cells):
        h = int(hashlib.md5(str(int(np.uint64(c))).encode()).hexdigest(),
                16) % 10
        expect = "test" if h == 9 else ("val" if h == 8 else "train")
        assert out["split"].iloc[i] == expect
    # val/validation alias filter
    df = spark.createDataFrame(
        pd.DataFrame({"split": ["val", "validation", "train", "test"]}))
    assert splits.filter_split(df, "val").count() == 2
    assert splits.filter_split(df, "validation").count() == 2
    assert splits.filter_split(df, "train").count() == 1


def test_span_sequence_preserved_through_shuffles(spark):
    """BASELINE.json per-row invariant: span-sequence equality
    (kind, text, media_ref, order) after shuffle-bearing operators."""
    docs = _docs(spark)
    base = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in docs.select("doc_id", "spans").collect()}

    regs = synth.regions_pdf(25)
    # 1. through the broadcast PIP join + repartition (forced shuffle)
    j = spatial_join.join_points_regions(docs, regs, level=7) \
        .repartition(16, "region_id")
    for r in j.select("doc_id", "spans").collect():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]]
        assert got == base[r["doc_id"]]

    # 2. through groupBy first-match carrying spans as payload
    fm = j.groupBy("doc_id").agg(
        F.min(F.struct("region_id", "spans")).alias("x"))
    for r in fm.select("doc_id", F.col("x.spans").alias("spans")).collect():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]]
        assert got == base[r["doc_id"]]

    # 3. through applyInPandas (Arrow round-trip of nested structs)
    sub = docs.select("doc_id", "spans", "lat")

    def _identity(pdf):
        return pdf

    out = sub.groupBy("doc_id").applyInPandas(_identity, sub.schema)
    for r in out.select("doc_id", "spans").collect():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]]
        assert got == base[r["doc_id"]]


def test_flagship_generate(spark):
    docs = _docs(spark)
    regs = synth.regions_pdf(25)
    ex = generate.generate_examples(docs, regs, cell_level=7)
    pdf = ex.toPandas()
    assert len(pdf) > 0
    assert set(["doc_id", "spans", "region_id", "utm_zone", "tile_x",
                "tile_y", "split"]).issubset(pdf.columns)
    # tiles snapped to the grid
    assert np.allclose(pdf["tile_x"] % 10.0, 0)
    assert set(pdf["split"]).issubset({"train", "val", "test"})


def test_md5_mod10_col_equals_hashlib(spark):
    """JVM CRT md5 bucket == literal hashlib formula on random cells,
    including sign-wrapped (uint64 > 2^63) ids."""
    import hashlib as _h
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 2**63 - 1, 300, dtype=np.int64)
    ids = np.concatenate([ids, np.array([-1, -2**63, -12345],
                                        dtype=np.int64)])
    pdf = pd.DataFrame({"cell": ids})
    df = spark.createDataFrame(pdf)
    got = df.select("cell", splits.md5_mod10_col(F.col("cell"))
                    .alias("b")).toPandas()
    for _, r in got.iterrows():
        u = int(np.uint64(np.int64(r["cell"])))
        exp = int(_h.md5(str(u).encode()).hexdigest(), 16) % 10
        assert int(r["b"]) == exp


import pytest as _pytest


@_pytest.mark.parametrize("index", ["s2", "hex"])
def test_join_points_regions_both_indexes(spark, index):
    # Same exact PIP output regardless of the index twin used for the
    # candidate cover (the refine stage makes the join index-agnostic).
    import pandas as pd
    from geeflow_spark.operators import spatial_join
    docs = synth.docs(spark, 2000).select("doc_id", "lat", "lon")
    regions = synth.regions_pdf(12, radius_scale=2.0)
    out = spatial_join.join_points_regions(docs, regions, level=6,
                                           index=index)
    got = set(map(tuple, out.select("doc_id", "region_id").toPandas()
                  .itertuples(index=False)))
    ref = spatial_join.join_points_regions(docs, regions, level=6,
                                           index="s2" if index == "hex"
                                           else "hex")
    ref_set = set(map(tuple, ref.select("doc_id", "region_id").toPandas()
                      .itertuples(index=False)))
    assert got == ref_set and len(got) > 0


@_pytest.mark.parametrize("index", ["s2", "hex"])
def test_knn_both_indexes_vs_brute_force(spark, index):
    from geeflow_spark.operators import knn as knn_mod
    docs = synth.docs(spark, 1500).select(
        F.col("doc_id").alias("data_id"), "lat", "lon")
    q = synth.docs(spark, 1500).filter(F.col("doc_id") < "doc0000000015") \
        .select(F.col("doc_id").alias("query_id"), "lat", "lon")
    got = knn_mod.knn(q, docs, k=4, level=4, index=index,
                      brute_force_threshold=0) \
        .select("query_id", "data_id", "rank").toPandas()
    exp = knn_mod.knn_brute_force(q, docs, k=4) \
        .select("query_id", "data_id", "rank").toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))  # noqa
    assert key(got) == key(exp)


def test_knn_cost_based_fast_path_identical(spark):
    from geeflow_spark.operators import knn as knn_mod
    docs = synth.docs(spark, 800).select(
        F.col("doc_id").alias("data_id"), "lat", "lon")
    q = synth.docs(spark, 800).filter(F.col("doc_id") < "doc0000000010") \
        .select(F.col("doc_id").alias("query_id"), "lat", "lon")
    ring = knn_mod.knn(q, docs, k=3, level=4, brute_force_threshold=0) \
        .select("query_id", "data_id", "rank").toPandas()
    fast = knn_mod.knn(q, docs, k=3, level=4) \
        .select("query_id", "data_id", "rank").toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))  # noqa
    assert key(ring) == key(fast)
