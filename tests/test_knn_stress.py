"""kNN ring-schedule stress: sparse data where k is unsatisfiable until
large rings (the r2 verdict's explosion scenario). Pins (a) exactness vs
brute force, (b) the cost gate: ring fan-out never exceeds the
data-side row count before falling back, (c) bounded wall-clock."""

import time

import numpy as np
import pandas as pd
import pytest

from geeflow_spark.operators import knn


@pytest.mark.parametrize("index", ["s2", "hex"])
def test_knn_sparse_data_exact_and_bounded(spark, index):
    rng = np.random.default_rng(5)
    # 40 data points scattered over the whole globe (level-7 cells are
    # ~100s of km; k=8 needs rings far beyond neighbors) + 12 queries.
    data = pd.DataFrame({
        "data_id": np.arange(40),
        "lat": rng.uniform(-70, 70, 40),
        "lon": rng.uniform(-179, 179, 40)})
    queries = pd.DataFrame({
        "query_id": np.arange(12),
        "lat": rng.uniform(-70, 70, 12),
        "lon": rng.uniform(-179, 179, 12)})
    qdf = spark.createDataFrame(queries)
    ddf = spark.createDataFrame(data)

    t0 = time.monotonic()
    # brute_force_threshold=0 forces the ring path (the stress target);
    # with 40 data rows the cost gate trips at (2r+1)^2 > 40 (r=4 for
    # s2), so the schedule runs at most 2 ring rounds then brute-forces
    # the stragglers - never the (2*64+1)^2 = 16k-cell explosion.
    got = knn.knn(qdf, ddf, k=8, level=7, index=index,
                  brute_force_threshold=0).toPandas()
    wall = time.monotonic() - t0

    exp = knn.knn_brute_force(qdf, ddf, k=8).toPandas()
    key = ["query_id", "rank"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert list(g["data_id"]) == list(e["data_id"])
    np.testing.assert_allclose(g["dist_m"], e["dist_m"], rtol=1e-9)
    # generous wall bound: the point is it does NOT iterate to max_ring
    # with 16k-cell explodes (which takes minutes); two rounds + a tiny
    # brute-force pass finish in seconds.
    assert wall < 120, f"ring schedule took {wall:.0f}s on sparse data"


def test_knn_empty_query_side(spark):
    # Empty query side + forced ring path: the loop and the brute-force
    # fallback are both skipped; must return an empty frame with the
    # contract schema, not crash (ADVICE r3: results=None tail).
    data = pd.DataFrame({
        "data_id": np.arange(10),
        "lat": np.linspace(-40, 40, 10),
        "lon": np.linspace(-90, 90, 10)})
    qdf = spark.createDataFrame([], "query_id long, lat double, lon double")
    got = knn.knn(qdf, spark.createDataFrame(data), k=3, level=7,
                  brute_force_threshold=0)
    assert got.columns == ["query_id", "data_id", "dist_m", "rank"]
    assert got.count() == 0


def test_knn_ring_gate_math():
    # the gate must trip before the fan-out exceeds the data rows
    for n_data in (10, 100, 10_000):
        r = 2
        while r <= 64:
            if (2 * r + 1) ** 2 > n_data:
                break
            r *= 2
        assert (2 * r + 1) ** 2 > n_data or r > 64
