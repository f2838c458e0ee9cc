"""The SQL-recomputability contracts behind the driver oracles.

Each engine kernel that a battery query relies on has a pure-SQL twin
(DuckDB) that must match bit-for-bit: the S2 cell encode
(s2.cell_sql_query), the UTM tile origin (utm.tile_origin_sql_query),
and the md5-family token hash used by the SQL-verifiable simhash.
These tests sweep adversarial inputs well beyond the gate data.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geeflow_spark.functions import s2, utm
from geeflow_spark.operators import dedup


@pytest.mark.parametrize("level", [3, 5, 8, 12])
def test_s2_cell_sql_matches_numpy(level):
    rng = np.random.default_rng(level)
    lat = rng.uniform(-89.99, 89.99, 50_000)
    lon = rng.uniform(-180.0, 180.0, 50_000)
    # adversarial extras: near faces' diagonals / equator / meridians
    extra_lat = np.array([0.0, 45.0, -45.0, 89.9, -89.9, 35.26438968])
    extra_lon = np.array([0.0, 45.0, 135.0, -135.0, 90.0, 180.0 - 1e-9])
    lat = np.concatenate([lat, extra_lat])
    lon = np.concatenate([lon, extra_lon])
    pdf = pd.DataFrame({"doc_id": np.arange(len(lat)),
                        "lat": lat, "lon": lon})
    con = duckdb.connect()
    con.register("pts", pdf)
    q = s2.cell_sql_query("pts", "lat", "lon", level)
    got = con.execute(q + " ORDER BY doc_id").df()["cell"] \
        .to_numpy(np.int64)
    exp = s2.latlon_to_cell_id(lat, lon, level).astype(np.int64)
    assert (got == exp).all()


def test_utm_tile_sql_matches_numpy():
    rng = np.random.default_rng(9)
    lat = rng.uniform(-79.9, 83.9, 100_000)
    lon = rng.uniform(-180.0, 180.0, 100_000)
    # Norway + Svalbard exception bands, zone edges
    lat = np.concatenate([lat, [56.0, 63.9, 72.0, 84.0, 80.0, -79.99]])
    lon = np.concatenate([lon, [3.0, 11.9, 9.0, 33.0, 41.9, 0.0]])
    pdf = pd.DataFrame({"doc_id": np.arange(len(lat)),
                        "lat": lat, "lon": lon})
    con = duckdb.connect()
    con.register("pts", pdf)
    q = utm.tile_origin_sql_query("pts", "lat", "lon", 10.0, 96)
    got = con.execute(q + " ORDER BY doc_id").df()
    e, n, zn, zl = utm.from_latlon(lat, lon)
    x0 = np.round((e - 480.0) / 10.0) * 10.0
    y0 = np.round((n - 480.0) / 10.0) * 10.0
    zone = (pd.Series(zn).astype(str) + pd.Series(zl).astype(str)) \
        .to_numpy()
    assert (got["utm_zone"].to_numpy() == zone).all()
    assert (got["tile_x"].to_numpy() == x0).all()
    assert (got["tile_y"].to_numpy() == y0).all()


def test_md5_token_hashes_match_hashlib(spark):
    import hashlib
    texts = ["hello world", "  padded   tokens  ", "", "ß ünïcode ☃",
             "single"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = df.select(dedup.md5_token_hashes_col(F.col("text"))
                    .alias("h")).toPandas()["h"].tolist()
    for t, hs in zip(texts, got):
        toks = t.split()
        exp = []
        for tok in toks:
            u = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
            exp.append(u - (1 << 64) if u >= (1 << 63) else u)
        assert list(hs) == exp


def test_simhash_md5_family_matches_recompute(spark):
    import hashlib
    base = "alpha beta gamma delta epsilon zeta eta theta " * 3
    texts = [base, base.replace("zeta", "zz"), "one", ""]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = df.select(dedup.simhash_udf(2, hash_family="md5")(F.col("text"))
                    .alias("h")).toPandas()["h"].tolist()
    POLY = np.uint64(0x100000001B3)
    shifts = np.arange(64, dtype=np.uint64)
    for t, g in zip(texts, got):
        toks = t.split()
        th = np.array(
            [np.uint64(int(hashlib.md5(x.encode()).hexdigest()[:16], 16))
             for x in toks], dtype=np.uint64)
        if len(th) == 0:
            assert int(g) == 0
            continue
        sh = th[:-1] * POLY + th[1:] if len(th) >= 2 else th
        sh = np.unique(sh)
        bits = ((sh[:, None] >> shifts[None, :])
                & np.uint64(1)).astype(np.int64)
        sums = (2 * bits - 1).sum(axis=0)
        exp = int(((sums > 0).astype(np.uint64)
                   << shifts).sum().astype(np.int64))
        assert int(g) == exp


def test_max_bucket_caps_hot_buckets(spark):
    # 30 copies of one template (a degenerate hot bucket) + one true
    # near-dup pair elsewhere. With max_bucket=8 the template bucket's
    # O(n^2) pair explosion is dropped; the small pair survives.
    template = "spam spam spam wonderful spam baked beans and spam " * 3
    base = ("the quiet library holds many unusual maps of old coastlines "
            "drawn by careful sailors who charted every hidden reef")
    near = base.replace("reef", "shoal")  # 3 of ~18 shingles differ
    pdf = pd.DataFrame({
        "doc_id": list(range(100, 130)) + [1, 2],
        "text": [template] * 30 + [base, near]})
    out = dedup.minhash_duplicate_pairs(
        spark.createDataFrame(pdf), num_perm=64, bands=16,
        verify_jaccard=0.5, max_bucket=8).toPandas()
    pairs = set(map(tuple, out[["a", "b"]].itertuples(index=False)))
    assert pairs == {(1, 2)}
    # uncapped: the template copies all pair up
    out2 = dedup.minhash_duplicate_pairs(
        spark.createDataFrame(pdf), num_perm=64, bands=16,
        verify_jaccard=0.5, max_bucket=None).toPandas()
    assert len(out2) == 30 * 29 // 2 + 1
    # simhash analog
    out3 = dedup.simhash_candidate_pairs(
        spark.createDataFrame(pdf), bands=16, max_hamming=15,
        max_bucket=8).toPandas()
    assert set(map(tuple, out3[["a", "b"]].itertuples(index=False))) \
        == {(1, 2)}


def test_spread_is_result_invariant(spark):
    # `spread` repartitions before the signature stage; results must be
    # identical regardless (guards against any shuffle-order dependence
    # sneaking into the vectorized folds / bucket emission).
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = dedup.minhash_duplicate_pairs(
        d, num_perm=64, bands=16, verify_jaccard=0.6, spread=None) \
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    wide = dedup.minhash_duplicate_pairs(
        d, num_perm=64, bands=16, verify_jaccard=0.6, spread=16) \
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, wide)
    s1 = dedup.simhash_candidate_pairs(d, hash_family="md5", spread=None) \
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    s2_ = dedup.simhash_candidate_pairs(d, hash_family="md5", spread=16) \
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2_)
