"""Similarity search over embedding columns (array<float>).

Large-pipeline first-class operators (not in the reference):
  - brute_force_topk: exact cosine top-k, all JVM-side via higher-order
    array functions (F.aggregate/zip_with dot products) - the correctness
    baseline.
  - lsh_topk: random-hyperplane (sign) LSH bucketing as the scale path:
    candidates only within matching bucket keys (multi-probe via bands),
    exact re-rank inside buckets. At 10^12 rows the bucket join replaces
    the O(Q*N) cross join with O(Q*bucket_size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries: DataFrame, data: DataFrame, k: int,
                     query_id: str = "query_id", data_id: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, score, rank).

    Ties broken by ascending data id for determinism.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    d = data.select(F.col(data_id), F.col(vec_col).alias("_dv"))
    cand = q.crossJoin(d).withColumn(
        "score", cosine_col(F.col("_qv"), F.col("_dv")))
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(),
                                             F.col(data_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, data_id, "score", "rank"))


def hyperplane_buckets_udf(dim: int, n_planes: int = 16, bands: int = 4,
                           seed: int = 3):
    """Pandas UDF embedding -> array of `bands` bucket keys (multi-probe).

    n_planes sign bits split into `bands` groups; each group forms one
    bucket key. Two vectors collide on a band with prob (1 - theta/pi)^r.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    per_band = n_planes // bands

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy())  # (n, dim)
        signs = (mat @ planes.T) > 0  # (n, n_planes)
        weights = (1 << np.arange(per_band)).astype(np.int64)
        keys = (signs.reshape(len(mat), bands, per_band)
                .astype(np.int64) * weights).sum(axis=2)
        keys |= (np.arange(bands, dtype=np.int64) << 32)[None, :]
        return pd.Series(list(keys))

    return _buckets


def lsh_topk(queries: DataFrame, data: DataFrame, k: int, dim: int,
             query_id: str = "query_id", data_id: str = "vec_id",
             vec_col: str = "embedding", n_planes: int = 16,
             bands: int = 4) -> DataFrame:
    """Approximate cosine top-k via sign-LSH bucketing + exact re-rank."""
    bud = hyperplane_buckets_udf(dim, n_planes, bands)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    d = data.select(F.col(data_id), F.col(vec_col).alias("_dv"))
    qb = q.select(query_id, F.explode(bud(F.col("_qv"))).alias("bucket"))
    db = d.select(data_id, F.explode(bud(F.col("_dv"))).alias("bucket"))
    # Dedup candidate PAIRS on bare ids (16-byte shuffle rows), then
    # rejoin the vectors once: never shuffle embedding payloads keyed by
    # (or alongside) a multi-band-inflated candidate set. Queries are the
    # small side by construction -> broadcast.
    cand_ids = (qb.join(db, "bucket")
                .select(query_id, data_id).distinct())
    cand = (cand_ids
            .join(F.broadcast(q), query_id)
            .join(d, data_id)
            .withColumn("score", cosine_col(F.col("_qv"), F.col("_dv"))))
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(),
                                             F.col(data_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, data_id, "score", "rank"))
