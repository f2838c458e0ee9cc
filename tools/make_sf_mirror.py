"""10x performance mirror of an sf dir (r7 measurement aid).

The driver re-generates its own large scale factor at round end; this
tool builds a LOCAL stand-in so scale behavior can be measured between
driver runs: each table is 10 shifted copies of the source sf dir with
keys re-based per copy so join relationships hold. Text/embedding
contents are made copy-distinct (per-token copy prefix; per-copy dim
permutation) so CROSS-copy rows are not near-duplicates - duplicate
and ANN candidate rates stay proportional to the source instead of
exploding 10x. NOT oracle data: bench_extra-style timing only.

Usage: python tools/make_sf_mirror.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


KEYS = {
    "customer": ["c_custkey", "c_nationkey@25"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "nation": [],     # dimension tables stay as-is (joins still hit
    "region": [],     # via the @mod wrap of the fact-side fk)
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey", "s_nationkey@25"],
}


def mirror(spark, src: str, dst: str, copies: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    for name, keys in KEYS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if not keys and name in ("nation", "region"):
            df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
            continue
        maxes = {}
        for k in keys:
            col = k.split("@")[0]
            maxes[k] = int(df.agg(F.max(col)).collect()[0][0]) + 1
        parts = []
        for i in range(copies):
            c = df
            for k in keys:
                col = k.split("@")[0]
                if "@" in k:  # fk into an unreplicated dimension: wrap
                    continue
                c = c.withColumn(col, F.col(col) + F.lit(i * maxes[k]))
            if name == "documents" and copies > 1 and i > 0:
                # Per-copy token BIJECTION (token -> token + digit):
                # within-copy shingle/window equality preserved exactly
                # (position-independent mapping), cross-copy shingles
                # distinct, so duplicate rates stay proportional to the
                # source. Structural words stay unmapped so the Gopher
                # stopword rule and the c4 ' spark ' sentence derivation
                # keep their source pass rates; +1 char/token keeps the
                # word-length rules in band.
                keep = ("scan", "column", "window", "order", "spark")
                toks = F.filter(F.split(F.col("text"), r"\s+"),
                                lambda t: t != "")
                mapped = F.transform(
                    toks,
                    lambda t: F.when(t.isin(*keep), t)
                    .otherwise(F.concat(t, F.lit(str(i)))))
                c = c.withColumn("text", F.array_join(mapped, " "))
            if name == "embeddings" and copies > 1:
                # per-copy deterministic dim permutation: within-copy
                # cosine structure preserved, cross-copy decorrelated.
                rng = np.random.default_rng(100 + i)
                dim = len(df.select("embedding").first()[0])
                perm = rng.permutation(dim).tolist()
                c = c.withColumn(
                    "embedding",
                    F.array(*[F.col("embedding")[int(p)] for p in perm]))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        n_files = max(4, copies)
        (out.repartition(n_files)
            .write.mode("overwrite").parquet(f"{dst}/{name}.parquet"))
        print(f"{name}: {out.count()} rows -> {dst}/{name}.parquet")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfmirror1.0"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from geeflow_spark.session import get_spark
    spark = get_spark("mirror")
    mirror(spark, src, dst, copies)
    spark.stop()
