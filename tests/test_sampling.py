"""Deterministic sampling / mixing operators (operators/sampling)."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from geeflow_spark.operators import sampling


def _docs(spark, n=400):
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "lang": [("en", "de", "fr", "zh")[i % 4] for i in range(n)],
    })
    return spark.createDataFrame(pdf)


def test_hash_sample_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    got = sorted(r.doc_id for r in
                 sampling.hash_sample(d, 0.5, seed=1).collect())
    again = sorted(r.doc_id for r in
                   sampling.hash_sample(d.repartition(7), 0.5,
                                        seed=1).collect())
    assert got == again and 120 < len(got) < 280
    # nested property: smaller fraction same seed is a SUBSET
    small = set(r.doc_id for r in
                sampling.hash_sample(d, 0.1, seed=1).collect())
    assert small <= set(got) and 0 < len(small) < len(got)
    # a different seed draws a genuinely different sample
    other = set(r.doc_id for r in
                sampling.hash_sample(d, 0.5, seed=2).collect())
    assert other != set(got)


def test_hash_sample_md5_matches_hashlib(spark):
    # the md5 family's draw is bit-for-bit the top-64-bits-mod-2^63 of
    # hashlib md5 over the same key string - the cross-engine contract
    # the DuckDB oracles rely on.
    d = _docs(spark, 50)
    got = sorted(r.doc_id for r in
                 sampling.hash_sample(d, 0.3, seed=9,
                                      hash_family="md5").collect())
    t = sampling.threshold_u63(0.3)
    exp = [i for i in range(50)
           if int(hashlib.md5(f"{i}:9".encode()).hexdigest()[:16], 16)
           % (1 << 63) < t]
    assert got == exp


def test_stratified_sample_edges(spark):
    d = _docs(spark)
    out = sampling.stratified_sample(
        d, {"en": 1.0, "de": 0.0}, strata_col="lang",
        default_fraction=0.5, seed=4).toPandas()
    by = out.groupby("lang").size().to_dict()
    assert by.get("en") == 100          # 1.0 keeps every en doc
    assert "de" not in by               # 0.0 drops the stratum
    assert 25 < by.get("fr", 0) < 75    # default applies to unlisted
    assert 25 < by.get("zh", 0) < 75


def test_mix_corpus_rates_and_epochs(spark):
    d = _docs(spark)
    out = sampling.mix_corpus(
        d, {"en": 2.0, "de": 0.0, "fr": 1.5}, strata_col="lang",
        default_rate=1.0, seed=5).toPandas()
    en = out[out.lang == "en"]
    assert len(en) == 200 and set(en.epoch) == {0, 1}
    assert (en.groupby("doc_id").size() == 2).all()
    assert (out.lang != "de").all()
    fr = out[out.lang == "fr"]
    assert 100 < len(fr) < 200          # 1.5: one full + ~50% second
    assert (out[out.lang == "zh"].epoch == 0).all()
    assert len(out[out.lang == "zh"]) == 100
    # deterministic: identical multiset on a different partitioning
    again = sampling.mix_corpus(
        d.repartition(13), {"en": 2.0, "de": 0.0, "fr": 1.5},
        strata_col="lang", default_rate=1.0, seed=5).toPandas()
    key = ["doc_id", "lang", "epoch"]
    assert sorted(map(tuple, out[key].itertuples(index=False))) == \
        sorted(map(tuple, again[key].itertuples(index=False)))


def test_shuffle_rank_permutation_and_order(spark):
    # rank is a dense 0-based permutation matching (md5 draw, key)
    # order - recomputed independently with hashlib - regardless of
    # partitioning or bucket count (3 buckets forces multi-bucket
    # offsets).
    d = _docs(spark, 97).repartition(5)
    out = sampling.shuffle_rank(d, seed=11, hash_family="md5",
                                n_buckets=3).toPandas()
    assert sorted(out["rank"]) == list(range(97))
    draws = {i: int(hashlib.md5(f"{i}:11".encode()).hexdigest()[:16], 16)
             % (1 << 63) for i in range(97)}
    exp_order = sorted(range(97), key=lambda i: (draws[i], i))
    got = out.sort_values("rank")["doc_id"].tolist()
    assert got == exp_order
    # same permutation at a different bucketing / parallelism
    out2 = sampling.shuffle_rank(d.coalesce(1), seed=11,
                                 hash_family="md5",
                                 n_buckets=64).toPandas()
    assert out2.sort_values("rank")["doc_id"].tolist() == exp_order
