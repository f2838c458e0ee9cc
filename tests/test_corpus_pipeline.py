"""Config-driven corpus pipeline (plans/corpus)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geeflow_spark.operators import chunking, dedup, sampling
from geeflow_spark.operators import text_metrics
from geeflow_spark.plans import corpus

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_matches_manual_chain(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = {
        "sample": {"fractions": {"en": 1.0, "de": 0.5},
                   "strata_col": "lang", "default_fraction": 0.5,
                   "seed": 7},
        # corpus-local function words: the synthetic docs contain no
        # English stopwords, so the naturalness rule uses the
        # corpus's own frequent terms (the documented override)
        "quality": {"min_words": 20,
                    "stopwords": ("scan", "column", "window", "order")},
        "chunk": {"max_tokens": 32, "overlap": 4},
        "shuffle": {"seed": 13, "n_buckets": 16},
        "pack": {"budget": 64, "bucket_size": 32},
    }
    got = corpus.build_corpus_pipeline(docs, cfg).toPandas()

    s = sampling.stratified_sample(docs, cfg["sample"]["fractions"],
                                   strata_col="lang",
                                   default_fraction=0.5, seed=7)
    q = s.filter(text_metrics.gopher_pass(
        min_words=20, stopwords=("scan", "column", "window", "order")))
    ch = chunking.chunk_documents(q, max_tokens=32, overlap=4)
    keyed = ch.withColumn(
        "_k", F.concat_ws("#", F.col("doc_id").cast("string"),
                          F.col("chunk_id").cast("string")))
    rk = sampling.shuffle_rank(keyed, key_col="_k", seed=13,
                               n_buckets=16).drop("_k")
    exp = chunking.pack_sequences(rk, budget=64, order_col="rank",
                                  bucket_size=32).toPandas()
    key = ["doc_id", "chunk_id", "rank", "prefix_tokens", "pack_id",
           "pack_offset"]
    assert len(got) == len(exp) > 0
    assert sorted(map(tuple, got[key].itertuples(index=False))) == \
        sorted(map(tuple, exp[key].itertuples(index=False)))


def test_corpus_pipeline_dedup_and_decontaminate_steps(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma delta epsilon zeta eta theta one",
                 "alpha beta gamma delta epsilon zeta eta theta one",
                 "bench match alpha beta gamma delta epsilon zeta eta",
                 "totally different content that stands alone fine"]}))
    bench = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [99],
         "text": ["bench match alpha beta gamma delta epsilon zeta eta"]}))
    cfg = {"dedup": {"num_perm": 32, "bands": 8, "verify_jaccard": 0.8,
                     "shingle_k": 2},
           "decontaminate": {"window": 8}}
    out = corpus.build_corpus_pipeline(docs, cfg, benchmark=bench) \
        .toPandas()
    # doc 2 is an exact dup of 1 (dropped); doc 3 shares an 8-gram
    # with the benchmark (dropped); 1 and 4 survive.
    assert sorted(out["doc_id"]) == [1, 4]
    dedup.release_survivors_state()
    dedup.release_decontaminate_state()


def test_corpus_pipeline_validation(spark):
    docs = None
    with pytest.raises(ValueError, match="unknown"):
        corpus.build_corpus_pipeline(docs, {"nope": {}})
    with pytest.raises(ValueError, match="shuffle"):
        corpus.build_corpus_pipeline(docs, {"pack": {"budget": 8}})
    with pytest.raises(ValueError, match="benchmark"):
        corpus.build_corpus_pipeline(docs, {"decontaminate": {}})
