"""10x-scale evidence run (r3 judge item 5): the scale-path queries at
n and 10n on deterministic synthetic corpora, with walls + scaling
ratios + the skew profile committed as BENCH/SF1.md.

Corpora (all seeded, JVM-generated - no driver-side data):
  - interleaved docs (synth.docs): flagship spatial join + tiles, kNN.
  - text corpus: 20 tokens/doc from a 1000-word vocab via xxhash64;
    one PLANTED near-dup per 1000 docs (single-token mutation ->
    3-shingle Jaccard 15/21 = 0.714 >= the 0.6 verify threshold), so
    the true pair count is known (n/1000) and recall is measurable at
    every scale.
  - clustered embeddings (64 centers, dim 16): sign-LSH top-k and the
    IVF build/probe split (probe wall reported separately from build -
    the amortized path).

Protocol: fresh corpus parquet per size, 1 warmup + 2 timed runs per
(query, size); the MIN wall feeds the scaling ratio (10x data in <= 2x
linear wall = pass, the r3 brief's bar). Run AFTER `python bench.py`
baselines, never concurrently with other Spark work.

Usage: python tools/bench_sf1.py [--small N] [--big M]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = int(os.environ.get("SF1_SMALL", "1000000"))
BIG = int(os.environ.get("SF1_BIG", "10000000"))
VOCAB = 1000
TOKENS = 20


def text_corpus(spark, n: int, n_parts: int = 128):
    """(doc_id, text): hash-drawn word soup + planted near-dup pairs.

    doc id%1000==1 copies doc id-1 with ONE token (position 10)
    replaced by a unique marker: 3-shingle Jaccard = 15/21 = 0.714.
    Random cross-doc Jaccard is ~0 (20 tokens from a 1000 vocab), so
    the exact verified-pair truth is floor-count n/1000.
    """
    from pyspark.sql import functions as F
    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(VOCAB)])
    df = spark.range(0, n, 1, n_parts)
    idc = F.col("id")
    is_mut = (idc % 1000 == 1)
    base = F.when(is_mut, idc - 1).otherwise(idc)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda i: F.when(
            is_mut & (i == 10),
            F.concat(F.lit("mut"), idc.cast("string")))
        .otherwise(F.element_at(
            vocab, (F.pmod(F.xxhash64(base, i), VOCAB) + 1).cast("int"))))
    return df.select(idc.alias("doc_id"),
                     F.concat_ws(" ", toks).alias("text"))


def vec_corpus(spark, n: int, n_parts: int = 128, dim: int = 16):
    """(vec_id, embedding double[dim]): 64 hash-placed cluster centers +
    per-vector hash noise - deterministic, clustered (IVF-friendly)."""
    from pyspark.sql import functions as F
    df = spark.range(0, n, 1, n_parts)
    idc = F.col("id")
    c = idc % 64
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.pmod(F.xxhash64(c, i), 1000) / 250.0 - 2.0)
                   + (F.pmod(F.xxhash64(idc, i, F.lit(7)), 1000)
                      / 1000.0 - 0.5)))
    return df.select(idc.alias("vec_id"), emb.alias("embedding"))


def _mat(spark, kind: str, n: int) -> str:
    """Materialize a corpus once; timed queries only READ parquet."""
    from geeflow_spark.sources import synth
    path = f"/tmp/geeflow_sf1_{kind}_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen = {"docs": lambda: synth.docs(spark, n, n_partitions=128),
               "text": lambda: text_corpus(spark, n),
               "vec": lambda: vec_corpus(spark, n)}[kind]
        gen().write.mode("overwrite").parquet(path)
    return path


def timed(fn, warmups: int = 1, runs: int = 2):
    for _ in range(warmups):
        fn()
    walls, out = [], None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        walls.append(round(time.monotonic() - t0, 2))
    return out, walls


def run(spark, n: int) -> dict:
    from pyspark.sql import functions as F
    from geeflow_spark.operators import dedup, knn, similarity
    from geeflow_spark.plans import generate
    from geeflow_spark.sources import synth

    res = {}
    docs_p = _mat(spark, "docs", n)
    text_p = _mat(spark, "text", n)
    vec_p = _mat(spark, "vec", n)
    spread = spark.sparkContext.defaultParallelism

    # flagship: spatial join + fused PIP/tile/split + count agg
    docs = spark.read.parquet(docs_p).select("doc_id", "lat", "lon")
    regions = synth.regions_pdf(40, radius_scale=2.0)

    def _flag():
        ex = generate.generate_examples(docs, regions, cell_level=8)
        return ex.groupBy("utm_zone", "split").count().count()

    out, walls = timed(_flag)
    res["flagship"] = {"rows": out, "walls": walls}

    # minhash LSH + exact-Jaccard verify (planted truth = n // 1000)
    text = spark.read.parquet(text_p)

    def _mh():
        return dedup.minhash_duplicate_pairs(
            text, num_perm=64, bands=16, verify_jaccard=0.6,
            spread=spread).count()

    out, walls = timed(_mh)
    res["minhash_pairs"] = {"pairs": out, "true_pairs": n // 1000,
                            "recall": round(out / (n // 1000), 4),
                            "walls": walls}

    # simhash banded candidates
    def _sh():
        return dedup.simhash_candidate_pairs(
            text, shingle_k=2, bands=8, max_hamming=12,
            spread=spread).count()

    out, walls = timed(_sh)
    res["simhash_pairs"] = {"pairs": out, "walls": walls}

    # embedding sign-LSH top-k (100 queries vs n vectors)
    vec = spark.read.parquet(vec_p)
    q = vec.filter(F.col("vec_id") < 100) \
        .select(F.col("vec_id").alias("query_id"), "embedding")

    def _lsh():
        return similarity.lsh_topk(q, vec, k=10, dim=16).count()

    out, walls = timed(_lsh)
    res["lsh_topk"] = {"rows": out, "walls": walls}

    # IVF: build ONCE (persisted lists), then the amortized probe path
    t0 = time.monotonic()
    idx = similarity.ivf_build(vec, n_centroids=64, train_rows=16384,
                               path=f"/tmp/geeflow_sf1_ivf_{n}")
    build_wall = round(time.monotonic() - t0, 2)

    def _probe():
        return similarity.ivf_probe(q, idx, vec, k=10, nprobe=8).count()

    out, walls = timed(_probe)
    res["ivf"] = {"rows": out, "build_wall": build_wall,
                  "probe_walls": walls}

    # geo kNN ring path: 200 queries vs n points
    qk = docs.filter(F.col("doc_id") < 200) \
        .select(F.col("doc_id").alias("query_id"), "lat", "lon")
    dk = docs.select(F.col("doc_id").alias("data_id"), "lat", "lon")

    def _knn():
        return knn.knn(qk, dk, k=5, level=7).count()

    out, walls = timed(_knn)
    res["geo_knn"] = {"rows": out, "walls": walls}
    return res


def skew_profile(spark, n: int) -> dict:
    """Level-8 cell histogram of the doc corpus + the salted defuse."""
    from pyspark.sql import functions as F
    from geeflow_spark.operators import spatial_join
    docs = spark.read.parquet(_mat(spark, "docs", n)) \
        .select("doc_id", "lat", "lon")
    enc = spatial_join.with_cell(docs, level=8)
    counts = enc.groupBy("cell").count().cache()
    top = [int(r["count"]) for r in
           counts.orderBy(F.col("count").desc()).limit(10).collect()]
    n_cells = counts.count()
    salted = enc.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id", "cell"), F.lit(16)))
    max_partial = salted.groupBy("cell", "_salt").count() \
        .agg(F.max("count")).collect()[0][0]
    counts.unpersist()
    return {"n_docs": n, "n_cells_level8": n_cells,
            "hottest_cells": top,
            "hottest_share": round(top[0] / n, 5),
            "mean_per_cell": round(n / n_cells, 1),
            "salted_max_partial": int(max_partial),
            "defuse_factor": round(top[0] / max_partial, 2)}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from geeflow_spark.session import get_spark
    spark = get_spark("sf1")
    small, big = SMALL, BIG
    out = {"small_n": small, "big_n": big,
           "small": run(spark, small), "big": run(spark, big),
           "skew": skew_profile(spark, big)}
    spark.stop()

    lines = [
        "# BENCH/SF1 — 10x scale-up evidence",
        "",
        f"Same queries, same generators, {small:,} -> {big:,} docs/"
        "vectors (10x). `ratio` = min big wall / min small wall; "
        "linear scaling = 10, the r3 bar is <= 2x linear (20).",
        "",
        "| query | small walls (s) | big walls (s) | ratio | <=2x linear |",
        "|---|---|---|---|---|",
    ]
    ratios = {}
    for name in ("flagship", "minhash_pairs", "simhash_pairs",
                 "lsh_topk", "geo_knn"):
        ws, wb = out["small"][name]["walls"], out["big"][name]["walls"]
        r = round(min(wb) / min(ws), 1)
        ratios[name] = r
        lines.append(f"| {name} | {ws} | {wb} | {r} | "
                     f"{'PASS' if r <= 20 else 'FAIL'} |")
    pb_s = out["small"]["ivf"]["probe_walls"]
    pb_b = out["big"]["ivf"]["probe_walls"]
    r = round(min(pb_b) / min(pb_s), 1)
    ratios["ivf_probe"] = r
    lines.append(f"| ivf_probe (post-build) | {pb_s} | {pb_b} | {r} | "
                 f"{'PASS' if r <= 20 else 'FAIL'} |")
    lines += [
        "",
        f"- IVF build wall (one-time, amortized across batches): "
        f"{out['small']['ivf']['build_wall']}s at {small:,}, "
        f"{out['big']['ivf']['build_wall']}s at {big:,}.",
        f"- Minhash planted-pair recall: "
        f"{out['small']['minhash_pairs']['recall']} at {small:,}, "
        f"{out['big']['minhash_pairs']['recall']} at {big:,} "
        f"(truth = n/1000 planted J=0.714 pairs; 16x4 banding "
        f"predicts ~0.99).",
        "",
        "## Skew profile (big corpus, level-8 cells)",
        "",
        "```json",
        json.dumps(out["skew"], indent=1),
        "```",
        "",
        "The hottest cell's count vs the max salted (cell,salt) "
        "stage-1 partial shows the explicit skew defuse "
        f"(factor {out['skew']['defuse_factor']}x, 16 salts).",
        "",
        "Raw:",
        "```json",
        json.dumps(out, indent=1),
        "```",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SF1.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"ratios": ratios, "skew": out["skew"]}))


if __name__ == "__main__":
    main()
