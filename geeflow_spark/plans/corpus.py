"""Config-driven corpus-pipeline front-end.

The LLM-data sibling of plans/config.py (the geo config->plan
front-end): one declarative dict builds the standard training-data
export chain from the individually-tested operators, in the canonical
order a production pipeline runs them:

    sample -> clean (PII masking) -> quality (Gopher rules)
    -> dedup (near-dup survivors) -> substrings (duplicate-run cuts)
    -> decontaminate -> mix (epoch rates) -> chunk -> shuffle -> pack

Every step is optional; present steps run in that fixed order (the
order is part of the semantics: sampling first keeps every later
stage's cost proportional to the kept fraction; dedup before
decontamination avoids paying the benchmark join for docs a cheaper
filter already dropped; chunking precedes the shuffle so the
permutation is over chunks, not docs).

All steps are deterministic (hash-keyed draws, content-keyed dedup),
so the whole pipeline is reproducible across runs and cluster sizes -
and, with hash_family="md5", replayable end-to-end in SQL (the
corpus_e2e driver oracle does exactly that).

Example config::

    {
      "sample": {"fractions": {"en": 1.0}, "strata_col": "lang",
                 "default_fraction": 0.25, "seed": 7},
      "clean": {},                           # PII masking, default patterns
      "quality": {"min_words": 30},
      "dedup": {"num_perm": 64, "bands": 16, "verify_jaccard": 0.6},
      "substrings": {"window": 8},           # duplicate-run cuts
      "decontaminate": {"window": 8},       # needs benchmark=frame
      "chunk": {"max_tokens": 512, "overlap": 64},
      "shuffle": {"seed": 13},
      "pack": {"budget": 4096},
    }
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geeflow_spark.operators import chunking, dedup, sampling
from geeflow_spark.operators import text_metrics

_STEP_ORDER = ("sample", "clean", "quality", "dedup", "substrings",
               "decontaminate", "mix", "chunk", "shuffle", "pack")


def build_corpus_pipeline(docs: DataFrame, cfg: dict,
                          benchmark: DataFrame | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          hash_family: str = "xxh64") -> DataFrame:
    """Runs the configured steps of the corpus export chain over
    `docs` and returns the resulting DataFrame (chunk-level once a
    "chunk" step is present, doc-level before). Unknown step names
    raise; "decontaminate" requires the `benchmark` frame.
    """
    unknown = set(cfg) - set(_STEP_ORDER)
    if unknown:
        raise ValueError(f"unknown corpus pipeline steps: {sorted(unknown)}")
    out = docs
    chunked = False
    if "sample" in cfg:
        c = dict(cfg["sample"])
        if "fractions" in c:
            out = sampling.stratified_sample(
                out, c["fractions"], strata_col=c["strata_col"],
                key_col=id_col,
                default_fraction=c.get("default_fraction", 0.0),
                seed=c.get("seed", 0), hash_family=hash_family)
        else:
            out = sampling.hash_sample(
                out, c["fraction"], key_col=id_col,
                seed=c.get("seed", 0), hash_family=hash_family)
    if "clean" in cfg:
        # PII masking BEFORE quality: the quality rules must judge
        # the text that will actually ship. Row-local JVM regexp -
        # rides in the same codegen span as the sample filter.
        c = dict(cfg["clean"])
        out = text_metrics.pii_redact(out, text_col=text_col,
                                      counts=c.get("counts", False),
                                      **{k: v for k, v in c.items()
                                         if k == "patterns"})
    if "quality" in cfg:
        # row-local predicate: no join, no extra pass - the Gopher
        # conjunction filters in place inside the same codegen span.
        out = out.filter(text_metrics.gopher_pass(
            text_col=text_col, **cfg["quality"]))
    if "dedup" in cfg:
        c = dict(cfg["dedup"])
        quality_col = c.pop("quality_col", None)
        pairs = dedup.minhash_duplicate_pairs(out, text_col=text_col,
                                              id_col=id_col, **c)
        out = dedup.dedup_survivors(out, pairs, id_col=id_col,
                                    quality_col=quality_col)
    if "substrings" in cfg:
        # duplicate-run cuts AFTER doc-level dedup (Lee et al. run
        # ExactSubstr in addition to NearDup: doc dedup first shrinks
        # the occurrence table this step shuffles), before
        # decontamination (the benchmark n-gram join should see the
        # text that ships).
        out = dedup.substring_dedup(out, text_col=text_col,
                                    id_col=id_col, metrics=False,
                                    **cfg["substrings"])
    if "decontaminate" in cfg:
        if benchmark is None:
            raise ValueError("decontaminate step needs benchmark=frame")
        out = dedup.decontaminate(out, benchmark, text_col=text_col,
                                  id_col=id_col,
                                  **cfg["decontaminate"])
    if "mix" in cfg:
        # after dedup/decontamination (epochs of a clean corpus),
        # before chunking (the epoch column rides into the chunks).
        c = dict(cfg["mix"])
        out = sampling.mix_corpus(
            out, c["rates"], strata_col=c.get("strata_col", "source"),
            key_col=id_col, default_rate=c.get("default_rate", 1.0),
            seed=c.get("seed", 0), hash_family=hash_family)
    mixed = "mix" in cfg
    if "chunk" in cfg:
        out = chunking.chunk_documents(
            out, text_col=text_col, id_col=id_col,
            carry_cols=("epoch",) if mixed else (), **cfg["chunk"])
        chunked = True
    if "shuffle" in cfg:
        c = dict(cfg["shuffle"])
        if chunked or mixed:
            parts = [F.col(id_col).cast("string")]
            if mixed:
                parts.append(F.col("epoch").cast("string"))
            if chunked:
                parts.append(F.col("chunk_id").cast("string"))
            out = out.withColumn("_k", F.concat_ws("#", *parts))
            key = "_k"
        else:
            key = id_col
        out = sampling.shuffle_rank(out, key_col=key,
                                    seed=c.get("seed", 0),
                                    hash_family=hash_family,
                                    n_buckets=c.get("n_buckets", 1024))
        if chunked or mixed:
            out = out.drop("_k")
    if "pack" in cfg:
        if "shuffle" not in cfg:
            raise ValueError("pack step needs a shuffle step (rank "
                             "order) before it")
        out = chunking.pack_sequences(
            out, budget=cfg["pack"]["budget"], order_col="rank",
            tokens_col="chunk_tokens" if chunked else
            cfg["pack"].get("tokens_col", "chunk_tokens"),
            bucket_size=cfg["pack"].get("bucket_size", 1 << 20))
    return out
