"""Document chunking: split long documents into bounded token windows.

The standard preprocessing step in front of context-limited consumers
(embedding models, training sequence assembly): each document becomes
ceil((n_tokens - overlap) / (max_tokens - overlap)) chunks of at most
`max_tokens` whitespace tokens, consecutive chunks sharing `overlap`
tokens so no boundary context is lost.

Scale shape: entirely row-local and JVM-side (split / explode / slice
/ concat_ws inside whole-stage codegen - no UDF, no shuffle; the plan
is scan -> project -> generate -> project). The token array is
materialized ONCE per document: the chunk-index explode runs on a row
that already carries the split array, so per-chunk slicing references
a bound column, not a re-evaluated split expression (the interpreted
re-evaluation trap measured 10x on rolling fingerprints - see
functions/text.rolling_fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    ) -> DataFrame:
    """(id, chunk_id, chunk_text, chunk_tokens): `text_col` split on
    whitespace into windows of at most `max_tokens` tokens, chunk i
    starting at token i * (max_tokens - overlap). Every document
    yields at least one chunk (shorter docs pass through whole; empty
    text yields one empty chunk - no rows are silently dropped).
    chunk_id is 0-based and dense per document; chunk order reproduces
    the original token order.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size("_ws")
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    start = F.col("_ci") * stride + 1  # slice() is 1-based
    return (df
            .select(F.col(id_col), ws.alias("_ws"))
            .select(id_col, "_ws",
                    F.explode(F.sequence(F.lit(0), (n_chunks - 1)
                                         .cast("int"))).alias("_ci"))
            .select(id_col,
                    F.col("_ci").cast("long").alias("chunk_id"),
                    F.concat_ws(" ", F.slice("_ws", start, max_tokens))
                    .alias("chunk_text"),
                    F.least(F.lit(max_tokens),
                            F.size("_ws") - F.col("_ci") * stride)
                    .cast("long").alias("chunk_tokens")))
