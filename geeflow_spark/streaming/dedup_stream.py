"""Stateful streaming deduplication of the document tail.

The build spec names `applyInPandasWithState` for custom stateful
streaming operators; this module provides both dedup paths a
training-data ingest tail needs:

  - `dedup_stream_builtin`: Spark's native stateful
    `dropDuplicates` on the collision-safe digest pair (same dual-key
    contract as batch `dedup.exact_dedup`) - the Spark-first default;
    state store bounded via `dropDuplicatesWithinWatermark` when an
    event-time column + retention horizon exist.
  - `seen_counts_stream`: a CUSTOM applyInPandasWithState operator -
    per-key running counts that survive across micro-batches (first-seen
    timestamps + duplicate counts per text digest), the shape every
    bespoke stateful kernel follows (GroupState timeout, pandas batch
    in/out).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, TimestampType)


def _digests(df: DataFrame, text_col: str) -> DataFrame:
    key = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("_k1", F.xxhash64(key)) \
             .withColumn("_k2", F.sha2(key, 256))


def dedup_stream_builtin(docs_stream: DataFrame, text_col: str = "text",
                         event_time_col: str | None = None,
                         watermark: str = "1 hour") -> DataFrame:
    """Exactly the batch dedup contract on a stream: first arrival of a
    (normalized-text digest pair) wins; duplicates are dropped with
    Spark's built-in stateful operator. With `event_time_col`, state is
    bounded by `dropDuplicatesWithinWatermark` (late duplicates beyond
    the horizon pass through - the documented trade for bounded state at
    10^12-doc scale; without it state grows with distinct keys)."""
    keyed = _digests(docs_stream, text_col)
    if event_time_col:
        keyed = keyed.withWatermark(event_time_col, watermark)
        out = keyed.dropDuplicatesWithinWatermark(["_k1", "_k2"])
    else:
        out = keyed.dropDuplicates(["_k1", "_k2"])
    return out.drop("_k1", "_k2")


_SEEN_OUT = StructType([
    StructField("_k1", LongType()),
    StructField("_k2", StringType()),
    StructField("n_seen", LongType()),
    StructField("first_ts", TimestampType()),
])
_SEEN_STATE = StructType([
    StructField("n_seen", LongType()),
    StructField("first_ts", TimestampType()),
])


def seen_counts_stream(docs_stream: DataFrame, text_col: str = "text",
                       ts_col: str = "ts") -> DataFrame:
    """Custom stateful operator: per-digest running duplicate counts.

    applyInPandasWithState keyed by the DUAL digest (_k1 xxhash64,
    _k2 sha2-256) - the same collision-safe contract as batch
    exact_dedup and dedup_stream_builtin: at 10^12-doc scale 64-bit
    birthday collisions WILL merge counts of distinct texts if keyed on
    _k1 alone (the r2 advice item). State carries (n_seen, first_ts)
    across micro-batches; each batch emits the updated totals for keys
    it touched. NoTimeout keeps state for the stream's lifetime
    (callers with an event-time horizon should use the built-in path
    instead)."""
    keyed = _digests(docs_stream, text_col).select(
        "_k1", "_k2", F.col(ts_col).alias("_ts"))

    def update(key, pdfs, state: GroupState):
        n = 0
        first = None
        for pdf in pdfs:
            n += len(pdf)
            t = pdf["_ts"].min()
            first = t if first is None else min(first, t)
        if state.exists:
            (n0, f0) = state.get
            n += n0
            first = f0 if f0 is not None and f0 <= first else first
        state.update((n, first))
        yield pd.DataFrame({"_k1": [key[0]], "_k2": [key[1]],
                            "n_seen": [n], "first_ts": [first]})

    return keyed.groupBy("_k1", "_k2").applyInPandasWithState(
        update, outputStructType=_SEEN_OUT, stateStructType=_SEEN_STATE,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
