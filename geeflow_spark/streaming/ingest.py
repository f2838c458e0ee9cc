"""Structured Streaming ingest of interleaved documents.

The reference is batch-only (SURVEY §2.7) - its incremental surface is
skip-existing resume + retries. This module adds the Spark-native
incremental path on top of the same kernels: a file-source stream of doc
parquet, per-microbatch S2 encode + spatial join + split, written
partitioned with exactly-once semantics via checkpointLocation +
idempotent sink paths.

Design notes for the 100 TB deployment:
  - the stream source is the Iceberg/parquet landing zone; maxFilesPerTrigger
    bounds per-batch memory;
  - all kernels are the SAME batch operators (generate_examples) applied
    in foreachBatch - no logic divergence between batch backfill and
    streaming tail;
  - watermarking is irrelevant for the geometry path (no event-time agg);
    the per-batch manifest rows give at-least-once lineage identical to
    the batch checkpoint layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_docs(spark: SparkSession, path: str, schema,
                max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def start_generate_stream(docs_stream: DataFrame, regions, out_path: str,
                          checkpoint_path: str, cell_level: int = 8):
    """foreachBatch application of the flagship pipeline; exactly-once
    via the streaming checkpoint + overwrite-by-batch-id directories."""
    from geeflow_spark.plans import generate

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ex = generate.generate_examples(batch_df, regions,
                                        cell_level=cell_level)
        (ex.write.mode("overwrite")
         .parquet(f"{out_path}/batch_id={batch_id}"))

    return (docs_stream.writeStream
            .option("checkpointLocation", checkpoint_path)
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())
