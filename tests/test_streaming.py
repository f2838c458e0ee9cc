"""End-to-end Structured Streaming test: the streaming tail runs the
SAME kernels as batch and produces identical rows, exactly once, with
incremental pickup of late-arriving files."""

import os

from pyspark.sql import functions as F

from geeflow_spark.plans import generate
from geeflow_spark.sources import synth
from geeflow_spark.streaming import ingest


def test_stream_matches_batch_exactly_once(spark, tmp_path):
    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = synth.docs(spark, 400)
    docs.filter(F.col("doc_id") < "doc0000000200") \
        .write.mode("overwrite").parquet(land)

    regions = synth.regions_pdf(10, radius_scale=3.0)
    schema = docs.schema

    # Batch 1: first 200 docs.
    q = ingest.start_generate_stream(
        ingest.stream_docs(spark, land, schema), regions, out, ckpt,
        cell_level=6)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    exp1 = generate.generate_examples(
        spark.read.parquet(land), regions, cell_level=6)
    assert got1.count() == exp1.count() > 0

    # Late arrivals: 200 more docs land; availableNow picks up ONLY the
    # new files (exactly-once via the checkpoint).
    docs.filter(F.col("doc_id") >= "doc0000000200") \
        .write.mode("append").parquet(land)
    q2 = ingest.start_generate_stream(
        ingest.stream_docs(spark, land, schema), regions, out, ckpt,
        cell_level=6)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out)
    exp_all = generate.generate_examples(
        spark.read.parquet(land), regions, cell_level=6)
    # Exactly-once: streaming total == full batch recompute (no dupes
    # from batch 1 being reprocessed).
    assert got2.count() == exp_all.count()
    # Span-sequence invariant survives the streaming path shuffle.
    row = got2.filter(F.size("spans") >= 2).limit(1).collect()[0]
    offs = [s["offset"] for s in row["spans"]]
    assert offs == sorted(offs)
    # batch-id partition dirs exist (idempotent overwrite-by-batch sink)
    assert any(d.startswith("batch_id=") for d in os.listdir(out))
    # per-batch lineage/metrics manifests (north rule: lineage on the
    # streaming tail, same layout as the batch checkpoint layer)
    import json
    mdir = os.path.join(out, "_manifest")
    recs = [json.load(open(os.path.join(mdir, f)))
            for f in sorted(os.listdir(mdir))]
    assert len(recs) >= 2  # one per committed micro-batch
    assert sum(r["rows"] for r in recs) == got2.count()
    assert all(r["lineage"]["id_min"] <= r["lineage"]["id_max"]
               for r in recs)


def test_stream_dedup_builtin_across_batches(spark, tmp_path):
    import pandas as pd
    from geeflow_spark.streaming import dedup_stream
    land = str(tmp_path / "dl")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    b1 = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha text", "beta text", "alpha  TEXT"]})
    spark.createDataFrame(b1).write.mode("overwrite").parquet(land)
    schema = spark.read.parquet(land).schema

    def run():
        s = spark.readStream.schema(schema).parquet(land)
        d = dedup_stream.dedup_stream_builtin(s)
        return (d.writeStream.format("parquet")
                .option("path", out).option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    run().awaitTermination(120)
    got1 = spark.read.parquet(out).toPandas()
    # alpha/ALPHA normalize equal -> one survivor
    assert len(got1) == 2

    # Batch 2: duplicate of batch-1 text arrives later + one new text.
    b2 = pd.DataFrame({"doc_id": [4, 5],
                       "text": ["ALPHA text", "gamma text"]})
    spark.createDataFrame(b2).write.mode("append").parquet(land)
    run().awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    # cross-batch state: the late alpha duplicate is dropped
    assert len(got2) == 3
    assert sorted(got2["text"].str.lower().str.split().str[0]) \
        == ["alpha", "beta", "gamma"]


def test_stream_seen_counts_stateful(spark, tmp_path):
    import pandas as pd
    from geeflow_spark.streaming import dedup_stream
    land = str(tmp_path / "sl")
    ckpt = str(tmp_path / "sckpt")
    out = str(tmp_path / "sout")
    ts = pd.Timestamp("2024-01-01")
    b1 = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["xx yy", "zz ww", "xx  YY"],
                       "ts": [ts, ts, ts + pd.Timedelta(minutes=1)]})
    spark.createDataFrame(b1).write.mode("overwrite").parquet(land)
    schema = spark.read.parquet(land).schema

    def run():
        s = spark.readStream.schema(schema).parquet(land)
        d = dedup_stream.seen_counts_stream(s)
        # update-mode stateful op -> foreachBatch append sink
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)
        return (d.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True).start())

    run().awaitTermination(120)
    # Batch 2: two more of the 'xx yy' digest.
    b2 = pd.DataFrame({"doc_id": [4, 5],
                       "text": ["XX yy", "xx yy"],
                       "ts": [ts + pd.Timedelta(hours=1)] * 2})
    spark.createDataFrame(b2).write.mode("append").parquet(land)
    run().awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    # state carried across micro-batches: latest emission for the xx-yy
    # digest counts all 4 occurrences with the batch-1 first_ts
    top = got.sort_values("n_seen").iloc[-1]
    assert top["n_seen"] == 4
    assert pd.Timestamp(top["first_ts"]) == ts
