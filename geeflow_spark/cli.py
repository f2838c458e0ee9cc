"""spark-submit entry points.

Usage (cluster):
    spark-submit --py-files geeflow_spark.zip -m geeflow_spark.cli generate \\
        --docs s3://bucket/docs --regions regions.parquet --out s3://bucket/out

Packaging: `python -m geeflow_spark.cli package` writes geeflow_spark.zip
next to the repo root for --py-files distribution (the engine is pure
Python + numpy/pandas - no native deps to ship).

Subcommands:
    generate  - flagship pipeline: docs -> spatial join -> tiles -> split,
                resumable via per-partition manifests (plans.checkpoint).
    rasters   - tile assignment + mosaic (export_rasters path).
    stats     - per-band stats JSON (compute_stats path).
    corpus    - LLM training-corpus export chain from a JSON config
                (plans/corpus step dict), stage-materialized +
                resumable (run_corpus_pipeline_checkpointed).
    package   - build the --py-files zip.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def _package(out: str = "geeflow_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "geeflow_spark")
    with zipfile.ZipFile(os.path.join(root, out), "w",
                         zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return os.path.join(root, out)


def _cmd_generate(args) -> None:
    import pandas as pd

    from geeflow_spark.plans import checkpoint, generate
    from geeflow_spark.session import get_spark
    from geeflow_spark.sources import synth

    spark = get_spark("geeflow-generate")
    docs = spark.read.parquet(args.docs)
    regions = (pd.read_parquet(args.regions) if args.regions
               else synth.regions_pdf(40))
    ex = generate.generate_examples(docs, regions,
                                    cell_level=args.cell_level)
    parts = ["train", "val", "test"]
    recs = checkpoint.run_partitioned(ex, args.out, "split", parts,
                                      id_col="doc_id",
                                      input_fingerprint=args.docs)
    print(f"wrote {len(recs)} partitions -> {args.out}")
    spark.stop()


def _cmd_rasters(args) -> None:
    import json

    from geeflow_spark.operators import raster_export, tiles
    from geeflow_spark.session import get_spark

    spark = get_spark("geeflow-rasters")
    plots = spark.read.parquet(args.plots)
    zone_bboxes = json.loads(args.zone_bboxes)
    assigned = tiles.assign_tiles(plots, zone_bboxes=zone_bboxes,
                                  num_splits=args.num_splits)
    rasters = raster_export.mosaic_assigned_tiles(
        assigned, zone_bboxes=zone_bboxes, num_splits=args.num_splits,
        pred_c=args.channels, border_mode=args.border_mode)
    rasters.write.mode("overwrite").parquet(args.out)
    spark.stop()


def _cmd_stats(args) -> None:
    from geeflow_spark.operators import stats
    from geeflow_spark.session import get_spark

    spark = get_spark("geeflow-stats")
    df = spark.read.parquet(args.table)
    out = stats.per_band_counter_stats(df, args.array_col, args.n_bands)
    os.makedirs(args.out, exist_ok=True)
    for band, d in out.items():
        stats.save_stats_json(
            d, os.path.join(args.out, f"stats_band_{band}.json"))
    print(f"wrote {len(out)} band stats -> {args.out}")
    spark.stop()


def _cmd_corpus(args) -> None:
    import json

    from geeflow_spark.plans import corpus
    from geeflow_spark.session import get_spark

    with open(args.config) as f:
        cfg = json.load(f)
    spark = get_spark("geeflow-corpus")
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark) if args.benchmark \
        else None
    out = corpus.run_corpus_pipeline_checkpointed(
        docs, cfg, args.stages, benchmark=bench,
        input_fingerprint=args.docs,
        benchmark_fingerprint=args.benchmark or "",
        hash_family=args.hash_family)
    out.write.mode("overwrite").parquet(args.out)
    print(f"corpus chain ({', '.join(k for k in cfg)}) -> {args.out}")
    spark.stop()


def main(argv=None):
    p = argparse.ArgumentParser(prog="geeflow_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--docs", required=True)
    g.add_argument("--regions", default=None)
    g.add_argument("--out", required=True)
    g.add_argument("--cell-level", type=int, default=8)

    r = sub.add_parser("rasters")
    r.add_argument("--plots", required=True)
    r.add_argument("--zone-bboxes", required=True,
                   help='JSON {"32T": [x0, y0, x1, y1], ...}')
    r.add_argument("--out", required=True)
    r.add_argument("--num-splits", type=int, default=4)
    r.add_argument("--channels", type=int, default=2)
    r.add_argument("--border-mode", default="uniform_avg")

    s = sub.add_parser("stats")
    s.add_argument("--table", required=True)
    s.add_argument("--array-col", required=True)
    s.add_argument("--n-bands", type=int, required=True)
    s.add_argument("--out", required=True)

    c = sub.add_parser("corpus")
    c.add_argument("--docs", required=True)
    c.add_argument("--config", required=True,
                   help="JSON step dict (plans/corpus config)")
    c.add_argument("--stages", required=True,
                   help="stage-checkpoint dir (driver-visible FS)")
    c.add_argument("--out", required=True)
    c.add_argument("--benchmark", default=None,
                   help="benchmark parquet (decontaminate step)")
    c.add_argument("--hash-family", default="xxh64",
                   choices=("xxh64", "md5"))

    sub.add_parser("package")

    args = p.parse_args(argv)
    if args.cmd == "package":
        print(_package())
    elif args.cmd == "generate":
        _cmd_generate(args)
    elif args.cmd == "rasters":
        _cmd_rasters(args)
    elif args.cmd == "stats":
        _cmd_stats(args)
    elif args.cmd == "corpus":
        _cmd_corpus(args)


if __name__ == "__main__":
    main()
