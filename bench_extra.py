"""Round-7 optimization measurement harness (bench.py is frozen for
measurement; this file holds the extra instrumentation the optimization
round needs - per-query isolation with the noop sink, plan capture,
subsets, A/B runs). Prints ONE JSON line like bench.py.

Usage:
  python bench_extra.py q1 q2 ...     # time only the named queries
  python bench_extra.py --plans q1 .. # also write .explain("formatted")
                                      #   to plans/r07/<q>_<tag>.txt
  --tag before|after                  # plan filename suffix (default raw)
  --runs N                            # timed runs per query (default 3)
  --flagship                          # include the flagship, report all
                                      #   raw walls (VERDICT r6 item 1)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans = "--plans" in args
    flagship = "--flagship" in args
    tag = "r07"
    if "--tag" in args:
        tag = args[args.index("--tag") + 1]
    runs = 3
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    names = [a for a in args if not a.startswith("--")
             and a not in (tag, str(runs))]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from geeflow_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench-extra")
    qs = entrymod.queries()
    # same session warmup as bench.py
    qs["geo_cell_counts"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    out: dict = {"sf": sf_dir, "tag": tag}
    if flagship:
        from bench import _flagship, FLAGSHIP_DOCS
        from geeflow_spark.operators import dedup as _dedup
        from geeflow_spark.operators import similarity as _sim
        _dedup.release_candidate_caches()
        _dedup.release_survivors_state()
        _dedup.release_component_labels()
        _sim.release_session_index()
        spark.catalog.clearCache()
        import bench as benchmod
        import statistics as st
        # replicate _flagship but record every wall
        from pyspark.sql import functions as F
        from geeflow_spark.plans import generate
        from geeflow_spark.sources import synth
        path = benchmod._flagship_input(spark, FLAGSHIP_DOCS)
        docs = spark.read.parquet(path)
        regions = synth.regions_pdf(40, radius_scale=2.0)

        def run():
            ex = generate.generate_examples(docs, regions, cell_level=8)
            return int(ex.groupBy("utm_zone", "tile_x", "tile_y", "split")
                       .agg(F.count("*").alias("n"))
                       .agg(F.sum("n")).collect()[0][0])
        for _ in range(3):
            run()
        walls = []
        for _ in range(5):
            t0 = time.monotonic()
            n = run()
            walls.append(round(time.monotonic() - t0, 3))
        med = st.median(walls)
        out["flagship"] = {
            "walls": walls, "median": round(med, 3),
            "docs_per_sec": round(FLAGSHIP_DOCS / med, 1),
            "rows": n,
            "spread": round(max(walls) / min(walls), 3)}

    timings = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if plans:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(txt)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        timings[name] = {"median": round(statistics.median(walls), 3),
                         "walls": walls}
        spark.sparkContext.setJobDescription(None)
    out["queries"] = timings
    out["total_median"] = round(
        sum(v["median"] for v in timings.values()), 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
