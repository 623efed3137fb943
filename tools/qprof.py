#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named registry query: capture .explain("formatted") to
plans/<tag>/<name>_<suffix>.txt, run one untimed warmup, then time
N samples of the bench-identical action (build + toPandas) AND of the
noop-sink action (computation only, no driver materialization), and
count the Spark jobs each execution launches (setJobGroup +
statusTracker — job count is the fixed-overhead driver at small SF).

Usage:
  python tools/qprof.py q1_pricing_summary dedup_minhash_lsh \
      [--samples 5] [--tag r17] [--suffix before] [--no-plan]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--tag", default="r17")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_qprof")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(plans_dir, exist_ok=True)

    # session warmup (bench-identical shape)
    from pyspark.sql import functions as F

    from tailsql_spark.plans.catalog import load_tables

    tables = load_tables(spark, args.sf_dir)
    tables["lineitem"].groupBy("l_returnflag").agg(F.count("*")).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in args.queries:
        spec = REGISTRY[name]
        plan_src = spec.plan or spec.build
        if not args.no_plan:
            df = plan_src(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        # warmup (codegen/JIT)
        spec.build(spark, args.sf_dir).toPandas()
        spark.catalog.clearCache()
        # timed samples, bench-identical
        wall: list[float] = []
        jobs = 0
        for i in range(args.samples):
            spark.catalog.clearCache()
            group = f"qprof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.build(spark, args.sf_dir).toPandas()
            wall.append(time.perf_counter() - t0)
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        # noop-sink samples (computation only)
        noop: list[float] = []
        njobs = 0
        for i in range(args.samples):
            spark.catalog.clearCache()
            group = f"qprofn-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
            njobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        out[name] = {
            "min": round(min(wall), 3),
            "samples": [round(s, 3) for s in wall],
            "jobs_last_run": jobs,
            "noop_min": round(min(noop), 3),
            "noop_samples": [round(s, 3) for s in noop],
            "noop_jobs_last_run": njobs,
        }
        print(f"# {name}: min {out[name]['min']}s jobs {jobs} | noop {out[name]['noop_min']}s jobs {njobs}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
