#!/usr/bin/env python
"""Per-job attribution for one registry query: runs it once with the UI
enabled and dumps every Spark job (duration, stage names, description)
via the UI REST API — answers "where do the N jobs of a small-SF run
come from" (guide §1/§7).

Usage: python tools/jobprof.py <query> [--sf-dir DIR] [--action noop|topandas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--action", default="noop", choices=["noop", "topandas"])
    args = ap.parse_args()

    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    spark = get_spark(
        app_name="tailsql_jobprof",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tailsql_spark.plans.catalog import load_tables

    tables = load_tables(spark, args.sf_dir)
    tables["lineitem"].groupBy("l_returnflag").agg(F.count("*")).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    spec = REGISTRY[args.query]
    # warmup
    spec.build(spark, args.sf_dir).toPandas()
    spark.catalog.clearCache()

    sc = spark.sparkContext
    group = f"jobprof-{args.query}"
    sc.setJobGroup(group, args.query)
    t0 = time.perf_counter()
    df = spec.build(spark, args.sf_dir)
    if args.action == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.toPandas()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)

    app_id = sc.applicationId
    url = f"http://localhost:4057/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as resp:
        jobs = json.load(resp)
    mine = [j for j in jobs if j.get("jobGroup") == group]
    mine.sort(key=lambda j: j["jobId"])
    total_ms = 0
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT")

    rows = []
    for j in mine:
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        total_ms += dur
        rows.append(
            {
                "jobId": j["jobId"],
                "sec": round(dur, 3),
                "stages": j["numCompletedStages"],
                "tasks": j["numCompletedTasks"],
                "desc": (j.get("description") or j.get("name", ""))[:160],
            }
        )
    print(json.dumps({"query": args.query, "wall_sec": round(wall, 3),
                      "n_jobs": len(mine), "sum_job_sec": round(total_ms, 3),
                      "jobs": rows}, indent=1))


if __name__ == "__main__":
    main()
