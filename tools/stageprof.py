#!/usr/bin/env python
"""Stage-level attribution for one registry query (guide §1/§7): runs
it once with the UI enabled and dumps the slowest stages (task count,
executor run time, name) via the UI REST API.

Usage: python tools/stageprof.py <query> [--top 25]
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
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    spark = get_spark(
        app_name="tailsql_stageprof",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4058"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tailsql_spark.plans.catalog import load_tables

    tables = load_tables(spark, args.sf_dir)
    tables["lineitem"].groupBy("l_returnflag").agg(F.count("*")).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    spec = REGISTRY[args.query]
    spec.build(spark, args.sf_dir).toPandas()   # warmup
    spark.catalog.clearCache()

    sc = spark.sparkContext
    app_id = sc.applicationId

    def stages():
        url = f"http://localhost:4058/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as resp:
            return json.load(resp)

    seen = {s["stageId"] for s in stages()}
    t0 = time.perf_counter()
    spec.build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    new = [s for s in stages() if s["stageId"] not in seen]
    rows = []
    for s in new:
        from datetime import datetime

        def ts(x):
            return datetime.strptime(x, "%Y-%m-%dT%H:%M:%S.%fGMT")

        dur = (ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])).total_seconds()
        rows.append(
            {
                "stage": s["stageId"],
                "wall_sec": round(dur, 3),
                "run_ms": s["executorRunTime"],
                "tasks": s["numCompleteTasks"],
                "in_rec": s["inputRecords"],
                "sh_read_rec": s["shuffleReadRecords"],
                "name": s["name"][:90],
            }
        )
    rows.sort(key=lambda r: -r["wall_sec"])
    print(json.dumps({"query": args.query, "wall_sec": round(wall, 3),
                      "n_stages": len(rows), "stages": rows[: args.top]}, indent=1))


if __name__ == "__main__":
    main()
