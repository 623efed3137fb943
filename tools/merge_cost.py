#!/usr/bin/env python
"""Measured MERGE cost: partition-pruned rewrite vs rewrite-the-world.

sink_merge_upsert's scale claim is that an incremental-crawl MERGE
costs the DELTA's touched partitions, not the table.  This tool
measures exactly that on the derived N× corpus (tools/scale_curve.py):
a fixed update delta touching ONE of the 16 partitions is applied to
the same base table two ways —

  merge   : connectors.merge_apply (partition-pruned read + dynamic
            overwrite of the touched partition only)
  rewrite : the same full-outer merge computed over the WHOLE table
            and written back with a full static overwrite (the
            rewrite-the-world baseline MERGE exists to avoid)

and reports wall seconds + the ratio.  Expected: merge ≈ touched
fraction of rewrite, diverging further as the table grows.

Usage: python tools/merge_cost.py [--factor 100] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_and_delta(spark, docs_path: str):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(docs_path)
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 16).alias("part"),
        F.col("n_chars").alias("content"),
        F.lit(1).cast("int").alias("version"),
    )
    # updates only, confined to part 1 (doc_id % 64 == 17 → % 16 == 1)
    delta = docs.filter(F.col("doc_id") % 64 == 17).select(
        "doc_id",
        (F.col("doc_id") % 16).alias("part"),
        (F.col("n_chars") + 1000).alias("content"),
        F.lit(2).cast("int").alias("version"),
        F.lit("U").alias("op"),
    )
    return base, delta


def measure(spark, docs_path: str, runs: int) -> dict:
    from pyspark.sql import functions as F

    from tailsql_spark.plans.connectors import merge_apply

    base, delta = base_and_delta(spark, docs_path)
    n_rows = base.count()

    t_merge = t_rewrite = float("inf")
    for _ in range(runs):
        root = tempfile.mkdtemp(prefix="tailsql_mergecost_")
        try:
            path = f"{root}/table"
            base.write.partitionBy("part").parquet(path)

            t0 = time.perf_counter()
            touched = merge_apply(spark, path, delta)
            t_merge = min(t_merge, time.perf_counter() - t0)
            assert touched == [1], touched

            # rewrite-the-world baseline: same merge rule, whole table
            base.write.mode("overwrite").partitionBy("part").parquet(path)
            t0 = time.perf_counter()
            b = spark.read.parquet(path).alias("b")
            d = delta.alias("d")
            merged = (
                b.join(d, F.col("b.doc_id") == F.col("d.doc_id"), "full_outer")
                .filter(F.col("d.op").isNull() | (F.col("d.op") != "D"))
                .select(
                    F.coalesce(F.col("d.doc_id"), F.col("b.doc_id")).alias("doc_id"),
                    F.coalesce(F.col("d.content"), F.col("b.content")).alias("content"),
                    F.coalesce(F.col("d.version"), F.col("b.version")).alias("version"),
                    F.coalesce(F.col("d.part"), F.col("b.part")).alias("part"),
                ).persist()
            )
            merged.count()
            merged.write.mode("overwrite").partitionBy("part").parquet(f"{root}/out")
            merged.unpersist()
            t_rewrite = min(t_rewrite, time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return {
        "table_rows": n_rows,
        "t_merge_sec": round(t_merge, 3),
        "t_rewrite_sec": round(t_rewrite, 3),
        "rewrite_over_merge": round(t_rewrite / t_merge, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tailsql_spark.session import get_spark
    from tools.scale_curve import build_scaled_corpus

    spark = get_spark(app_name="tailsql_merge_cost")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_scaled_corpus(spark, src, args.factor)

    rows = []
    for label, path in (
        ("1x", f"{src}/documents.parquet"),
        (f"{args.factor}x", f"{dest}/documents.parquet"),
    ):
        r = measure(spark, path, args.runs)
        r["scale"] = label
        rows.append(r)
        print(f"# {label}: {r}", file=sys.stderr)
    print(json.dumps({"factor": args.factor, "runs": args.runs, "rows": rows}))


if __name__ == "__main__":
    main()
