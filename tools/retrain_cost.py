#!/usr/bin/env python
"""Measured re-train bill for the incremental IVF serving index (r14).

``ivf_retrain_quantizer`` is the rebuild-by-design response the
``ivf_cell_imbalance`` drift gate schedules; this tool converts its
cost story into measured wall seconds, the same way scale_curve.py did
for the serving probes:

* **1× vs N× wall time** of a full 3-iteration re-train over a real
  incremental state (the corpus scaled by scale_curve's deterministic
  salted self-union).  Pre-cap the dial keeps |C| ∝ |V|, so each
  Lloyd iteration's |V|×|C| assignment grows ~quadratically — the
  expected super-linear ratio is the point of the measurement, and the
  reason the gate (not a cron period) schedules re-trains.
* **the post-cap budget effect**: past IVF_CELL_MAX (any actual 100 TB
  embedding corpus) occupancy outgrows IVF_TRAIN_PER_CELL and the
  mean-update iterations ride the hash-sample, leaving one full
  |V|×|C| pass.  That regime is simulated at N× by shrinking the
  budget below the dial occupancy (the same arithmetic production
  hits past the cap) and re-timing — the saving is the two training
  iterations' share of the bill.
* **serve flat across the re-train**: the 2-probe indexed serve is
  timed before/after, over the committed manifests.

Usage: python tools/retrain_cost.py [--factor 10] [--runs 2]
Writes JSON to stdout; paste the table into SCALING.md.
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

from tools.scale_curve import build_scaled_corpus  # noqa: E402


def _stage_state(spark, sf_dir: str, root: str):
    """Healthy staged quantizer + one ingested batch — the state shape
    every incremental-IVF row builds before its first maintenance."""
    from pyspark.sql import functions as F

    import tailsql_spark.plans.streaming_exec as SE
    from tailsql_spark.operators.similarity import (
        as_double,
        ivf_cell_count,
        norm,
    )
    from tailsql_spark.plans.catalog import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    embd = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    nc = ivf_cell_count(embd.count())
    seeds_path = f"{root}/seeds"
    embd.filter(F.col("vec_id") < nc).select("vec_id", "v", "nrm").write.mode(
        "overwrite"
    ).parquet(seeds_path)
    cells = f"{root}/cells"
    spark.createDataFrame(
        [], "vec_id long, v array<double>, nrm double, ccell long"
    ).write.mode("overwrite").parquet(f"{cells}/seed")
    SE._bucket_manifest_seed(spark.createDataFrame([], "x long"), cells)
    SE._ivf_index_processor(cells, seeds_path)(emb, 0)
    return cells, seeds_path, int(nc)


def _time_retrain(spark, sf_dir: str, runs: int, budget: int | None) -> dict:
    import tailsql_spark.plans.streaming_exec as SE
    from tailsql_spark.operators.similarity import N_QUERIES_IDX

    saved = SE.IVF_TRAIN_PER_CELL
    if budget is not None:
        SE.IVF_TRAIN_PER_CELL = budget
    try:
        best = float("inf")
        serve = float("inf")
        nc = 0
        for _ in range(runs):
            root = tempfile.mkdtemp(prefix="tailsql_retrain_cost_")
            try:
                cells, seeds_path, nc = _stage_state(spark, sf_dir, root)
                t0 = time.perf_counter()
                SE.ivf_retrain_quantizer(spark, cells, seeds_path, n_iters=3)
                best = min(best, time.perf_counter() - t0)
                t0 = time.perf_counter()
                SE._ivf_index_serve(
                    spark, sf_dir, cells, seeds_path, N_QUERIES_IDX, n_probes=2
                ).toPandas()
                serve = min(serve, time.perf_counter() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        return {
            "retrain_sec": round(best, 3),
            "serve_after_sec": round(serve, 3),
            "n_cells": nc,
        }
    finally:
        SE.IVF_TRAIN_PER_CELL = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_retrain_cost")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_scaled_corpus(spark, src, args.factor)

    r1 = _time_retrain(spark, src, args.runs, budget=None)
    rn = _time_retrain(spark, dest, args.runs, budget=None)
    # post-cap regime at N×: occupancy > budget, training iterations
    # ride the hash-sample (production hits this past IVF_CELL_MAX)
    rn_capped = _time_retrain(spark, dest, args.runs, budget=8)

    out = {
        "factor": args.factor,
        "runs": args.runs,
        "t_1x": r1,
        f"t_{args.factor}x_full": rn,
        f"t_{args.factor}x_budget8": rn_capped,
        "retrain_ratio_full": round(rn["retrain_sec"] / r1["retrain_sec"], 2),
        "budget_saving": round(
            1 - rn_capped["retrain_sec"] / rn["retrain_sec"], 3
        ),
        "serve_ratio": round(
            rn["serve_after_sec"] / r1["serve_after_sec"], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
