#!/usr/bin/env python
"""Measured per-batch cost vs accumulated index size (r8).

The streaming operators' central scale claim is that per-batch cost
tracks the NEW data, not the corpus: the incremental MinHash probe
equi-joins |batch|·N_BANDS rows against the accumulated band index,
so a batch arriving at a 10× index should cost ~the same as at a 1×
index.  This tool measures exactly that:

for each seed scale (1× = sf0.1 documents, N× = the salted derived
corpus from tools/scale_curve.py):
  1. PRELOAD the accumulated index state directly from the batch
     builders under a high batch-id dir (identical bytes to what
     streamed ingestion would have accumulated — seeding cost is not
     what this measures);
  2. land one FIXED probe batch — the same docs for every scale,
     re-id'd/salted so it collides with nothing — and time the stream
     run that processes ONLY that batch against that history.

Prints one JSON line {"rows": [{"scale": "...", "seed_docs": N,
"batch_docs": M, "t_batch_sec": s}, ...]} plus a markdown table on
stderr.  Flat t_batch across scales = the claim, measured.

Usage: python tools/incremental_cost.py [--factor 10] [--runs 3]
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


def seed_and_probe(
    spark, docs_path: str, probe_df, runs: int, bucketed: bool = False
) -> dict:
    from pyspark.sql import functions as F

    from tailsql_spark.operators.dedup import (
        band_long,
        minhash_signatures,
        shingles_col,
    )
    from tailsql_spark.plans.streaming_exec import (
        _await_or_raise,
        _bucket_manifest_write,
        _mh_bucketed_seed,
        _mh_seed_state,
        _minhash_batch_processor,
        _minhash_bucketed_processor,
        _state_meta_write,
        state_bucket_count,
    )

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    n_seed = docs.count()

    best = float("inf")
    for _ in range(runs):
        root = tempfile.mkdtemp(prefix="tailsql_inccost_")
        try:
            src = f"{root}/src"
            # preload the ACCUMULATED index directly from the batch
            # builders (seed cost is not what this measures).  r10: the
            # bucketed preload lands as the DIAL's compacted base — a
            # base_v1 dir bucketed at state_bucket_count(rows) with a
            # version-1 manifest and meta pointer, byte-equivalent to
            # what decade re-buckets would have accumulated — so the
            # probe measures the two-tier layout as it would stand at
            # this index size, not the fixed-32 degenerate form
            ex = docs.select(
                "doc_id", F.explode_outer(shingles_col(F.col("text"))).alias("s")
            ).filter(F.col("s").isNotNull())
            if bucketed:
                bands_root, ex_root, out_root = _mh_bucketed_seed(docs, root)
                n_ex = ex.count()
                nb_ex = state_bucket_count(n_ex)
                ex_xb = ex.withColumn("xb", F.pmod(F.col("doc_id"), F.lit(nb_ex)))
                (
                    ex_xb.repartition(min(nb_ex, 1024), "xb")
                    .write.mode("overwrite").partitionBy("xb")
                    .parquet(f"{ex_root}/base_v1")
                )
                _bucket_manifest_write(
                    ex_xb, ex_root, "xb", bid=-1, nb=nb_ex, version=1,
                    data_dir=f"{ex_root}/base_v1", sub="base",
                )
                _state_meta_write(
                    ex_root, {"version": 1, "nb": nb_ex, "rows": n_ex}
                )
                sig = minhash_signatures(
                    spark.read.parquet(f"{ex_root}/base_v1").select("doc_id", "s")
                )
                bands = band_long(sig)
                n_bands = bands.count()
                nb_b = state_bucket_count(n_bands)
                band_bb = bands.withColumn(
                    "bb", F.pmod(F.xxhash64("band_hash"), F.lit(nb_b))
                )
                (
                    band_bb.repartition(min(nb_b, 1024), "bb")
                    .write.mode("overwrite").partitionBy("bb")
                    .parquet(f"{bands_root}/base_v1")
                )
                _bucket_manifest_write(
                    band_bb, bands_root, "bb", bid=-1, nb=nb_b, version=1,
                    data_dir=f"{bands_root}/base_v1", sub="base",
                )
                _state_meta_write(
                    bands_root, {"version": 1, "nb": nb_b, "rows": n_bands}
                )
                print(
                    f"#   dial: ex {n_ex} rows -> {nb_ex} buckets, "
                    f"bands {n_bands} rows -> {nb_b} buckets",
                    file=sys.stderr,
                )
                process = _minhash_bucketed_processor(
                    bands_root, ex_root, out_root
                )
            else:
                ex_root, sig_root, out_root = _mh_seed_state(docs, root)
                ex.write.mode("overwrite").parquet(f"{ex_root}/b99999")
                minhash_signatures(
                    spark.read.parquet(f"{ex_root}/b99999")
                ).write.mode("overwrite").parquet(f"{sig_root}/b99999")
                process = _minhash_batch_processor(ex_root, sig_root, out_root)
            probe_df.coalesce(1).write.mode("append").parquet(src)
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", "4")
                .parquet(src)
            )
            t0 = time.perf_counter()
            q = (
                stream.writeStream.foreachBatch(process)
                .option("checkpointLocation", f"{root}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            try:
                _await_or_raise(q, "inccost")
            finally:
                q.stop()
            best = min(best, time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return {"seed_docs": n_seed, "t_batch_sec": round(best, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--bucketed", action="store_true")
    # r10: probe-size sweep — the dial's claim is that the pruned read
    # tracks the BATCH (touched buckets ~ batch keys), so a smaller
    # probe against the same huge index must cost proportionally less;
    # the fixed-bucket layout reads the same history either way
    ap.add_argument("--probe-docs", type=int, default=0,
                    help="limit the probe batch to N docs (0 = all ~500)")
    args = ap.parse_args()

    src_1x = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from tailsql_spark.session import get_spark
    from tools.scale_curve import build_scaled_corpus

    spark = get_spark(app_name="tailsql_incremental_cost")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_scaled_corpus(spark, src_1x, args.factor)

    # the fixed probe batch: sf0.001 docs, ids offset far above any
    # corpus and every token salted '~p' so it collides with nothing —
    # identical content for every seed scale
    probe = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(split(text, ' '), w -> concat(w, '~p')))"
            ).alias("text"),
        )
    )
    if args.probe_docs:
        probe = probe.orderBy("doc_id").limit(args.probe_docs)
    n_probe = probe.count()

    rows = []
    for label, path in (
        ("1x", f"{src_1x}/documents.parquet"),
        (f"{args.factor}x", f"{dest}/documents.parquet"),
    ):
        r = seed_and_probe(spark, path, probe, args.runs, bucketed=args.bucketed)
        r.update({"scale": label, "batch_docs": n_probe})
        rows.append(r)
        print(f"# {label}: seed={r['seed_docs']} docs, "
              f"probe batch {n_probe} docs → {r['t_batch_sec']} s",
              file=sys.stderr)

    print(json.dumps({"factor": args.factor, "runs": args.runs,
                      "bucketed": args.bucketed, "probe_docs": n_probe,
                      "rows": rows}))
    print("\n| seed corpus | seed docs | probe-batch sec |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['scale']} | {r['seed_docs']} | {r['t_batch_sec']} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
