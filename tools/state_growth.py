#!/usr/bin/env python
"""Live-file growth of the incremental SERVING indexes over many
batches (r13 — VERDICT r11 #4 / r12 #7).

The claim under measurement: with the dial's decade folds PLUS the r13
minor fold, a state family's LIVE file count is bounded — base files +
at most MINOR_FOLD_MAX_DELTAS delta tiers — no matter how many batches
a decade spans, and per-batch processor time stays flat.  Without the
minor fold, files grow linearly with batch count and the manifest read
(and any listing-based consumer) degrades with them.

Drives `_bm25_index_processor` (the term-bucketed serving index — the
family with BOTH fold kinds) directly for --batches micro-batches of
--docs-per-batch salted docs each (unique ids/tokens per batch, so
state genuinely grows), sampling every --sample batches:

  {"batch": i, "t_batch_sec": s, "files": live parquet files under the
   post family, "delta_dirs": live per-batch dirs, "version": manifest
   version, "nb": bucket count}

After the loop, runs `expire_state_versions` (the offline vacuum the
discipline prescribes) and records the post-vacuum file count, then
re-serves and asserts the probe still answers.  Prints ONE JSON line;
markdown table on stderr.

Usage:
    python tools/state_growth.py [--batches 1000] [--docs-per-batch 50]
                                 [--sample 50] [--vacuum-every 0]
`--vacuum-every N` > 0 additionally vacuums during the run every N
batches — the scheduled-compaction operating mode; file counts then
show the bounded sawtooth rather than fold-point cliffs.
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


def _live_stats(post_root: str) -> dict:
    files = 0
    for dirpath, _dirs, names in os.walk(post_root):
        files += sum(1 for n in names if n.endswith(".parquet"))
    deltas = [
        d for d in os.listdir(post_root) if d.startswith("b") and d[1:].isdigit()
    ]
    return {"files": files, "delta_dirs": len(deltas)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=1000)
    ap.add_argument("--docs-per-batch", type=int, default=50)
    ap.add_argument("--sample", type=int, default=50)
    ap.add_argument("--vacuum-every", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tailsql_spark.plans.streaming_exec import (
        _bm25_index_processor,
        _bm25_index_seed,
        _bm25_index_serve,
        _state_meta_read,
        expire_state_versions,
    )
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_state_growth")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(args.docs_per_batch)
        .collect()
    )

    root = tempfile.mkdtemp(prefix="tailsql_state_growth_")
    rows = []
    try:
        post_root, stat_root, _del = _bm25_index_seed(spark, root)
        process = _bm25_index_processor(post_root, stat_root)
        for i in range(args.batches):
            # unique ids + per-batch token salt: every batch is genuinely
            # NEW corpus (state grows), nothing collides
            batch = spark.createDataFrame(
                [
                    (r.doc_id + i * 10**7, " ".join(f"{w}~{i}" for w in r.text.split(" ")))
                    for r in base_docs
                ],
                "doc_id long, text string",
            )
            t0 = time.perf_counter()
            process(batch, i)
            dt = time.perf_counter() - t0
            if args.vacuum_every and i > 0 and i % args.vacuum_every == 0:
                expire_state_versions(spark, post_root)
            if i % args.sample == 0 or i == args.batches - 1:
                meta = _state_meta_read(post_root)
                s = _live_stats(post_root)
                s.update(
                    {
                        "batch": i,
                        "t_batch_sec": round(dt, 3),
                        "version": int(meta["version"]),
                        "nb": int(meta["nb"]),
                    }
                )
                rows.append(s)
                print(
                    f"# batch {i}: {dt:.2f}s files={s['files']} "
                    f"deltas={s['delta_dirs']} v{s['version']} nb={s['nb']}",
                    file=sys.stderr,
                )
        expire_state_versions(spark, post_root)
        final = _live_stats(post_root)
        served = _bm25_index_serve(spark, post_root, stat_root).count()
        out = {
            "batches": args.batches,
            "docs_per_batch": args.docs_per_batch,
            "vacuum_every": args.vacuum_every,
            "rows": rows,
            "post_vacuum": final,
            "served_rows": served,
        }
        print(json.dumps(out))
        print("\n| batch | sec | files | delta dirs | version | nb |", file=sys.stderr)
        print("|---|---|---|---|---|---|", file=sys.stderr)
        for r in rows:
            print(
                f"| {r['batch']} | {r['t_batch_sec']} | {r['files']} "
                f"| {r['delta_dirs']} | {r['version']} | {r['nb']} |",
                file=sys.stderr,
            )
        print(
            f"| post-vacuum | - | {final['files']} | {final['delta_dirs']} | - | - |",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
