#!/usr/bin/env python
"""State growth of the additive-partial sketch/counter logs over many
batches, with and without `sketch_maintain` (r15 — VERDICT r14 ask #1).

The claim under measurement: without a fold, a partial log's live file
count — and the read-time merge's planning cost — grows linearly with
batch count (the partials themselves are bounded; the FILE count is
not).  With `sketch_maintain` cron'd every N batches, live state is
bounded (one base + ≤ N per-batch dirs) and the read-time merge stays
flat however many batches arrive.

Drives `_kmv_batch_processor` (the K-min family — the one whose merge
is a genuine sketch algebra, not a plain sum) directly for --batches
micro-batches of unique synthetic users across a rotating day set, in
TWO modes over the same inputs:

  unmaintained: never folded — the r14 status quo;
  maintained:   `sketch_maintain` every --maintain-every batches.

Samples every --sample batches: live parquet file count, per-batch
processor time, and the READ cost (full K-min merge + collect of the
served day sketch).  Prints ONE JSON line; markdown table on stderr.

Usage:
    python tools/sketch_growth.py [--batches 1000] [--users-per-batch 200]
                                  [--sample 100] [--maintain-every 100]
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


def _live_stats(root: str) -> dict:
    files = 0
    for _dirpath, _dirs, names in os.walk(root):
        files += sum(1 for n in names if n.endswith(".parquet"))
    deltas = [d for d in os.listdir(root) if d.startswith("b") and d[1:].isdigit()]
    return {"files": files, "delta_dirs": len(deltas)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=1000)
    ap.add_argument("--users-per-batch", type=int, default=200)
    ap.add_argument("--sample", type=int, default=100)
    ap.add_argument("--maintain-every", type=int, default=100)
    args = ap.parse_args()

    from tailsql_spark.plans.streaming_exec import (
        _kmv_batch_processor,
        _partial_log_df,
        sketch_maintain,
    )
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_sketch_growth")
    spark.sparkContext.setLogLevel("ERROR")

    def batch_frame(i: int):
        # unique users per batch across a rotating 8-day window: the
        # per-day sketches keep genuinely updating, nothing collides
        base = i * 10**6
        day = f"2024-01-{(i % 8) + 1:02d}"
        return spark.createDataFrame(
            [(day + " 12:00:00", base + u) for u in range(args.users_per_batch)],
            "ts string, user_id long",
        ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id")

    def run(mode: str, maintain_every: int) -> dict:
        root = tempfile.mkdtemp(prefix=f"tailsql_sketch_growth_{mode}_")
        sk_root = f"{root}/sk"
        rows = []
        try:
            spark.createDataFrame([], "day string, h long").write.mode(
                "overwrite"
            ).parquet(f"{sk_root}/seed")
            process = _kmv_batch_processor(sk_root)
            for i in range(args.batches):
                t0 = time.perf_counter()
                process(batch_frame(i), i)
                dt = time.perf_counter() - t0
                if maintain_every and i > 0 and i % maintain_every == 0:
                    sketch_maintain(spark, sk_root, "kmv")
                if i % args.sample == 0 or i == args.batches - 1:
                    t1 = time.perf_counter()
                    served = _partial_log_df(spark, sk_root, "kmv").count()
                    t_read = time.perf_counter() - t1
                    s = _live_stats(sk_root)
                    s.update(
                        batch=i,
                        t_batch_sec=round(dt, 3),
                        t_read_sec=round(t_read, 3),
                        served_rows=served,
                    )
                    rows.append(s)
                    print(
                        f"# [{mode}] batch {i}: proc {dt:.2f}s read {t_read:.2f}s "
                        f"files={s['files']} deltas={s['delta_dirs']}",
                        file=sys.stderr,
                    )
            rep = sketch_maintain(spark, sk_root, "kmv")
            final = _live_stats(sk_root)
            t1 = time.perf_counter()
            served = _partial_log_df(spark, sk_root, "kmv").count()
            t_read = time.perf_counter() - t1
            return {
                "mode": mode,
                "maintain_every": maintain_every,
                "rows": rows,
                "final_maintain": rep,
                "post_maintain": {
                    **final,
                    "t_read_sec": round(t_read, 3),
                    "served_rows": served,
                },
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    maintained = run("maintained", args.maintain_every)
    unmaintained = run("unmaintained", 0)
    out = {
        "batches": args.batches,
        "users_per_batch": args.users_per_batch,
        "family": "kmv",
        "maintained": maintained,
        "unmaintained": unmaintained,
    }
    print(json.dumps(out))
    for res in (unmaintained, maintained):
        print(f"\n## {res['mode']}", file=sys.stderr)
        print("| batch | proc s | read s | files | delta dirs |", file=sys.stderr)
        print("|---|---|---|---|---|", file=sys.stderr)
        for r in res["rows"]:
            print(
                f"| {r['batch']} | {r['t_batch_sec']} | {r['t_read_sec']} "
                f"| {r['files']} | {r['delta_dirs']} |",
                file=sys.stderr,
            )
        pm = res["post_maintain"]
        print(
            f"| post-maintain | - | {pm['t_read_sec']} | {pm['files']} "
            f"| {pm['delta_dirs']} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
