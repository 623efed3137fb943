#!/usr/bin/env python
"""Measured ingest throughput for the planner-partitioned ``tailn``
source (r14 — the thousand-service-logs claim, in numbers).

`sources/tail.py`'s TailNStreamReader is pytest-certified for
exactly-once line delivery, checkpoint resume, byte-cap backpressure,
range splitting, and rotation; this tool records what the design is
FOR — wall-clock ingest rate over a fleet of real log files — in two
configurations:

* **backfill**: ``seek_to_end=false`` with no byte cap — the planner
  stats every file once, every file becomes one (or, past
  SPLIT_BYTES, several) executor-read partitions, and availableNow
  drains the fleet in a handful of micro-batches.  The measured MB/s
  is the source's sustained scan rate.
* **capped**: ``max_bytes_per_batch`` forces many micro-batches (the
  steady-state tail shape where ingest must not swallow a burst in
  one batch).  Measures per-batch overhead amortization: rows/s at a
  bounded batch size, plus the batch count actually taken.

Both configurations assert EXACT line-count delivery — the throughput
claim is only meaningful if nothing was lost or doubled under it.

Usage: python tools/tailn_throughput.py [--files 200] [--lines 2000000] [--cap-kb 256]
Writes one JSON line to stdout; paste into SCALING.md.
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


def _stage_logs(spark, root: str, n_files: int, n_lines: int) -> tuple[str, int]:
    """N real text files of deterministic synthetic log lines; returns
    (glob_dir, total_bytes)."""
    from pyspark.sql import functions as F

    lines = (
        spark.range(n_lines)
        .select(
            F.concat(
                F.lit("2026-08-16T03:"),
                F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                F.lit(":00Z svc-"),
                (F.col("id") % 97).cast("string"),
                F.lit(" GET /api/v1/resource/"),
                F.col("id").cast("string"),
                F.lit(" status=200 bytes="),
                ((F.col("id") * 37) % 9973).cast("string"),
            ).alias("value")
        )
    )
    staged = f"{root}/logs"
    lines.repartition(n_files).write.mode("overwrite").text(staged)
    total = sum(
        os.path.getsize(os.path.join(staged, f))
        for f in os.listdir(staged)
        if f.startswith("part-")
    )
    return staged, total


def _drain(
    spark, staged: str, ckpt: str, cap: int | None, expect: int | None = None
) -> tuple[int, int, float]:
    """Drain the staged fleet; returns (rows, n_batches, wall_sec).

    Uncapped: availableNow (the wrapper captures one full-fleet plan —
    the backfill shape).  Capped: a live processingTime trigger,
    stopped once ``expect`` rows arrive — Spark wraps plain
    MicroBatchStream sources' availableNow in a single captured plan,
    so the per-batch cap is only observable under a live trigger (one
    latestOffset per real micro-batch; this is also the steady-state
    tail shape the cap exists for)."""
    from tailsql_spark.sources.tail import TailNDataSource

    spark.dataSource.register(TailNDataSource)
    reader = (
        spark.readStream.format("tailn")
        .option("paths", f"{staged}/part-*")
        .option("seek_to_end", "false")
    )
    if cap is not None:
        reader = reader.option("max_bytes_per_batch", str(cap))
    counts: list[int] = []

    def count_batch(df, bid):
        counts.append(df.count())

    t0 = time.perf_counter()
    w = reader.load().writeStream.foreachBatch(count_batch).option(
        "checkpointLocation", ckpt
    )
    if cap is None:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.trigger(processingTime="0 seconds").start()
        while sum(counts) < (expect or 0) and time.perf_counter() - t0 < 570:
            time.sleep(0.2)
        q.stop()
    wall = time.perf_counter() - t0
    return sum(counts), len(counts), wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=200)
    ap.add_argument("--lines", type=int, default=2_000_000)
    ap.add_argument("--cap-kb", type=int, default=256)
    args = ap.parse_args()

    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailn_throughput")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tailsql_tailn_bench_")
    try:
        staged, total_bytes = _stage_logs(spark, root, args.files, args.lines)
        mb = total_bytes / (1 << 20)

        # warmup drain (uncounted): Python-datasource worker startup +
        # OS page cache, so the two measured configurations compare
        # fairly instead of the first paying the cold-start bill
        _drain(spark, staged, f"{root}/ck_w", None)

        rows_b, batches_b, wall_b = _drain(spark, staged, f"{root}/ck_b", None)
        assert rows_b == args.lines, (rows_b, args.lines)

        cap = args.cap_kb << 10
        rows_c, batches_c, wall_c = _drain(spark, staged, f"{root}/ck_c", cap, expect=args.lines)
        assert rows_c == args.lines, (rows_c, args.lines)

        print(
            json.dumps(
                {
                    "files": args.files,
                    "lines": args.lines,
                    "mb": round(mb, 1),
                    "backfill": {
                        "wall_sec": round(wall_b, 2),
                        "batches": batches_b,
                        "mb_per_sec": round(mb / wall_b, 1),
                        "lines_per_sec": int(args.lines / wall_b),
                    },
                    "capped": {
                        "cap_kb_per_file_per_batch": args.cap_kb,
                        "wall_sec": round(wall_c, 2),
                        "batches": batches_c,
                        "mb_per_sec": round(mb / wall_c, 1),
                        "lines_per_sec": int(args.lines / wall_c),
                    },
                    "exactly_once": True,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
