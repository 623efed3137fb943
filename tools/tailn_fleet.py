#!/usr/bin/env python
"""Driver-side PLANNING cost of the ``tailn`` fleet source, isolated
from ingest (r15 — VERDICT r14 ask #4).

`tools/tailn_throughput.py` measures end-to-end ingest; this tool
times `latestOffset` ITSELF — the per-trigger driver loop that stats
every globbed file — across fleet sizes, in the three shapes a
thousand-service deployment alternates between:

* **first plan**: every file new (backfill discovery — stat + prefix
  probe + line-alignment backscan per file);
* **steady state**: nothing grew since the last trigger — the shape a
  quiet fleet presents at every trigger, and the one the r15
  unchanged fast path targets (stat + 64-byte prefix probe only; the
  ≤64 KiB backscan is skipped because the previous plan's end is
  provably still correct);
* **1% growth**: a realistic trigger where a few services appended —
  unchanged files take the fast path, grown ones pay alignment.

No Spark session: the reader is driven directly (it is plain driver
Python), so the numbers are the planning loop and nothing else.
Writes tools/measurements/r16_tailn_fleet.json.

Usage: python tools/tailn_fleet.py [--fleets 1000,3000,10000]
                                   [--lines-per-file 50] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage(root: str, n_files: int, lines_per_file: int) -> str:
    d = os.path.join(root, f"fleet{n_files}")
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        with open(os.path.join(d, f"svc-{i:05d}.log"), "w") as fh:
            for j in range(lines_per_file):
                fh.write(f"2026-08-16T04:00:{j % 60:02d}Z svc-{i} evt-{j}\n")
    return d


def _time_plans(reader, reps: int) -> list[float]:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        reader.latestOffset()
        ts.append(time.perf_counter() - t0)
    return ts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleets", default="1000,10000,100000")
    ap.add_argument("--lines-per-file", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    fleets = [int(x) for x in args.fleets.split(",")]

    from tailsql_spark.sources.tail import TailNStreamReader

    root = tempfile.mkdtemp(prefix="tailsql_tailn_fleet_")
    rows = []
    try:
        for n in fleets:
            d = _stage(root, n, args.lines_per_file)
            r = TailNStreamReader(
                f"{d}/svc-*.log", seek_to_end=False,
                max_bytes_per_batch=1 << 20,
            )
            t0 = time.perf_counter()
            first = r.latestOffset()
            t_first = time.perf_counter() - t0
            assert len(first) == n
            # steady state: nothing changed since the last plan
            steady = _time_plans(r, args.reps)
            plan2 = r.latestOffset()
            assert plan2 == first, "steady-state plan must be byte-identical"
            # 1% growth: append to every 100th file
            grown = 0
            for i in range(0, n, 100):
                with open(os.path.join(d, f"svc-{i:05d}.log"), "a") as fh:
                    fh.write("2026-08-16T05:00:00Z late event\n")
                grown += 1
            t0 = time.perf_counter()
            plan3 = r.latestOffset()
            t_growth = time.perf_counter() - t0
            changed = sum(1 for p in plan3 if plan3[p] != first[p])
            assert changed == grown, (changed, grown)
            row = {
                "files": n,
                "first_plan_sec": round(t_first, 3),
                "steady_plan_sec_median": round(statistics.median(steady), 4),
                "steady_plan_sec_max": round(max(steady), 4),
                "steady_us_per_file": round(
                    statistics.median(steady) / n * 1e6, 1
                ),
                "growth1pct_plan_sec": round(t_growth, 3),
                "grown_files": grown,
            }
            rows.append(row)
            print(f"# {row}", file=sys.stderr)
            shutil.rmtree(d, ignore_errors=True)
        out = {
            "lines_per_file": args.lines_per_file,
            "reps": args.reps,
            "fleets": rows,
        }
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "measurements", "r16_tailn_fleet.json",
        )
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
