#!/usr/bin/env python
"""Long-lived curation-maintenance daemon for the live-interleaving
soak (r16): loops ``curation_maintain`` in ``wait_ingest`` mode on a
fixed interval against a state root a LIVE ``stream_unified_curation``
is concurrently writing, printing one JSON line per pass (flushed, so
the soak harness can kill -9 this process provably MID-fold: between a
``start`` line and its ``done`` line).

Usage: python tools/_curation_maintain_daemon.py STATE_ROOT INTERVAL_SEC
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    state_root, interval = sys.argv[1], float(sys.argv[2])
    from tailsql_spark.plans.streaming_exec import curation_maintain
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_curation_maintain_daemon")
    spark.sparkContext.setLogLevel("ERROR")
    n = 0
    while True:
        n += 1
        print(json.dumps({"ev": "start", "pass": n, "ts": time.time()}), flush=True)
        t0 = time.perf_counter()
        try:
            report = curation_maintain(spark, state_root, wait_ingest_sec=600.0)
        except Exception as e:  # noqa: BLE001 — cron semantics: log, retry next tick
            # e.g. a prior kill -9's family lease is still inside its
            # TTL: this pass fails loudly, the NEXT tick reclaims it
            print(
                json.dumps(
                    {
                        "ev": "error",
                        "pass": n,
                        "sec": round(time.perf_counter() - t0, 2),
                        "err": repr(e)[:200],
                        "ts": time.time(),
                    }
                ),
                flush=True,
            )
            time.sleep(interval)
            continue
        print(
            json.dumps(
                {
                    "ev": "done",
                    "pass": n,
                    "sec": round(time.perf_counter() - t0, 2),
                    "noop": report.get("noop"),
                    "ts": time.time(),
                }
            ),
            flush=True,
        )
        time.sleep(interval)


if __name__ == "__main__":
    main()
