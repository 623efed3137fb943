#!/usr/bin/env python
"""Interleaved live-stream x maintenance soak (r16 — VERDICT r15 ask
#4).  Every prior artifact measured maintenance against a PAUSED
stream; this one runs them together, for real, in separate processes:

* a LIVE ``stream_unified_curation`` layout (the graded composition's
  exact state families via ``_unified_curation_layout``) ingests one
  small parquet file per micro-batch on a processing-time trigger,
  fed gradually by this harness for ``--batches`` batches;
* a separate-JVM maintenance DAEMON
  (``tools/_curation_maintain_daemon.py``) fires ``curation_maintain``
  in ``wait_ingest`` mode on a timer the whole time — real lease
  contention on the composition root: each batch holds the root lease
  for its read+write span, each maintain pass holds it for its fold;
* once, mid-run, the daemon is SIGKILLed provably MID-fold (between
  its flushed start/done markers) while ingest keeps running — the
  stale root lease must be TTL-reclaimed by the next waiting batch,
  the half-committed fold must stay invisible (versioned-fold crash
  discipline), and the restarted daemon must complete the fold;
* at checkpoints (feeding paused, stream still LIVE and its
  checkpoint open), the incremental serve is compared to the BATCH
  ``corpus_unified_curation`` over a corpus dir holding exactly the
  fed prefix — serve ≡ batch under interleaved maintenance.

Writes tools/measurements/r17_live_maintain_soak.json with per-batch
durations (median / p95 / first-vs-last-100 trend — the flatness
evidence), maintain pass log, the kill/recovery record, and the
checkpoint equality results; a failed checkpoint records both sides'
rows and a per-family column diff (r17 — self-diagnosing on
inequality).

Usage: python tools/live_maintain_soak.py [--batches 500]
           [--maintain-every 45] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEASE_TTL = "30"  # > max batch duration, small enough to recover fast


def _feed_chunk(df, src_dir: str, i: int) -> None:
    """Materialize one micro-batch source file: write a 1-part parquet
    dir, move its part file into the live source dir under a unique
    monotone name (the file-stream pick-up contract)."""
    tmp = tempfile.mkdtemp(prefix="tailsql_feed_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.rename(part, f"{src_dir}/feed-{i:05d}.parquet")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _drain(q, feed_seen: int, poll: float = 0.5, quiet_polls: int = 4) -> None:
    """Wait until the live query has consumed every fed file: its last
    progress shows no available data for ``quiet_polls`` consecutive
    polls.  The query keeps RUNNING (trigger loop stays live)."""
    quiet = 0
    while quiet < quiet_polls:
        time.sleep(poll)
        st = q.status
        lp = q.lastProgress or {}
        busy = st.get("isDataAvailable") or st.get("isTriggerActive")
        if not busy and (lp.get("numInputRows") or 0) == 0:
            quiet += 1
        else:
            quiet = 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=500)
    ap.add_argument("--maintain-every", type=float, default=45.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--checkpoints", default="0.25,0.5,0.75,1.0")
    args = ap.parse_args()

    os.environ["TAILSQL_LEASE_TTL_SEC"] = LEASE_TTL

    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.plans.streaming_exec import (
        _unified_curation_layout,
        release_family_lease,
        wait_family_lease,
    )
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_live_maintain_soak")
    spark.sparkContext.setLogLevel("ERROR")

    full_docs = load_tables(spark, args.sf)["documents"].orderBy("doc_id")
    full_schema = full_docs.schema
    full_rows = full_docs.collect()  # sf0.01 = 5k rows: driver feed plan only
    docs = full_docs.select("doc_id", "lang", "text", "n_chars")
    n_docs = len(full_rows)
    per_batch = max(1, n_docs // args.batches)
    rows = [
        (r["doc_id"], r["lang"], r["text"], r["n_chars"]) for r in full_rows
    ]
    all_tables = sorted(
        os.path.basename(p).replace(".parquet", "")
        for p in glob.glob(f"{args.sf}/*.parquet")
    )

    work = tempfile.mkdtemp(prefix="tailsql_live_soak_")
    state_root = f"{work}/state"
    src_dir = f"{work}/src"
    os.makedirs(state_root)
    os.makedirs(src_dir)

    process, roots = _unified_curation_layout(spark, docs, state_root)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{state_root}/ckpt")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    env = dict(os.environ)

    def start_daemon():
        return subprocess.Popen(
            [
                sys.executable,
                "tools/_curation_maintain_daemon.py",
                state_root,
                str(args.maintain_every),
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )

    import threading

    daemon = start_daemon()
    daemon_log: list[dict] = []
    daemon_open_pass: list[dict] = []  # starts without a done yet

    def _pump(proc):
        for line in proc.stdout:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            daemon_log.append(ev)
            if ev["ev"] == "start":
                daemon_open_pass.append(ev)
            elif ev["ev"] in ("done", "error") and daemon_open_pass:
                daemon_open_pass.pop()

    pump = threading.Thread(target=_pump, args=(daemon,), daemon=True)
    pump.start()

    checkpoints = [int(float(x) * args.batches) for x in args.checkpoints.split(",")]
    kill_at = args.batches // 2
    kill_record: dict = {}
    batch_prog: dict[int, float] = {}
    checkpoint_results: list[dict] = []

    def harvest_progress():
        for p in q.recentProgress:
            if p is None:
                continue
            bid = p.get("batchId")
            dur = (p.get("durationMs") or {}).get("triggerExecution")
            if bid is not None and dur and (p.get("numInputRows") or 0) > 0:
                batch_prog[int(bid)] = dur / 1000.0

    fed = 0
    schema = "doc_id long, lang string, text string, n_chars long"
    for b in range(args.batches):
        lo, hi = b * per_batch, (b + 1) * per_batch if b < args.batches - 1 else n_docs
        chunk = spark.createDataFrame(rows[lo:hi], schema)
        _feed_chunk(chunk, src_dir, b)
        fed = hi
        harvest_progress()
        # keep the feeder slightly ahead but bounded: wait while the
        # backlog exceeds ~8 files so batch timings reflect steady
        # state.  Committed = MAX batch id + 1, never a count: Spark
        # retains only the last ~100 commit-log entries
        # (minBatchesToRetain), so len(listing) plateaus at ~100 and a
        # count-based test spins forever past batch ~108 (found live
        # in the first 500-batch run).
        while True:
            ids = [
                int(os.path.basename(p))
                for p in glob.glob(f"{state_root}/ckpt/commits/*")
                if os.path.basename(p).isdigit()
            ]
            committed = (max(ids) + 1) if ids else 0
            if b + 1 - committed <= 8:
                break
            time.sleep(0.2)
            harvest_progress()

        if b + 1 == kill_at:
            # KILL the daemon provably mid-fold, ingest still running:
            # wait for a start marker with no matching done, then -9
            t0 = time.time()
            while not daemon_open_pass and time.time() - t0 < 300:
                time.sleep(0.05)
            mid_fold = bool(daemon_open_pass)
            daemon.send_signal(signal.SIGKILL)
            daemon.wait()
            kill_record = {
                "at_batch": b + 1,
                "mid_fold": mid_fold,
                "killed_pass": (daemon_open_pass or [{}])[-1].get("pass"),
            }
            t_kill = time.time()
            daemon_open_pass.clear()
            daemon = start_daemon()
            pump = threading.Thread(target=_pump, args=(daemon,), daemon=True)
            pump.start()
            kill_record["restart_sec"] = round(time.time() - t_kill, 2)

        if b + 1 in checkpoints:
            _drain(q, fed)
            harvest_progress()
            # consistent read: hold the root lease like ingest does
            wait_family_lease(state_root, holder="checkpoint-serve", timeout_sec=600)
            try:
                from tailsql_spark.plans.streaming_exec import (
                    _unified_curation_serve,
                )

                fed_docs = spark.read.parquet(src_dir)
                serve = sorted(
                    map(
                        tuple,
                        _unified_curation_serve(
                            spark,
                            fed_docs,
                            roots["attrs"],
                            roots["labels"],
                            roots["ph"],
                            roots["fpa"],
                            roots["fpv"],
                        ).collect(),
                    )
                )
            finally:
                release_family_lease(state_root, holder="checkpoint-serve")
            # batch twin: the graded query over a corpus dir holding
            # exactly the fed prefix (other tables borrowed verbatim)
            tmp_sf = tempfile.mkdtemp(prefix="tailsql_prefix_sf_")
            try:
                for tbl in all_tables:
                    s = f"{args.sf}/{tbl}.parquet"
                    d = f"{tmp_sf}/{tbl}.parquet"
                    if tbl == "documents":
                        spark.createDataFrame(
                            full_rows[:fed], full_schema
                        ).write.parquet(d)
                    elif os.path.isfile(s):
                        shutil.copy(s, d)
                    else:
                        shutil.copytree(s, d)
                batch = sorted(
                    map(
                        tuple,
                        REGISTRY["corpus_unified_curation"]
                        .build(spark, tmp_sf)
                        .collect(),
                    )
                )
            finally:
                shutil.rmtree(tmp_sf, ignore_errors=True)
            ck = {
                "batch": b + 1,
                "docs_fed": fed,
                "serve_eq_batch": serve == batch,
                "rows": serve,
            }
            if serve != batch:
                # r17 (VERDICT r16 ask #2): a failed checkpoint must
                # name the family and columns — record BOTH sides and
                # a per-family column diff so the artifact is the
                # diagnosis, not just the verdict
                cols = ["media_type", "n_total", "n_survivors", "n_tokens"]
                sv = {r[0]: r for r in serve}
                bt = {r[0]: r for r in batch}
                diff = {}
                for fam in sorted(set(sv) | set(bt)):
                    a, c = sv.get(fam), bt.get(fam)
                    if a != c:
                        diff[fam] = {
                            cols[i]: {"serve": a[i] if a else None,
                                      "batch": c[i] if c else None}
                            for i in range(len(cols))
                            if (a[i] if a else None) != (c[i] if c else None)
                        }
                ck["batch_rows"] = batch
                ck["family_diff"] = diff
            checkpoint_results.append(ck)
            print(
                f"# checkpoint @ batch {b + 1}: serve==batch -> {serve == batch}",
                file=sys.stderr,
            )

    _drain(q, fed)
    harvest_progress()
    q.stop()
    daemon.send_signal(signal.SIGTERM)

    durs = [batch_prog[k] for k in sorted(batch_prog)]
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else None  # noqa: E731
    p95 = lambda xs: sorted(xs)[int(len(xs) * 0.95)] if xs else None  # noqa: E731
    passes = [e for e in daemon_log if e["ev"] == "done"]
    out = {
        "batches": args.batches,
        "docs": n_docs,
        "maintain_every_sec": args.maintain_every,
        "lease_ttl_sec": float(LEASE_TTL),
        "batch_sec": {
            "n_measured": len(durs),
            "median": round(med(durs), 3) if durs else None,
            "p95": round(p95(durs), 3) if durs else None,
            "first100_median": round(med(durs[:100]), 3) if durs else None,
            "last100_median": round(med(durs[-100:]), 3) if durs else None,
        },
        "maintain_passes": {
            "n_completed": len(passes),
            "median_sec": round(med([p["sec"] for p in passes]), 2)
            if passes
            else None,
            "n_noop": sum(1 for p in passes if p.get("noop")),
            "n_error": sum(1 for e in daemon_log if e["ev"] == "error"),
            "error_samples": [
                e for e in daemon_log if e["ev"] == "error"
            ][:3],
        },
        "kill": kill_record,
        "checkpoints": checkpoint_results,
        "all_checkpoints_equal": all(
            c["serve_eq_batch"] for c in checkpoint_results
        ),
    }
    path = os.path.join(REPO, "tools", "measurements", "r17_live_maintain_soak.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
