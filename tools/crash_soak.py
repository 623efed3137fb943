#!/usr/bin/env python
"""Crash-injection soak for the maintenance entry points (r15 —
VERDICT r14 ask #6).

The state-machine property tests simulate torn commits; this soak does
it at the CLI level, end-to-end: for each maintain kind it builds the
SAME state twice from the same deterministic inputs, runs one root's
``python -m tailsql_spark.cli maintain ...`` to completion (the
baseline), kill -9s the other root's run at a random point inside the
work window, restarts it, and asserts:

  * the restart completes (the dead holder's lease is reclaimed via
    the TTL path — the soak runs the subprocesses with
    TAILSQL_LEASE_TTL_SEC=2 and waits past it, standing in for an
    orchestrator that knows its child is dead);
  * the recovered root's SERVE output is value-identical to the
    uninterrupted root's (sorted full-row comparison — the
    crash-window guarantee every versioned fold claims).

Kinds covered: bm25 (postings fold + tombstone purge), curation (the
six-family composition), sketch (the r15 partial-log fold), ivf
(purge → drift gate → re-train → recall re-cert).

Writes tools/measurements/r15_crash_soak.json.

Usage: python tools/crash_soak.py [--kinds bm25,curation,sketch,ivf]
                                  [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
LEASE_TTL = "2"


def _cli_env() -> dict:
    env = dict(os.environ)
    env["TAILSQL_LEASE_TTL_SEC"] = LEASE_TTL
    return env


def _run_cli(args: list[str]) -> float:
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "tailsql_spark.cli", "maintain", *args],
        check=True,
        cwd=REPO,
        env=_cli_env(),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    return time.perf_counter() - t0


def _kill_cli_at(args: list[str], kill_at: float) -> bool:
    """Start the maintain CLI, SIGKILL it at ``kill_at`` seconds.
    Returns True when the kill landed while the process was alive
    (a real mid-run crash), False when it had already finished."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "tailsql_spark.cli", "maintain", *args],
        cwd=REPO,
        env=_cli_env(),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        proc.wait(timeout=kill_at)
        return False  # finished before the crash point
    except subprocess.TimeoutExpired:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return True


def _rows(df) -> list:
    return sorted(map(tuple, df.collect()))


# --------------------------------------------------------------------------
# per-kind builders: (build(root) -> cli_args, serve(root) -> rows)
# --------------------------------------------------------------------------


def build_bm25(spark, root: str) -> list[str]:
    from pyspark.sql import functions as F

    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.streaming_exec import (
        BM25_TAKEDOWN_MOD,
        BM25_TAKEDOWN_RESIDUE,
        _bm25_index_processor,
        _bm25_index_seed,
    )

    docs = load_tables(spark, SF_ORACLE)["documents"].select("doc_id", "text")
    is_del = F.col("doc_id") % BM25_TAKEDOWN_MOD == BM25_TAKEDOWN_RESIDUE
    post_root, stat_root, del_root = _bm25_index_seed(spark, root)
    process = _bm25_index_processor(post_root, stat_root, del_root)
    process(docs.filter(F.col("doc_id") % 2 == 0).withColumn("op", F.lit("I")), 0)
    process(docs.filter(F.col("doc_id") % 2 == 1).withColumn("op", F.lit("I")), 1)
    process(docs.filter(is_del).withColumn("op", F.lit("D")), 2)
    return ["bm25", "--state-root", post_root, "--del-root", del_root]


def serve_bm25(spark, root: str) -> list:
    from tailsql_spark.plans.streaming_exec import _bm25_index_serve

    return _rows(
        _bm25_index_serve(spark, f"{root}/post", f"{root}/stat", f"{root}/del")
    )


def build_sketch(spark, root: str) -> list[str]:
    from tailsql_spark.plans.streaming_exec import _kmv_batch_processor

    sk_root = f"{root}/sk"
    spark.createDataFrame([], "day string, h long").write.mode(
        "overwrite"
    ).parquet(f"{sk_root}/seed")
    process = _kmv_batch_processor(sk_root)
    for i in range(12):
        base = i * 10**6
        day = f"2024-02-{(i % 6) + 1:02d}"
        frame = spark.createDataFrame(
            [(day + " 08:00:00", base + u) for u in range(500)],
            "ts string, user_id long",
        ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id")
        process(frame, i)
    return ["sketch", "--state-root", sk_root, "--family", "kmv"]


def serve_sketch(spark, root: str) -> list:
    from tailsql_spark.plans.streaming_exec import _partial_log_df

    return _rows(_partial_log_df(spark, f"{root}/sk", "kmv"))


def build_curation(spark, root: str) -> list[str]:
    from tailsql_spark.plans.streaming_exec import (
        _bdir,
        stream_unified_curation,
    )

    stream_unified_curation(spark, SF_SMALL, root)
    # takedown feed: tombstone a residue class AFTER the stream drained
    # (the offline purge is exactly what curation_maintain exists for)
    spark.createDataFrame([], "doc_id long").write.mode("overwrite").parquet(
        f"{root}/del/seed"
    )
    docs = spark.read.parquet(f"{root}/src")
    docs.filter("doc_id % 13 = 3").select("doc_id").write.mode(
        "overwrite"
    ).parquet(f"{root}/del/{_bdir(90)}")
    return ["curation", "--state-root", root]


def serve_curation(spark, root: str) -> list:
    from tailsql_spark.plans.streaming_exec import _unified_curation_serve

    return _rows(
        _unified_curation_serve(
            spark,
            spark.read.parquet(f"{root}/src"),
            f"{root}/attrs",
            f"{root}/labels",
            f"{root}/ph",
            f"{root}/fpa",
            f"{root}/fpv",
            edges_root=f"{root}/edges",
            del_root=f"{root}/del",
        )
    )


def build_ivf(spark, root: str) -> list[str]:
    from pyspark.sql import functions as F

    from tailsql_spark.operators.similarity import as_double, ivf_cell_count, norm
    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.streaming_exec import (
        _bucket_manifest_seed,
        _ivf_index_processor,
    )

    emb = load_tables(spark, SF_ORACLE)["embeddings"].select("vec_id", "embedding")
    embd = emb.select("vec_id", as_double(F.col("embedding")).alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )
    nc = ivf_cell_count(embd.count())
    seeds_path = f"{root}/seeds"
    # DEGENERATE quantizer so the maintain run takes the FULL loop:
    # purge -> gate trips -> re-train -> recall re-certification
    v0 = embd.filter(F.col("vec_id") == 0).select("v", "nrm")
    spark.range(int(nc)).select(F.col("id").alias("vec_id")).join(v0).write.mode(
        "overwrite"
    ).parquet(seeds_path)
    cells = f"{root}/cells"
    del_root = f"{root}/del"
    spark.createDataFrame(
        [], "vec_id long, v array<double>, nrm double, ccell long"
    ).write.mode("overwrite").parquet(f"{cells}/seed")
    spark.createDataFrame([], "vec_id long").write.mode("overwrite").parquet(
        f"{del_root}/seed"
    )
    _bucket_manifest_seed(spark.createDataFrame([], "x long"), cells)
    process = _ivf_index_processor(cells, seeds_path, del_root)
    process(emb.withColumn("op", F.lit("I")), 0)
    process(
        emb.filter("vec_id % 11 = 5").select("vec_id", "embedding").withColumn(
            "op", F.lit("D")
        ),
        1,
    )
    return [
        "ivf",
        "--state-root", cells,
        "--seeds", seeds_path,
        "--del-root", del_root,
        "--sf-dir", SF_ORACLE,
    ]


def serve_ivf(spark, root: str) -> list:
    from tailsql_spark.operators.similarity import N_QUERIES_IDX
    from tailsql_spark.plans.streaming_exec import _ivf_index_serve

    return _rows(
        _ivf_index_serve(
            spark,
            SF_ORACLE,
            f"{root}/cells",
            f"{root}/seeds",
            N_QUERIES_IDX,
            n_probes=2,
            del_root=f"{root}/del",
        )
    )


KINDS = {
    "bm25": (build_bm25, serve_bm25),
    "curation": (build_curation, serve_curation),
    "sketch": (build_sketch, serve_sketch),
    "ivf": (build_ivf, serve_ivf),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kinds", default="bm25,curation,sketch,ivf")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time())
    rng = random.Random(seed)

    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_crash_soak")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"seed": seed, "lease_ttl_sec": float(LEASE_TTL), "kinds": {}}
    for kind in [k.strip() for k in args.kinds.split(",") if k.strip()]:
        build, serve = KINDS[kind]
        root_a = tempfile.mkdtemp(prefix=f"tailsql_soak_{kind}_a_")
        root_b = tempfile.mkdtemp(prefix=f"tailsql_soak_{kind}_b_")
        try:
            print(f"# [{kind}] building state x2 ...", file=sys.stderr)
            cli_a = build(spark, root_a)
            cli_b = build(spark, root_b)
            # baseline: uninterrupted CLI run on root A (also times the
            # work window the kill point is drawn from)
            t_full = _run_cli(cli_a)
            baseline = serve(spark, root_a)
            # crash run on root B: SIGKILL at a random point inside the
            # window where the subprocess is past session startup and
            # still mutating state
            attempts = 0
            while True:
                attempts += 1
                kill_at = t_full * (0.5 + 0.4 * rng.random())
                killed = _kill_cli_at(cli_b, kill_at)
                if killed or attempts >= 5:
                    break
            # let the dead holder's lease age past the TTL, then restart
            time.sleep(float(LEASE_TTL) + 1)
            t_restart = _run_cli(cli_b)
            recovered = serve(spark, root_b)
            identical = recovered == baseline
            results["kinds"][kind] = {
                "baseline_wall_sec": round(t_full, 2),
                "kill_at_sec": round(kill_at, 2),
                "killed_mid_run": killed,
                "kill_attempts": attempts,
                "restart_wall_sec": round(t_restart, 2),
                "serve_rows": len(baseline),
                "identical_after_recovery": identical,
            }
            print(
                f"# [{kind}] killed at {kill_at:.1f}s/{t_full:.1f}s "
                f"(mid-run={killed}), restart {t_restart:.1f}s, "
                f"identical={identical} ({len(baseline)} rows)",
                file=sys.stderr,
            )
            if not identical:
                a_only = [r for r in baseline if r not in recovered][:5]
                b_only = [r for r in recovered if r not in baseline][:5]
                print(f"#   baseline-only: {a_only}", file=sys.stderr)
                print(f"#   recovered-only: {b_only}", file=sys.stderr)
        finally:
            shutil.rmtree(root_a, ignore_errors=True)
            shutil.rmtree(root_b, ignore_errors=True)

    ok = all(
        k["identical_after_recovery"] and k["killed_mid_run"]
        for k in results["kinds"].values()
    )
    results["all_identical_after_mid_run_kill"] = ok
    out_path = os.path.join(REPO, "tools", "measurements", "r15_crash_soak.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
