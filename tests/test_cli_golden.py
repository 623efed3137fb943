"""End-to-end CLI golden test: the README demo cadence through cli.py.

Replays FIXTURES.md F1 (``/root/reference/README.md:22-82``) through the
REAL CLI entrypoint: ``main(argv)`` with the reference's flag surface —
tail -f a growing log, regex-parse to ``t0``, pre-window ``-F`` filter,
``-w 10:5:-1`` (10 s sliding window, 5 s slide, processing time), the
README count query per emission, raw formatter.

Golden determinism: streaming ingest runs on REAL triggers (genuine
tailf source → micro-batch → spool), but the WINDOW CLOCK is a fake
``time`` module patched into the squeryer — the test appends lines,
waits until the spool provably holds them, then advances the clock to
the next slide boundary. Arrival timestamps and eviction horizons are
therefore exact integers and the per-emission counts are a strict
golden: [3, 2, 0, 0] — phase A in window; A evicted at +10 s leaving
phase B; B evicted; empty tail.
"""

from __future__ import annotations

import threading
import time as realtime

import pytest


class FakeTime:
    """Drop-in for the squeryer's ``time`` module: manual clock."""

    def __init__(self, t0: float = 0.0):
        self._t = t0
        self._cv = threading.Condition()

    def time(self) -> float:
        with self._cv:
            return self._t

    def sleep(self, dt: float) -> None:
        with self._cv:
            target = self._t + dt
            while self._t < target:
                self._cv.wait()

    def advance(self, dt: float) -> None:
        with self._cv:
            self._t += dt
            self._cv.notify_all()


README_RE = r".+ (?P<method__str>GETM) (?P<status__str>SUCC) .+7710 (?P<time__int>[0-9]+).*"

#: 4 rows pass regex + -F (3 also pass the query predicate); 1 dropped
#: by -F (time <= 10000); 1 never parses (SETM/FAIL/wrong port) —
#: sql/lparser.go:98-100 drop semantics.
PHASE_A = [
    "2024/04/12 22:47:42.506277 GETM SUCC localhost:7710 13000",
    "2024/04/12 22:47:42.606277 GETM SUCC localhost:7710 12500",
    "2024/04/12 22:47:42.706277 GETM SUCC localhost:7710 12276",
    "2024/04/12 22:47:42.806277 GETM SUCC localhost:7710 11000",
    "2024/04/12 22:47:42.906277 GETM SUCC localhost:7710 500",
    "2024/04/12 22:47:43.006277 SETM FAIL localhost:7711 99999",
]

#: 2 rows pass everything.
PHASE_B = [
    "2024/04/12 22:48:42.000001 GETM SUCC localhost:7710 20000",
    "2024/04/12 22:48:42.100001 GETM SUCC localhost:7710 15000",
]


def _append(path, lines) -> None:
    with open(path, "a") as fh:
        fh.write("\n".join(lines) + "\n")


def _poll(predicate, what: str, timeout: float = 90.0) -> None:
    deadline = realtime.time() + timeout
    while not predicate():
        assert realtime.time() < deadline, f"timed out waiting for {what}"
        realtime.sleep(0.1)


def test_cli_sliding_window_golden(spark, tmp_path, monkeypatch):
    from tailsql_spark import cli
    from tailsql_spark.streaming import squeryer

    fake = FakeTime()
    monkeypatch.setattr(squeryer, "time", fake)

    outputs: list[str] = []
    captured: dict = {}
    real_sq = squeryer.StreamQueryer

    def capturing_sq(*args, **kwargs):
        sq = real_sq(*args, **kwargs)
        sq.sink = outputs.append  # the CLI's stdout sink, captured
        captured["sq"] = sq
        return sq

    monkeypatch.setattr(squeryer, "StreamQueryer", capturing_sq)

    log = tmp_path / "demo.log"
    log.write_text("")  # empty at stream start: seek-to-end offset is 0

    argv = [
        "query",
        "-f", str(log),
        "-r", README_RE,
        "-F", "time > 10000",
        "-w", "10:5:-1",
        "-o", "raw",
        "--duration", "18",
        "select count(1) as n from t0 where time > 12275",
    ]
    rc: list[int] = []
    t = threading.Thread(target=lambda: rc.append(cli.main(argv)), daemon=True)
    t.start()

    def spooled_rows() -> int:
        sq = captured.get("sq")
        return sum(b.n for b in sq._buffers[0]) if sq else -1

    def emissions() -> int:
        sq = captured.get("sq")
        return sq._emissions if sq else 0

    # the harness is up once the streaming query exists; the log file was
    # empty at start, so appends can never race the seek-to-end offset
    _poll(lambda: captured.get("sq") and captured["sq"]._queries, "stream start")

    _append(log, PHASE_A)
    _poll(lambda: spooled_rows() == 4, f"phase A ingest (have {spooled_rows()})")
    fake.advance(5)  # slide 1: window (-5, 5], A arrived at t=0
    _poll(lambda: emissions() >= 1, "emission 1")

    _append(log, PHASE_B)
    _poll(lambda: spooled_rows() == 6, f"phase B ingest (have {spooled_rows()})")
    fake.advance(5)  # slide 2: window (0, 10] — A (t=0) evicted, B (t=5) in
    _poll(lambda: emissions() >= 2, "emission 2")

    fake.advance(5)  # slide 3: window (5, 15] — B evicted
    _poll(lambda: emissions() >= 3, "emission 3")

    fake.advance(10)  # past --duration 18: one final tick, then the loop exits
    t.join(timeout=90)
    assert not t.is_alive(), "CLI did not terminate after duration"
    assert rc == [0]

    # README cadence golden: count per 5 s emission, raw format
    assert outputs == ["n\n3", "n\n2", "n\n0", "n\n0"], outputs


def test_cli_yaml_config_batch_golden(spark, tmp_path, capsys):
    """Entry point 2 (config.yaml, reference config.yaml parity) end to
    end through cli.main in batch mode: YAML-declared source + regex +
    filter, --do-not-tail table render to stdout."""
    from tailsql_spark import cli

    log = tmp_path / "app.log"
    log.write_text(
        "\n".join(
            PHASE_A
            + ["2024/04/12 22:49:00.000001 GETM SUCC localhost:7710 19000"]
        )
        + "\n"
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
files:
  - path: "{log}"
    regex: '{README_RE}'
    filter: "time > 10000"
    do_not_tail: true
sink:
  to: "stdout"
  formatter: "table"
db_engine: "duckdb"
"""
    )
    rc = cli.main(
        ["query", "-c", str(cfg), "select count(1) as n from t0 where time > 12275"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    # 3 PHASE_A hits + the extra 19000 line; table formatter golden
    assert "| n" in out and "| 4" in out, out


def test_cli_maintain_curation_noop_and_ivf_arg_validation(spark, tmp_path, capsys):
    """The cron-facing ``maintain`` subcommand: a healthy (seed-only)
    curation composition is a metadata-read NO-OP reported as one
    parseable JSON line with exit 0; the IVF kind refuses (exit 2)
    without the recall re-certification inputs instead of running a
    re-train it could not certify."""
    import json

    from pyspark.sql import functions as F  # noqa: F401

    from tailsql_spark import cli
    from tailsql_spark.plans.streaming_exec import _bucket_manifest_seed

    root = str(tmp_path / "cur")
    empty_band = spark.createDataFrame(
        [], "doc_id long, band_idx int, band_hash string"
    )
    empty_band.write.parquet(f"{root}/bands/seed")
    spark.createDataFrame([], "doc_id long, s string").write.parquet(
        f"{root}/ex/seed"
    )
    _bucket_manifest_seed(empty_band, f"{root}/bands")
    _bucket_manifest_seed(empty_band, f"{root}/ex")
    for sub, schema in (
        ("attrs", "doc_id long, lang string, fingerprint string, n_tokens long"),
        ("del", "doc_id long"),
        ("ph", "doc_id long, b0 long, b1 long, b2 long, b3 long"),
        ("fpa", "doc_id long, fh string"),
        ("fpv", "doc_id long, fh string"),
    ):
        spark.createDataFrame([], schema).write.parquet(f"{root}/{sub}/seed")

    rc = cli.main(["maintain", "curation", "--state-root", root])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc == 0
    assert report["kind"] == "curation" and report["noop"] is True
    assert set(report["families"]) == {"attrs", "ph", "fpa", "fpv", "bands", "ex"}

    rc2 = cli.main(["maintain", "ivf", "--state-root", str(tmp_path / "cells")])
    assert rc2 == 2
