"""r15: fold + scheduled maintenance for the additive-partial
sketch/counter state families (VERDICT r14 ask #1).

The five families (KMV day sketches, Misra-Gries summaries, count-min
matrices, binned quality histograms, hourly rate counters) append one
bounded partial per micro-batch; without a fold their live FILE count
grows linearly with batch count.  `sketch_maintain` gives them the
same {version, folded_below_bid} + lease + vacuum lifecycle as the
content-derived families.  The certifiable property: fold ≡ read-time
merge — the served result is byte-identical before a fold, after it,
and after a second (idempotent) fold, because the fold and the read
share one merge function per family.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tailsql_spark.plans.streaming_exec import (
    _bdir,
    _flat_state_paths,
    _has_unfolded_batch_dirs,
    _partial_log_df,
    expire_del_versions,
    fold_partial_log,
    sketch_maintain,
    stream_countmin_sketch,
    stream_heavy_hitters,
    stream_kmv_sketch,
    stream_quality_gate_binned,
    stream_rate_anomaly,
)

#: (family key, stream query, state sub-dir the query lays down)
FAMILY_CASES = [
    ("kmv", stream_kmv_sketch, "sk"),
    ("hh", stream_heavy_hitters, "hh"),
    ("cms", stream_countmin_sketch, "cm"),
    ("hist", stream_quality_gate_binned, "hist"),
    ("cnt", stream_rate_anomaly, "cnt"),
]


@pytest.mark.parametrize(
    "family,query,sub", FAMILY_CASES, ids=[c[0] for c in FAMILY_CASES]
)
def test_sketch_maintain_fold_preserves_served_result(
    spark, sf_dir, tmp_path_factory, family, query, sub
):
    """End-to-end per family: stream the corpus in (4 micro-batches of
    partials), serve; `sketch_maintain` folds the log to a base-only
    layout and vacuums the per-batch dirs; re-serving through the SAME
    query (checkpoint resumes over the same staged files — no new
    batches) is byte-identical; a direct second fold is idempotent;
    and the healthy no-op fast path reports without folding."""
    root = str(tmp_path_factory.mktemp(f"sketch_{family}"))
    log_root = f"{root}/{sub}"

    r1 = sorted(map(tuple, query(spark, sf_dir, root).collect()))
    assert r1, "streamed query produced no rows"
    assert _has_unfolded_batch_dirs(_flat_state_paths(log_root))

    rep = sketch_maintain(spark, log_root, family)
    assert rep["folded"] is True and rep["noop"] is False
    assert rep["dirs_after"] < rep["dirs_before"]
    # post-fold: base-only live set — the bounded-state shape
    paths = _flat_state_paths(log_root)
    assert not _has_unfolded_batch_dirs(paths)
    assert any(p.endswith(f"base_v{rep['version']}") for p in paths)

    r2 = sorted(map(tuple, query(spark, sf_dir, root).collect()))
    assert r2 == r1

    # fold idempotency: re-folding a base-only log re-derives the same
    # state (merge is idempotent on its own output) and serves equal
    fold_partial_log(spark, log_root, family)
    expire_del_versions(log_root)
    r3 = sorted(map(tuple, query(spark, sf_dir, root).collect()))
    assert r3 == r1

    rep2 = sketch_maintain(spark, log_root, family)
    assert rep2["noop"] is True and rep2["folded"] is False


def _write_partials(spark, root: str, schema: str, partials, start_bid=0):
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        f"{root}/seed"
    )
    for i, rows in enumerate(partials):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{root}/{_bdir(start_bid + i)}"
        )


def _append_partials(spark, root: str, schema: str, partials, start_bid):
    for i, rows in enumerate(partials):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{root}/{_bdir(start_bid + i)}"
        )


@pytest.mark.parametrize(
    "family,schema,early,late",
    [
        (
            "kmv",
            "day string, h long",
            [[("d1", 5), ("d1", 9)], [("d1", 3), ("d2", 7)], [("d1", 5)]],
            [[("d1", 1), ("d2", 2)], [("d2", 11)]],
        ),
        (
            "cms",
            "d int, cell long, c long",
            [[(0, 3, 2), (1, 5, 1)], [(0, 3, 4)], [(1, 5, 7), (0, 9, 1)]],
            [[(0, 3, 1)], [(1, 8, 2)]],
        ),
        (
            "hist",
            "lang string, bin long, c long",
            [[("en", 2, 3)], [("en", 2, 1), ("de", 4, 5)], [("de", 4, 2)]],
            [[("en", 7, 1)], [("de", 4, 1)]],
        ),
        (
            "cnt",
            "event_type string, h timestamp, cnt long",
            [
                [("click", "2024-01-01 10:00:00", 3)],
                [("click", "2024-01-01 10:00:00", 2), ("view", "2024-01-01 11:00:00", 5)],
                [("view", "2024-01-01 11:00:00", 1)],
            ],
            [[("click", "2024-01-01 12:00:00", 4)], [("view", "2024-01-01 11:00:00", 2)]],
        ),
    ],
    ids=["kmv", "cms", "hist", "cnt"],
)
def test_fold_then_new_deltas_equals_unfolded_merge(
    spark, tmp_path, family, schema, early, late
):
    """The merge-algebra contract behind the fold: consolidate the
    early partials into a base, land MORE partials after it, and the
    read-time merge over base + post-fold deltas equals the one-shot
    merge over ALL partials unfolded — associativity, asserted on
    synthetic logs for every exact-merge family (KMV K-min, CMS /
    histogram / counter sums)."""
    root = str(tmp_path / family)
    if family == "cnt":
        # createDataFrame parses timestamp strings via pandas-less path;
        # feed through to_timestamp for determinism
        def conv(rows):
            return [(a, __import__("datetime").datetime.fromisoformat(b), c) for a, b, c in rows]

        early = [conv(r) for r in early]
        late = [conv(r) for r in late]
    _write_partials(spark, root, schema, early)
    fold_partial_log(spark, root, family)
    expire_del_versions(root)
    _append_partials(spark, root, schema, late, start_bid=len(early))

    folded_read = sorted(map(tuple, _partial_log_df(spark, root, family).collect()))

    flat_root = str(tmp_path / f"{family}_flat")
    _write_partials(spark, flat_root, schema, early + late)
    oneshot = sorted(
        map(tuple, _partial_log_df(spark, flat_root, family).collect())
    )
    assert folded_read == oneshot


def test_hh_fold_preserves_candidate_superset_and_rescan(spark, tmp_path):
    """Misra-Gries folds are not value-identical to the one-shot reduce
    (mergeable summaries preserve the ERROR BOUND, not the estimates) —
    the invariant that matters is downstream: the folded candidate set
    still supersets every true heavy hitter, so the exact rescan (what
    the certified row serves) is unchanged."""
    from tailsql_spark.operators.sketches import (
        MG_SLOTS,
        mg_partition_summaries,
        mg_summary_reduce,
    )

    # a token stream with two genuine heavy hitters and a noise tail
    toks = (
        ["alpha"] * 400 + ["beta"] * 300 + [f"noise{i}" for i in range(200)]
    )
    tok_df = spark.createDataFrame([(t,) for t in toks], "tok string")
    root = str(tmp_path / "hh")
    spark.createDataFrame([], "tok string, cnt_est long").write.parquet(
        f"{root}/seed"
    )
    # three per-batch MG summaries over disjoint slices
    n = len(toks)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        sl = spark.createDataFrame([(t,) for t in toks[lo:hi]], "tok string")
        mg_summary_reduce(mg_partition_summaries(sl)).write.mode(
            "overwrite"
        ).parquet(f"{root}/{_bdir(i)}")

    fold_partial_log(spark, root, "hh")
    expire_del_versions(root)
    cands = {
        r.tok for r in _partial_log_df(spark, root, "hh").collect()
    }
    # true heavy hitters at the MG threshold N/slots
    true_hh = {
        r.tok
        for r in tok_df.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") * MG_SLOTS > F.lit(n))
        .collect()
    }
    assert true_hh  # non-vacuous: alpha and beta must be above threshold
    assert true_hh <= cands
    # and the folded summary respects the slot bound
    assert len(cands) <= MG_SLOTS


def test_sketch_maintain_unknown_family_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown family"):
        sketch_maintain(spark, str(tmp_path), "nope")


def test_wait_family_lease_serializes(tmp_path):
    """r16: the blocking acquire used by live-interleaved maintenance —
    a waiter blocks while the lease is held, proceeds the moment it is
    released, and times out (re-raising FamilyLeaseHeld) when the
    holder never lets go within the budget."""
    import threading
    import time

    import pytest

    from tailsql_spark.plans.streaming_exec import (
        FamilyLeaseHeld,
        acquire_family_lease,
        release_family_lease,
        wait_family_lease,
    )

    root = str(tmp_path / "fam")
    import os

    os.makedirs(root)
    acquire_family_lease(root, holder="ingest:b1")
    got = []

    def waiter():
        wait_family_lease(root, holder="maintain", timeout_sec=30, poll_sec=0.05)
        got.append(time.monotonic())
        release_family_lease(root)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.4)
    assert not got  # still blocked while ingest holds the root
    t0 = time.monotonic()
    release_family_lease(root)
    t.join(timeout=10)
    assert got and got[0] - t0 < 5  # proceeded promptly on release
    # timeout path: a fresh holder that never releases
    acquire_family_lease(root, holder="ingest:b2")
    with pytest.raises(FamilyLeaseHeld):
        wait_family_lease(root, holder="maintain", timeout_sec=0.3, poll_sec=0.05)
    release_family_lease(root)
