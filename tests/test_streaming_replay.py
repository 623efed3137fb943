"""Micro-batch REPLAY safety for the incremental MinHash dedup.

Structured Streaming's foreachBatch contract is at-least-once: a batch
whose state writes completed but whose checkpoint commit didn't is
re-run on restart. The processor must therefore be idempotent — a
replay that double-appended shingles would silently corrupt every
later Jaccard denominator. These tests drive the processor directly
(no streaming engine) and replay every batch, then require the final
pair set to still equal the batch operator's answer.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def _pairs(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_minhash_processor_replay_idempotent(spark, oracle_sf_dir):
    from tailsql_spark.operators.dedup import REGISTRY as _DEDUP
    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.streaming_exec import (
        _mh_seed_state,
        _mh_state_paths,
        _minhash_batch_processor,
    )

    docs = load_tables(spark, oracle_sf_dir)["documents"].select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)

    root = tempfile.mkdtemp(prefix="tailsql_replay_")
    try:
        ex_root, sig_root, out_root = _mh_seed_state(docs, root)
        process = _minhash_batch_processor(ex_root, sig_root, out_root)
        # every batch runs TWICE: original + simulated post-crash replay
        process(half, 0)
        process(half, 0)
        process(rest, 1)
        process(rest, 1)
        got = _pairs(spark.read.parquet(*_mh_state_paths(out_root)))
        want = _pairs(_DEDUP["dedup_minhash_lsh"].build(spark, oracle_sf_dir))
        assert got == want, (
            f"replayed incremental result diverged from batch: "
            f"extra={got - want}, missing={want - got}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
