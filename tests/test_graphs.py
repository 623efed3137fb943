"""Connected-components clustering: transitivity, determinism, and the
worst-case (path-graph) convergence the near-dup closure relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tailsql_spark.operators.graphs import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in got}


def test_transitive_closure_beyond_direct_pairs(spark):
    # A~B, B~C but never A~C: all three must share one cluster
    labels = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_path_graph_worst_case_diameter(spark):
    # a 12-node path is the slowest-mixing shape at this size; the min
    # label must still reach the far end within the iteration cap
    n = 12
    labels = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(labels.values()) == {0}
    assert len(labels) == n + 1


def test_star_and_order_invariance(spark):
    # same component presented in reversed/shuffled pair order → same
    # labels (min semantics are order-free)
    a = _cc(spark, [(5, 9), (9, 7), (7, 6)])
    b = _cc(spark, [(7, 6), (9, 5), (7, 9)])
    assert a == b == {5: 5, 6: 5, 7: 5, 9: 5}


def test_empty_pairs_empty_labels(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_iteration_cap_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iter=2)


def test_survivor_stats_reconcile(spark, oracle_sf_dir):
    from tailsql_spark.operators.graphs import dedup_clusters, dedup_survivor_stats

    clusters = dedup_clusters(spark, oracle_sf_dir)
    stats = dedup_survivor_stats(spark, oracle_sf_dir).agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_dup_members").alias("members"),
        F.sum("n_survivors").alias("surv"),
    ).collect()[0]
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert stats["members"] == n_members
    # survivors = untouched docs + one canonical per cluster
    assert stats["surv"] == stats["docs"] - n_members + n_clusters
    # every cluster has >= 2 members (a singleton can't be a dup pair)
    assert clusters.groupBy("cluster_id").count().filter("count < 2").count() == 0


def test_reliable_checkpoint_dir_same_result(spark, tmp_path):
    # cluster mode: reliable checkpoint() into a directory must produce
    # the identical fixpoint as the localCheckpoint default
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    got = connected_components(df, checkpoint_dir=str(tmp_path / "cc_ckpt")).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in got} == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # checkpoint files actually landed in the requested directory
    assert any((tmp_path / "cc_ckpt").rglob("*"))
