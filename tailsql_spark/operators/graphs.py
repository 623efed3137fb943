"""Near-duplicate CLUSTERING — the last mile of every dedup family.

The pair detectors (minhash LSH, winnow, embedding LSH) emit EDGES:
``(id_a, id_b, score)``.  A production dedup pass must then (1) close
the pairs transitively into clusters — A~B and B~C dedups A,B,C
together even when A-C was never a candidate pair — and (2) keep ONE
canonical survivor per cluster.  This module supplies both as
first-class operators:

* :func:`connected_components` — iterative min-label propagation
  ("hash-to-min"): each round every node adopts the smallest label in
  its closed neighborhood.  Pure DataFrame ops: one equi-join + one
  groupBy-min per round, converging in O(graph diameter) rounds
  (near-dup clusters are shallow — boilerplate stars have diameter 2).
  Each round checkpoints the new label table (two scalar longs +
  change flag) so LINEAGE stays O(1) — persist alone keeps stacking
  the logical plan and a 12-round loop already blows analysis time.
  Pass ``checkpoint_dir`` for reliable ``checkpoint()`` on a cluster
  (survives executor loss); default ``localCheckpoint`` locally.
  Edges stay partitioned by node across rounds; labels are the only
  moving table, and the convergence count rides the label job.
* ``dedup_clusters`` — transitive clusters over the certified
  MinHash-LSH pair stream, labeled by min member id, with sizes.
* ``dedup_survivor_stats`` — the curation report: per language, how
  many docs, how many sit in a near-dup cluster, how many survive
  keep-canonical (cluster minimum or untouched).

Cross-engine: the iteration is not SQL-expressible, but its RESULT is
— the DuckDB oracle computes the same fixpoint with a recursive CTE
(transitive closure → min reachable id).  All arithmetic is integer
min/count, so the engines agree exactly.

Reference parity: the reference's dedup surface stops at per-window
``SELECT DISTINCT`` (dispensable/tailsql ``sql/engine.go:256-258``
delegated SQL); clustering generalizes it for the corpus-curation
pipelines this engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import QuerySpec, load_tables
from tailsql_spark.operators.dedup import _MINHASH_ORACLE, dedup_minhash_lsh

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None, doc: str = "", plan=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), plan=plan,
        )
        return fn

    return deco


MAX_CC_ITERS = 25  # diameter bound: near-dup clusters are shallow


def connected_components(
    pairs: DataFrame,
    max_iter: int = MAX_CC_ITERS,
    checkpoint_dir: str | None = None,
    seed_labels: DataFrame | None = None,
    caches: list | None = None,
) -> DataFrame:
    """``(id_a, id_b)`` undirected pairs → ``(doc_id, cluster_id)``
    where ``cluster_id`` is the minimum member id of the node's
    connected component.  Nodes not in any pair are absent (callers
    left-join them back as singletons).

    Min-label propagation: ``label(v) ← min(label(v), min over
    neighbors label(u))`` to fixpoint.  Per round: one shuffle join
    (edges ⋈ labels on the neighbor key) + one groupBy-min — both hash
    partitioned on the same key, so at scale AQE coalesces them into a
    stable exchange reused across rounds.  The driver-side loop is the
    documented non-SQL-expressible part; the fixpoint itself is
    oracle-checked via a recursive CTE.

    Checkpointing: each round's label table must be materialized with
    TRUNCATED lineage (a data-dependent loop must not stack its plan
    round over round).  With ``checkpoint_dir`` set, rounds use reliable
    ``checkpoint()`` into that directory — survives executor loss, the
    right mode on a real cluster.  Unset (local/test), ``localCheckpoint``
    avoids the write-to-storage round trip but is lossy on executor
    failure.  The context's previous checkpoint dir is restored on exit
    (the setting is context-global), and the CALLER owns the directory
    lifecycle: the returned DataFrame reads from the final round's
    checkpoint files, so delete the dir only after consuming the
    result (Spark does not clean reliable checkpoints by default).

    Convergence: the changed-label count RIDES the label-update job —
    the old label is joined in before checkpointing and the per-row
    ``chg`` flag lands in the materialized table, so detecting the
    fixpoint is a checkpoint-local column sum (no join recompute, no
    extra shuffle — one fewer job per round than re-deriving the diff).

    ``seed_labels`` (``(doc_id, cluster_id)``) warm-starts the loop
    from a PREVIOUS fixpoint computed over a subset of these edges —
    the incremental-maintenance path: adding edges only merges
    components, every seed label is still a member id of its node's
    component, so min-propagation converges to the identical fixpoint
    (min member id) in O(1) rounds instead of O(diameter). Purely an
    accelerator; never changes the result.

    ``caches`` (r17, guide §5): the returned frame reads the FINAL
    round's localCheckpoint blocks, which otherwise linger in the
    context's persistent-RDD map for the session lifetime.  A caller
    that MATERIALIZES the result can pass a list; an ``.unpersist()``
    handle for those final blocks is appended for release after the
    materialization (reliable-checkpoint mode appends nothing — files
    are the checkpoint_dir's lifecycle).
    """
    spark = pairs.sparkSession
    sc = spark.sparkContext
    prev_ckpt_dir: str | None = None
    restore_ckpt = False
    if checkpoint_dir is not None:
        # setCheckpointDir is context-GLOBAL: remember the previous
        # setting so a caller with its own iterative jobs isn't
        # silently redirected after we return. getCheckpointDir is
        # public PySpark API (returns None when unset); the py4j probe
        # is only a fallback for builds where it's absent, and a failed
        # probe degrades to not restoring — logged, never raised.
        try:
            prev_ckpt_dir = sc.getCheckpointDir()
            restore_ckpt = True
        except Exception:
            try:
                prev = sc._jsc.sc().getCheckpointDir()
                prev_ckpt_dir = prev.get() if prev.isDefined() else None
                restore_ckpt = True
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "connected_components: could not read the current "
                    "checkpoint dir; it will not be restored on exit"
                )
        sc.setCheckpointDir(checkpoint_dir)

    def _rdd_ids() -> set:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _ckpt(df: DataFrame) -> tuple:
        """Checkpoint ``df`` eagerly and return (frame, created persistent
        RDD ids).  localCheckpoint registers its block-backed RDD in the
        context's persistent map; tracking the ids lets the loop RELEASE
        each superseded round's storage as soon as its successor is
        materialized — without it a long iteration holds O(rounds ×
        labels) blocks for the session lifetime (and dead rounds linger
        as persistent-RDD stragglers, the r9 ADVICE finding).  Reliable
        checkpoint() writes files instead of blocks, so its created set
        is empty and release is a no-op (files are the caller-owned
        checkpoint_dir's lifecycle)."""
        before = _rdd_ids()
        out = df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()
        return out, _rdd_ids() - before

    def _release(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for i in ids:
            r = jmap.get(i)
            if r is not None:
                r.unpersist()

    ids = pairs.select(
        F.col("id_a").cast("long").alias("u"), F.col("id_b").cast("long").alias("v")
    )
    edges = ids.union(ids.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    try:
        # label0(v) = min(v, neighbors(v)) — one groupBy, also materializes edges
        label0 = (
            edges.groupBy("u")
            .agg(F.least(F.min("v"), F.col("u")).alias("label"))
            .select(F.col("u").alias("node"), "label")
        )
        if seed_labels is not None:
            seed = seed_labels.select(
                F.col("doc_id").cast("long").alias("node"),
                F.col("cluster_id").cast("long").alias("label"),
            )
            # seed nodes are a subset of the edge nodes (edges accumulate),
            # so a union + min fold is lossless and keeps one row per node
            label0 = (
                label0.unionByName(seed).groupBy("node").agg(F.min("label").alias("label"))
            )
        # NO standalone emptiness count (r17): an empty label table
        # falls through round 1 as sum(chg)=NULL and breaks below —
        # the guard action cost one job per call for a case the loop
        # already handles (measured ~0.2 s at sf0.1, where the whole
        # CC is action-barrier-bound: 4 eager jobs, rounds=1).
        labels, labels_ids = _ckpt(label0)
        for _ in range(max_iter):
            neighbor = (
                edges.join(labels, edges["v"] == labels["node"])
                .select(F.col("u").alias("node"), "label")
            )
            # The node set is identical every round (all endpoints appear in
            # label0 and nodes are never dropped), so the old-label join is
            # inner and lossless; `chg` is computed BEFORE the checkpoint so
            # the convergence signal is part of the materialized table.
            new, new_ids = _ckpt(
                neighbor.union(labels.select("node", "label"))
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .join(
                    labels.select("node", F.col("label").alias("old_label")), "node"
                )
                .select(
                    "node",
                    "label",
                    (F.col("label") != F.col("old_label")).cast("long").alias("chg"),
                )
            )
            changed = new.agg(F.sum("chg")).first()[0]
            # the successor is materialized (eager checkpoint): release
            # the superseded round's blocks NOW, so peak label storage
            # is 2 rounds, not O(rounds)
            _release(labels_ids)
            labels, labels_ids = new, new_ids
            # sum(chg) is NULL on an empty label table (no edges) —
            # that is converged too, not a straggling round
            if not changed:
                break
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds "
                "(component diameter exceeds the bound — raise max_iter)"
            )
        if caches is not None and labels_ids:

            class _FinalBlocks:
                def __init__(self, ids: set):
                    self._ids = ids

                def unpersist(self) -> None:
                    _release(self._ids)

            caches.append(_FinalBlocks(labels_ids))
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    finally:
        edges.unpersist()
        if checkpoint_dir is not None and restore_ckpt:
            # restore even to the UNSET state (setCheckpointDir(None)
            # clears it) — leaving the context pointed at our dir would
            # redirect every later checkpoint in the session into a
            # directory the caller is told to delete
            sc.setCheckpointDir(prev_ckpt_dir)


#: Recursive-CTE fixpoint shared by both oracles: pairs → symmetric
#: edges → transitive closure → min reachable id per node.
_CC_ORACLE_CTES = f"""pairs AS ({_MINHASH_ORACLE}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT u AS node, u AS r FROM edges
        UNION
        SELECT e.u AS node, reach.r
        FROM edges e JOIN reach ON e.v = reach.node
    ),
    labels AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )"""


@query(
    "dedup_clusters",
    "dedup",
    f"""
    WITH RECURSIVE {_CC_ORACLE_CTES},
    sizes AS (SELECT cluster_id, COUNT(*) AS n FROM labels GROUP BY cluster_id)
    SELECT CAST(l.doc_id AS BIGINT) AS doc_id,
           CAST(l.cluster_id AS BIGINT) AS cluster_id,
           CAST(s.n AS BIGINT) AS cluster_size
    FROM labels l JOIN sizes s USING (cluster_id)
    """,
    doc="Transitive near-duplicate clusters over the MinHash-LSH pair "
    "stream: A~B and B~C land A,B,C in ONE cluster even when A-C never "
    "collided in a band — the closure every real dedup pass needs "
    "before it can drop documents. Iterative min-label propagation "
    "(one equi-join + groupBy-min per round, O(diameter) rounds, O(1) "
    "lineage via per-round persist); oracle = recursive-CTE transitive "
    "closure. Output: every clustered doc with its cluster (min member "
    "id) and cluster size.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


@query(
    "dedup_survivor_stats",
    "dedup",
    f"""
    WITH RECURSIVE {_CC_ORACLE_CTES}
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(l.doc_id) AS BIGINT) AS n_dup_members,
           CAST(SUM(CASE WHEN l.doc_id IS NULL OR l.doc_id = l.cluster_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    GROUP BY d.lang
    """,
    doc="Keep-canonical curation report: per language, corpus size, "
    "docs caught in a near-dup cluster, and docs surviving after each "
    "cluster keeps only its minimum-id member. The cluster label table "
    "is tiny vs the corpus (only clustered docs), so the corpus-side "
    "join broadcasts it and the corpus is never shuffled — the exact "
    "materialization step of a 100 TB dedup pass.",
)
def dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.dedup import _small_input

    t = load_tables(spark, sf_dir)
    labels = connected_components(dedup_minhash_lsh(spark, sf_dir))
    docs = t["documents"].select(F.col("doc_id").cast("long").alias("doc_id"), "lang")
    # the label table is clustered docs only — linear in the corpus, so
    # the broadcast hint is size-gated like every label attach (r17)
    lab = labels.withColumnRenamed("doc_id", "l_doc")
    if _small_input(sf_dir):
        lab = F.broadcast(lab)
    j = docs.join(lab, docs["doc_id"] == F.col("l_doc"), "left")
    survivor = F.col("l_doc").isNull() | (F.col("l_doc") == F.col("cluster_id"))
    return j.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("l_doc").alias("n_dup_members"),
        F.sum(survivor.cast("long")).alias("n_survivors"),
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (third certified iterative algorithm)
# ---------------------------------------------------------------------------

PR_ITERS = 3
PR_SCALE = 10**12  # fixed-point rank mass
#: damping 0.85 expressed as the integer pair (85, 100) so every update
#: is exact floor arithmetic in both engines.


def _pagerank_oracle() -> str:
    """Unrolled-CTE replay of PR_ITERS PageRank steps on the symmetric
    near-dup graph.  The exactness device of the iterative family
    (kmeans/logreg): ranks live in ×1e12 fixed-point BIGINTs, every
    contribution and damping step is FLOOR (integer) division, so both
    engines walk the identical trajectory — no float summation order
    can fork it.  All values non-negative, so ``//``/``div`` agree."""
    parts = [
        f"WITH pairs AS ({_MINHASH_ORACLE}),",
        """edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),""",
        "deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),",
        "nn AS (SELECT COUNT(*) AS n FROM deg),",
        f"r0 AS (SELECT u, CAST({PR_SCALE} // nn.n AS BIGINT) AS r"
        " FROM deg CROSS JOIN nn),",
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"r{i} AS (SELECT e.v AS u,"
            f" CAST((15 * {PR_SCALE}) // (100 * nn.n)"
            f" + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT) AS r"
            f" FROM edges e JOIN r{i - 1} r ON r.u = e.u"
            f" JOIN deg d ON d.u = e.u CROSS JOIN nn"
            f" GROUP BY e.v, nn.n),"
        )
    parts.append(
        f"""final AS (SELECT * FROM r{PR_ITERS})
    SELECT CAST(f.u AS BIGINT) AS doc_id,
           CAST(f.r AS BIGINT) AS rank_fp,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(nn.n AS BIGINT) AS n_nodes
    FROM final f JOIN deg d ON d.u = f.u CROSS JOIN nn"""
    )
    return "\n".join(parts)


@query(
    "graph_pagerank_neardup",
    "graph-analytics",
    _pagerank_oracle(),
    plan=lambda s, d: _pagerank_ranked(
        dedup_minhash_lsh(s, d).select("id_a", "id_b"), cache=False
    )[0],
    doc=f"Distributed PageRank ({PR_ITERS} damped power-iteration "
    "steps, d=0.85) over the symmetric MinHash near-dup graph — the "
    "link-graph authority score web-scale corpora use for quality "
    "weighting, here certified INCLUDING the trajectory: ranks are "
    "×1e12 fixed-point BIGINTs and every step is exact integer floor "
    "arithmetic, so the final fixed-point masses hash-match DuckDB's "
    "unrolled-CTE replay. Scale: each step is one equi-join of the "
    "edge list with the rank vector (both keyed by node — at 100 TB "
    "both live bucketed on that key so the join is co-located) plus "
    "one shuffle of contributions to their targets; the teleport term "
    "rides a broadcast 1-row count. No collect anywhere — the "
    "textbook Pregel-style PR as pure DataFrame ops.",
)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.plans.catalog import sf_key

    return pagerank_fixed(
        dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b"),
        key=sf_key(sf_dir),
    )


def pagerank_fixed(pairs: DataFrame, key: str) -> DataFrame:
    # key is REQUIRED (no default): two ad-hoc pair graphs in one
    # session must not alias the same materialized result path while a
    # lazy frame over the first still reads it — matching
    # materialize_result's non-empty-key contract.
    result, caches = _pagerank_ranked(pairs)
    # materialize (keyed so two corpora never alias the same
    # files), then RELEASE the caches in a finally — a failed write
    # must not leak them; the returned frame reads the written files,
    # so unpersisting cannot re-trigger the re-derivation.
    from tailsql_spark.plans.catalog import materialize_result

    try:
        return materialize_result(result, "graph_pagerank", key=key)
    finally:
        for frame in caches:
            frame.unpersist()


def _pagerank_ranked(pairs: DataFrame, cache: bool = True):
    """PR_ITERS fixed-point PageRank steps over undirected unique pairs
    ``(id_a, id_b)`` — the query body, factored so the integer
    trajectory is property-testable against a pure-Python reference on
    arbitrary random graphs (tests/test_properties.py).

    The edge list / degree / node-count frames are PERSISTED: every
    iteration (and the final projection) references them, and without
    the cut each round would re-derive the entire upstream pair
    pipeline — the executed plan ballooned to 134 exchanges at sf0.01
    before the cut, 3 iterations re-running MinHash end to end.  All
    three are near-dup-pair-sized (collision-bounded), never
    corpus-sized, so caching them is safe at any scale.  The
    plan-audit lambda never materializes — it passes ``cache=False``
    so the dropped handles cannot leak session caches."""
    def _p(df: DataFrame) -> DataFrame:
        return df.persist() if cache else df

    edges = _p(pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    ))
    deg = _p(edges.groupBy("u").agg(F.count("*").alias("deg")))
    nn = _p(deg.agg(F.count("*").alias("n")))
    r = deg.crossJoin(F.broadcast(nn)).select(
        "u", F.expr(f"{PR_SCALE} div n").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(r.join(deg, "u"), "u")
            .select(F.col("v").alias("tu"), F.expr("r div deg").alias("c"))
        )
        r = (
            contrib.groupBy("tu")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("tu").alias("u"),
                (
                    F.expr(f"(15 * {PR_SCALE}) div (100 * n)")
                    + F.expr("(85 * s) div 100")
                ).alias("r"),
            )
        )
    result = (
        r.join(deg, "u")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("u").cast("long").alias("doc_id"),
            F.col("r").cast("long").alias("rank_fp"),
            F.col("deg").cast("long").alias("degree"),
            F.col("n").cast("long").alias("n_nodes"),
        )
    )
    return result, ((edges, deg, nn) if cache else ())


# ---------------------------------------------------------------------------
# triangle counting / clustering coefficients over the candidate graph
# ---------------------------------------------------------------------------

def _triangle_oracle() -> str:
    from tailsql_spark.operators.similarity import REGISTRY as _SIM

    sign_pairs = _SIM["ann_signlsh_bucket_pairs"].oracle
    return f"""
    WITH p0 AS ({sign_pairs}),
    pairs AS (SELECT id_a, id_b FROM p0),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
    o AS (
        SELECT s.u, s.v FROM sym s
        JOIN deg d1 ON d1.u = s.u JOIN deg d2 ON d2.u = s.v
        WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND s.u < s.v)
    ),
    w AS (SELECT o1.u, o1.v AS v1, o2.v AS v2
          FROM o o1 JOIN o o2 ON o2.u = o1.u AND o1.v < o2.v),
    tri AS (SELECT w.u, w.v1, w.v2
            FROM w JOIN pairs p ON p.id_a = w.v1 AND p.id_b = w.v2),
    tn AS (
        SELECT node AS doc_id, COUNT(*) AS n_triangles FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v1 FROM tri
            UNION ALL SELECT v2 FROM tri
        ) GROUP BY node
    )
    SELECT d.u AS doc_id, CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN d.deg >= 2
                 THEN 2.0 * COALESCE(t.n_triangles, 0) / (d.deg * (d.deg - 1))
                 ELSE 0.0 END, 6) AS clustering_coeff
    FROM deg d LEFT JOIN tn t ON t.doc_id = d.u
    """


@query(
    "graph_triangle_counts",
    "graph",
    _triangle_oracle(),
    plan=lambda s, d: _triangle_frames(s, d, cache=False)[0],
    doc="Per-node triangle counts + local clustering coefficients over "
    "the sign-LSH candidate graph, by DEGREE-ORDERED orientation (the "
    "production triangle algorithm): orient every edge from its lower "
    "(degree, id) endpoint, enumerate wedges only from each triangle's "
    "minimum-degree apex, and close them against the canonical edge "
    "list — each triangle found exactly once, and wedge fan-out is "
    "bounded by out-degree ≤ O(√m) instead of max degree (the "
    "difference between feasible and quadratic on power-law graphs). "
    "Clustering coefficient 2T/(deg·(deg−1)) flags spammy near-clique "
    "neighborhoods in candidate graphs — a curation signal exact "
    "pairwise dedup can't see. Scale: degree table broadcasts, wedges "
    "are one self-equi-join on the apex, closure is one equi-join on "
    "the (v1, v2) pair key; all-integer until the one rounded "
    "division.",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    result, caches = _triangle_frames(spark, sf_dir)
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    try:
        return materialize_result(result, "graph_triangle_counts", key=sf_key(sf_dir))
    finally:
        for frame in caches:
            frame.unpersist()


def _triangle_frames(spark: SparkSession, sf_dir: str, cache: bool = True):
    """(result, caches): the triangle computation plus the bucket cache
    the candidate graph pins — the query materializes and releases; the
    plan audit passes ``cache=False``."""
    from tailsql_spark.operators.similarity import _sign_bucket_pairs

    pairs, caches = _sign_bucket_pairs(spark, sf_dir, cache=cache)
    sym = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("degv"))
    # degree tables are candidate-graph-vertex-sized (linear in the
    # corpus): hint only under the source-size gate (r17, guide §3.1),
    # and only at THIS join site — ``deg`` is reused as the left side
    # of the final left join, where a broadcast hint is unsupported
    # (build side must be right) and would be noisily dropped
    from tailsql_spark.operators.dedup import _small_input

    small = _small_input(sf_dir)
    o = (
        sym.join(F.broadcast(deg) if small else deg, "u")
        .join(F.broadcast(dv) if small else dv, "v")
        .filter(
            (F.col("deg") < F.col("degv"))
            | ((F.col("deg") == F.col("degv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    o1 = o.select("u", F.col("v").alias("v1"))
    o2 = o.select("u", F.col("v").alias("v2"))
    wedge = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))
    tri = wedge.join(
        pairs, (wedge["v1"] == pairs["id_a"]) & (wedge["v2"] == pairs["id_b"])
    ).select("u", "v1", "v2")
    pern = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    nt = F.coalesce(F.col("n_triangles"), F.lit(0))
    coeff = F.when(
        F.col("deg") >= 2,
        F.lit(2.0) * nt / (F.col("deg") * (F.col("deg") - 1)),
    ).otherwise(F.lit(0.0))
    result = (
        deg.select(F.col("u").alias("doc_id"), "deg")
        .join(pern, "doc_id", "left")
        .select(
            "doc_id",
            F.col("deg").cast("long").alias("degree"),
            nt.cast("long").alias("n_triangles"),
            F.round(coeff, 6).alias("clustering_coeff"),
        )
    )
    return result, caches
