"""Similarity search over embedding columns (`array<float>`).

Extension operators (BASELINE.json north star): brute-force cosine
top-k as the correctness baseline, and an IVF (inverted-file) variant
as the scale path.

Scale design:

* **brute force** — broadcast the (small) query block against the
  corpus: one linear scan, no shuffle on the corpus side; top-k via a
  rank window partitioned by query. Right up to ~1e4 queries this is
  the honest baseline and the thing every ANN method is verified
  against. The hot loop is JVM-side ``zip_with``/``aggregate``; the
  bench variant uses an Arrow-batched numpy matmul (see
  :func:`ann_topk_pandas_df`) — same results, ~10× the throughput.
* **IVF** — assign every vector to its nearest coarse centroid
  (deterministic vec_id<8 seeds for the baseline variants; the
  ``_kmeans`` variants LEARN the cells with the certified Lloyd loop
  and compose multiprobe + PQ on top), then search only the query's
  probed cell(s). Turns O(N·Q) into O(N·Q·probes/C) with one extra
  equi-join on the cell id — exactly the partition-pruning shape that
  scales: at 100 TB the corpus is *stored* partitioned by cell, so a
  query touches probes/C of the files.  ``ann_ivf_recall_at_k``
  certifies the index's recall against the brute-force ground truth.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_CELLS = 8  # IVF coarse cells (seeded by vec_id < 8)


def query(name: str, category: str, oracle: str | None, doc: str = "", plan=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), plan=plan,
        )
        return fn

    return deco


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


_DUCK_DOT = (
    "(SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) "
    "FROM (SELECT unnest({a}) AS x, unnest({b}) AS y))"
)
_DUCK_NORM = (
    "sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) "
    "FROM (SELECT unnest({a}) AS x)))"
)

_BRUTE_ORACLE = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='c.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='c.embedding')}), 4) AS cosine
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
"""


def _scored(
    spark: SparkSession, sf_dir: str, raw: DataFrame | None = None
) -> DataFrame:
    base = raw if raw is not None else load_tables(spark, sf_dir)["embeddings"]
    emb = base.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    return (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )


@query(
    "ann_cosine_topk",
    "similarity",
    _BRUTE_ORACLE,
    doc="Brute-force cosine top-5 for 10 query vectors: broadcast query "
    "block × linear corpus scan, rank window per query. The ANN "
    "correctness baseline.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        _scored(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


def ann_topk_pandas_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched numpy variant of the brute-force scorer (bench path).

    The query block is closed over (it is tiny); each corpus partition
    arrives as pandas batches and scores against all queries with one
    matmul — the 100 TB-friendly shape for brute-force re-ranking.
    """
    import numpy as np

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    # The query block is the CLIENT side of an ANN search — K vectors,
    # not corpus data — so read it driver-side with parquet predicate
    # pushdown (pyarrow row-group + page pruning) rather than paying a
    # whole Spark job launch to fetch 10 rows (measured: the collect
    # job was ~0.12 s of the query's ~0.5 s at sf0.1, all fixed
    # overhead). Falls back to the collect when the table isn't a local
    # parquet path (e.g. a view over a remote store).
    try:
        import pyarrow.parquet as pq

        qtab = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", N_QUERIES)],
        ).sort_by("vec_id")
        q_ids = np.asarray(qtab["vec_id"])
        q_mat = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    except Exception:
        qrows = (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "embedding")
            .collect()
        )
        q_ids = np.array([r.vec_id for r in qrows])
        q_mat = np.array([r.embedding for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = q_mat @ c_mat.T  # (Q, B)
            n_q, n_b = sims.shape
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_b),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), n_q),
                    "cosine": sims.round(4).ravel(),
                }
            )
            # MAP-SIDE partial top-k (the aggregation-pushdown analogue
            # for top-k): only each query's local best TOP_K rows leave
            # the executor, so the rank-window shuffle downstream sees
            # Q·K rows per batch instead of Q·|corpus| — measured 3.5×
            # on this query at sf0.1 (0.57 s → 0.16 s), and the ratio
            # grows with corpus size. Exact: global top-k of per-batch
            # top-k unions ≡ top-k of the whole set under the same
            # (cosine DESC, neighbor_id ASC) order, applied after the
            # same 4-decimal rounding the final rank uses.
            out = out[out["neighbor_id"] != out["query_id"]]
            out = out.sort_values(
                ["query_id", "cosine", "neighbor_id"],
                ascending=[True, False, True],
            )
            yield out.groupby("query_id", sort=False).head(TOP_K)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


REGISTRY["ann_cosine_topk_arrow"] = QuerySpec(
    name="ann_cosine_topk_arrow",
    category="similarity",
    build=ann_topk_pandas_df,
    oracle=_BRUTE_ORACLE,
    doc="Same top-k as ann_cosine_topk but scored via Arrow-batched numpy "
    "matmul (mapInPandas) — the vectorized bench path, verified against "
    "the same oracle.",
)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def _duck_cells_sql(nc_sql: str) -> str:
    """The cells CTE (max-cosine assignment to the first-``nc`` seed
    vectors, ties → lowest seed id), parameterized on the seed-count
    SQL expression: the per-run family bakes the fixed ``N_CELLS``, the
    persisted index bakes the DIALED count's CASE ladder — one
    definition of the assignment rule for both."""
    return f"""
    cells AS (
        SELECT e.vec_id,
               (SELECT min(s.vec_id)
                FROM embeddings s
                WHERE s.vec_id < {nc_sql}
                  AND {_DUCK_DOT.format(a='e.embedding', b='s.embedding')}
                      / ({_DUCK_NORM.format(a='e.embedding')} * {_DUCK_NORM.format(a='s.embedding')})
                      = (SELECT max({_DUCK_DOT.format(a='e.embedding', b='s2.embedding')}
                                    / ({_DUCK_NORM.format(a='e.embedding')} * {_DUCK_NORM.format(a='s2.embedding')}))
                         FROM embeddings s2 WHERE s2.vec_id < {nc_sql})
               ) AS cell
        FROM embeddings e
    )
"""


_DUCK_CELLS = _duck_cells_sql(str(N_CELLS))


def assign_cells(vec: DataFrame, seeds: DataFrame) -> DataFrame:
    """IVF coarse quantization as a reusable rule: each ``(vec_id, v,
    nrm)`` row gets the max-cosine seed's cell, ties → lowest
    ``seed_id``.  THE single definition of the assignment order — the
    batch query, the streaming incremental processor, and the replay
    tests all call this, so the tie-break/rounding rule cannot drift
    between the certified streaming ≡ batch twins.  Keeps ``v``/``nrm``
    so downstream scoring needs no re-join.

    Expressed as a lexicographic max-struct AGGREGATION rather than a
    row_number window (r14): ``max(struct(scos, -seed_id, seed_id))``
    picks the identical winner (highest cosine, then lowest seed id —
    struct comparison puts a null cosine below every non-null one,
    matching the window's DESC-nulls-last), but hash-aggregates with
    MAP-SIDE partial combine: the |V|×|C| candidate stream collapses
    to one row per vec_id per input partition before the exchange, so
    the shuffle carries |V| rows instead of sorting |V|×|C| — the
    difference between a corpus-sized sort and a key-sized exchange
    when a re-train assigns 10⁹ vectors to 65k cells.  ``v``/``nrm``
    are constant within a vec_id group, so ``first`` over them is
    deterministic."""
    cos = dot(F.col("v"), F.col("sv")) / (F.col("nrm") * F.col("sn"))
    return (
        vec.join(F.broadcast(seeds))
        .withColumn("scos", cos)
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("scos").alias("s"),
                    (-F.col("seed_id")).alias("ns"),
                    F.col("seed_id").alias("seed_id"),
                )
            ).alias("b"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", F.col("b.seed_id").alias("cell"), "v", "nrm")
    )


def seed_table(vec: DataFrame) -> DataFrame:
    """The fixed coarse-cell seed vectors (``vec_id < N_CELLS``) in the
    column shape :func:`assign_cells` expects."""
    return vec.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"), F.col("nrm").alias("sn")
    )


@query(
    "ann_ivf_assign",
    "similarity",
    f"WITH {_DUCK_CELLS} SELECT vec_id, cell FROM cells",
    doc="IVF coarse quantization: every vector assigned to its "
    "max-cosine seed cell (ties → lowest seed id). At scale this is "
    "the storage partitioning key.",
)
def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    return assign_cells(emb, seed_table(emb)).select("vec_id", "cell")


@query(
    "ann_ivf_topk",
    "similarity",
    f"""
    WITH {_DUCK_CELLS},
    q AS (SELECT c.vec_id, c.cell, e.embedding
          FROM cells c JOIN embeddings e USING (vec_id) WHERE c.vec_id < {N_QUERIES}),
    corp AS (SELECT c.vec_id, c.cell, e.embedding
             FROM cells c JOIN embeddings e USING (vec_id)),
    scored AS (
        SELECT q.vec_id AS query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM q JOIN corp ON q.cell = corp.cell AND corp.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc="IVF search: probe only the query's own cell (cell equi-join "
    "replaces the full cross product) → top-3. The recall/latency "
    "trade is the standard IVF one; verified cell-for-cell vs DuckDB.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cells = ann_ivf_assign(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    both = emb.join(cells, "vec_id")
    q = both.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = both.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cell") == F.col("ccell")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


def _kmeans_ivf_oracle() -> str:
    """IVF search over LEARNED cells: the k-means trajectory's final
    assignment (the exact integer-quantized Lloyd walk certified by
    ann_kmeans_lloyd) becomes the cell table, then the same
    probe-own-cell top-3 as ann_ivf_topk."""
    from tailsql_spark.operators.mlprep import KMEANS_ITERS, kmeans_cte_parts

    parts = kmeans_cte_parts()
    ka = f"a{KMEANS_ITERS}"
    parts.append(
        f"""
    q AS (SELECT a.vec_id, a.cell, e.embedding
          FROM {ka} a JOIN embeddings e USING (vec_id)
          WHERE a.vec_id < {N_QUERIES}),
    corp AS (SELECT a.vec_id, a.cell, e.embedding
             FROM {ka} a JOIN embeddings e USING (vec_id)),
    scored AS (
        SELECT q.vec_id AS query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM q JOIN corp ON q.cell = corp.cell AND corp.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3"""
    )
    return "\n".join(parts)


@query(
    "ann_ivf_kmeans_topk",
    "similarity",
    _kmeans_ivf_oracle(),
    doc="The real ANN index build: IVF cells LEARNED by the certified "
    "k-means Lloyd loop (operators/mlprep.py) instead of first-8-vector "
    "seeds, then probe-own-cell top-3 exactly as ann_ivf_topk. The "
    "composition a production pipeline runs — cluster the corpus, "
    "partition storage by learned cell, search the query's cell. "
    "Cross-engine exact because the assignment rides the integer-"
    "quantized trajectory (one shared CTE/loop definition on each side) "
    "and scoring reuses the rounded-cosine rule.",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.mlprep import lloyd_loop

    assigned, _ = lloyd_loop(spark, sf_dir)
    cells = assigned.select("vec_id", "cell")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    both = emb.join(cells, "vec_id")
    q = both.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = both.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cell") == F.col("ccell")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


SEMDEDUP_EPS = 0.4  # within-cell cosine above this ⇒ semantic duplicate


def _semdedup_oracle() -> str:
    """SemDeDup over learned cells, recursion-free: membership comes
    from the shared k-means trajectory CTEs; within each cell a vector
    is pruned iff some SMALLER-id member sits within ε cosine (greedy
    keep-first — exactly expressible as one aggregated self-join, no
    transitive closure needed)."""
    from tailsql_spark.operators.mlprep import KMEANS_ITERS, kmeans_cte_parts

    parts = kmeans_cte_parts()
    ka = f"a{KMEANS_ITERS}"
    parts.append(
        f"""
    m AS (SELECT a.vec_id, a.cell, e.embedding
          FROM {ka} a JOIN embeddings e USING (vec_id)),
    dup AS (
        SELECT x.vec_id, MIN(y.vec_id) AS pruned_by
        FROM m x JOIN m y ON x.cell = y.cell AND y.vec_id < x.vec_id
        WHERE ROUND({_DUCK_DOT.format(a='x.embedding', b='y.embedding')}
                    / ({_DUCK_NORM.format(a='x.embedding')}
                       * {_DUCK_NORM.format(a='y.embedding')}), 4)
              >= {SEMDEDUP_EPS}
        GROUP BY x.vec_id
    )
    SELECT m.vec_id, m.cell,
           (d.pruned_by IS NULL) AS is_kept,
           d.pruned_by
    FROM m LEFT JOIN dup d USING (vec_id)"""
    )
    return "\n".join(parts)


@query(
    "dedup_semantic",
    "dedup",
    _semdedup_oracle(),
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023 shape): "
    "k-means-cluster the embedding space (the certified Lloyd "
    "trajectory), compare pairs ONLY within a cell, prune every vector "
    "that has an ε-close smaller-id cellmate (greedy keep-canonical — "
    "deterministic and recursion-free, so the oracle is one aggregated "
    "self-join per cell). Scale: the pairwise stage is quadratic only "
    "within a cell, never across the corpus — cells are the storage "
    "partitioning key, so each executor prunes its own cell locally; "
    "the cross-corpus cost is the linear k-means pass it composes.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.mlprep import lloyd_loop

    assigned, _ = lloyd_loop(spark, sf_dir)
    cells = assigned.select("vec_id", "cell")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    m = emb.join(cells, "vec_id")
    x = m.select("vec_id", "cell", "v", "nrm")
    y = m.select(
        F.col("vec_id").alias("y_id"),
        F.col("cell").alias("y_cell"),
        F.col("v").alias("yv"),
        F.col("nrm").alias("ynrm"),
    )
    cos = dot(F.col("v"), F.col("yv")) / (F.col("nrm") * F.col("ynrm"))
    dup = (
        x.join(y, (F.col("cell") == F.col("y_cell")) & (F.col("y_id") < F.col("vec_id")))
        .filter(F.round(cos, 4) >= SEMDEDUP_EPS)
        .groupBy("vec_id")
        .agg(F.min("y_id").alias("pruned_by"))
    )
    return (
        m.select("vec_id", "cell")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("pruned_by").isNull().alias("is_kept"),
            "pruned_by",
        )
    )


N_PROBES = 2  # multiprobe: search the query's 2 nearest cells


@query(
    "ann_ivf_multiprobe_topk",
    "similarity",
    f"""
    WITH {_DUCK_CELLS},
    seeds AS (SELECT vec_id AS seed_id, embedding FROM embeddings
              WHERE vec_id < {N_CELLS}),
    probes AS (
        SELECT query_id, seed_id AS cell FROM (
            SELECT e.vec_id AS query_id, s.seed_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_DUCK_DOT.format(a='e.embedding', b='s.embedding')}
                                / ({_DUCK_NORM.format(a='e.embedding')}
                                   * {_DUCK_NORM.format(a='s.embedding')}) DESC,
                                s.seed_id ASC) AS rn
            FROM embeddings e CROSS JOIN seeds s
            WHERE e.vec_id < {N_QUERIES})
        WHERE rn <= {N_PROBES}
    ),
    corp AS (SELECT c.vec_id, c.cell, e.embedding
             FROM cells c JOIN embeddings e USING (vec_id)),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT p.query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM probes p
        JOIN corp ON corp.cell = p.cell AND corp.vec_id <> p.query_id
        JOIN q ON q.vec_id = p.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc=f"IVF multiprobe: each query searches its {N_PROBES} nearest "
    "cells instead of one — the standard recall lever when the true "
    "neighbor straddles a cell boundary. Cost grows by the probe "
    f"factor, never by corpus size: probes is a |Q|x{N_PROBES} "
    "broadcast and the corpus side stays one cell equi-join over "
    "cell-partitioned storage. A corpus vector lives in exactly one "
    "cell, so probed cells never produce duplicate candidates.",
)
def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cells = ann_ivf_assign(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    seeds = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("seed_id"),
        F.col("v").alias("sv"),
        F.col("nrm").alias("sn"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    seed_cos = dot(F.col("qv"), F.col("sv")) / (F.col("qn") * F.col("sn"))
    wq = W.partitionBy("query_id").orderBy(F.col("scos").desc(), F.col("seed_id").asc())
    probes = (
        q.join(F.broadcast(seeds))
        .withColumn("scos", seed_cos)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBES)
        .select("query_id", F.col("seed_id").alias("cell"), "qv", "qn")
    )
    corp = emb.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        F.broadcast(probes)
        .join(
            corp,
            (F.col("cell") == F.col("ccell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# sign-LSH (random hyperplane) bucketing
# ---------------------------------------------------------------------------

N_LSH_TABLES = 4  # L hash tables ...
PLANES_PER_TABLE = 4  # ... of k sign bits each

#: Collision math (why multi-table): P[bit agrees] = 1 − θ/π; a single
#: k-bit table recalls pᵏ (3% at cos≈0.42 with k=8 — measured), while
#: L tables recall 1 − (1 − pᵏ)ᴸ (~50% here) at candidate rate
#: ≈ L·2⁻ᵏ for random pairs. k trades precision, L buys recall.


def _plane_seeds(emb: DataFrame) -> DataFrame:
    """Deterministic pseudo-hyperplanes: the first L·k corpus vectors
    (a real pipeline would sample Gaussian planes; seeding from the
    corpus keeps the oracle reproducible with zero literals)."""
    n = N_LSH_TABLES * PLANES_PER_TABLE
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("plane_id"), F.col("v").alias("pv")
    )


def _duck_table_bucket(table: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) "
        f"FROM (SELECT unnest(e.embedding) AS x, unnest((SELECT embedding FROM embeddings WHERE vec_id = {table * PLANES_PER_TABLE + p}) ) AS y)) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(PLANES_PER_TABLE)
    )
    return f"SELECT vec_id, {table} AS tbl, {bits} AS bucket FROM embeddings e"


_DUCK_SIGN_BUCKETS = " UNION ALL ".join(
    _duck_table_bucket(t) for t in range(N_LSH_TABLES)
)


@query(
    "ann_signlsh_bucket_pairs",
    "similarity",
    plan=lambda s, d: _sign_bucket_pairs(s, d, cache=False)[0],
    oracle=f"""
    WITH buckets AS ({_DUCK_SIGN_BUCKETS})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    """,
    doc="Random-hyperplane (sign) LSH, multi-table (L=4 tables × k=4 "
    "bits): candidates = pairs colliding in ANY table. O(n·L) "
    "bucketing + equi-join on (table, bucket) replaces the O(n²) "
    "cosine cross product — the embedding near-dup scale path.",
)
def ann_signlsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, caches = _sign_bucket_pairs(spark, sf_dir)
    # materialize-and-release (the PageRank lesson): the pair table is
    # candidate-sized; write it out and drop the bucket cache so a
    # session running the sign-LSH family repeatedly leaks nothing.
    try:
        return _materialized(pairs, "ann_signlsh_bucket_pairs", sf_dir)
    finally:
        for frame in caches:
            frame.unpersist()


def _sign_bucket_pairs(spark: SparkSession, sf_dir: str, cache: bool = True):
    """Shared core: (pairs, caches) — multi-table sign-LSH candidate
    pairs (id_a < id_b) plus the persisted bucket table the self-join
    pins.  Callers materialize their result and release the caches;
    plan tooling passes ``cache=False`` (it never materializes, so a
    persist would leak for the session)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    planes = _plane_seeds(emb)
    d = dot(F.col("v"), F.col("pv"))
    tbl = (F.col("plane_id") / PLANES_PER_TABLE).cast("int")
    signed = (
        # planes is a CONSTANT-size table (L*k = 16 rows) — the hint is
        # always safe, unlike a corpus-proportional side.
        emb.join(F.broadcast(planes))
        .select(
            "vec_id",
            tbl.alias("tbl"),
            (F.when(d >= 0, F.expr(f"shiftleft(1, CAST(plane_id % {PLANES_PER_TABLE} AS INT))"))
             .otherwise(F.lit(0))).alias("bit"),
        )
        .groupBy("vec_id", "tbl")
        .agg(F.sum("bit").cast("long").alias("bucket"))
    )
    # The bucket table self-joins below.  Without a persist the
    # O(n·L·d) plane fan-out — the one interpreted-HOF stage in this
    # pipeline — is planned AND COMPUTED once per join side (the
    # round-1 minhash lesson, dedup.py: never cache nothing when a
    # DAG self-joins).  Three narrow scalar columns (vec_id, tbl,
    # bucket): cheap to cache at any corpus size, and the columnar
    # checkpoint you'd write to scratch storage at 1e9 docs.
    if cache:
        signed = signed.persist()
        signed.count()
    a = signed.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
    b = signed.select(
        F.col("vec_id").alias("id_b"), F.col("tbl").alias("t2"), F.col("bucket").alias("b2")
    )
    pairs = (
        a.join(
            b,
            (F.col("tbl") == F.col("t2"))
            & (F.col("bucket") == F.col("b2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs, ((signed,) if cache else ())


COSINE_DUP_THRESHOLD = 0.42  # same corpus-relative cut as dedup_embedding_cosine


@query(
    "dedup_embedding_lsh_verified",
    "dedup",
    plan=lambda s, d: _verified_pairs(s, d, cache=False)[0],
    oracle=f"""
    WITH buckets AS ({_DUCK_SIGN_BUCKETS}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           ROUND({_DUCK_DOT.format(a='ea.embedding', b='eb.embedding')}
                 / ({_DUCK_NORM.format(a='ea.embedding')}
                    * {_DUCK_NORM.format(a='eb.embedding')}), 4) AS cosine
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE {_DUCK_DOT.format(a='ea.embedding', b='eb.embedding')}
          / ({_DUCK_NORM.format(a='ea.embedding')}
             * {_DUCK_NORM.format(a='eb.embedding')}) >= {COSINE_DUP_THRESHOLD}
    """,
    doc="Scale-safe embedding near-dup: sign-LSH bucket candidates "
    "(O(n·L) + equi-join, never all-pairs) → exact-cosine verify at "
    "the same 0.42 cut as dedup_embedding_cosine. This is the shape "
    "that survives 1e9 docs where the brute-force theta join cannot; "
    "recall is bounded by the L=4×k=4 table family (candidates only). "
    "Ref parity: dispensable/tailsql has no ANN surface — LLM-pipeline "
    "extension per the build brief.",
)
def dedup_embedding_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    result, caches = _verified_pairs(spark, sf_dir)
    try:
        return _materialized(result, "dedup_embedding_lsh_verified", sf_dir)
    finally:
        for frame in caches:
            frame.unpersist()


def _verified_pairs(spark: SparkSession, sf_dir: str, cache: bool = True):
    """(result, caches) for the sign-LSH-pruned exact-cosine near-dup
    verify — the query materializes and releases; plan tooling and the
    plan-shape test consume the frames directly."""
    t = load_tables(spark, sf_dir)
    cand, caches = _sign_bucket_pairs(spark, sf_dir, cache=cache)
    emb = t["embeddings"].select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
    ).withColumn("nrm", norm(F.col("v")))
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    # Two equi-joins on the candidate ids: the candidate set is tiny
    # relative to the corpus (LSH pruned), so AQE turns these into
    # broadcasts when they fit; no hint — at 1e9 docs the candidate
    # table is legitimately large and must shuffle.
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    result = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b", F.round("cosine_raw", 4).alias("cosine"))
    )
    return result, caches


# ---------------------------------------------------------------------------
# product quantization + ADC (the compressed-index ANN family)
# ---------------------------------------------------------------------------

PQ_M = 8      # subspaces (64 dims → 8 × 8)
PQ_DSUB = 8   # dims per subspace
PQ_CODES = 4  # codes per subspace, seeded from vec_id < 4 subvectors

_PQ_SUBDIST = (
    "CAST(list_sum(list_transform(generate_series(1, 8),"
    " i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS BIGINT)"
)

_PQ_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
        FROM embeddings
    ),
    ms AS (SELECT unnest(range({PQ_M})) AS m),
    sub AS (
        SELECT vec_id, ms.m, e.v[ms.m * {PQ_DSUB} + 1 : ms.m * {PQ_DSUB} + {PQ_DSUB}] AS sv
        FROM e CROSS JOIN ms
    ),
    cb AS (
        SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {PQ_CODES}
    ),
    cand AS (
        SELECT s.vec_id, s.m, c.code, {_PQ_SUBDIST} AS dist
        FROM sub s JOIN cb c USING (m)
    ),
    codes AS (
        SELECT vec_id, m, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                         ORDER BY dist, code) AS rn
            FROM cand
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT vec_id AS query_id, m, code, dist AS d
        FROM cand WHERE vec_id < {N_QUERIES}
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(l.d) AS BIGINT) AS adc_dist
        FROM codes cd JOIN lut l ON l.m = cd.m AND l.code = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, neighbor_id) AS rnk
        FROM adc
    ) WHERE rnk <= {TOP_K}
"""


@query(
    "ann_pq_adc_topk",
    "similarity",
    _PQ_ORACLE,
    doc=f"Product-quantization ANN with asymmetric distance computation: "
    f"{PQ_M} subspaces × {PQ_DSUB} dims, {PQ_CODES}-entry codebook per "
    f"subspace (deterministic vec_id<{PQ_CODES} seeds; ann_pq_kmeans_topk "
    "is the Lloyd-TRAINED variant), every "
    f"vector compressed to {PQ_M} code bytes, queries scored per-code "
    "via a broadcast lookup table and summed — exact x1e6-quantized "
    "integer arithmetic end to end, so the DuckDB replay hash-matches. "
    "Scale: the codes table IS the index (M bytes/vector — the only "
    "corpus-sized artifact, ~1000x smaller than raw vectors), the LUT "
    "is queries×M×K rows broadcast, scoring is one broadcast join + "
    "one (query,vec) groupBy — no full-vector math ever touches the "
    "corpus at query time.",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    sub = _pq_subvectors(spark, sf_dir)
    cb = sub.filter(F.col("vec_id") < PQ_CODES).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    cand = _pq_code_distances(sub, cb)
    return _pq_adc_rank(cand)


def _pq_subvectors(
    spark: SparkSession, sf_dir: str, raw: DataFrame | None = None
) -> DataFrame:
    """(vec_id, m, sv): ×1e6-quantized BIGINT subvectors, one row per
    (vector, subspace) — the shared input of the seeded and the
    Lloyd-trained PQ builds."""
    base = raw if raw is not None else load_tables(spark, sf_dir)["embeddings"]
    e = base.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"
        ).alias("v"),
    )
    msubs = F.array(
        *[
            F.struct(
                F.lit(m).cast("long").alias("m"),
                F.slice("v", m * PQ_DSUB + 1, PQ_DSUB).alias("sv"),
            )
            for m in range(PQ_M)
        ]
    )
    return e.select("vec_id", F.explode(msubs).alias("s")).select(
        "vec_id", "s.m", "s.sv"
    )


def _pq_code_distances(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, code, dist): exact integer distance of every
    subvector to every codebook entry of its subspace — the codebook
    (M×K rows) broadcasts, the corpus is scanned once."""
    dist = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", dist.alias("dist")
    )


def _pq_adc_rank(cand: DataFrame) -> DataFrame:
    """Codes + LUT + ADC scoring + top-k from a (vec_id, m, code, dist)
    distance table — shared tail of both PQ variants."""
    codes = (
        cand.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "code")).alias("mc"))
        .select("vec_id", "m", F.col("mc.code").alias("code"))
    )
    lut = cand.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code", F.col("dist").alias("d")
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# PQ with Lloyd-TRAINED codebooks (the production index build)
# ---------------------------------------------------------------------------

#: per-subspace Lloyd steps: assignments under cb0, cb1, cb2
#: (2 codebook updates) — the PQ twin of mlprep.KMEANS_ITERS.
PQ_KMEANS_ITERS = 3


def _pq_kmeans_cte_parts(prefix: str = "", src: str = "embeddings") -> list[str]:
    """CTE chain (no ``WITH``, trailing commas) for per-subspace
    k-means codebook training — the subspace id ``m`` rides through
    every CTE as an extra grouping key, so ONE chain trains all
    PQ_M codebooks, exactly what the Spark loop does with (m, code)
    compound keys.  ``prefix`` namespaces every CTE so the chain
    composes with kmeans_cte_parts (whose names e/d1/a1/u1 would
    otherwise collide) in the IVF-PQ oracle.  Ends at
    ``{prefix}d{last}`` (full distance table) / ``{prefix}a{last}``
    (final code assignment).  Same exactness device as
    kmeans_cte_parts: ×1e6 BIGINT subvectors, integer distances,
    FLOOR'd centroid means."""
    p = prefix
    parts = [
        f"{p}e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v"
        f" FROM {src}),",
        f"{p}ms AS (SELECT unnest(range({PQ_M})) AS m),",
        f"{p}sub AS (SELECT vec_id, {p}ms.m,"
        f" {p}e.v[{p}ms.m * {PQ_DSUB} + 1 : {p}ms.m * {PQ_DSUB} + {PQ_DSUB}] AS sv"
        f" FROM {p}e CROSS JOIN {p}ms),",
        f"{p}cb0 AS (SELECT m, vec_id AS code, sv AS cv FROM {p}sub"
        f" WHERE vec_id < {PQ_CODES}),",
    ]
    for r in range(1, PQ_KMEANS_ITERS + 1):
        parts.append(
            f"{p}d{r} AS (SELECT s.vec_id, s.m, c.code, {_PQ_SUBDIST} AS dist"
            f" FROM {p}sub s JOIN {p}cb{r - 1} c USING (m)),"
        )
        parts.append(
            f"{p}a{r} AS (SELECT vec_id, m, code, dist FROM"
            f" (SELECT *, row_number() OVER (PARTITION BY vec_id, m"
            f" ORDER BY dist, code) AS rn FROM {p}d{r}) WHERE rn = 1),"
        )
        if r < PQ_KMEANS_ITERS:
            parts.append(
                f"{p}u{r} AS (SELECT a.m, a.code, CAST(t.i AS BIGINT) AS pos,"
                f" CAST(FLOOR(SUM(s.sv[t.i + 1]) * 1.0 / COUNT(*)) AS BIGINT) AS v"
                f" FROM {p}a{r} a JOIN {p}sub s ON s.vec_id = a.vec_id AND s.m = a.m"
                f" CROSS JOIN range({PQ_DSUB}) t(i)"
                f" GROUP BY 1, 2, 3),"
            )
            parts.append(
                f"{p}cb{r} AS (SELECT m, code, list(v ORDER BY pos) AS cv FROM {p}u{r}"
                f" GROUP BY m, code),"
            )
    return parts


def _pq_kmeans_oracle() -> str:
    """Trained-codebook PQ oracle: the training CTE chain + the same
    ADC scoring as ann_pq_adc_topk."""
    last = PQ_KMEANS_ITERS
    parts = ["WITH " + "\n".join(_pq_kmeans_cte_parts())]
    parts.append(
        f"""
    lut AS (SELECT vec_id AS query_id, m, code, dist AS d
            FROM d{last} WHERE vec_id < {N_QUERIES}),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(l.d) AS BIGINT) AS adc_dist
        FROM a{last} cd JOIN lut l ON l.m = cd.m AND l.code = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, neighbor_id) AS rnk
        FROM adc
    ) WHERE rnk <= {TOP_K}"""
    )
    return "\n".join(parts)


@query(
    "ann_pq_kmeans_topk",
    "similarity",
    _pq_kmeans_oracle(),
    plan=lambda s, d: _pq_adc_rank(pq_trained_distances(s, d)),
    doc=f"PQ/ADC over Lloyd-TRAINED codebooks (closes the round-5 gap: "
    f"ann_pq_adc_topk's codebooks were vec_id<{PQ_CODES} seeds): "
    f"{PQ_KMEANS_ITERS} per-subspace k-means steps train all {PQ_M} "
    "codebooks in ONE pipeline — the subspace id is just an extra "
    "compound key on every Lloyd stage, so each step stays scan + "
    f"broadcast({PQ_M}×{PQ_CODES} codebook rows) + one (m,code,pos) "
    "shuffle — then the standard ADC scoring (broadcast LUT, one "
    "groupBy) ranks neighbors. Certified cross-engine INCLUDING the "
    "training trajectory via the same ×1e6-integer exactness device "
    "as ann_kmeans_lloyd.",
)
def ann_pq_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    dist = pq_trained_distances(spark, sf_dir).persist()
    try:
        return _materialized(_pq_adc_rank(dist), "ann_pq_kmeans_topk", sf_dir)
    finally:
        dist.unpersist()


def _materialized(df: DataFrame, name: str, sf_dir: str) -> DataFrame:
    """Materialize-and-release for the trained-PQ queries: both ADC
    consumers (codes + LUT) derive from the 3-iteration training
    chain, so without a cache the chain is evaluated twice inside one
    plan; with a bare persist the cache would leak for the session
    (the PageRank lesson).  Write the (top-k-sized) result keyed by
    corpus path (a second-corpus build must not overwrite files a lazy
    frame from the first still reads), return the parquet-backed
    frame, let callers unpersist in a finally."""
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    return materialize_result(df, name, key=sf_key(sf_dir))


def pq_trained_distances(
    spark: SparkSession,
    sf_dir: str,
    raw: DataFrame | None = None,
    n_iters: int = PQ_KMEANS_ITERS,
    spool: str | None = None,
) -> DataFrame:
    """Train the per-subspace codebooks (``n_iters`` Lloyd steps) and
    return the FINAL distance table ``(vec_id, m, code, dist)`` —
    codes and query LUTs both derive from it.  The Spark twin of
    ``_pq_kmeans_cte_parts``; shared by ann_pq_kmeans_topk and the
    composed IVF-PQ stack.  ``spool``: per-iteration lineage truncation
    of the codebook table (M×K rows) for deep runs — the same Catalyst
    plan-tree-growth discipline as lloyd_loop / the BPE trainer; the
    deep-run property test proves trajectory identity.  Caller owns the
    dir."""
    sub = _pq_subvectors(spark, sf_dir, raw)
    cb = sub.filter(F.col("vec_id") < PQ_CODES).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    cand = None
    for r in range(n_iters):
        if spool is not None:
            cb.write.mode("overwrite").parquet(f"{spool}/cb{r}")
            cb = spark.read.parquet(f"{spool}/cb{r}")
        cand = _pq_code_distances(sub, cb)
        if r < n_iters - 1:
            assigned = (
                cand.groupBy("vec_id", "m")
                .agg(F.min(F.struct("dist", "code")).alias("mc"))
                .select("vec_id", "m", F.col("mc.code").alias("code"))
            )
            per_el = (
                assigned.join(sub, ["vec_id", "m"])
                .select("m", "code", F.posexplode("sv").alias("pos_i", "x"))
                .groupBy("m", "code", F.col("pos_i").cast("long").alias("pos"))
                .agg(
                    F.floor(F.sum("x") * 1.0 / F.count("*")).cast("long").alias("v")
                )
            )
            cb = per_el.groupBy("m", "code").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("cv")
            )
    return cand


# ---------------------------------------------------------------------------
# multiprobe over LEARNED cells (the full production ANN stack)
# ---------------------------------------------------------------------------

def _learned_probes(
    spark: SparkSession, sf_dir: str, cent: DataFrame, raw: DataFrame | None = None
) -> DataFrame:
    """(query_id, cell): each query's N_PROBES nearest LEARNED
    centroids, selected by the SAME exact-integer distance the Lloyd
    assignment used (ties -> lower cell) — probe 1 is therefore
    provably the query's own cell.  Shared by the learned multiprobe
    and the composed IVF-PQ stack so probe tie-breaking cannot
    diverge between them or their oracles."""
    from tailsql_spark.operators.mlprep import quantize_embedding

    base = raw if raw is not None else load_tables(spark, sf_dir)["embeddings"]
    eq = (
        base
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", quantize_embedding("embedding").alias("e"))
    )
    intdist = F.expr(
        "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    wq = W.partitionBy("query_id").orderBy(F.asc("pdist"), F.asc("cell"))
    return (
        eq.crossJoin(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), "cell", intdist.alias("pdist"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBES)
        .select("query_id", "cell")
    )


def _kmeans_multiprobe_oracle() -> str:
    """Learned-cell multiprobe: the certified Lloyd trajectory supplies
    BOTH the corpus partitioning (final assignment) and the probe
    targets (the centroids that assignment was computed under); each
    query searches its N_PROBES nearest learned centroids by the SAME
    exact-integer distance the assignment used, then candidates score
    by the rounded-cosine rule."""
    from tailsql_spark.operators.mlprep import (
        EMBED_DIM,
        KMEANS_ITERS,
        kmeans_cte_parts,
    )

    parts = kmeans_cte_parts()
    ka, kc = f"a{KMEANS_ITERS}", f"c{KMEANS_ITERS - 1}"
    intdist = (
        f"CAST(list_sum(list_transform(generate_series(1, {EMBED_DIM}),"
        f" i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))) AS BIGINT)"
    )
    parts.append(
        f"""
    probes AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {intdist}, c.cell) AS rn
            FROM e CROSS JOIN {kc} c
            WHERE e.vec_id < {N_QUERIES})
        WHERE rn <= {N_PROBES}
    ),
    corp AS (SELECT a.vec_id, a.cell, em.embedding
             FROM {ka} a JOIN embeddings em USING (vec_id)),
    qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT p.query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM probes p
        JOIN corp ON corp.cell = p.cell AND corp.vec_id <> p.query_id
        JOIN qv q ON q.vec_id = p.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3"""
    )
    return "\n".join(parts)


@query(
    "ann_ivf_kmeans_multiprobe_topk",
    "similarity",
    _kmeans_multiprobe_oracle(),
    plan=lambda s, d: _kmeans_multiprobe_ranked(s, d, cache=False)[0],
    doc=f"The full production ANN stack certified end-to-end: k-means-"
    "LEARNED cells (the certified Lloyd trajectory) + multiprobe — "
    f"each query searches its {N_PROBES} nearest learned centroids "
    "(chosen by the SAME exact-integer distance the assignment used, "
    "so probe 1 is provably the query's own cell) and candidates "
    "score by rounded cosine. Scale shape unchanged from "
    "ann_ivf_multiprobe_topk: probes are a |Q|×N_PROBES broadcast, "
    "the corpus side is one cell equi-join over cell-partitioned "
    "storage, cost grows with the probe factor never the corpus.",
)
def ann_ivf_kmeans_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked, caches = _kmeans_multiprobe_ranked(spark, sf_dir)
    try:
        return _materialized(ranked, "ann_ivf_kmeans_multiprobe_topk", sf_dir)
    finally:
        for frame in caches:
            frame.unpersist()


def _kmeans_multiprobe_ranked(spark: SparkSession, sf_dir: str, cache: bool = True):
    """(ranked, caches): the learned-cell multiprobe computation plan
    plus the Lloyd frames it cached — the query materializes ranked
    and releases the caches; the plan test inspects ranked directly
    (the materialized frame's plan is just a parquet scan).
    ``cache=False`` (plan-audit lambdas, which never materialize and
    drop the handles) skips the persists entirely."""
    from tailsql_spark.operators.mlprep import lloyd_loop

    # cells and centroids are both consumed (probes from cent, corp
    # from assigned), each tracing the full Lloyd chain — cache for
    # the build, release after materialization (see ann_ivfpq_topk)
    assigned, cent = lloyd_loop(spark, sf_dir)
    if cache:
        assigned = assigned.persist()
        cent = cent.persist()
    probes = _learned_probes(spark, sf_dir, cent)
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probes_q = probes.join(q, probes.query_id == q.qid).select(
        "query_id", "cell", "qv", "qn"
    )
    corp = emb.join(assigned.select("vec_id", "cell"), "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        F.broadcast(probes_q)
        .join(
            corp,
            (F.col("cell") == F.col("ccell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    ranked = (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )
    return ranked, ((assigned, cent) if cache else ())


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the learned IVF vs brute force
# ---------------------------------------------------------------------------

RECALL_K = 3  # ivf variants rank top-3; recall is measured at the same k
# The IVF/IVF-PQ top-k queries rank exactly 3 rows (the literal in their
# oracles and ranked builders); measuring recall at a larger k would
# silently cap n_hit at 3 — fail LOUD at import instead.  A real raise,
# not assert: python -O strips asserts and the cap would go silent.
if RECALL_K > 3:
    raise ValueError("raise the ranked builders' top-k before RECALL_K")


def _brute_recall_tail(
    approx_cte: str, src: str = "embeddings", n_queries: int = N_QUERIES
) -> str:
    """qb/brute_scored/brute3 CTEs + the final recall SELECT, joined
    against ``approx_cte`` (a CTE yielding (query_id, neighbor_id)
    top-RECALL_K rows).  THE single definition of the ground-truth
    side and the recall arithmetic, shared by every recall oracle.
    ``n_queries`` narrows the query block (the persisted-index probes
    serve a request-sized N_QUERIES_IDX batch, not the full 10)."""
    return f"""
    qb AS (SELECT vec_id, embedding FROM {src} WHERE vec_id < {n_queries}),
    brute_scored AS (
        SELECT qb.vec_id AS query_id, cc.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='qb.embedding', b='cc.embedding')}
                     / ({_DUCK_NORM.format(a='qb.embedding')}
                        * {_DUCK_NORM.format(a='cc.embedding')}), 4) AS cosine
        FROM qb JOIN {src} cc ON cc.vec_id <> qb.vec_id
    ),
    brute3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rnk
            FROM brute_scored) WHERE rnk <= {RECALL_K}
    )
    SELECT b.query_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hit,
           CAST({RECALL_K} AS BIGINT) AS k,
           ROUND(COUNT(i.neighbor_id) * 1.0 / {RECALL_K}, 4) AS recall
    FROM brute3 b
    LEFT JOIN {approx_cte} i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id"""


def _recall_vs_brute(
    spark: SparkSession,
    sf_dir: str,
    approx3: DataFrame,
    raw: DataFrame | None = None,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Spark twin of :func:`_brute_recall_tail`: join an approximate
    top-RECALL_K frame (query_id, neighbor_id) against brute-force
    cosine ground truth and aggregate per-query recall.  Shared by
    every recall metric so rounding/tie rules cannot drift.
    ``n_queries`` narrows the query block like the oracle tail's."""
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    brute3 = (
        _scored(spark, sf_dir, raw)
        .filter(F.col("query_id") < n_queries)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    hit = approx3.withColumn("hit", F.lit(1))
    return (
        brute3.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hit"),
            F.lit(RECALL_K).cast("long").alias("k"),
            F.round(F.count("hit") * 1.0 / RECALL_K, 4).alias("recall"),
        )
    )


def _ivf_recall_oracle() -> str:
    """recall@3 of learned-cell IVF against the exact brute-force
    neighbors: both rankings come from the SAME rounded-cosine rule, so
    the metric is exact cross-engine.  The IVF side reuses the
    certified Lloyd-trajectory CTEs (one definition of the cells)."""
    from tailsql_spark.operators.mlprep import KMEANS_ITERS, kmeans_cte_parts

    parts = kmeans_cte_parts()
    ka = f"a{KMEANS_ITERS}"
    parts.append(
        f"""
    qi AS (SELECT a.vec_id, a.cell, e.embedding
           FROM {ka} a JOIN embeddings e USING (vec_id)
           WHERE a.vec_id < {N_QUERIES}),
    corp AS (SELECT a.vec_id, a.cell, e.embedding
             FROM {ka} a JOIN embeddings e USING (vec_id)),
    ivf_scored AS (
        SELECT qi.vec_id AS query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='qi.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='qi.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM qi JOIN corp ON qi.cell = corp.cell AND corp.vec_id <> qi.vec_id
    ),
    ivf3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rnk
            FROM ivf_scored) WHERE rnk <= {RECALL_K}
    ),{_brute_recall_tail('ivf3')}"""
    )
    return "\n".join(parts)


@query(
    "ann_ivf_recall_at_k",
    "similarity",
    _ivf_recall_oracle(),
    doc=f"ANN index QUALITY metric, certified: recall@{RECALL_K} of the "
    "learned-cell IVF (ann_ivf_kmeans_topk's exact plan) against the "
    "brute-force ground truth, per query. The eval every production "
    "ANN deployment runs before trusting an index — here it is itself "
    "a certified operator, so index-quality regressions are caught by "
    "the same differential gate as correctness bugs. Scale: the brute "
    "side is the one-off offline ground-truth pass (broadcast query "
    "block, linear corpus scan); the comparison join is |Q|×k rows.",
)
def ann_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivf3 = ann_ivf_kmeans_topk(spark, sf_dir).filter(
        F.col("rnk") <= RECALL_K
    ).select("query_id", "neighbor_id")
    return _recall_vs_brute(spark, sf_dir, ivf3)


# ---------------------------------------------------------------------------
# IVF-PQ: the complete production ANN stack in one certified query
# ---------------------------------------------------------------------------

def _ivfpq_adc_cte_parts(src: str = "embeddings", pre: str = "") -> list[str]:
    """THE single SQL definition of the composed IVF-PQ index: Lloyd
    cell CTEs + 'p'-prefixed PQ-training CTEs + probes/cands/lut/adc,
    ending after ``adc`` (no trailing comma).  Shared by the top-k
    oracle and the recall oracle so the shipped index and the index
    being measured can never drift apart."""
    from tailsql_spark.operators.mlprep import (
        EMBED_DIM,
        KMEANS_ITERS,
        kmeans_cte_parts,
    )

    parts = kmeans_cte_parts(src=src, pre=pre)
    parts.extend(_pq_kmeans_cte_parts(prefix="p", src=src))
    ka, kc = f"a{KMEANS_ITERS}", f"c{KMEANS_ITERS - 1}"
    pd, pa = f"pd{PQ_KMEANS_ITERS}", f"pa{PQ_KMEANS_ITERS}"
    intdist = (
        f"CAST(list_sum(list_transform(generate_series(1, {EMBED_DIM}),"
        f" i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))) AS BIGINT)"
    )
    parts.append(
        f"""
    probes AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {intdist}, c.cell) AS rn
            FROM e CROSS JOIN {kc} c
            WHERE e.vec_id < {N_QUERIES})
        WHERE rn <= {N_PROBES}
    ),
    cands AS (
        SELECT p.query_id, a.vec_id
        FROM probes p JOIN {ka} a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    ),
    lut AS (SELECT vec_id AS query_id, m, code, dist AS d
            FROM {pd} WHERE vec_id < {N_QUERIES}),
    adc AS (
        SELECT c.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(l.d) AS BIGINT) AS adc_dist
        FROM cands c
        JOIN {pa} cd ON cd.vec_id = c.vec_id
        JOIN lut l ON l.query_id = c.query_id
                  AND l.m = cd.m AND l.code = cd.code
        GROUP BY 1, 2
    )"""
    )
    return parts


def _ivfpq_oracle() -> str:
    """Learned cells + multiprobe + trained-codebook ADC — the whole
    FAISS-style IVF-PQ pipeline in one WITH chain (see
    _ivfpq_adc_cte_parts for the shared index definition)."""
    parts = _ivfpq_adc_cte_parts()
    parts.append(
        """
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adc_dist, neighbor_id) AS rnk
          FROM adc)
    WHERE rnk <= 3"""
    )
    return "\n".join(parts)


@query(
    "ann_ivfpq_topk",
    "similarity",
    _ivfpq_oracle(),
    plan=lambda s, d: _ivfpq_ranked(s, d, cache=False)[0],
    doc=f"The COMPLETE production ANN stack (FAISS IVF-PQ shape) "
    "certified end-to-end in one query: k-means-LEARNED coarse cells "
    f"partition the corpus, each query multiprobes its {N_PROBES} "
    "nearest learned centroids (selected by the same exact-integer "
    "distance the assignment used), and ONLY the probed candidates "
    f"are scored — by ADC over the Lloyd-TRAINED {PQ_M}×{PQ_CODES} "
    "codebooks (broadcast LUT, one groupBy). Scale: query cost is "
    "probes/C of the corpus touched × M code bytes per vector "
    "scanned; no full-precision vector math after the one-off index "
    "build; cells are the storage partitioning so probing prunes "
    "files. Certified cross-engine including BOTH training "
    "trajectories (cells and codebooks).",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked, caches = _ivfpq_ranked(spark, sf_dir)
    try:
        return _materialized(ranked, "ann_ivfpq_topk", sf_dir)
    finally:
        for frame in caches:
            frame.unpersist()


def _ivfpq_ranked(
    spark: SparkSession, sf_dir: str, cache: bool = True, raw: DataFrame | None = None
):
    """(ranked, caches): the IVF-PQ computation plan plus the cached
    frames it pins — the query materializes ranked and releases the
    caches; plan tooling inspects ranked directly with ``cache=False``
    (it never materializes, so a persist would leak for the session)."""
    from tailsql_spark.operators.mlprep import lloyd_loop

    # cells and centroids are BOTH consumed (probes from cent, cands
    # from assigned), each tracing the full 3-iteration Lloyd chain —
    # cache them for the build, release after materialization below
    assigned, cent = lloyd_loop(spark, sf_dir, raw=raw)
    if cache:
        assigned = assigned.persist()
        cent = cent.persist()
    probes = _learned_probes(spark, sf_dir, cent, raw=raw)
    cands = (
        assigned.select("vec_id", "cell")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    dist = pq_trained_distances(spark, sf_dir, raw=raw)
    if cache:
        dist = dist.persist()
    codes = (
        dist.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "code")).alias("mc"))
        .select("vec_id", "m", F.col("mc.code").alias("code"))
    )
    lut = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code", F.col("dist").alias("d")
    )
    adc = (
        cands.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    ranked = (
        adc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )
    return ranked, ((dist, assigned, cent) if cache else ())


def _ivfpq_recall_oracle() -> str:
    """recall@3 of the composed IVF-PQ stack against brute-force
    cosine ground truth — the quality number that decides whether the
    compressed index ships.  ADC ranks by quantized distance while
    ground truth ranks by cosine, so unlike ann_ivf_recall_at_k this
    also measures the quantization loss.  Index definition and
    ground-truth tail are the SHARED builders
    (_ivfpq_adc_cte_parts / _brute_recall_tail), so the measured
    index can never drift from the shipped one."""
    parts = _ivfpq_adc_cte_parts()
    parts.append(
        f""",
    ivfpq3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist, neighbor_id) AS rnk FROM adc)
        WHERE rnk <= {RECALL_K}
    ),{_brute_recall_tail('ivfpq3')}"""
    )
    return "\n".join(parts)


@query(
    "ann_ivfpq_recall_at_k",
    "similarity",
    _ivfpq_recall_oracle(),
    doc=f"recall@{RECALL_K} of the COMPLETE IVF-PQ stack against "
    "brute-force ground truth, per query — the accept/reject number "
    "for a compressed index. Measures cell-pruning AND quantization "
    "loss together (ADC ranks by trained-codebook distance, ground "
    "truth by exact cosine), certified cross-engine end to end. "
    "Measured at sf0.01: learned-IVF recall@3 is 0.80; IVF-PQ lands "
    "0.167 / 0.20 / 0.233 at 4 / 16 / 64 codes per subspace (swept by "
    "varying PQ_CODES — the pipeline is parametric). The embeddings "
    "are unit-norm, so ADC's L2 ranking equals cosine ranking by "
    "construction; the residual loss is a CORPUS property — the "
    "synthetic vectors are near-random, cosines concentrate at the "
    "noise floor, and 8-byte compression cannot preserve noise-floor "
    "rankings (the planted near-dup structure, which IS separable, "
    "survives the coarse cells — hence IVF's 0.80). Exactly the "
    "diagnosis this metric exists to enable — and "
    "ann_ivfpq_recall_structured certifies it: the SAME stack on a "
    "planted-group corpus recovers recall@3 to 0.967.",
)
def ann_ivfpq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivfpq3 = ann_ivfpq_topk(spark, sf_dir).filter(
        F.col("rnk") <= RECALL_K
    ).select("query_id", "neighbor_id")
    return _recall_vs_brute(spark, sf_dir, ivfpq3)


# ---------------------------------------------------------------------------
# IVF-PQ recall on SEPARABLE structure: the recovery demonstration
# ---------------------------------------------------------------------------

#: The structured slice plants groups of STRUCT_GROUP vectors around a
#: shared center with weight STRUCT_W: cos(within-group) ≈ W²/(W²+1)
#: ≈ 0.96 vs cross-group ≈ the base corpus's noise floor.  Group size 4
#: makes each query's true top-3 exactly its groupmates — the geometry
#: a curated near-dup corpus actually has, and the one the r6 sweep
#: predicted PQ recovers (numpy pre-check at this geometry: 0.97).
STRUCT_GROUP = 4
STRUCT_W = 5


def _struct_semb_cte() -> str:
    """The structured-corpus CTE, derived DETERMINISTICALLY from the
    embeddings table in pure SQL (both engines compute the identical
    doubles: int×double product + one sum, each correctly rounded):
    vector v = W·center(v) + base(v), center(v) = embeddings[v ÷ G]."""
    from tailsql_spark.operators.mlprep import EMBED_DIM

    return (
        f"semb AS (SELECT b.vec_id, list_transform(generate_series(1, {EMBED_DIM}),"
        f" i -> {STRUCT_W} * CAST(c.embedding[i] AS DOUBLE)"
        " + CAST(b.embedding[i] AS DOUBLE)) AS embedding"
        f" FROM embeddings b JOIN embeddings c ON c.vec_id = b.vec_id // {STRUCT_GROUP}), "
    )


def structured_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_struct_semb_cte`: (vec_id, embedding) with
    planted group structure.  One self-equi-join on the group id — at
    corpus scale this shuffles once on a dense integer key; the derived
    frame feeds the UNCHANGED IVF-PQ builders via their ``raw`` hook."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    c = e.select(F.col("vec_id").alias("gid"), F.col("embedding").alias("cemb"))
    comb = F.zip_with(
        "cemb", "embedding",
        lambda a, b: F.lit(float(STRUCT_W)) * a.cast("double") + b.cast("double"),
    )
    return (
        e.withColumn("gid", F.expr(f"vec_id DIV {STRUCT_GROUP}"))
        .join(c, "gid")
        .select("vec_id", comb.alias("embedding"))
    )


def _ivfpq_structured_recall_oracle() -> str:
    """The SAME composed IVF-PQ chain and the SAME ground-truth tail as
    ann_ivfpq_recall_at_k, pointed at the structured CTE — only the
    corpus changes, never the index or the metric."""
    parts = _ivfpq_adc_cte_parts(src="semb", pre=_struct_semb_cte())
    parts.append(
        f""",
    ivfpq3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist, neighbor_id) AS rnk FROM adc)
        WHERE rnk <= {RECALL_K}
    ),{_brute_recall_tail('ivfpq3', src='semb')}"""
    )
    return "\n".join(parts)


def _structured_recall_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncached computation plan for the audit tooling: the full
    structured-corpus IVF-PQ recall chain with zero persists and no
    materialized scans, so the de-optimization gates inspect the real
    computation."""
    raw = structured_embeddings(spark, sf_dir)
    top3 = (
        _ivfpq_ranked(spark, sf_dir, cache=False, raw=raw)[0]
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_brute(spark, sf_dir, top3, raw=raw)


@query(
    "ann_ivfpq_recall_structured",
    "similarity",
    _ivfpq_structured_recall_oracle(),
    plan=_structured_recall_plan,
    doc=f"recall@{RECALL_K} of the UNCHANGED IVF-PQ stack on a corpus "
    "with SEPARABLE structure (planted groups of "
    f"{STRUCT_GROUP} around shared centers, weight {STRUCT_W}) — the "
    "counterpart to ann_ivfpq_recall_at_k's ~0.17 on noise-floor "
    "cosines: same cells, same codebooks, same ADC, same ground-truth "
    "rule; only the corpus differs, and recall recovers to ~0.97 "
    "(floor-gated ≥ 0.6 in pytest). Together the two metrics certify "
    "the r6 diagnosis: the compressed stack's loss was a corpus "
    "property, not a pipeline defect. The structured corpus is itself "
    "derived in-plan from the embeddings table (deterministic doubles "
    "in both engines), so the whole demonstration is cross-engine "
    "certified end to end.",
)
def ann_ivfpq_recall_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = structured_embeddings(spark, sf_dir).persist()
    ranked, caches = _ivfpq_ranked(spark, sf_dir, raw=raw)
    try:
        top3 = _materialized(
            ranked.filter(F.col("rnk") <= RECALL_K).select("query_id", "neighbor_id"),
            "ann_ivfpq_recall_structured_top3",
            sf_dir,
        )
        return _recall_vs_brute(spark, sf_dir, top3, raw=raw)
    finally:
        for frame in caches:
            frame.unpersist()
        raw.unpersist()


# ---------------------------------------------------------------------------
# persisted cell-partitioned IVF index — the ANN serving shape (r10)
# ---------------------------------------------------------------------------

#: the serving probe set: a per-request-sized query batch (the 10-query
#: bench block would touch all 8 cells at this sf, which would make the
#: "pruned scan" claim vacuous — a real serving request probes its OWN
#: cell, and 3 queries demonstrably touch a strict subset).
N_QUERIES_IDX = 3

#: r11 dial for the PERSISTED index's cell count (the per-run family
#: keeps the fixed N_CELLS): target vectors per cell.  The builder
#: counts the corpus once and doubles the cell count from N_CELLS until
#: vectors/cell fits the target — the state_bucket_count discipline
#: applied to the serving layout, so a probe's nprobe-cells read stays
#: request-sized through corpus decades instead of degenerating toward
#: a full scan at a fixed 8.  At 100 TB the target would be a task's
#: worth of vectors (~1e6); the test-scale constant keeps the dial
#: OBSERVABLE at certification scale (sf0.01's 500 vectors dial to 16
#: cells — the content-certification rows are green at a NON-default
#: count, which is what certifies the dial itself).
IVF_VECS_PER_CELL = 32
IVF_CELL_MAX = 65536


def ivf_cell_count(n_vecs: int) -> int:
    """The dialed cell count for an ``n_vecs``-vector corpus."""
    from tailsql_spark.operators.dial import doubling_dial

    return doubling_dial(n_vecs, N_CELLS, IVF_VECS_PER_CELL, IVF_CELL_MAX)


def _duck_nc_dialed() -> str:
    """SQL expression for the dialed cell count — the CASE-ladder twin
    of :func:`ivf_cell_count`, generated from the same constants."""
    from tailsql_spark.operators.dial import dial_case_sql

    return dial_case_sql(
        "SELECT COUNT(*) FROM embeddings", N_CELLS, IVF_VECS_PER_CELL, IVF_CELL_MAX
    )


#: cells CTE for the persisted index's oracles: the identical
#: assignment rule as _DUCK_CELLS, seeded by the DIALED count.
_DUCK_CELLS_DIALED = _duck_cells_sql(f"({_duck_nc_dialed()})")


def ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the IVF index once per corpus: every vector's
    (vec_id, embedding) row written partitionBy(cell) — the storage
    layout ann_ivf_assign's docstring names as "the partitioning key at
    scale" — plus the N_CELLS seed vectors as a sibling table, so a
    probe can coarse-quantize its queries without touching the corpus.
    Idempotent-staging guarded on the embeddings fingerprint (the
    bm25_index_path / manifest_orders_path discipline).  At 100 TB: one
    assignment pass (broadcast seeds), one shuffle by cell, and the
    probe cost becomes nprobe cell-directory reads per query — the
    FAISS IVF serving shape expressed as parquet partitioning."""
    from tailsql_spark.plans.connectors import _stage_dir
    from tailsql_spark.plans.streaming_exec import _fs_exists

    import json

    from tailsql_spark.plans.streaming_exec import _fs_write_text_atomic

    # the tag carries a LAYOUT VERSION: staging is fingerprint-keyed on
    # the corpus, so without it a pre-dial index (fixed 8 cells, no
    # meta) from an older build would be silently reused by the dialed
    # probes and diverge from the oracle's dialed recomputation
    root = _stage_dir(sf_dir, "ivf_index_v2", src_tables=("embeddings",))
    cell_dir = f"{root}/cells"
    seed_dir = f"{root}/seeds"
    # staged-index check through the Hadoop-FS dispatcher (object-store
    # index roots reuse correctly, the bm25_index_path discipline)
    if (
        _fs_exists(f"{cell_dir}/_SUCCESS")
        and _fs_exists(f"{seed_dir}/_SUCCESS")
        and _fs_exists(f"{root}/_index_meta.json")
    ):
        return root
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    # the dial: one corpus count picks the cell count (r11); the oracle
    # recomputes the same count via the shared CASE ladder
    n_vecs = emb.count()
    nc = ivf_cell_count(n_vecs)
    seeds = emb.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"), F.col("nrm").alias("sn")
    )
    assigned = assign_cells(emb, seeds)
    (
        assigned.select("vec_id", "v", "nrm", "cell")
        .repartition(min(nc, 1024), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(cell_dir)
    )
    emb.filter(F.col("vec_id") < nc).select("vec_id", "v", "nrm").write.mode(
        "overwrite"
    ).parquet(seed_dir)
    # self-describing index: probes and tests read the dialed geometry
    # from the meta instead of recounting the corpus
    _fs_write_text_atomic(
        f"{root}/_index_meta.json", json.dumps({"n_cells": nc, "n_vecs": n_vecs})
    )
    return root


def ivf_index_meta(root: str) -> dict:
    """The index's recorded geometry ({n_cells, n_vecs})."""
    import json

    from tailsql_spark.plans.streaming_exec import _fs_read_text

    return json.loads(_fs_read_text(f"{root}/_index_meta.json"))


@query(
    "sink_ivf_index",
    "sinks",
    f"""
    WITH {_DUCK_CELLS_DIALED}
    SELECT cell,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec,
           CAST(MAX(vec_id) AS BIGINT) AS max_vec,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec
    FROM cells GROUP BY cell
    """,
    doc="The persisted IVF index, certified by CONTENT: the per-cell "
    "membership profile (count, min/max/sum of vec ids) is read back "
    "from the cell-partitioned files ON DISK and must match the "
    "oracle's recomputation of the max-cosine assignment — a writer "
    "bug (dropped vectors, wrong cell routing, stale reuse) surfaces "
    "as a hash mismatch before any search probes the index. The "
    "sink_bm25_index discipline applied to the ANN family. r11: the "
    "cell count is DIALED (ivf_cell_count doubles from N_CELLS to keep "
    "vectors/cell at the target) and the oracle recomputes the same "
    "count through the shared CASE ladder — this row being green at a "
    "non-default count is the dial's own certification.",
)
def sink_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = ivf_index_path(spark, sf_dir)
    cells = spark.read.parquet(f"{root}/cells")
    return cells.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        F.count("*").alias("n_vecs"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
        F.sum("vec_id").alias("sum_vec"),
    )


#: salt fan-out for the indexed probes' two-level top-k (the bm25_rank
#: discipline): the per-(query, salt) partial pass bounds what any one
#: task sorts to candidates/ANN_IDX_SALTS, and the final per-query
#: window sees <= k×salts rows — at 100 TB a hot cell no longer pulls a
#: whole cell's candidates through ONE task.
ANN_IDX_SALTS = 16


def _ann_salted_topk(scored: DataFrame, k: int = 3) -> DataFrame:
    """Exact two-level top-k over (query_id, neighbor_id, cosine):
    hash(neighbor_id) salting spreads one query's candidates over
    ANN_IDX_SALTS tasks for a partial top-k; only the <= k×salts
    partial winners reach the final per-query window.  Exact — every
    global top-k row is, a fortiori, in its own salt stratum's top-k."""
    order = (F.col("cosine").desc(), F.col("neighbor_id").asc())
    partial = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(ANN_IDX_SALTS))
        )
        .withColumn(
            "prnk",
            F.row_number().over(W.partitionBy("query_id", "salt").orderBy(*order)),
        )
        .filter(F.col("prnk") <= k)
    )
    win = W.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rnk", F.row_number().over(win).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ivf_probe_plan(qvec: DataFrame, seeds: DataFrame, n_probes: int) -> DataFrame:
    """Coarse-quantize request vectors against the broadcast seed
    table: each (vec_id, v, nrm) row keeps its ``n_probes``
    max-cosine seeds (ties → lowest seed_id) — rn <= n_probes
    generalizes assign_cells' single winner under the IDENTICAL
    ordering rule (the window stays here because the input is the
    request-sized query block, not the corpus — assign_cells' agg
    rewrite matters only corpus-side).  THE single probe-planning
    definition, shared by the batch
    persisted-index probes and the incremental index's serve."""
    scos = dot(F.col("v"), F.col("sv")) / (F.col("nrm") * F.col("sn"))
    wq = W.partitionBy("vec_id").orderBy(F.col("scos").desc(), F.col("seed_id").asc())
    return (
        qvec.join(F.broadcast(seeds))
        .withColumn("scos", scos)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probes)
    )


def _ivf_indexed_scored(
    spark: SparkSession, sf_dir: str, n_probes: int = 1
) -> DataFrame:
    """The persisted-index probe's candidate scoring, shared by the
    single-probe / multiprobe / recall rows: coarse-quantize the
    request's query vectors against the broadcast seed table through
    the SAME assign-by-max-cosine rule as the writer (ivf_probe_plan),
    collect the request-sized (query, probed cell) plan — never corpus
    data — and scan ONLY the probed cells' directories, constructed by
    PATH from the probe plan (r14: an IN-filter over the partitioned
    root pays partition DISCOVERY across every dialed cell dir per
    query — the cost the 100× curve caught on the BM25 twin; the probe
    now plans exactly |probed cells| directory stats, like the
    streaming index's manifest-resolved read)."""
    import os

    root = ivf_index_path(spark, sf_dir)
    seeds = spark.read.parquet(f"{root}/seeds").select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"), F.col("nrm").alias("sn")
    )
    t = load_tables(spark, sf_dir)
    qvec = (
        t["embeddings"]
        .filter(F.col("vec_id") < N_QUERIES_IDX)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .withColumn("nrm", norm(F.col("v")))
    )
    probes = ivf_probe_plan(qvec, seeds, n_probes)
    # request-sized planning metadata: |Q| × n_probes rows via the
    # writer's own assignment rule — the probed-cell list is what an
    # IVF serving planner hands the scan
    qrows = probes.collect()
    qcells = sorted({int(r.seed_id) for r in qrows})
    q = spark.createDataFrame(
        [
            (int(r.vec_id), int(r.seed_id), list(r.v), float(r.nrm))
            for r in qrows
        ],
        "query_id long, cell long, qv array<double>, qn double",
    )
    probe_dirs = [
        d
        for d in (f"{root}/cells/cell={c}" for c in qcells)
        if os.path.exists(d)
    ]
    if probe_dirs:
        # basePath keeps the cell partition column on the pruned read
        src = spark.read.option("basePath", f"{root}/cells").parquet(*probe_dirs)
    else:  # degenerate: every probed cell empty at a tiny corpus
        src = spark.read.parquet(f"{root}/cells").filter(
            F.col("cell").isin(qcells)
        )
    cand = src.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").cast("long").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    return (
        F.broadcast(q)
        .join(
            cand,
            (F.col("cell") == F.col("ccell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
    )


@query(
    "ann_ivf_topk_indexed",
    "similarity",
    f"""
    WITH {_DUCK_CELLS_DIALED},
    q AS (SELECT c.vec_id, c.cell, e.embedding
          FROM cells c JOIN embeddings e USING (vec_id)
          WHERE c.vec_id < {N_QUERIES_IDX}),
    corp AS (SELECT c.vec_id, c.cell, e.embedding
             FROM cells c JOIN embeddings e USING (vec_id)),
    scored AS (
        SELECT q.vec_id AS query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM q JOIN corp ON q.cell = corp.cell AND corp.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc="IVF search served from the PERSISTED cell-partitioned index "
    "(the ANN twin of text_bm25_topk_indexed): the request's query "
    "vectors coarse-quantize against the broadcast seed table through "
    "the SAME assignment rule as the writer (one tiny Spark job; its "
    "q-row collect is request-sized planning metadata, never corpus "
    "data), and the candidate scan reads ONLY the probed cells' "
    "directories — a static partition IN-filter, plan-asserted as a "
    "strict subset of the on-disk cells. r11: ranking is the TWO-LEVEL "
    "salted top-k (the bm25_rank discipline — a hot cell's candidates "
    "no longer funnel through one task) and the index geometry is "
    "DIALED (ivf_cell_count), with the oracle recomputing the same "
    "cell count via the shared CASE ladder. At 100 TB: per-request "
    "cost is nprobe cell reads out of thousands, the FAISS serving "
    "economics on plain parquet.",
)
def ann_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_salted_topk(_ivf_indexed_scored(spark, sf_dir, n_probes=1))


def _duck_probes_dialed(n_probes: int) -> str:
    """probes CTE against the DIALED seed set (the oracle twin of
    _ivf_indexed_scored's rn <= n_probes coarse quantization)."""
    nc = _duck_nc_dialed()
    return f"""
    seeds AS (SELECT vec_id AS seed_id, embedding FROM embeddings
              WHERE vec_id < ({nc})),
    probes AS (
        SELECT query_id, seed_id AS cell FROM (
            SELECT e.vec_id AS query_id, s.seed_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_DUCK_DOT.format(a='e.embedding', b='s.embedding')}
                                / ({_DUCK_NORM.format(a='e.embedding')}
                                   * {_DUCK_NORM.format(a='s.embedding')}) DESC,
                                s.seed_id ASC) AS rn
            FROM embeddings e CROSS JOIN seeds s
            WHERE e.vec_id < {N_QUERIES_IDX})
        WHERE rn <= {n_probes}
    )"""


_DUCK_IDX_MULTIPROBE_SCORED = f"""
    corp AS (SELECT c.vec_id, c.cell, e.embedding
             FROM cells c JOIN embeddings e USING (vec_id)),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES_IDX}),
    scored AS (
        SELECT p.query_id, corp.vec_id AS neighbor_id,
               ROUND({_DUCK_DOT.format(a='q.embedding', b='corp.embedding')}
                     / ({_DUCK_NORM.format(a='q.embedding')}
                        * {_DUCK_NORM.format(a='corp.embedding')}), 4) AS cosine
        FROM probes p
        JOIN corp ON corp.cell = p.cell AND corp.vec_id <> p.query_id
        JOIN q ON q.vec_id = p.query_id
    )"""


@query(
    "ann_ivf_multiprobe_topk_indexed",
    "similarity",
    f"""
    WITH {_DUCK_CELLS_DIALED},
    {_duck_probes_dialed(N_PROBES)},
    {_DUCK_IDX_MULTIPROBE_SCORED}
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc=f"Multiprobe over the PERSISTED IVF index (r11): each request "
    f"query probes its {N_PROBES} nearest cells' directories instead "
    "of one — the first knob a production ANN deployment turns when a "
    "true neighbor straddles a cell boundary, now available on the "
    "serving index, not just the per-run family. Probe-cell planning, "
    "partition-pruned scan, scoring, and the salted two-level top-k "
    "are the SAME code as ann_ivf_topk_indexed (n_probes is the only "
    "difference), and the oracle generalizes the writer's assignment "
    "CTE to rn <= n_probes. Cost grows by the probe factor, never by "
    "corpus size.",
)
def ann_ivf_multiprobe_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_salted_topk(_ivf_indexed_scored(spark, sf_dir, n_probes=N_PROBES))


@query(
    "ann_ivf_indexed_recall_at_k",
    "similarity",
    f"""
    WITH {_DUCK_CELLS_DIALED},
    {_duck_probes_dialed(N_PROBES)},
    {_DUCK_IDX_MULTIPROBE_SCORED},
    idx3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rnk
            FROM scored) WHERE rnk <= {RECALL_K}
    ),{_brute_recall_tail('idx3', n_queries=N_QUERIES_IDX)}
    """,
    doc=f"recall@{RECALL_K} of the PERSISTED-index multiprobe search "
    "against brute-force ground truth — the quality gate a production "
    "deployment tunes nprobe with, certified like ann_ivf_recall_at_k "
    "but measuring the index actually served from disk (so a stale or "
    "mis-routed index surfaces as a recall regression in the same "
    "differential gate as correctness bugs). The brute side is the "
    "one-off offline ground-truth pass; the comparison join is |Q|×k "
    "rows.",
)
def ann_ivf_indexed_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx3 = (
        ann_ivf_multiprobe_topk_indexed(spark, sf_dir)
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_brute(spark, sf_dir, idx3, n_queries=N_QUERIES_IDX)
