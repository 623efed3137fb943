"""Training-data preparation operators (extension surface).

Ops a large-scale training pipeline runs between raw corpus and model
input, beyond dedup/similarity/textstats:

* **deterministic hash split** — reproducible train/val/test
  assignment from a content-stable hash, never `rand()`: re-running
  the pipeline (or re-running it on 100 TB after adding one shard)
  keeps every existing document in the same split.
* **centroid update** — one k-means/IVF refinement step: element-wise
  mean of member embeddings per cell. The shuffle is (cell, dim) —
  64 dims × n_cells groups regardless of corpus size, so the reduce
  side is constant-width at any scale.
* **regression stats** — built-in second-moment aggregates
  (corr / covar / regr_slope / regr_intercept), the screening stats
  for feature-target relationships; one map-side-combinable pass.

Cross-engine determinism: centroid sums are computed over scaled
BIGINTs (×1e6) so the order-dependent double summation can't perturb
the oracle hash; one final division + round per element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

EMBED_DIM = 64

# --- defined BEFORE the similarity import below (circular-import
# discipline): operators/similarity's module body imports
# KMEANS_ITERS + kmeans_cte_parts from THIS module while building the
# k-means-seeded IVF oracle.  When mlprep loads first, the similarity
# import below re-enters this partially-initialized module — these two
# names must already be bound, and kmeans_cte_parts resolves N_CELLS
# via a function-local import (bound early in similarity's body, so it
# is available in BOTH import orders).  test_registry's import-order
# tests cover both directions.

KMEANS_ITERS = 3  # assignments under c0, c1, c2 (2 centroid updates)


def kmeans_cte_parts(src: str = "embeddings", pre: str = "") -> list[str]:
    """Unrolled CTE chain for KMEANS_ITERS Lloyd steps, ending with the
    final assignment ``a{KMEANS_ITERS}`` (trailing comma on every part,
    so callers can append further CTEs and a final SELECT).  Shared by
    the trajectory oracle below and the k-means-seeded IVF oracle in
    operators/similarity.py — one definition of the walked trajectory.

    Bit-for-bit cross-engine determinism: embeddings quantize to ×1e6
    BIGINTs once; distances are exact integer sums of squares; centroid
    updates FLOOR an IEEE-identical double division — so both engines
    walk the SAME trajectory and the md5 centroid fingerprints match
    exactly (no float-summation-order hazard anywhere)."""
    from tailsql_spark.operators.similarity import N_CELLS  # function-local: see circular-import note above

    d = EMBED_DIM
    parts = [
        f"WITH {pre}e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e"
        f" FROM {src}),",
        f"c0 AS (SELECT vec_id AS cell, e AS c FROM e WHERE vec_id < {N_CELLS}),",
    ]
    for r in range(1, KMEANS_ITERS + 1):
        parts.append(
            f"d{r} AS (SELECT e.vec_id, c.cell,"
            f" CAST(list_sum(list_transform(generate_series(1, {d}),"
            f" i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))) AS BIGINT) AS dist"
            f" FROM e CROSS JOIN c{r - 1} c),"
        )
        parts.append(
            f"a{r} AS (SELECT vec_id, cell, dist FROM"
            f" (SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY dist, cell) AS rn FROM d{r}) WHERE rn = 1),"
        )
        if r < KMEANS_ITERS:
            parts.append(
                f"u{r} AS (SELECT cell, CAST(t.i AS BIGINT) AS pos,"
                f" CAST(FLOOR(SUM(e.e[t.i + 1]) * 1.0 / COUNT(*)) AS BIGINT) AS v"
                f" FROM a{r} JOIN e USING (vec_id) CROSS JOIN range({d}) t(i)"
                f" GROUP BY 1, 2),"
            )
            parts.append(
                f"c{r} AS (SELECT cell, list(v ORDER BY pos) AS c FROM u{r}"
                f" GROUP BY cell),"
            )
    return parts


from tailsql_spark.operators.similarity import N_CELLS, _DUCK_CELLS  # noqa: E402 - placed after the definitions similarity needs (see note)


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


@query(
    "sample_hash_split",
    "ml-prep",
    """
    SELECT doc_id,
           CASE WHEN h < '1a' THEN 'test'
                WHEN h < '34' THEN 'val'
                ELSE 'train' END AS split
    FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
          FROM documents)
    """,
    doc="Deterministic train/val/test split by md5(doc_id) band "
    "(~10%/10%/80%). Content-stable: adding data never reassigns "
    "existing docs, unlike rand()-based sampling; embarrassingly "
    "parallel, no shuffle at all.",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    h = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return t["documents"].select(
        "doc_id",
        F.when(h < "1a", "test").when(h < "34", "val").otherwise("train").alias("split"),
    )


@query(
    "ann_centroid_update",
    "ml-prep",
    f"""
    WITH {_DUCK_CELLS},
    m AS (SELECT c.cell, e.embedding
          FROM cells c JOIN embeddings e USING (vec_id)),
    ex AS (SELECT cell, CAST(t.i AS BIGINT) AS pos,
                  CAST(ROUND(CAST(embedding[t.i + 1] AS DOUBLE) * 1000000) AS BIGINT)
                      AS scaled
           FROM m CROSS JOIN range({EMBED_DIM}) t(i)),
    agg AS (SELECT cell, pos, SUM(scaled) AS s, COUNT(*) AS n
            FROM ex GROUP BY 1, 2)
    SELECT cell,
           list(ROUND(s / (n * 1000000.0), 6) ORDER BY pos) AS centroid,
           MAX(n) AS n_members
    FROM agg GROUP BY cell
    """,
    doc="One k-means/IVF centroid refinement step: element-wise mean "
    "of member embeddings per cell. Sums are ×1e6 BIGINTs (exact under "
    "any summation order); the shuffle key is (cell, dim) so reduce "
    "width is constant in corpus size. Iterating this query IS "
    "distributed k-means.",
)
def ann_centroid_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.similarity import REGISTRY as _SIM

    t = load_tables(spark, sf_dir)
    cells = _SIM["ann_ivf_assign"].build(spark, sf_dir)
    m = cells.join(t["embeddings"].select("vec_id", "embedding"), "vec_id")
    ex = m.select(
        "cell",
        F.posexplode("embedding").alias("pos_i", "x"),
    ).select(
        "cell",
        F.col("pos_i").cast("long").alias("pos"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("scaled"),
    )
    agg = ex.groupBy("cell", "pos").agg(
        F.sum("scaled").alias("s"), F.count("*").alias("n")
    )
    per_el = agg.withColumn("val", F.round(F.col("s") / (F.col("n") * 1000000.0), 6))
    return per_el.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda st: st["val"]
        ).alias("centroid"),
        F.max("n").alias("n_members"),
    )


@query(
    "agg_regression_stats",
    "ml-prep",
    """
    SELECT o_orderpriority,
           ROUND(corr(o_totalprice, day_x), 6)                AS price_day_corr,
           ROUND(covar_pop(o_totalprice, day_x), 4)           AS price_day_covar,
           ROUND(regr_slope(o_totalprice, day_x), 6)          AS slope,
           ROUND(regr_intercept(o_totalprice, day_x), 4)      AS intercept,
           COUNT(*) AS n
    FROM (SELECT o_orderpriority, o_totalprice,
                 CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                      AS DOUBLE) AS day_x
          FROM orders)
    GROUP BY o_orderpriority
    """,
    doc="Feature-screening second-moment aggregates: corr / covar_pop "
    "/ regr_slope / regr_intercept of price against order age — all "
    "built-in, map-side combinable, one pass.",
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = t["orders"].select(
        "o_orderpriority",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("double")
        .alias("day_x"),
    )
    return src.groupBy("o_orderpriority").agg(
        F.round(F.corr("o_totalprice", "day_x"), 6).alias("price_day_corr"),
        F.round(F.covar_pop("o_totalprice", "day_x"), 4).alias("price_day_covar"),
        F.round(F.regr_slope("o_totalprice", "day_x"), 6).alias("slope"),
        F.round(F.regr_intercept("o_totalprice", "day_x"), 4).alias("intercept"),
        F.count("*").alias("n"),
    )


@query(
    "grouped_zscore_pandas",
    "ml-prep",
    """
    WITH m AS (
        SELECT c_nationkey,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s1,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                   * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s2,
               COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_custkey, c.c_nationkey,
           ROUND((CAST(ROUND(c_acctbal * 100) AS BIGINT) - s1 * 1.0 / n)
                 / sqrt(GREATEST(s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n), 1e-9)),
                 6) AS zscore
    FROM customer c JOIN m ON c.c_nationkey = m.c_nationkey
    """,
    doc="Per-group feature normalization (z-score) as a grouped Pandas "
    "transform (applyInPandas): the whole group arrives as one Arrow "
    "batch, moments are computed from exact integer-cents sums "
    "(order-independent), so the Python path hash-matches the "
    "relational oracle. The partitioning contract is groupBy-key "
    "shuffle; group size bounds executor memory (nation-sized groups "
    "here; salt the key first if a group can exceed a partition).",
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = load_tables(spark, sf_dir)
    src = t["customer"].select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["cents"].astype("int64")
        n = len(c)
        s1 = int(c.sum())
        s2 = int((c * c).sum())
        mean = s1 / n
        var = max(s2 / n - mean * mean, 1e-9)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "zscore": ((c - mean) / (var ** 0.5)).round(6),
            }
        )

    return src.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, zscore double"
    )


# ---------------------------------------------------------------------------
# iterative k-means (multi-step Lloyd), certified cross-engine
# ---------------------------------------------------------------------------



def _kmeans_oracle() -> str:
    parts = kmeans_cte_parts()
    last_a = f"a{KMEANS_ITERS}"
    last_c = f"c{KMEANS_ITERS - 1}"
    parts[-1] = parts[-1].rstrip(",")  # last CTE: no trailing comma
    parts.append(
        f"""
    SELECT a.cell, COUNT(*) AS n_members,
           CAST(SUM(a.dist) AS BIGINT) AS inertia,
           MAX(md5(array_to_string(c.c, ','))) AS centroid_fp
    FROM {last_a} a JOIN {last_c} c USING (cell)
    GROUP BY a.cell"""
    )
    return "\n".join(parts)


@query(
    "ann_kmeans_lloyd",
    "ml-prep",
    _kmeans_oracle(),
    doc=f"Iterative distributed k-means: {KMEANS_ITERS} full Lloyd steps "
    "(assign → recompute means → reassign) from the deterministic "
    f"vec_id<{N_CELLS} seeding, certified cross-engine INCLUDING the "
    "trajectory — per-cell membership, exact-integer inertia, and an "
    "md5 fingerprint of the final centroids all hash-match DuckDB's "
    "unrolled-CTE replay. Exactness: ×1e6 BIGINT quantization makes "
    "distances integer and centroid updates FLOOR an IEEE-identical "
    "division, so no float summation order can fork the iterations. "
    "Scale: each step is scan + broadcast(k centroids) + one "
    "(cell,dim)-key shuffle — the textbook distributed k-means; "
    "centroids stay k×d rows forever. Driver only unrolls the loop "
    "(plan construction), no data ever collects.",
)
def ann_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, cent = lloyd_loop(spark, sf_dir)
    fp = cent.select(
        "cell",
        F.md5(
            F.concat_ws(",", F.transform("c", lambda x: x.cast("string"))).cast(
                "binary"
            )
        ).alias("centroid_fp"),
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("n_members"), F.sum("dist").alias("inertia"))
        .join(fp, "cell")
        .select("cell", "n_members", "inertia", "centroid_fp")
    )


def quantize_embedding(col):
    """×1e6 BIGINT quantization — THE shared exactness device of the
    k-means family (see kmeans_cte_parts)."""
    return F.expr(
        f"transform({col}, x -> cast(round(cast(x as double) * 1000000, 0)"
        " as bigint))"
    )


def assign_quantized(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """One Lloyd assignment step: each ``(vec_id, e)`` row (quantized
    BIGINT vector) goes to the min-integer-distance centroid of ``cent``
    (``cell``, quantized ``c``), ties → lowest cell.  THE single
    definition of the assignment rule — the Lloyd loop applies it every
    round and the streaming semantic-dedup processor applies it per
    batch against the FIXED final centroids, so the certified streaming
    ≡ batch equivalence cannot drift on a tie-break."""
    dist = F.expr(
        "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell", dist.alias("dist")
    )
    # lexicographic max-struct aggregation (r14, the assign_cells
    # rewrite): max(struct(-dist, -cell)) IS min-dist-then-lowest-cell
    # — exact for BIGINT negation — but partial-aggregates map-side,
    # so each Lloyd round's exchange carries |V| rows instead of
    # sorting the full |V|×k candidate stream through a window.
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    (-F.col("dist")).alias("nd"), (-F.col("cell")).alias("nc")
                )
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.nc")).alias("cell"),
            (-F.col("b.nd")).alias("dist"),
        )
    )


def lloyd_loop(
    spark: SparkSession,
    sf_dir: str,
    raw: DataFrame | None = None,
    n_iters: int = KMEANS_ITERS,
    spool: str | None = None,
):
    """``n_iters`` Lloyd steps; returns ``(assigned, cent)`` — the
    final integer-distance assignment ``(vec_id, cell, dist)`` and the
    centroids it was computed under.  The Spark twin of
    :func:`kmeans_cte_parts`; ann_kmeans_lloyd certifies the trajectory,
    and ann_ivf_kmeans_topk (operators/similarity.py) composes the
    assignment as its learned IVF partitioning.

    ``spool``: per-iteration LINEAGE TRUNCATION dir — each round's
    centroid table (|cells| rows) is written to parquet and rebuilt
    from the scan.  At the certified depth (3) the direct chain is
    fine, but each iteration references the previous chain 2-3× and
    Catalyst plans are trees, so a production run of 20+ iterations
    compounds the plan ~3^n and stalls analysis (the BPE-loop lesson,
    operators/textstats.py) — pass a spool for deep runs; the deep-run
    property test proves the truncated loop walks the identical
    trajectory.  Caller owns the dir lifecycle (delete after consuming
    the result)."""
    base = raw if raw is not None else load_tables(spark, sf_dir)["embeddings"]
    emb = base.select("vec_id", quantize_embedding("embedding").alias("e"))
    cent = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("e").alias("c")
    )
    assigned = None
    for r in range(n_iters):
        if spool is not None:
            cent.write.mode("overwrite").parquet(f"{spool}/c{r}")
            cent = spark.read.parquet(f"{spool}/c{r}")
        assigned = assign_quantized(emb, cent)
        if r < n_iters - 1:
            per_el = (
                assigned.join(emb, "vec_id")
                .select("cell", F.posexplode("e").alias("pos_i", "x"))
                .groupBy("cell", F.col("pos_i").cast("long").alias("pos"))
                .agg(
                    F.floor(F.sum("x") * 1.0 / F.count("*")).cast("long").alias("v")
                )
            )
            cent = per_el.groupBy("cell").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("c")
            )
    return assigned, cent


# ---------------------------------------------------------------------------
# distributed logistic-regression training (full-batch GD), certified
# cross-engine including the optimization trajectory
# ---------------------------------------------------------------------------

LOGREG_ITERS = 3
#: weights live in ×1e12 fixed-point BIGINTs; sigmoids quantize to ×1e6
#: BIGINTs before any summation (see _logreg_oracle for why).
_LR_WSCALE = 1_000_000_000_000
_LR_SSCALE = 1_000_000

#: integer features over documents: bias, capped token count, capped
#: occurrences of the token 'query', capped distinct-token count
#: (punctuation/digit counts would be the natural quality features but
#: are identically zero on this synthetic corpus — degenerate
#: gradients certify nothing). Caps bound |z| so the sigmoid stays in
#: its responsive range without float feature scaling.
_LR_NFEAT = 4


def _logreg_feature_cols() -> list:
    return [
        F.lit(1).cast("long"),
        F.least(F.size(F.split(F.col("text"), " ")), F.lit(100)).cast("long"),
        F.least(F.size(F.split(F.col("text"), "query")) - 1, F.lit(50)).cast("long"),
        F.least(F.size(F.array_distinct(F.split(F.lower(F.col("text")), " "))), F.lit(100)).cast("long"),
    ]


_LR_DUCK_FEATS = """
        SELECT lang,
               CAST(1 AS BIGINT) AS x0,
               CAST(least(len(string_split(text, ' ')), 100) AS BIGINT) AS x1,
               CAST(least(len(string_split(text, 'query')) - 1, 50) AS BIGINT) AS x2,
               CAST(least(len(list_distinct(string_split(lower(text), ' '))), 100) AS BIGINT) AS x3,
               CAST(CASE WHEN position(' the ' IN lower(text)) > 0
                         THEN 1 ELSE 0 END AS BIGINT) AS y
        FROM documents
"""


def _logreg_oracle() -> str:
    """Unrolled-CTE replay of LOGREG_ITERS full-batch GD steps.

    Exactness strategy (the logreg twin of kmeans_cte_parts): the ONLY
    transcendental, exp(), differs by ~1 ulp between the JVM's Math.exp
    and DuckDB's libm — so the sigmoid is quantized to ×1e6 BIGINT the
    instant it is computed (a 1-ulp input wiggle flips the rounding only
    within ~1e-16 of a boundary: odds ~1e-10/eval).  Everything summed
    across rows is then an exact 64-bit integer (order-free), the z
    dot-product is an exact integer dot over fixed-point weights
    (|w·x| < 2^53, so even its double image is exact), and each weight
    step rounds ONE double expression with an identical literal formula
    in both engines.  lr=0.001 folds into the ×1000 of the step
    formula: w' = w − ROUND(g·1000.0/n)."""
    J = range(_LR_NFEAT)
    parts = [f"WITH feat AS ({_LR_DUCK_FEATS}),"]
    tparts, wprev = _logreg_train_ctes()
    parts += tparts
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in range(_LR_NFEAT))
    parts.append(
        f"acc AS (SELECT CAST(SUM(CASE WHEN (({dot}) > 0) = (f.y = 1)"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,"
        f" COUNT(*) AS n_rows FROM feat f CROSS JOIN {wprev} w)"
    )
    wcols = ", ".join(f"w.w{j}" for j in range(_LR_NFEAT))
    parts.append(f"SELECT {wcols}, acc.n_correct, acc.n_rows FROM {wprev} w CROSS JOIN acc")
    return "\n".join(parts)


def _logreg_train_ctes() -> tuple[list[str], str]:
    """The LOGREG_ITERS training-chain CTE parts (shared by the train
    oracle and the inference-gate oracle), assuming a ``feat`` CTE is
    already in scope; returns ``(parts, final_weight_cte_name)``."""
    J = range(_LR_NFEAT)
    parts: list[str] = []
    wprev = None
    for it in range(1, LOGREG_ITERS + 1):
        if wprev is None:
            # w=0 → z=0 → sigmoid exactly 0.5 → sq = 500000, no exp()
            sq = "CAST(500000 AS BIGINT)"
            parts.append(f"s1 AS (SELECT f.*, {sq} AS sq FROM feat f),")
        else:
            dot = " + ".join(f"w.w{j} * f.x{j}" for j in J)
            z = f"(({dot}) / {_LR_WSCALE}.0)"
            sq = f"CAST(ROUND({_LR_SSCALE}.0 / (1.0 + EXP(0.0 - {z})), 0) AS BIGINT)"
            parts.append(
                f"s{it} AS (SELECT f.*, {sq} AS sq FROM feat f CROSS JOIN {wprev} w),"
            )
        gsel = ", ".join(
            f"SUM((sq - y * {_LR_SSCALE}) * x{j}) AS g{j}" for j in J
        )
        parts.append(f"g{it} AS (SELECT {gsel}, COUNT(*) AS n FROM s{it}),")
        wsel = ", ".join(
            (
                f"CAST(0 - ROUND(g.g{j} * 1000.0 / g.n) AS BIGINT) AS w{j}"
                if wprev is None
                else f"CAST(w.w{j} - ROUND(g.g{j} * 1000.0 / g.n) AS BIGINT) AS w{j}"
            )
            for j in J
        )
        src = f"g{it} g" if wprev is None else f"g{it} g CROSS JOIN {wprev} w"
        parts.append(f"w{it} AS (SELECT {wsel} FROM {src}),")
        wprev = f"w{it}"
    return parts, wprev


def _logreg_gate_oracle() -> str:
    """Train (shared chain) then SCORE AND GATE every document with the
    final weights — the classifier-filter replay."""
    J = range(_LR_NFEAT)
    parts = [f"WITH feat AS ({_LR_DUCK_FEATS}),"]
    tparts, wprev = _logreg_train_ctes()
    parts += tparts
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in J)
    z = f"(({dot}) / {_LR_WSCALE}.0)"
    sq = f"CAST(ROUND({_LR_SSCALE}.0 / (1.0 + EXP(0.0 - {z})), 0) AS BIGINT)"
    parts.append(
        f"scored AS (SELECT f.lang, {sq} AS sq,"
        f" CASE WHEN ({dot}) > 0 THEN 1 ELSE 0 END AS adm"
        f" FROM feat f CROSS JOIN {wprev} w)"
    )
    parts.append(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,"
        " CAST(SUM(adm) AS BIGINT) AS n_admitted,"
        " CAST(SUM(sq) AS BIGINT) AS sum_score_q6"
        " FROM scored GROUP BY lang"
    )
    return "\n".join(parts)


@query(
    "quality_logreg_train",
    "ml-prep",
    _logreg_oracle(),
    doc=f"Distributed quality-classifier training: {LOGREG_ITERS} "
    "full-batch gradient-descent steps of logistic regression over "
    "integer document features (bias, capped token count, capped "
    "'query'-occurrence count, capped distinct-token count; "
    "label = contains-' the '), certified cross-engine INCLUDING the "
    "trajectory — final fixed-point weights and training accuracy "
    "hash-match DuckDB's unrolled-CTE replay. Exactness: sigmoids "
    "quantize to ×1e6 BIGINT before summation (1-ulp exp() drift "
    "cannot fork the trajectory), gradients are exact integer sums, "
    "weights are ×1e12 fixed-point. Scale: each step is one linear "
    "scan + broadcast(1-row weights) + a 4-column partial-aggregated "
    "sum — the textbook distributed GD; nothing ever collects, the "
    "driver loop only unrolls plan steps.",
)
def quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    J = range(_LR_NFEAT)
    feat = logreg_features(spark, sf_dir)
    w = logreg_train_weights(feat)
    dot = sum(F.col(f"w{j}") * F.col(f"x{j}") for j in J)
    acc = (
        feat.crossJoin(F.broadcast(w))
        .agg(
            F.sum(((dot > 0) == (F.col("y") == 1)).cast("long")).alias("n_correct"),
            F.count("*").alias("n_rows"),
        )
    )
    return w.crossJoin(acc).select(
        *[f"w{j}" for j in J], "n_correct", "n_rows"
    )


def logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, x0..x3, y) integer feature rows over documents — THE
    shared feature definition of the certified trainer, the
    inference gate, and the deep-run truncation test."""
    t = load_tables(spark, sf_dir)
    J = range(_LR_NFEAT)
    fcols = _logreg_feature_cols()
    y = (F.instr(F.lower(F.col("text")), " the ") > 0).cast("long")
    return t["documents"].select(
        "lang", *[c.alias(f"x{j}") for j, c in zip(J, fcols)], y.alias("y")
    )


@query(
    "quality_logreg_gate",
    "ml-prep",
    _logreg_gate_oracle(),
    doc="Classifier-filter INFERENCE — the fastText-style quality-gate "
    "shape every production corpus runs after training: the certified "
    "fixed-point weight row broadcasts over one corpus scan, each doc "
    "scores via an exact integer dot product, admission is "
    "sigmoid > 0.5 (equivalently z > 0, decided in exact integers), "
    "and per-language admission counts plus the quantized score mass "
    "certify cross-engine against the shared training chain + scoring "
    "replay. Train + gate in ONE certified composition; sigmoids "
    "quantize to x1e6 BIGINT before summation (the trainer's "
    "exactness discipline). Scale: training is the certified GD loop; "
    "inference is one scan + broadcast(1-row weights) + one "
    "per-language agg — no shuffle beyond the final groupBy.",
)
def quality_logreg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    J = range(_LR_NFEAT)
    feat = logreg_features(spark, sf_dir)
    w = logreg_train_weights(feat)
    dot = sum(F.col(f"w{j}") * F.col(f"x{j}") for j in J)
    z = dot / F.lit(float(_LR_WSCALE))
    sq = F.round(F.lit(float(_LR_SSCALE)) / (F.lit(1.0) + F.exp(-z)), 0).cast("long")
    scored = feat.crossJoin(F.broadcast(w)).select(
        "lang", sq.alias("sq"), (dot > 0).cast("long").alias("adm")
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum("adm").alias("n_admitted"),
        F.sum("sq").alias("sum_score_q6"),
    )


def logreg_train_weights(
    feat: DataFrame, n_iters: int = LOGREG_ITERS, spool: str | None = None
) -> DataFrame:
    """``n_iters`` full-batch GD steps over the integer feature frame;
    returns the 1-row fixed-point weight table.  ``spool``: per-step
    lineage truncation of the weight row — the iterative-loop
    plan-growth discipline (SCALING.md); truncation is semantically
    neutral (pytest-proven: spooled ≡ unspooled weights past the
    certified depth).  Caller owns the dir."""
    spark = feat.sparkSession
    J = range(_LR_NFEAT)
    w = None  # None encodes the all-zero start (sigmoid exactly 0.5)
    for it in range(n_iters):
        if w is not None and spool is not None:
            w.write.mode("overwrite").parquet(f"{spool}/w{it}")
            w = spark.read.parquet(f"{spool}/w{it}")
        if w is None:
            scored = feat.withColumn("sq", F.lit(500_000).cast("long"))
        else:
            dot = sum(F.col(f"w{j}") * F.col(f"x{j}") for j in J)
            z = dot / F.lit(float(_LR_WSCALE))
            sq = F.round(F.lit(float(_LR_SSCALE)) / (F.lit(1.0) + F.exp(-z)), 0).cast("long")
            scored = feat.crossJoin(F.broadcast(w)).withColumn("sq", sq)
        g = scored.agg(
            *[
                F.sum((F.col("sq") - F.col("y") * _LR_SSCALE) * F.col(f"x{j}")).alias(f"g{j}")
                for j in J
            ],
            F.count("*").alias("n"),
        )
        if w is None:
            w = g.select(
                *[
                    (-F.round(F.col(f"g{j}") * 1000.0 / F.col("n"), 0)).cast("long").alias(f"w{j}")
                    for j in J
                ]
            )
        else:
            w = g.crossJoin(F.broadcast(w)).select(
                *[
                    (F.col(f"w{j}") - F.round(F.col(f"g{j}") * 1000.0 / F.col("n"), 0))
                    .cast("long")
                    .alias(f"w{j}")
                    for j in J
                ]
            )
    return w
