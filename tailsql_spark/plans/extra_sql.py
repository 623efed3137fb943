"""Second-wave coverage: remaining §2B/§2C surface + iterative algorithms.

* ``setop_except_all``      — multiset EXCEPT ALL (vs set EXCEPT in core).
* ``window_first_last``     — FIRST_VALUE/LAST_VALUE over a full frame.
* ``percentile_exact``      — exact interpolated percentiles (Spark
  ``percentile`` ≡ DuckDB ``quantile_cont``).
* ``agg_approx_sketches``   — approx_count_distinct / approx quantiles
  (sketch outputs are engine-specific → rows-only check, no oracle).
* ``json_struct_parse``     — ``from_json`` typed struct extraction.
* ``text_ngram_topk``       — corpus-level top-k bigrams.
* ``tailsql_filter_expr``   — the reference's ``-F`` filter surface
  (qlbridge expression dialect, SURVEY §2C) through ``apply_filter``.
* ``dedup_clusters``        — connected components over near-dup pairs:
  an iterative label-propagation loop in Spark (driver-coordinated
  joins, the Pregel-lite shape) vs a recursive-CTE transitive closure
  in DuckDB. This is the canonical "non-SQL iterative algorithm" the
  engine must still express — and it IS differential-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.operators.dedup import REGISTRY as _DEDUP_REGISTRY
from tailsql_spark.operators.rowfilter import apply_filter
from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


@query(
    "setop_except_all",
    "set-operations",
    """
    SELECT k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        EXCEPT ALL
        SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
    )
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s)


@query(
    "window_first_last",
    "window-functions",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey)  OVER w AS last_ok,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_cust
    FROM orders WHERE o_custkey <= 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 40)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w).alias("last_ok"),
            F.count("*").over(w).cast("long").alias("n_in_cust"),
        )
    )


@query(
    "percentile_exact",
    "aggregation",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles: Spark `percentile` and DuckDB "
    "`quantile_cont` share the p·(n−1) linear-interpolation definition.",
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "agg_approx_sketches",
    "aggregation",
    None,  # sketch estimates are engine-specific — rows-only check
    doc="Approximate aggregates (HLL distinct count, approximate "
    "quantiles): the 100 TB substitutes for exact DISTINCT/percentile. "
    "No oracle — estimates legitimately differ between engines.",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
        F.count("*").alias("n_rows"),
    )


@query(
    "json_struct_parse",
    "scalar-functions",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           (CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL) AS has_k
    FROM events WHERE event_id < 1000
    """,
    doc="Typed JSON parsing: Spark from_json to a struct vs DuckDB "
    "json_extract casts — the sources/formats surface beyond regex lines.",
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        t["events"]
        .filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            parsed.getField("k").alias("k_val"),
            parsed.getField("k").isNotNull().alias("has_k"),
        )
    )


@query(
    "text_ngram_topk",
    "text-analysis",
    """
    WITH toks AS (
        SELECT doc_id, ws, len(ws) AS n
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
    ),
    bigrams AS (
        SELECT unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, n)]) AS bg
        FROM toks
    )
    SELECT bg, COUNT(*) AS cnt
    FROM bigrams GROUP BY bg
    ORDER BY cnt DESC, bg ASC LIMIT 10
    """,
    doc="Corpus top-10 bigrams: the n-gram frequency table every "
    "text-dedup/quality pipeline starts from. One explode + one agg + "
    "top-k (TakeOrderedAndProject, no global sort).",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2), lambda i: F.concat_ws(" ", toks[i], toks[i + 1])
    )).otherwise(F.array().cast("array<string>"))
    return (
        t["documents"]
        .select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bg").asc())
        .limit(10)
    )


@query(
    "tailsql_filter_expr",
    "tailsql-pipeline",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type = 'click' AND value > 50 AND contains(props, '9')
    """,
    doc="The -F filter surface (qlbridge expression dialect, SURVEY "
    "§2C): `==` equality, boolean ops, string helpers — all valid "
    "Spark SQL via apply_filter.",
)
def tailsql_filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    filtered = apply_filter(
        t["events"], 'event_type == "click" AND value > 50 AND contains(props, "9")'
    )
    return filtered.select("event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------

_MINHASH_ORACLE = _DEDUP_REGISTRY["dedup_minhash_lsh"].oracle

_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE
    mh AS (SELECT id_a, id_b FROM ({_MINHASH_ORACLE}) q),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM mh
        UNION
        SELECT id_b AS a, id_a AS b FROM mh
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
"""


@query(
    "dedup_clusters",
    "dedup",
    _CLUSTERS_ORACLE,
    doc="Duplicate-cluster assignment: connected components over the "
    "MinHash-LSH near-dup graph. Spark side is iterative min-label "
    "propagation (driver loop over distributed joins — the Pregel "
    "shape, O(diameter) rounds); oracle is a recursive-CTE transitive "
    "closure. Canonical doc per cluster = min doc_id.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _DEDUP_REGISTRY["dedup_minhash_lsh"].build(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    labels = (
        edges.select(F.col("id_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(20):  # diameter bound; near-dup clusters are shallow
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.node)
            .groupBy(F.col("id_a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out


from tailsql_spark.operators.textstats import REGISTRY as _TEXT_REGISTRY

_QUALITY_ORACLE = _TEXT_REGISTRY["text_quality_score"].oracle

_CANONICAL_ORACLE = f"""
    WITH clusters AS (SELECT * FROM ({_CLUSTERS_ORACLE}) zc),
    q AS (SELECT doc_id, quality FROM ({_QUALITY_ORACLE}) zq)
    SELECT cluster_id, doc_id AS canonical_doc_id, n_members
    FROM (
        SELECT c.cluster_id, c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
        FROM clusters c JOIN q ON c.doc_id = q.doc_id
    ) WHERE rn = 1
"""


@query(
    "dedup_canonical_selection",
    "dedup",
    _CANONICAL_ORACLE,
    doc="End-to-end dedup policy: near-dup graph (MinHash-LSH) → "
    "connected components → keep the highest-QUALITY member per "
    "cluster (tie → lowest id). Demonstrates operator composition: "
    "dedup, clustering, and text-quality scoring in one certified plan.",
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.textstats import REGISTRY as _TR

    clusters = REGISTRY["dedup_clusters"].build(spark, sf_dir)
    quality = _TR["text_quality_score"].build(spark, sf_dir).select("doc_id", "quality")
    joined = clusters.join(quality, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(W.partitionBy("cluster_id")))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("canonical_doc_id"), "n_members")
    )


@query(
    "dedup_keep_first_event",
    "dedup",
    """
    SELECT user_id, event_id AS first_event_id, ts AS first_ts
    FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-first-by-time dedup: one row per key, earliest event "
    "(deterministic tiebreak on id). One shuffle on the key; at scale "
    "this is the standard latest/earliest-record compaction shape.",
)
def dedup_keep_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@query(
    "scalar_edit_distance",
    "scalar-functions",
    """
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS BIGINT)        AS name_type_dist,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT)    AS brand_dist
    FROM part WHERE p_partkey <= 200
    """,
    doc="Edit-distance surface (levenshtein) — the approximate string "
    "matching primitive under fuzzy dedup.",
)
def scalar_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.levenshtein("p_name", "p_type").cast("long").alias("name_type_dist"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("long").alias("brand_dist"),
        )
    )


@query(
    "array_hof_ops",
    "array-map-functions",
    """
    WITH per_order AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
        FROM lineitem WHERE l_orderkey < 500
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qtys)                                              AS n_items,
           len(list_filter(qtys, x -> x >= 25))                   AS n_big,
           len(list_filter(qtys, x -> x >= 45)) > 0               AS has_ge_45,
           len(list_filter(qtys, x -> x < 5)) = 0                 AS all_ge_5,
           CAST(list_sum(qtys) AS BIGINT)                         AS total_qty,
           list_transform(qtys, x -> x * 2)[1]                    AS min_doubled
    FROM per_order
    """,
    doc="Higher-order array functions (SURVEY §2B array/map row): "
    "filter / exists / forall / aggregate / transform over a "
    "deterministically sorted per-order quantity array. HOFs are "
    "interpreted (outside whole-stage codegen) — fine off the hot "
    "path; hot-path pipelines flatten to scalar columns instead "
    "(see dedup.py caching note).",
)
def array_hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_order = (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 500)
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.col("l_quantity").cast("long"))
            ).alias("qtys")
        )
    )
    a = F.col("qtys")
    return per_order.select(
        "l_orderkey",
        F.size(a).cast("long").alias("n_items"),
        F.size(F.filter(a, lambda x: x >= 25)).cast("long").alias("n_big"),
        F.exists(a, lambda x: x >= 45).alias("has_ge_45"),
        F.forall(a, lambda x: x >= 5).alias("all_ge_5"),
        F.aggregate(a, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("total_qty"),
        F.element_at(F.transform(a, lambda x: x * 2), 1).alias("min_doubled"),
    )


@query(
    "map_ops",
    "array-map-functions",
    """
    WITH per_line AS (
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem WHERE l_orderkey < 500
        GROUP BY 1, 2
    )
    SELECT l_orderkey,
           MAX(CASE WHEN l_linenumber = 1 THEN qty END) AS first_line_qty,
           COUNT(*)                                     AS n_lines,
           MAX(l_linenumber)                            AS max_line,
           CAST(SUM(qty) AS BIGINT)                     AS qty_sum
    FROM per_line
    GROUP BY l_orderkey
    """,
    doc="Map-typed column surface: per order, build "
    "map<linenumber, qty> with map_from_entries, then read it back "
    "with element_at / size / map_keys / map_values+aggregate. The "
    "oracle states the same facts relationally — DuckDB's MAP "
    "extraction semantics differ, and the certified contract is "
    "values, not dialect.",
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_line = (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 500)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    per_order = per_line.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("k"), F.col("qty").alias("v")
                    )
                )
            )
        ).alias("mp")
    )
    mp = F.col("mp")
    return per_order.select(
        "l_orderkey",
        F.element_at(mp, 1).alias("first_line_qty"),
        F.size(mp).cast("long").alias("n_lines"),
        F.array_max(F.map_keys(mp)).cast("long").alias("max_line"),
        F.aggregate(
            F.map_values(mp), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("qty_sum"),
    )


@query(
    "scalar_regexp_funcs2",
    "scalar-functions",
    """
    SELECT event_id,
           len(regexp_extract_all(props, '[0-9]+'))            AS n_numbers,
           regexp_extract_all(props, '[0-9]+')                 AS numbers,
           regexp_matches(props, '"k"')                        AS has_k,
           regexp_replace(props, '[0-9]', '#', 'g')            AS masked
    FROM events WHERE event_id < 500
    """,
    doc="Regexp surface wave 2: regexp_extract_all (list of every "
    "match), match-count, boolean regexp test, global replace — the "
    "log-line mining toolkit the reference's regex-DSL parse stage "
    "(sql/lparser.go:89-149) implies. All JVM-side built-ins; the "
    "extract_all list is deterministic (match order).",
)
def scalar_regexp_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0)).cast("long").alias("n_numbers"),
            F.regexp_extract_all("props", F.lit("[0-9]+"), 0).alias("numbers"),
            F.col("props").rlike('"k"').alias("has_k"),
            F.regexp_replace("props", "[0-9]", "#").alias("masked"),
        )
    )


@query(
    "agg_hll_mergeable",
    "aggregation",
    None,  # sketch estimates are engine-specific — rows-only check
    doc="The 100 TB distinct-count workflow: per-day PARTIAL DataSketches "
    "HLL sketches of user_id per event_type, then hll_union_agg to the "
    "global estimate — the two-level shape that replaces a full "
    "COUNT(DISTINCT) shuffle with constant-size mergeable state (the "
    "same sketches could land in a rollup table and merge across any "
    "grouping later). Estimate accuracy vs exact is asserted within "
    "2 % in tests/test_registry.py (rows-only here: sketch bytes are "
    "engine-specific, so no cross-engine oracle exists by design).",
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    partial = (
        t["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(CAST(user_id AS STRING))").alias("sk"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users"),
            F.count("*").alias("n_partials"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_try_funcs",
    "scalar",
    """
    SELECT l_orderkey,
           TRY_CAST(l_returnflag AS BIGINT) AS bad_int,
           TRY_CAST(substring(CAST(l_orderkey AS VARCHAR), 1, 1) AS BIGINT)
               AS maybe_int,
           CASE WHEN (l_linenumber - 1) = 0 THEN NULL
                ELSE CAST(l_quantity AS BIGINT) // (l_linenumber - 1) END AS safe_div,
           TRY_CAST(l_linestatus AS DATE) IS NULL AS not_a_date
    FROM lineitem WHERE l_orderkey < 200
    """,
    doc="Error-tolerant scalar surface: TRY_CAST of malformed "
    "strings -> NULL (never a task failure) and guarded division - "
    "the ingestion idiom for dirty 100 TB text where one bad row must "
    "not kill a stage. Spark try_cast vs DuckDB TRY_CAST; integer div "
    "floors identically both sides.",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            F.expr("try_cast(l_returnflag AS bigint)").alias("bad_int"),
            F.expr(
                "try_cast(substring(cast(l_orderkey as string), 1, 1) AS bigint)"
            ).alias("maybe_int"),
            F.when(F.col("l_linenumber") == 1, F.lit(None).cast("long"))
            .otherwise(
                F.floor(
                    F.col("l_quantity").cast("bigint") / (F.col("l_linenumber") - 1)
                ).cast("long")
            )
            .alias("safe_div"),
            F.expr("try_cast(l_linestatus AS date)").isNull().alias("not_a_date"),
        )
    )
