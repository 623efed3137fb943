"""Certified core SQL surface (SURVEY §2B) — Spark builders + DuckDB oracles.

The reference delegates its whole relational surface to an embedded
engine (DuckDB by default): the user's SQL string is passed through
verbatim (``/root/reference/sql/engine.go:256-258``). Parity therefore
means certifying every §2B category — projection, predicates, all join
flavors, aggregation incl. grouping sets/cube/rollup, window functions
with frames, set ops, scalar function families, subqueries/CTEs, and
event-time windows — against the same engine the reference embeds.

Every builder is idiomatic DataFrame API (Catalyst plans it: predicate
pushdown into the parquet scan, broadcast for the small dimensions,
whole-stage codegen); the oracle string is the ANSI-SQL equivalent DuckDB
executes over identical parquet views.

Conventions (driver compare is order-insensitive but name/value exact):
* every computed column is aliased identically on both sides;
* float aggregates are rounded on both sides (sum/revenue → 2 dp,
  ratios → 4 dp) so cross-engine summation-order noise cannot flip a
  hash;
* derived integers are cast to BIGINT on the Spark side (DuckDB's
  integer functions already return BIGINT);
* LIMIT queries carry a total ORDER BY with a unique-key tiebreak so
  the selected *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}


def _cents(col: str | F.Column) -> F.Column:
    """Exact integer cents for a 2-decimal money double.

    Money sums are computed in fixed-point: ``double`` summation of
    60k+ 4-decimal values accumulates ~1 ulp-of-total error, which sits
    within rounding distance of a ``.xx5`` boundary for ~1% of cells —
    enough to flip a cross-engine hash. Integer cents are exact in both
    engines and at any scale (1e15 cents headroom before BIGINT sums
    would need DECIMAL).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT)                                  AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
               * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS BIGINT)     AS sum_charge_e6,
           ROUND(AVG(l_quantity), 4)        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)   AS avg_price,
           ROUND(AVG(l_discount), 4)        AS avg_disc,
           COUNT(*)                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: the headline scan+agg. Money in exact fixed-point "
    "(cents/e4/e6 BIGINT) — deterministic at any scale and engine.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    price_c = _cents("l_extendedprice")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100, 0).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(price_c).alias("sum_base_price_cents"),
        F.sum(price_c * (100 - disc_pct)).alias("sum_disc_price_e4"),
        F.sum(price_c * (100 - disc_pct) * (100 + tax_pct)).alias("sum_charge_e6"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_basic_stats",
    "aggregation",
    """
    SELECT o_orderstatus,
           COUNT(*)                                          AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           ROUND(AVG(o_totalprice), 4)                       AS mean,
           MIN(o_totalprice)                                 AS lo,
           MAX(o_totalprice)                                 AS hi,
           ROUND(STDDEV(o_totalprice), 4)                    AS sd,
           ROUND(VAR_SAMP(o_totalprice), 2)                  AS variance
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(_cents("o_totalprice")).alias("total_cents"),
        F.round(F.avg("o_totalprice"), 4).alias("mean"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.round(F.stddev("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("variance"),
    )


@query(
    "agg_count_distinct",
    "aggregation",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_supp,
           COUNT(DISTINCT l_partkey)  AS n_part,
           COUNT(*)                   AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_having",
    "aggregation",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15 AND SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) > 150000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("spend_cents"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("spend_cents") > 150000000))
    )


@query(
    "agg_grouping_sets",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        """
    )


@query(
    "agg_rollup",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS amt_cents
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum(_cents("l_extendedprice")).alias("amt_cents")
    )


@query(
    "agg_cube",
    "aggregation",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "agg_pivot",
    "aggregation",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot: DataFrame .pivot() vs conditional aggregation in ANSI SQL.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    piv = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv


# ---------------------------------------------------------------------------
# projection / predicates / scalar functions
# ---------------------------------------------------------------------------

@query(
    "projection_case_arithmetic",
    "projection",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS net_e4,
           CASE WHEN l_discount >= 0.05 THEN 'deep'
                WHEN l_discount > 0 THEN 'light' ELSE 'none' END AS disc_band,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def projection_case_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            (_cents("l_extendedprice")
             * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))).alias("net_e4"),
            F.when(F.col("l_discount") >= 0.05, "deep")
            .when(F.col("l_discount") > 0, "light")
            .otherwise("none")
            .alias("disc_band"),
            F.col("l_quantity").cast("long").alias("qty_int"),
        )
    )


@query(
    "predicate_in_between_like",
    "predicates",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#3')
      AND p_name LIKE '%al%'
    """,
)
def predicate_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            F.col("p_size").between(10, 20)
            & F.col("p_brand").isin("Brand#1", "Brand#3")
            & F.col("p_name").like("%al%")
        )
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


@query(
    "predicate_null_handling",
    "predicates",
    """
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING')               AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'defaulted') AS seg_coalesced,
           (NULLIF(c_mktsegment, 'BUILDING') IS NULL)     AS is_building
    FROM customer WHERE c_custkey <= 200
    """,
    doc="NULL production + IS NULL / COALESCE semantics (reference renders NULLs only in results, sink/format.go:64-70).",
)
def predicate_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            seg_null.alias("seg_or_null"),
            F.coalesce(seg_null, F.lit("defaulted")).alias("seg_coalesced"),
            seg_null.isNull().alias("is_building"),
        )
    )


@query(
    "scalar_string_funcs",
    "scalar-functions",
    """
    SELECT c_custkey,
           LOWER(c_name)                       AS lname,
           UPPER(c_mktsegment)                 AS useg,
           SUBSTR(c_name, 1, 8)                AS prefix8,
           TRIM(CONCAT('  ', c_name, '  '))    AS trimmed,
           REPLACE(c_name, '#', '-')           AS dashed,
           CAST(LENGTH(c_name) AS BIGINT)      AS name_len,
           CONCAT(c_mktsegment, ':', c_name)   AS tagged
    FROM customer WHERE c_custkey <= 100
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            F.lower("c_name").alias("lname"),
            F.upper("c_mktsegment").alias("useg"),
            F.substring("c_name", 1, 8).alias("prefix8"),
            F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
            F.length("c_name").cast("long").alias("name_len"),
            F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        )
    )


@query(
    "scalar_regexp_json",
    "scalar-functions",
    """
    SELECT event_id,
           regexp_extract(props, '"k": ([0-9]+)', 1)           AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k_val
    FROM events WHERE event_id < 500
    """,
    doc="Regex + JSON extraction over the events.props JSON column.",
)
def scalar_regexp_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
    )


@query(
    "scalar_date_funcs",
    "scalar-functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS yr,
           CAST(month(o_orderdate) AS BIGINT)   AS mo,
           CAST(day(o_orderdate) AS BIGINT)     AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due"),
        )
    )


@query(
    "scalar_math_funcs",
    "scalar-functions",
    """
    SELECT s_suppkey,
           ROUND(ABS(s_acctbal), 2)                 AS mag,
           CAST(CEIL(s_acctbal) AS BIGINT)          AS up,
           CAST(FLOOR(s_acctbal) AS BIGINT)         AS down,
           ROUND(SQRT(ABS(s_acctbal)), 4)           AS root,
           ROUND(LN(ABS(s_acctbal) + 1), 4)         AS logn,
           CAST(ROUND(s_acctbal * 100) AS BIGINT)
             * CAST(ROUND(s_acctbal * 100) AS BIGINT) AS sq_e4,
           CAST(s_suppkey % 7 AS BIGINT)            AS modk
    FROM supplier
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bal = F.col("s_acctbal")
    return t["supplier"].select(
        "s_suppkey",
        F.round(F.abs(bal), 2).alias("mag"),
        F.ceil(bal).cast("long").alias("up"),
        F.floor(bal).cast("long").alias("down"),
        F.round(F.sqrt(F.abs(bal)), 4).alias("root"),
        F.round(F.log(F.abs(bal) + 1), 4).alias("logn"),
        (_cents(bal) * _cents(bal)).alias("sq_e4"),
        (F.col("s_suppkey") % 7).cast("long").alias("modk"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

@query(
    "join_inner_equi",
    "joins",
    """
    SELECT n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Broadcast inner equi-join: 25-row nation is broadcast, no shuffle on the fact side.",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )


@query(
    "join_left_outer",
    "joins",
    """
    SELECT p.p_partkey, p.p_name, l.n_li
    FROM part p LEFT JOIN (
        SELECT l_partkey, COUNT(*) AS n_li FROM lineitem WHERE l_quantity > 49 GROUP BY l_partkey
    ) l ON p.p_partkey = l.l_partkey
    WHERE p.p_partkey <= 500
    """,
    doc="Left outer with genuinely unmatched rows (high-quantity lineitems are sparse).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 49)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_li"))
    )
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 500)
        .join(li, F.col("p_partkey") == F.col("l_partkey"), "left")
        .select("p_partkey", "p_name", "n_li")
    )


@query(
    "join_right_outer",
    "joins",
    """
    SELECT r.r_name, n.n_name
    FROM (SELECT * FROM nation WHERE n_nationkey < 10) n
    RIGHT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n = t["nation"].filter(F.col("n_nationkey") < 10)
    return n.join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"), "right").select(
        "r_name", "n_name"
    )


@query(
    "join_full_outer",
    "joins",
    """
    SELECT COALESCE(s.k, c.k) AS nkey, s.n_supp, c.n_cust
    FROM (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 0 GROUP BY 1) s
    FULL JOIN (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer WHERE c_acctbal < -900 GROUP BY 1) c
    ON s.k = c.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    s = (
        t["supplier"]
        .filter(F.col("s_acctbal") > 0)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("n_supp"))
    )
    c = (
        t["customer"]
        .filter(F.col("c_acctbal") < -900)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_cust"))
    )
    return s.join(c, F.col("sk") == F.col("ck"), "full").select(
        F.coalesce("sk", "ck").alias("nkey"), "n_supp", "n_cust"
    )


@query(
    "join_semi",
    "joins",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    "joins",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_theta_range",
    "joins",
    """
    SELECT a.p_size AS size_a, COUNT(*) AS n_pairs
    FROM (SELECT p_partkey, p_size FROM part WHERE p_partkey <= 300) a
    JOIN (SELECT p_partkey, p_size FROM part WHERE p_partkey <= 300) b
      ON a.p_partkey < b.p_partkey AND b.p_size BETWEEN a.p_size - 1 AND a.p_size + 1
    GROUP BY a.p_size
    """,
    doc="Theta/range join (inequality ON). Scale path: band the range key and equi-join on band, see operators/asof.py notes.",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_partkey") <= 300).select("p_partkey", "p_size")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & F.col("b.p_size").between(F.col("a.p_size") - 1, F.col("a.p_size") + 1),
        )
        .groupBy(F.col("a.p_size").alias("size_a"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_banded_range",
    "joins",
    """
    SELECT a.p_size AS size_a, COUNT(*) AS n_pairs
    FROM (SELECT p_partkey, p_size FROM part WHERE p_partkey <= 300) a
    JOIN (SELECT p_partkey, p_size FROM part WHERE p_partkey <= 300) b
      ON a.p_partkey < b.p_partkey AND b.p_size BETWEEN a.p_size - 1 AND a.p_size + 1
    GROUP BY a.p_size
    """,
    doc="The SAME range join as join_theta_range, decomposed for scale: "
    "band p_size into width-3 buckets, explode each probe row to the "
    "(at most 2) buckets its +/-1 window overlaps, EQUI-join on the "
    "bucket id, then re-apply the exact range predicate. Each "
    "qualifying pair matches exactly once (the build side's bucket is "
    "unique and probe buckets are distinct), so the oracle is the "
    "plain theta join verbatim. The plan becomes a hash-partitioned "
    "equi join instead of the O(n*m) BroadcastNestedLoopJoin the pure "
    "theta form compiles to (plan-asserted in pytest) - the standard "
    "interval-join decomposition at 100 TB.",
)
def join_banded_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    band_w = 3  # equals the window width, so each window spans <= 2 bands
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_partkey") <= 300).select("p_partkey", "p_size")
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_size").alias("a_size"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("p_size") - 1) / band_w),
                    F.floor((F.col("p_size") + 1) / band_w),
                )
            )
        ).alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_size").alias("b_size"),
        F.floor(F.col("p_size") / band_w).alias("band"),
    )
    return (
        a.join(b, "band")
        .filter(
            (F.col("a_key") < F.col("b_key"))
            & F.col("b_size").between(F.col("a_size") - 1, F.col("a_size") + 1)
        )
        .groupBy(F.col("a_size").alias("size_a"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_star_5way",
    "joins",
    """
    SELECT r_name, n_name, COUNT(*) AS n_li,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    doc="Multi-way star join: fact table joins broadcast dimensions; one shuffle for the final agg.",
)
def join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
    return (
        t["lineitem"]
        .join(t["orders"].filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_li"), F.sum(rev).alias("revenue_e4"))
    )


@query(
    "q3_shipping_priority",
    "joins",
    """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_e4 DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape with deterministic tiebreak on the LIMIT.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    "joins",
    """
    SELECT n_name, CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: co-membership join (customer and supplier in same nation).",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

@query(
    "window_topk_per_group",
    "window-functions",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        t["part"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@query(
    "window_rank_dense_ntile",
    "window-functions",
    """
    SELECT s_suppkey,
           CAST(RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey)        AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (ORDER BY s_nationkey)                AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey)      AS BIGINT) AS quartile
    FROM supplier
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    by_bal = W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return t["supplier"].select(
        "s_suppkey",
        F.rank().over(by_bal).cast("long").alias("rnk"),
        F.dense_rank().over(W.orderBy("s_nationkey")).cast("long").alias("drnk"),
        F.ntile(4).over(by_bal).cast("long").alias("quartile"),
    )


@query(
    "window_lag_lead",
    "window-functions",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders WHERE o_custkey <= 50
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
        )
    )


@query(
    "window_running_sum_rows",
    "window-functions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
    FROM orders WHERE o_custkey <= 50
    """,
)
def window_running_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(_cents("o_totalprice")).over(w).alias("running_cents"),
        )
    )


@query(
    "window_range_frame",
    "window-functions",
    """
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(COUNT(*) OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal
               RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS peers_within_1k
    FROM supplier
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal").rangeBetween(-1000, 1000)
    return t["supplier"].select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.count("*").over(w).cast("long").alias("peers_within_1k"),
    )


# ---------------------------------------------------------------------------
# sorts / limits / set ops
# ---------------------------------------------------------------------------

@query(
    "orderby_limit_topk",
    "sorting",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
    doc="Top-K: Spark plans TakeOrderedAndProject — no global sort, per-partition heaps.",
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "setop_union_all",
    "set-operations",
    """
    SELECT k, src FROM (
        SELECT c_nationkey AS k, 'cust' AS src FROM customer WHERE c_acctbal > 9990
        UNION ALL
        SELECT s_nationkey AS k, 'supp' AS src FROM supplier WHERE s_acctbal > 9000
    )
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .filter(F.col("c_acctbal") > 9990)
        .select(F.col("c_nationkey").alias("k"), F.lit("cust").alias("src"))
    )
    s = (
        t["supplier"]
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"), F.lit("supp").alias("src"))
    )
    return c.unionByName(s)


@query(
    "setop_union_distinct",
    "set-operations",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
    UNION
    SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct()


@query(
    "setop_intersect",
    "set-operations",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@query(
    "setop_except",
    "set-operations",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("k"))
    return c.subtract(s)  # EXCEPT (set semantics); exceptAll would be EXCEPT ALL


# ---------------------------------------------------------------------------
# subqueries / CTEs
# ---------------------------------------------------------------------------

@query(
    "subquery_scalar",
    "subqueries",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_correlated",
    "subqueries",
    """
    SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > 1.9 * (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates to an aggregate + join.",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c_acctbal > 1.9 * (
            SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "cte_top_supplier",
    "subqueries",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev_e4
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_e4
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM revenue)
    """,
    doc="TPC-H Q15 shape: CTE + scalar subquery over it. Revenue in exact "
    "fixed-point so the equality-with-MAX predicate is deterministic.",
)
def cte_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS total_rev_e4
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev_e4
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM revenue)
        """
    )
