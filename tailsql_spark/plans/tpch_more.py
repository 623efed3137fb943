"""Third-wave SQL surface: more canonical TPC-H query shapes + the
remaining scalar/relational forms (arrays, unpivot, rank distributions).

Shapes (adapted to the driver testdata's columns — the schema lacks
l_shipmode/p_container etc., so predicates are re-targeted while the
*plan shapes* stay canonical):

* Q7-like  — two-sided nation-pair volume (self-join dimension alias).
* Q10-like — returned-items top-k customers (multi-join + agg + top-k).
* Q14-like — conditional-aggregate ratio (promo revenue %).
* Q16-like — distinct-supplier counts with NOT IN subquery.
* Q18-like — IN over a grouped-HAVING subquery (large-volume orders).
* Q19-like — disjunctive multi-clause predicate (OR of ANDs) —
  Catalyst must still push the common conjuncts.
* Q22-like — substring bucketing + NOT EXISTS + scalar avg subquery.
* array_ops — slice/element_at/contains/sort over array<float>.
* unpivot_stack — wide→long (stack ≡ UNPIVOT ≡ UNION ALL oracle).
* window_rank_distribution — percent_rank / cume_dist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.plans.catalog import QuerySpec, load_tables
from tailsql_spark.plans.core_sql import _cents

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


_REV_E4_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _rev_e4():
    return _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )


@query(
    "q7_nation_volume",
    "joins",
    f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS revenue_e4
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: same dimension joined twice under different "
    "aliases (customer nation vs supplier nation).",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(
            F.col("cust_nation").isin("NATION_1", "NATION_2")
            & F.col("supp_nation").isin("NATION_1", "NATION_2")
            & (F.col("n1_key") != F.col("n2_key"))
        )
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("ship_year")
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
    )


@query(
    "q10_returned_items",
    "joins",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS revenue_e4
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_e4 DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q14_promo_ratio",
    "aggregation",
    f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_E4_SQL} ELSE 0 END)
                 / SUM({_REV_E4_SQL}), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-aggregate ratio. Numerator and "
    "denominator are exact BIGINTs; one final double division is "
    "deterministic (same two ints on both engines).",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = _rev_e4()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@query(
    "q16_supplier_cnt",
    "subqueries",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN subquery (null-safe anti-join under "
    "the hood) + multi-key distinct count.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (5, 10, 15, 20)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )


@query(
    "q18_large_volume",
    "subqueries",
    """
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS odate,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery (semi-join "
    "against an aggregate).",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", F.col("o_orderdate").alias("odate"))
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
    )


@query(
    "q19_disjunctive",
    "predicates",
    f"""
    SELECT CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS revenue_e4, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs disjunctive predicate — the join "
    "stays an equi-join; the disjunction filters post-join.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p, q_ = F.col("p_brand"), F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((p == "Brand#1") & sz.between(1, 15) & q_.between(1, 20))
        | ((p == "Brand#2") & sz.between(10, 30) & q_.between(10, 35))
        | ((p == "Brand#3") & sz.between(20, 50) & q_.between(20, 50))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev_e4()).alias("revenue_e4"), F.count("*").alias("n"))
    )


@query(
    "q22_global_sales",
    "subqueries",
    """
    SELECT SUBSTR(c_name, 18, 1) AS name_digit,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape: substring bucketing + scalar avg subquery + "
    "NOT EXISTS anti-join.",
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT SUBSTR(c_name, 18, 1) AS name_digit,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 400000)
        GROUP BY 1
        """
    )


@query(
    "array_ops",
    "scalar-functions",
    """
    SELECT vec_id,
           embedding[1]                 AS first_el,
           embedding[2:4]               AS middle,
           CAST(len(embedding) AS BIGINT) AS dim,
           list_sort(embedding[1:4])    AS sorted_head,
           list_contains(embedding, embedding[1]) AS has_first
    FROM embeddings WHERE vec_id < 50
    """,
    doc="Array surface over array<float>: index, slice, sort, contains "
    "(Spark 1-based element_at/slice ≡ DuckDB 1-based list ops).",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = F.col("embedding")
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.element_at(e, 1).alias("first_el"),
            F.slice(e, 2, 3).alias("middle"),
            F.size(e).cast("long").alias("dim"),
            F.sort_array(F.slice(e, 1, 4)).alias("sorted_head"),
            F.array_contains(e, F.element_at(e, 1)).alias("has_first"),
        )
    )


@query(
    "unpivot_stack",
    "projection",
    """
    SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'price' AS metric, p_retailprice AS val FROM part
    ) WHERE p_partkey <= 100
    """,
    doc="Unpivot (wide→long): Spark stack() ≡ SQL UNION ALL branches.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (metric, val)",
        )
    )


@query(
    "window_rank_distribution",
    "window-functions",
    """
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pr,
           ROUND(CUME_DIST()    OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cd
    FROM supplier
    """,
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.orderBy("s_acctbal", "s_suppkey")
    return t["supplier"].select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "scalar_string_funcs2",
    "scalar-functions",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g')   AS devowelled,
           lpad(CAST(p_size AS VARCHAR), 4, '0')          AS size_padded,
           rpad(p_brand, 12, '.')                         AS brand_padded,
           split_part(p_type, ' ', 1)                     AS type_head,
           reverse(p_brand)                               AS brand_rev,
           repeat(SUBSTR(p_name, 1, 2), 2)                AS head_twice,
           translate(p_brand, '#', '-')                   AS brand_dash,
           CAST(strpos(p_name, 'a') AS BIGINT)            AS first_a
    FROM part WHERE p_partkey <= 150
    """,
    doc="String surface wave 2: regexp_replace/pads/split_part/reverse/"
    "repeat/translate/position.",
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 150)
        .select(
            "p_partkey",
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devowelled"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.rpad(F.col("p_brand"), 12, ".").alias("brand_padded"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.repeat(F.substring("p_name", 1, 2), 2).alias("head_twice"),
            F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
            F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        )
    )


@query(
    "scalar_date_funcs2",
    "scalar-functions",
    """
    SELECT o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
               AS days_since_epoch_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP)        AS month_end,
           o_orderdate + INTERVAL 1 MONTH                  AS next_month,
           CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
           CAST(date_part('dow', o_orderdate) AS BIGINT)     AS dow_sun0
    FROM orders WHERE o_orderkey < 200
    """,
    doc="Date surface wave 2: datediff/last_day/add_months/quarter/"
    "day-of-week (dialects aligned: Spark dayofweek is 1-based Sunday, "
    "DuckDB dow is 0-based Sunday).",
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    od = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.datediff(od, F.lit("1995-01-01").cast("timestamp")).cast("long").alias(
                "days_since_epoch_start"
            ),
            F.last_day(od).cast("timestamp").alias("month_end"),
            (od + F.expr("INTERVAL 1 MONTH")).alias("next_month"),
            F.quarter(od).cast("long").alias("qtr"),
            (F.dayofweek(od) - 1).cast("long").alias("dow_sun0"),
        )
    )


@query(
    "scalar_bitwise_funcs",
    "scalar-functions",
    """
    SELECT o_orderkey,
           o_orderkey & 255                    AS band,
           o_orderkey | 4096                   AS bor,
           xor(o_orderkey, o_custkey)          AS bxor,
           o_orderkey << 3                     AS shl,
           o_orderkey >> 2                     AS shr,
           ~o_orderkey                         AS bnot
    FROM orders WHERE o_orderkey < 300
    """,
    doc="Bitwise surface: and/or/xor/shifts/not. Dialect note: DuckDB "
    "spells xor as a function (its ^ is exponentiation); Spark SQL's "
    "^ is bitwise xor.",
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return (
        t["orders"]
        .filter(k < 300)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("band"),
            k.bitwiseOR(F.lit(4096)).alias("bor"),
            k.bitwiseXOR(c).alias("bxor"),
            F.shiftleft(k, 3).alias("shl"),
            F.shiftright(k, 2).alias("shr"),
            F.expr("~o_orderkey").alias("bnot"),
        )
    )


@query(
    "scalar_hash_funcs",
    "scalar-functions",
    """
    SELECT p_partkey,
           md5(p_name)                          AS name_md5,
           sha256(p_brand)                      AS brand_sha256,
           md5(concat(p_brand, '|', p_type))    AS combo_md5
    FROM part WHERE p_partkey <= 200
    """,
    doc="Hashing surface: md5 / sha-256 hex digests (Spark sha2(x,256) "
    "= DuckDB sha256) — the primitives under every dedup/fingerprint "
    "operator in this repo.",
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
            F.sha2(F.col("p_brand").cast("binary"), 256).alias("brand_sha256"),
            F.md5(F.concat_ws("|", "p_brand", "p_type").cast("binary")).alias("combo_md5"),
        )
    )


@query(
    "scalar_conditional_funcs",
    "scalar-functions",
    """
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, 'Supplier#000000001'), '<masked>')   AS masked_name,
           GREATEST(CAST(ROUND(s_acctbal * 100) AS BIGINT), 0)          AS bal_floor_cents,
           LEAST(s_nationkey, 10)                                       AS nk_cap,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal = 0 THEN 'zero'
                ELSE 'credit' END                                       AS bal_class,
           IFNULL(NULLIF(s_nationkey, 0), -1)                           AS nk_or_neg1
    FROM supplier
    """,
    doc="Conditional surface: coalesce/nullif/greatest/least/ifnull + "
    "searched CASE.",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bal = F.col("s_acctbal")
    return t["supplier"].select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("Supplier#000000001")), F.lit("<masked>"))
            .alias("masked_name"),
        F.greatest(_cents("s_acctbal"), F.lit(0).cast("long")).alias("bal_floor_cents"),
        F.least(F.col("s_nationkey"), F.lit(10)).alias("nk_cap"),
        F.when(bal < 0, "debt").when(bal == 0, "zero").otherwise("credit").alias("bal_class"),
        F.ifnull(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias("nk_or_neg1"),
    )


_LATERAL_SQL = """
    SELECT n_name, t.s_name, t.bal_cents
    FROM nation,
    LATERAL (SELECT s_name, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_cents
             FROM supplier WHERE s_nationkey = n_nationkey
             ORDER BY s_acctbal DESC, s_name LIMIT 2) t
"""


@query(
    "join_lateral_topk",
    "joins",
    _LATERAL_SQL,
    doc="Correlated LATERAL subquery (top-2 suppliers per nation) — "
    "the modern per-group-top-k form; Catalyst decorrelates it to a "
    "ranked window join, same plan as the window_topk shape.",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_GROUPING_ID_SQL = """
    SELECT r_name, n_name,
           GROUPING(n_name) AS g_n, GROUPING(r_name) AS g_r,
           CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
"""


@query(
    "agg_grouping_id",
    "aggregation",
    _GROUPING_ID_SQL,
    doc="GROUPING()/GROUPING_ID() markers over ROLLUP — distinguishes "
    "real NULL group keys from subtotal rows (argument order must "
    "match the rollup order; both engines then agree bit-for-bit).",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_GROUPING_ID_SQL)


_TIME_RANGE_SQL = """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
               AS rolling7d_cents
    FROM orders WHERE o_custkey < 50
"""


@query(
    "window_time_range_rolling",
    "window-functions",
    _TIME_RANGE_SQL,
    doc="Time-interval RANGE frame: per-customer rolling 7-day spend — "
    "the event-time sliding aggregate expressed as a window frame "
    "(one shuffle on the partition key + one sort, no self-join).",
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_TIME_RANGE_SQL)
