"""Fourth wave: the 12 remaining TPC-H query shapes, completing all 22.

The reference delegates its whole SQL surface to the embedded engine
(`/root/reference/sql/engine.go:256-258` — verbatim passthrough to
DuckDB), so the canonical TPC-H set is the cleanest certification that
our Spark SQL surface matches what a tailsql user can run today.

The driver testdata has no ``partsupp`` table and lacks some columns
(l_shipmode/commitdate/receiptdate, p_container/p_mfgr, o_comment), so
predicates are re-targeted while each query's *plan shape* — the thing
Catalyst has to get right — stays canonical:

* Q2  — correlated MAX subquery over a region-filtered join (min-cost
        supplier → best-acctbal supplier; part↔supplier link derived
        from lineitem in place of partsupp).
* Q4  — EXISTS semi-join counted per order priority.
* Q6  — single-table forecast-revenue filter-agg.
* Q8  — market-share ratio: two-level agg over an 8-way join with the
        same dimension (nation) joined on both customer and supplier
        sides.
* Q9  — product-profit: profit = revenue − cost proxy (0.5·retail·qty),
        grouped by supplier nation × year.
* Q11 — important-stock: group-agg filtered by a scalar-subquery
        fraction of the global total (exact-integer threshold).
* Q12 — priority-shipping conditional counts per linestatus.
* Q13 — customer order-count distribution (left outer join with an
        ON-clause filter, then a histogram of counts).
* Q15 — top-supplier: revenue CTE + scalar MAX equality.
* Q17 — small-quantity revenue: correlated per-part average threshold,
        done in exact integer arithmetic (q·5·cnt < Σq).
* Q20 — nested IN subqueries (semi-join chains).
* Q21 — waiting-supplier: EXISTS + NOT EXISTS correlated self-joins on
        lineitem ("failure" = l_returnflag='R' stands in for
        receipt-after-commit).

Cross-engine determinism: money in integer cents / e4 fixed-point
(BIGINT), ratios as one final double division of two exact integers,
quantity thresholds cross-multiplied to stay integral — see
``core_sql._cents``.
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


#: revenue in e4 fixed-point: cents(extendedprice) * (100 - pct(discount))
_REV_E4_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)
_QTY_SQL = "CAST(ROUND(l_quantity) AS BIGINT)"


def _rev_e4() -> F.Column:
    return _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )


def _qty() -> F.Column:
    """Integral quantity as BIGINT (testdata quantities are whole)."""
    return F.round(F.col("l_quantity"), 0).cast("long")


@query(
    "q2_best_supplier",
    "subqueries",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem),
    eu AS (
        SELECT partkey, s_suppkey, s_name, n_name,
               CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM ps
        JOIN supplier ON s_suppkey = suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT acctbal_cents, s_name, n_name, p_partkey, p_type
    FROM part JOIN eu ON p_partkey = eu.partkey
    WHERE p_size = 15
      AND acctbal_cents = (SELECT MAX(e2.acctbal_cents) FROM eu e2
                           WHERE e2.partkey = p_partkey)
    """,
    doc="TPC-H Q2 shape: correlated MAX subquery selecting the best "
    "supplier per part within a region (acctbal stands in for the "
    "missing ps_supplycost; part↔supplier pairs derived from "
    "lineitem). Spark side uses a window MAX — the decorrelated plan "
    "Catalyst would produce anyway, with no second scan.",
)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pairs = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    eu = (
        pairs.join(F.broadcast(t["supplier"]), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select(
            "partkey", "s_suppkey", "s_name", "n_name",
            _cents("s_acctbal").alias("acctbal_cents"),
        )
    )
    best = W.partitionBy("partkey")
    return (
        t["part"]
        .filter(F.col("p_size") == 15)
        .join(eu, F.col("p_partkey") == F.col("partkey"))
        .withColumn("max_bal", F.max("acctbal_cents").over(best))
        .filter(F.col("acctbal_cents") == F.col("max_bal"))
        .select("acctbal_cents", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "q4_order_priority",
    "subqueries",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery → left-semi join, "
    "counted per priority bucket ('has a returned line' stands in for "
    "the missing commit/receipt-date lateness predicate).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    "aggregation",
    f"""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND {_QTY_SQL} < 24
    """,
    doc="TPC-H Q6 shape: single-scan filter-aggregate (revenue that "
    "would be recovered by dropping small-quantity discounts). The "
    "discount band compares rounded integer percent, not raw doubles "
    "— exact on both engines.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & disc_pct.between(5, 7)
            & (_qty() < 24)
        )
        .agg(
            F.sum(_cents("l_extendedprice") * disc_pct).alias("revenue_e4"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q8_market_share",
    "aggregation",
    f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume_e4 ELSE 0 END) * 1.0
                 / SUM(volume_e4), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {_REV_E4_SQL} AS volume_e4,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem  ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    ) allnations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 8-way join with nation joined twice (customer "
    "side restricted by region, supplier side providing the share "
    "dimension), then a conditional-sum market-share ratio per year. "
    "Numerator and denominator are exact BIGINTs; one final division.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    flat = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
              F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_e4().alias("volume_e4"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_1", F.col("volume_e4")).otherwise(F.lit(0))
    return flat.groupBy("o_year").agg(
        F.round(F.sum(nat) * 1.0 / F.sum("volume_e4"), 6).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    "aggregation",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_E4_SQL}
               - {_QTY_SQL} * CAST(ROUND(p_retailprice * 100) AS BIGINT) * 50) AS BIGINT)
               AS profit_e4
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: profit per supplier-nation per year over a "
    "5-way join with a LIKE part filter. Cost proxy = 0.5 × retail × "
    "qty (testdata has no ps_supplycost); all terms e4 fixed-point.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    amount = _rev_e4() - _qty() * _cents("p_retailprice") * 50
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_e4"))
    )


_Q11_VALUE = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"

@query(
    "q11_important_stock",
    "subqueries",
    f"""
    SELECT l_partkey AS partkey, CAST(SUM({_Q11_VALUE}) AS BIGINT) AS value_cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING SUM({_Q11_VALUE}) * 1000 > (
        SELECT SUM({_Q11_VALUE})
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3')
    """,
    doc="TPC-H Q11 shape: per-part value within one nation, kept only "
    "when above a scalar-subquery fraction (0.1%) of the national "
    "total. Threshold cross-multiplied to exact integers. Spark side "
    "computes the grouped values once and broadcasts the 1-row total "
    "instead of re-scanning (the decorrelated form).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    value = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = value.agg(F.sum("value_cents").alias("grand_total"))
    return (
        value.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("grand_total"))
        .select("partkey", "value_cents")
    )


@query(
    "q12_priority_shipping",
    "aggregation",
    """
    SELECT l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag <> 'A'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: orders↔lineitem join with complementary "
    "conditional counts (linestatus stands in for the missing "
    "l_shipmode).",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_returnflag") != "A")
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    "aggregation",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an ON-clause (not "
    "WHERE) filter, then a histogram of per-customer counts — the "
    "two-level aggregation distribution query. COUNT(col) ignores "
    "the NULLs from unmatched customers on both engines.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q15_top_supplier",
    "subqueries",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS total_revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue_e4
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
    """,
    doc="TPC-H Q15 shape: revenue CTE reused twice — once joined, once "
    "reduced to a scalar MAX. Exact-integer revenue makes the equality "
    "deterministic. Spark side reuses one grouped DataFrame for both "
    "(self-reuse instead of re-scan) and broadcasts the 1-row max.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_e4()).alias("total_revenue_e4"))
    )
    top = revenue.agg(F.max("total_revenue_e4").alias("max_rev"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue_e4") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
    )


@query(
    "q17_small_qty_revenue",
    "subqueries",
    f"""
    WITH pq AS (
        SELECT l_partkey AS pk,
               SUM({_QTY_SQL}) AS sum_qty, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey)
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 7.0, 4)
               AS avg_yearly_cents,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN pq   ON pk = l_partkey
    WHERE p_brand = 'Brand#1'
      AND {_QTY_SQL} * 5 * cnt < sum_qty
    """,
    doc="TPC-H Q17 shape: rows below 20% of their part's average "
    "quantity. The correlated AVG is decorrelated into one grouped "
    "scan, and the 0.2·avg comparison is cross-multiplied "
    "(q·5·cnt < Σq) so both engines compare exact integers.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(_qty()).alias("sum_qty"), F.count("*").alias("cnt"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#1")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pk") == F.col("l_partkey"))
        .filter(_qty() * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(F.sum(_cents("l_extendedprice")) / 7.0, 4).alias("avg_yearly_cents"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q20_potential_promotion",
    "subqueries",
    f"""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING SUM({_QTY_SQL}) > 50)
    """,
    doc="TPC-H Q20 shape: two nested IN subqueries (parts by name "
    "prefix → suppliers who moved >50 units of them in a year) "
    "filtered to one nation — a semi-join chain with a grouped-HAVING "
    "inner block.",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    movers = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_qty()).alias("moved"))
        .filter(F.col("moved") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_5")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_supplier",
    "subqueries",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: the sole-blame pattern — a correlated EXISTS "
    "(order had other suppliers) AND NOT EXISTS (none of the others "
    "failed) self-join pair on lineitem, counted per supplier "
    "(l_returnflag='R' stands in for receipt-after-commit).",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    # Spark SQL decorrelates both predicates into semi/anti joins; the
    # DataFrame translation would need non-equi semi joins, which read
    # worse for the same plan.
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        """
    )
