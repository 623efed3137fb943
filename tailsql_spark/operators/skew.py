"""Skew-aware aggregation: explicit two-phase salted combine.

At 100 TB a handful of hot keys (one log-spamming host, one viral
document) can pin an entire aggregation on one reducer. AQE's skew
handling covers joins; for low-cardinality/hot-key AGGREGATION the
classic fix is salting — and Spark's hash aggregate already does a
map-side partial, so explicit salting matters when the combine itself
is expensive (e.g. ``collect_set``-style state, exact distincts). This
module shows the pattern as a certified operator:

phase 1: group by (key, salt) where salt = a deterministic hash of a
         high-cardinality column mod S → S-way spread of each hot key;
phase 2: re-aggregate the S partials by key.

Result is EXACTLY the unsalted aggregate (sums/counts/min/max are
associative) — which is what the DuckDB oracle certifies: the oracle
computes the plain GROUP BY, proving salting is a pure execution-plan
transformation, not a semantics change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    salt_src: str,
    aggs_phase1: list,
    aggs_phase2: list,
) -> DataFrame:
    """Generic two-phase salted aggregation (see module docstring)."""
    salt = F.pmod(F.crc32(F.col(salt_src).cast("string")), F.lit(N_SALTS)).alias("__salt")
    partial = df.groupBy(F.col(key), salt).agg(*aggs_phase1)
    return partial.groupBy(key).agg(*aggs_phase2)


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


@query(
    "agg_salted_skew",
    "skew-handling",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS amt_cents,
           MIN(l_orderkey) AS min_ok,
           MAX(l_orderkey) AS max_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="3-key aggregation over 60k+ rows — the hot-key shape — via "
    "16-way salt + re-combine. Oracle is the PLAIN group-by: salting "
    "must be invisible in the result.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    from tailsql_spark.plans.core_sql import _cents

    return salted_agg(
        t["lineitem"],
        key="l_returnflag",
        salt_src="l_orderkey",
        aggs_phase1=[
            F.count("*").alias("p_n"),
            F.sum("l_quantity").alias("p_qty"),
            F.sum(_cents("l_extendedprice")).alias("p_amt"),
            F.min("l_orderkey").alias("p_min"),
            F.max("l_orderkey").alias("p_max"),
        ],
        aggs_phase2=[
            F.sum("p_n").alias("n"),
            F.sum("p_qty").cast("long").alias("qty"),
            F.sum("p_amt").alias("amt_cents"),
            F.min("p_min").alias("min_ok"),
            F.max("p_max").alias("max_ok"),
        ],
    )


_SALTED_JOIN_ORACLE = """
    SELECT p_brand, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
"""


@query(
    "join_salted_skew",
    "skew",
    _SALTED_JOIN_ORACLE,
    doc="Salted skew join: the probe side gets a deterministic salt, "
    "the build side is replicated once per salt value, and the join "
    "key becomes (key, salt) — a hot key's rows now spread over "
    "N_SALTS reducers instead of one. Result is EXACTLY the plain "
    "join (the oracle computes it unsalted). This is the manual form "
    "of what AQE skew-join does adaptively; at 100 TB you use it when "
    "skew is known ahead of time (e.g. null-ish default keys).",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "__salt", F.pmod(F.crc32(F.col("l_orderkey").cast("string")), F.lit(N_SALTS))
    )
    part_rep = t["part"].select(
        "p_partkey", "p_brand", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("__salt")
    )
    return (
        li.join(
            part_rep,
            (F.col("l_partkey") == F.col("p_partkey")) & (li["__salt"] == part_rep["__salt"]),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("total_qty"),
            F.count("*").alias("n"),
        )
    )
