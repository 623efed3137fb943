"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`tailsql_spark.plans.registry`; this module
is a thin adapter over that registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tailsql_spark.plans.registry import REGISTRY
from tailsql_spark.session import DEFAULT_CONF


def _apply_conf(spark: SparkSession) -> None:
    """The driver builds its own SparkSession; apply the runtime-settable
    parts of our config (notably nanosAsLong for the ns-timestamp
    parquet and UTC session time) so plans behave identically."""
    for k, v in DEFAULT_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs can't be set post-start; session.py handles those


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end tailsql
    pipeline (synthesize log lines → regex-DSL parse → filter → agg)."""
    _apply_conf(spark)
    spec = REGISTRY["tailsql_parse_pipeline"]
    return spec.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def make(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_conf(spark)
            return spec.build(spark, sf_dir)

        return run

    return {name: make(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted where the
    operator is genuinely non-SQL-expressible → rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
