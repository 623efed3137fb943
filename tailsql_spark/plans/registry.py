"""Aggregated query registry: core SQL surface + extension operators."""

from __future__ import annotations

from tailsql_spark.plans.catalog import QuerySpec
from tailsql_spark.plans.core_sql import REGISTRY as _CORE

REGISTRY: dict[str, QuerySpec] = {}
REGISTRY.update(_CORE)

# Extension modules register lazily so a broken extension never takes
# down the core surface.
for _mod in (
    "tailsql_spark.plans.streaming_sql",
    "tailsql_spark.plans.extra_sql",
    "tailsql_spark.plans.tpch_more",
    "tailsql_spark.plans.tpch_full",
    "tailsql_spark.plans.streaming_exec",
    "tailsql_spark.operators.dedup",
    "tailsql_spark.operators.skew",
    "tailsql_spark.operators.similarity",
    "tailsql_spark.operators.textstats",
    "tailsql_spark.operators.multimodal",
    "tailsql_spark.operators.mlprep",
    "tailsql_spark.operators.corpus",
    "tailsql_spark.plans.tailsql_pipeline",
):
    try:
        _m = __import__(_mod, fromlist=["REGISTRY"])
        REGISTRY.update(getattr(_m, "REGISTRY", {}))
    except ImportError:
        pass
