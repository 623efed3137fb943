"""Pre-window row filter + sampling (reference operators #5/#6).

The reference evaluates a SQL-WHERE-like expression per row before
windowing (``/root/reference/sql/squeryer.go:130-167``) and ships one
custom filter function, ``randfilter(rate)``
(``/root/reference/sql/funcs.go:13-41``): keep a row with probability
``rate`` when ``0 < rate < 1``, otherwise keep nothing.

Spark mapping: the filter string goes straight into ``F.expr`` — Spark
SQL's WHERE syntax and function library are a superset of the qlbridge
expression surface the reference exposes (SURVEY §2C). Running the
filter *before* windowing is the same manual pushdown the reference does
(``sql/squeryer.go:400-402``); under Catalyst it additionally pushes
into the file scan when the column supports it.

Failure semantics preserved: an expression that evaluates to NULL (the
qlbridge "nil / non-bool" case) drops the row
(``sql/squeryer.go:152-161``) — Spark's ``filter`` already treats NULL
as not-true, so this is the native behavior.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RANDFILTER_RE = re.compile(r"randfilter\s*\(\s*([^)]*?)\s*\)", re.IGNORECASE)


def rewrite_randfilter(expr: str) -> str:
    """Rewrite ``randfilter(rate)`` calls to pure Spark SQL.

    Matches the reference semantics (``sql/funcs.go:23-38``): keep with
    probability ``rate`` iff ``0 < rate < 1``; any other rate (including
    exactly 0 or 1, non-numeric, etc.) keeps nothing.
    """

    def _sub(m: re.Match[str]) -> str:
        rate = m.group(1)
        return (
            f"(CASE WHEN ({rate}) > 0 AND ({rate}) < 1 "
            f"THEN rand() < ({rate}) ELSE false END)"
        )

    return _RANDFILTER_RE.sub(_sub, expr)


def apply_filter(df: DataFrame, filter_expr: str | None) -> DataFrame:
    """Apply a tailsql ``-F`` filter expression to a DataFrame.

    Accepts the reference's expression syntax (it is a subset of Spark
    SQL WHERE syntax; ``==`` is valid Spark SQL equality). ``randfilter``
    is rewritten to a ``rand()`` comparison — a built-in, codegen'd
    expression rather than a UDF.
    """
    if not filter_expr:
        return df
    return df.filter(F.expr(rewrite_randfilter(filter_expr)))
