"""Table catalog over the driver's parquet testdata.

The reference materializes per-window tables ``t0..tN`` inside an
embedded engine (``/root/reference/sql/squeryer.go:239-277``). In batch
mode our "database" is simply temp views over parquet-backed DataFrames
— Catalyst then gets parquet column pruning + predicate pushdown for
free, which is what makes the same query shapes viable at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow.parquet as _pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (no Spark equivalent)."""
    import pyarrow as pa

    schema = _pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps.

    ``spark.sql.legacy.parquet.nanosAsLong`` makes the scan yield raw
    nanos as LongType; exact integer division (``div 1000``) converts to
    microsecond timestamps — never float math, which would lose
    microseconds at epoch-nanos magnitudes.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Parquet written without isAdjustedToUTC (pandas default) infers as
    # TIMESTAMP_NTZ when spark.sql.parquet.inferTimestampNTZ.enabled is
    # on — and withWatermark rejects NTZ event-time columns
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Under the pinned UTC
    # session zone the cast is value-identical, so normalize every NTZ
    # column to TIMESTAMP here; DEFAULT_CONF also disables the NTZ
    # inference so sessions we didn't build get LTZ straight off the
    # scan (belt and braces — either alone suffices).
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


#: (session id, sf_dir) → table dict. spark.read.parquet costs a
#: driver round-trip + footer read per table; memoizing the lazy
#: DataFrames removes ~seconds of fixed overhead from every query.
_CATALOG_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table and register it as a temp view.

    Views make the DataFrame and SQL APIs interchangeable over the same
    scan — both produce identical Catalyst plans. Memoized per
    (session, sf_dir); temp views are re-registered only when the
    catalog entry is first built for that pair.
    """
    key = (id(spark), sf_dir)
    cached = _CATALOG_CACHE.get(key)
    if cached is not None:
        # re-register views every call: a prior load_tables for a
        # DIFFERENT sf_dir on this session may have pointed the view
        # names elsewhere (catalog-only op, ~ms).
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        return cached
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    _CATALOG_CACHE[key] = out
    return out


@dataclass(frozen=True)
class QuerySpec:
    """One certified query: a Spark builder + its DuckDB oracle SQL.

    ``oracle`` is ANSI SQL DuckDB runs over the same parquet views; the
    driver hash-compares both results (column names must line up —
    alias everything identically on both sides). ``oracle=None`` marks a
    genuinely non-SQL-expressible operator (weaker rows-only check).
    """

    name: str
    category: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
