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


class SchemaDriftError(RuntimeError):
    """Testdata schema drifted from the pinned contract.

    Raised by :func:`load_table` so drift surfaces as ONE actionable
    error at load time instead of a deep operator stack trace (round 3:
    ``events.ts`` silently flipped nanos→microsecond-NTZ and the first
    symptom was ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` inside
    ``withWatermark``).
    """


#: Pinned type-class per column, checked POST-normalization. Classes
#: are deliberately coarse ("integer", not int32-vs-int64) so benign
#: width changes pass while semantic drift (timestamp→string, array
#: element type change, a column vanishing) fails loud. Extra columns
#: are allowed — the contract is "at least these, with these shapes".
#: "timestamp" means Spark TimestampType (LTZ) — exactly what
#: withWatermark and the DuckDB oracle comparison require; NTZ or raw
#: longs surviving normalization is drift.
EXPECTED_COLUMNS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "integer", "r_name": "string"},
    "nation": {"n_nationkey": "integer", "n_name": "string", "n_regionkey": "integer"},
    "customer": {
        "c_custkey": "integer",
        "c_name": "string",
        "c_nationkey": "integer",
        "c_acctbal": "floating",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "integer",
        "s_name": "string",
        "s_nationkey": "integer",
        "s_acctbal": "floating",
    },
    "part": {
        "p_partkey": "integer",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "integer",
        "p_retailprice": "floating",
    },
    "orders": {
        "o_orderkey": "integer",
        "o_custkey": "integer",
        "o_orderstatus": "string",
        "o_totalprice": "floating",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "integer",
        "l_partkey": "integer",
        "l_suppkey": "integer",
        "l_linenumber": "integer",
        "l_quantity": "floating",
        "l_extendedprice": "floating",
        "l_discount": "floating",
        "l_tax": "floating",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "integer",
        "ts": "timestamp",
        "user_id": "integer",
        "event_type": "string",
        "value": "floating",
        "props": "string",
    },
    "documents": {
        "doc_id": "integer",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "integer",
    },
    "embeddings": {
        "vec_id": "integer",
        "embedding": "array<floating>",
        "label": "integer",
    },
}


def _type_class(dt) -> str:
    """Collapse a Spark DataType to the coarse class EXPECTED_COLUMNS pins."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "floating"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_ntz"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"array<{_type_class(dt.elementType)}>"
    return dt.simpleString()


def check_schema(name: str, df: DataFrame, *, path: str = "") -> None:
    """Raise :class:`SchemaDriftError` if ``df`` violates the pinned contract."""
    expected = EXPECTED_COLUMNS.get(name)
    if expected is None:
        return
    actual = {f.name: _type_class(f.dataType) for f in df.schema.fields}
    problems = []
    for col, want in expected.items():
        got = actual.get(col)
        if got is None:
            problems.append(f"column `{col}` missing (expected {want})")
        elif got != want:
            problems.append(f"column `{col}` is {got}, expected {want}")
    if problems:
        raise SchemaDriftError(
            f"testdata schema drift in table `{name}`"
            + (f" ({path})" if path else "")
            + ": "
            + "; ".join(problems)
            + ". The driver's parquet changed shape (it has before: "
            "TIMESTAMP(NANOS) in round 2, microsecond-NTZ in round 3). "
            "Fix the normalization in tailsql_spark/plans/catalog.py "
            "load_table and update EXPECTED_COLUMNS if the new shape is "
            "intended."
        )


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (no Spark equivalent)."""
    import os

    import pyarrow as pa

    if os.path.isdir(path):
        # Spark-written directory table: every part file shares the
        # schema, so the footer of any one of them answers for all
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return []
        path = os.path.join(path, parts[0])
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
    # Loud drift gate: schema-only (no data read), O(#cols). A new
    # physical shape the normalizations above don't cover fails HERE
    # with a targeted message, not three operators deep.
    check_schema(name, df, path=path)
    return df


#: (session id, sf_dir) → table dict. spark.read.parquet costs a
#: driver round-trip + footer read per table; memoizing the lazy
#: DataFrames removes ~seconds of fixed overhead from every query.
_CATALOG_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}

#: session id → the sf_dir its temp views currently point at.  Lets the
#: cached path skip the 10× createOrReplaceTempView round-trips when the
#: views are already correct (measured 0.12-0.2 s per load_tables call —
#: pure fixed overhead on every query build) while still re-pointing
#: them after a prior call for a DIFFERENT sf_dir on the same session.
_ACTIVE_VIEWS: dict[int, str] = {}


def sf_key(sf_dir: str) -> str:
    """Collision-safe namespace key for a corpus directory: readable
    basename + short hash of the FULL path.  Two corpora whose
    directories share a basename (``/a/sf0.1`` vs ``/b/sf0.1``) must
    not alias the same materialized files — a still-lazy frame from
    the first build would silently read the second's data."""
    import hashlib
    import os

    path = os.path.abspath(sf_dir.rstrip("/"))
    base = os.path.basename(path) or "sf"
    return f"{base}-{hashlib.sha1(path.encode()).hexdigest()[:8]}"


def materialize_result(df: DataFrame, name: str, key: str) -> DataFrame:
    """Materialize a final result into a SESSION-OWNED directory via a
    distributed parquet write and return the parquet-backed DataFrame.

    Lets an operator release its internal caches (unpersist) before
    returning: the returned frame reads the written files, not the
    cached lineage.  Destination lives under the session warehouse
    (same lifetime as any saved table), never a per-run tempdir.  At
    real scale the result is corpus-proportional, so it must never
    funnel through the driver — this is the distributed alternative.
    """
    # ``key`` namespaces the destination (corpus callers pass
    # sf_key(sf_dir)): without it, building the same query for a
    # SECOND corpus would overwrite the files a still-lazy frame from
    # the first build reads — stale/missing data with no error.
    if not key:
        raise ValueError("materialize_result requires a non-empty namespace key")
    spark = df.sparkSession
    wh = spark.conf.get("spark.sql.warehouse.dir")
    dest = f"{wh.rstrip('/')}/tailsql_results/{name}_{key}"
    df.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def source_bytes(path: str) -> int:
    """Plan-time parquet footprint in bytes — the stand-in for catalog
    statistics on a real cluster.  Directory-shaped tables (every
    staged/production layout) sum their files: ``os.path.getsize`` on
    a directory returns the dirent size (~KB), which silently
    mis-sized ANY multi-file corpus (r15 found this in dedup's
    broadcast gate; r16 routes every size gate through here)."""
    import os

    try:
        if os.path.isdir(path):
            total = 0
            with os.scandir(path) as it:
                for e in it:
                    if e.is_file():
                        total += e.stat().st_size
            return total
        return os.path.getsize(path)
    except OSError:
        return 0


def load_documents_sized(
    spark: SparkSession, sf_dir: str, bytes_per_task: int = 16 * 1024
) -> DataFrame:
    """``documents`` sized for CPU-bound interpreted pipelines (gram /
    shingle builders are higher-order functions, not codegen'd).

    A 100 TB corpus arrives pre-split into many file partitions; a
    small local file reads as ONE partition and would serialize the
    pipeline.  Split from input BYTES, not core count (~16 KB of
    compressed text per task — measured in operators/dedup.py's
    tokenizer A/B), capped at the session's parallelism.  Sizing is
    directory-aware via :func:`source_bytes` (r16): a multi-file
    corpus previously read the dirent size and collapsed the target
    to the floor of 2 partitions."""
    docs = load_tables(spark, sf_dir)["documents"]
    nbytes = source_bytes(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    target = max(2, min(par, nbytes // bytes_per_task or 2))
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(int(target))
    return docs


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table and register it as a temp view.

    Views make the DataFrame and SQL APIs interchangeable over the same
    scan — both produce identical Catalyst plans. Memoized per
    (session, sf_dir); temp views are (re-)registered only when the
    catalog entry is first built for that pair or the session's views
    last pointed at a different sf_dir.
    """
    key = (id(spark), sf_dir)
    cached = _CATALOG_CACHE.get(key)
    if cached is not None:
        if _ACTIVE_VIEWS.get(id(spark)) != sf_dir:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _ACTIVE_VIEWS[id(spark)] = sf_dir
        return cached
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    _CATALOG_CACHE[key] = out
    _ACTIVE_VIEWS[id(spark)] = sf_dir
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
    #: optional COMPUTATION builder for queries whose ``build``
    #: materializes its result (returning a parquet-backed frame whose
    #: plan is just a scan): plan-shape tooling (tools/plan_audit.py,
    #: tests/test_scale.py) audits this instead, so materialization
    #: never blinds the de-optimization gate.
    plan: Callable[[SparkSession, str], DataFrame] | None = None
