"""Connector certification: CSV/JSON source round-trips + sink
formatting as oracle-checked queries.

The reference reads log text and emits formatted rows
(``source/fs.go``, ``sink/format.go``); its CSV/JSON-shaped concerns
are config-level.  Here each connector gets a DIFFERENTIAL row instead
of pytest-only coverage: stage a testdata table through the connector
format with Spark, read it back, aggregate — while the DuckDB oracle
computes the same aggregate straight from the parquet.  Any loss or
coercion in the round-trip (quoting, header, date/timestamp text form,
numeric parsing) breaks the hash match.

Scale notes: the staged write/read is the exact shape of a 100 TB
landing zone (text files in, schema-on-read with an EXPLICIT schema —
never ``inferSchema``, which double-scans); aggregation after read
proves the schema, not just row counts.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import QuerySpec, load_table, load_tables
from tailsql_spark.sinks.formatters import raw_line_col

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def _stage_dir(sf_dir: str, tag: str, src_tables: tuple[str, ...] = ()) -> str:
    """Deterministic per-(sf_dir, tag) scratch path so repeated builds
    overwrite instead of leaking temp dirs.  Keyed like
    catalog.sf_key — readable basename + short hash of the FULL path —
    because the r7 idempotent-staging guards REUSE an existing staging:
    a basename-only key would hand corpus B a staging built from
    corpus A whenever their directories share a basename.

    Guarded (reusing) callers pass ``src_tables``: a content
    fingerprint of those source tables' parquet files (relative path,
    size, mtime_ns) is folded into the key, so a corpus REGENERATED at
    the same absolute path mints a fresh staging dir instead of
    silently reusing stale staged data that would diverge from the
    oracle (which reads the fresh table).  Prior-fingerprint siblings
    for the same (tag, sf_dir) are deleted so regeneration swaps, not
    leaks."""
    import glob
    import hashlib
    import shutil

    path = os.path.abspath(sf_dir.rstrip("/"))
    base = os.path.basename(path) or "sf"
    digest = hashlib.sha1(path.encode()).hexdigest()[:8]
    stem = os.path.join(tempfile.gettempdir(), f"tailsql_stage_{tag}_{base}-{digest}")
    if not src_tables:
        return stem
    h = hashlib.sha1()
    for name in src_tables:
        root = os.path.join(path, f"{name}.parquet")
        if os.path.isfile(root):
            st = os.stat(root)
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for fn in sorted(filenames):
                st = os.stat(os.path.join(dirpath, fn))
                rel = os.path.relpath(os.path.join(dirpath, fn), root)
                h.update(f"{name}/{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    fp = h.hexdigest()[:8]
    for stale in glob.glob(f"{stem}-*"):
        if stale != f"{stem}-{fp}":
            shutil.rmtree(stale, ignore_errors=True)
    return f"{stem}-{fp}"


@query(
    "source_csv_roundtrip",
    "sources",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           CAST(CAST(MIN(o_orderdate) AS DATE) AS TIMESTAMP) AS min_date,
           CAST(CAST(MAX(o_orderdate) AS DATE) AS TIMESTAMP) AS max_date
    FROM orders GROUP BY o_orderstatus
    """,
    doc="CSV connector certified differentially: orders staged to CSV "
    "(header, explicit DDL schema on read — schema-on-read, never "
    "inferSchema) then aggregated; the oracle aggregates the parquet "
    "directly, so any quoting/parsing/date-text loss in the round-trip "
    "breaks the hash. Ref parity: tailsql's sources are text files "
    "(source/fs.go:14-71); CSV is the delegated-engine format surface.",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    staged = (
        t["orders"]
        .select(
            "o_orderkey",
            "o_orderstatus",
            _price_cents().alias("o_price_cents"),
            F.col("o_orderdate").cast("date").alias("o_date"),
        )
    )
    path = _stage_dir(sf_dir, "csv_orders")
    staged.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_orderstatus string, o_price_cents long, o_date date"
        )
        .option("header", "true")
        .csv(path)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("o_price_cents").alias("sum_price_cents"),
        # DATE at top level splits the engines' pandas dtypes (date
        # object vs datetime64) — certified queries emit TIMESTAMP
        F.min("o_date").cast("timestamp").alias("min_date"),
        F.max("o_date").cast("timestamp").alias("max_date"),
    )


def _price_cents() -> F.Column:
    return F.round(F.col("o_totalprice") * 100, 0).cast("long")


@query(
    "source_json_roundtrip",
    "sources",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="JSON-lines connector certified differentially: lineitem staged "
    "to newline-delimited JSON, read back with an explicit schema, "
    "aggregated; oracle aggregates the parquet directly. Doubles ride "
    "as exact integer cents so the text round-trip is bit-precise.",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    staged = t["lineitem"].select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("l_qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("l_price_cents"),
    )
    path = _stage_dir(sf_dir, "json_lineitem")
    staged.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "l_orderkey long, l_returnflag string, l_qty long, l_price_cents long"
    ).json(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("l_qty").alias("sum_qty"),
        F.sum("l_price_cents").alias("sum_price_cents"),
    )


@query(
    "sink_format_raw_lines",
    "sinks",
    """
    SELECT concat_ws(' ',
               COALESCE(CAST(o_orderkey AS VARCHAR), 'NULL'),
               COALESCE(o_orderstatus, 'NULL'),
               COALESCE(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 'NULL'),
               COALESCE(CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
                             ELSE o_orderpriority END, 'NULL')) AS line
    FROM orders
    WHERE o_orderkey < 500
    """,
    doc="The raw formatter (sink/format.go:77-98: space-joined values, "
    "NULL literal) expressed as an EXECUTOR-SIDE expression — "
    "formatting scales with the cluster instead of serializing through "
    "the driver; the CASE plants NULLs to certify the literal. "
    "sinks/formatters.raw_line_col is the shared builder.",
)
def sink_format_raw_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rows = t["orders"].filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        "o_orderstatus",
        _price_cents().alias("cents"),
        F.when(F.col("o_orderpriority") == "3-MEDIUM", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
    )
    return rows.select(
        raw_line_col(["o_orderkey", "o_orderstatus", "cents", "prio"]).alias("line")
    )


@query(
    "source_orc_roundtrip",
    "sources",
    """
    SELECT p_brand,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_retail_cents,
           MIN(p_size) AS min_size,
           MAX(p_size) AS max_size
    FROM part GROUP BY p_brand
    """,
    doc="ORC connector certified differentially: part staged to ORC "
    "(Spark-native columnar alternative; zlib default codec) and read "
    "back, aggregated; the oracle aggregates the parquet directly. "
    "Certifies type fidelity through the ORC writer/reader pair — the "
    "format a warehouse migration would land in besides parquet.",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    staged = t["part"].select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("p_retail_cents"),
        "p_size",
    )
    path = _stage_dir(sf_dir, "orc_part")
    staged.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("p_retail_cents").alias("sum_retail_cents"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@query(
    "sink_partitioned_parquet",
    "sinks",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM orders
    WHERE YEAR(CAST(o_orderdate AS DATE)) = 1996
    GROUP BY o_orderpriority
    """,
    doc="Hive-style partitioned parquet sink certified differentially: "
    "orders written partitionBy(year), read back with a partition "
    "predicate, aggregated — the oracle aggregates the unpartitioned "
    "parquet with the same predicate. The year filter must become a "
    "PartitionFilter (directory pruning, no data read outside 1996): "
    "the layout a 100 TB landing zone uses so queries touch only the "
    "partitions they name. Plan-asserted in tests/test_scale.py.",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _partitioned_orders_agg(spark, sf_dir)


def _partitioned_orders_agg(spark: SparkSession, sf_dir: str):
    back = partitioned_orders_scan(spark, sf_dir)
    return (
        back.filter(F.col("o_year") == 1996)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_price_cents").alias("sum_price_cents"),
        )
    )


def partitioned_orders_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage orders partitioned by year (once per sf_dir) and return the
    partitioned scan — shared by the certified query and the
    partition-pruning plan test."""
    t = load_tables(spark, sf_dir)
    path = _stage_dir(sf_dir, "part_orders")
    staged = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("o_price_cents"),
        F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
    )
    staged.write.mode("overwrite").partitionBy("o_year").parquet(path)
    return spark.read.parquet(path)


@query(
    "source_xml_roundtrip",
    "sources",
    """
    SELECT n_regionkey,
           COUNT(*) AS n,
           STRING_AGG(n_name, '|' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
    doc="XML connector (Spark 4 native spark-xml) certified "
    "differentially: nation staged to XML rowTag elements and read "
    "back with an explicit schema, re-aggregated; the oracle reads the "
    "parquet. The ordered STRING_AGG proves every row and value "
    "survived tag round-tripping, not just counts.",
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    path = _stage_dir(sf_dir, "xml_nation")
    t["nation"].select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).option("rowTag", "nation").format("xml").save(path)
    back = (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .option("rowTag", "nation")
        .format("xml")
        .load(path)
    )
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n"),
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("names"),
    )


# ---------------------------------------------------------------------------
# small-file compaction — the partition-maintenance op of a landing zone
# ---------------------------------------------------------------------------

def compact_partitions(spark: SparkSession, src: str, dest: str) -> DataFrame:
    """Rewrite a day-partitioned parquet dataset with one file per
    partition: read, cluster rows by the partition key (hash
    repartition puts every day's rows in exactly one task), write back
    partitionBy(day).  THE maintenance pass a 100 TB landing zone runs
    continuously — streaming ingest leaves O(trigger × partitions)
    small files whose per-file open/footer cost eventually dominates
    scans; compaction restores ~one file per partition so footer reads
    and row-group pruning work again.  For partitions larger than a
    target file size, repartition(n, key) with n > |days| splits hot
    days across files while keeping cold days whole."""
    frag = spark.read.parquet(src)
    frag.repartition(F.col("day")).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(dest)
    return spark.read.parquet(dest)


def _staged_fragmented_events(spark: SparkSession, sf_dir: str) -> str:
    """events written day-partitioned with deliberate fragmentation
    (32-way shuffle before the write → up to 32 files per day) — the
    shape streaming ingest produces."""
    t = load_tables(spark, sf_dir)
    path = _stage_dir(sf_dir, "frag_events")
    ev = t["events"].select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    ev.repartition(32).write.mode("overwrite").partitionBy("day").parquet(path)
    return path


@query(
    "sink_compact_small_files",
    "sinks",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events
    GROUP BY 1
    """,
    doc="Small-file compaction certified differentially: events staged "
    "day-partitioned with deliberate 32-way fragmentation (the shape "
    "streaming ingest leaves), compacted to one file per day partition "
    "(hash-cluster by the partition key, rewrite partitionBy), then "
    "aggregated from the COMPACTED layout — the oracle aggregates the "
    "original events, so the certification proves compaction preserved "
    "every row and value. File-count collapse is asserted in pytest "
    "(tests/test_scale.py).",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    frag_path = _staged_fragmented_events(spark, sf_dir)
    back = compact_partitions(
        spark, frag_path, _stage_dir(sf_dir, "compact_events")
    )
    # partition-column type inference reads the yyyy-MM-dd directory
    # values back as DATE; normalize to the string key the oracle uses
    return back.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum("value_cents").alias("sum_value_cents"),
    )


# ---------------------------------------------------------------------------
# bucketed co-located join — the petabyte-join idiom as a certified query
# ---------------------------------------------------------------------------

def bucketed_join_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage orders/customer as 8-bucket sorted tables keyed on the
    join column (once per sf_dir; saveAsTable → session warehouse).
    Bucket layout is THE 100 TB join idiom: both fact tables stored
    pre-hashed on the join key, so the join needs no exchange and no
    sort on either side — the shuffle was paid once at write time and
    is amortized over every subsequent join."""
    key = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    to, tc = f"bk_orders_{key}", f"bk_customer_{key}"
    t = load_tables(spark, sf_dir)
    # saveAsTable(overwrite) still refuses a location left behind by a
    # PREVIOUS session (table absent from this session's in-memory
    # catalog, dir present in the warehouse) — drop both forms first
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in (to, tc):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)
    # repartition(8, key) BEFORE the bucketed write: task hashing and
    # bucket hashing use the same Murmur3 pmod rule, so each task holds
    # exactly one bucket and writes exactly one file — the scan can
    # then trust per-bucket sortedness and the join needs no Sort
    # (multiple files per bucket would force a re-sort on read).
    (
        t["orders"]
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("o_price_cents"),
        )
        .repartition(8, F.col("o_custkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(to)
    )
    (
        t["customer"]
        .select("c_custkey", "c_nationkey")
        .repartition(8, F.col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(tc)
    )
    return to, tc


@query(
    "join_bucketed_colocated",
    "sinks",
    """
    SELECT c_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    doc="Bucketed co-located join certified differentially: orders and "
    "customer staged as 8-bucket sorted tables on the join key, then "
    "merge-joined (hinted so the small side cannot auto-broadcast at "
    "test scale) and aggregated; the oracle joins the unbucketed "
    "parquet. Both sides bucketed on the key -> the executed join has "
    "ZERO exchanges (plan-asserted in tests/test_scale.py): the "
    "shuffle was paid once at write time and is amortized over every "
    "subsequent join. The residual in-bucket sort is linear per "
    "bucket; Spark drops it only under the legacy "
    "bucketedTableScan.outputOrdering flag (SPARK-28632), which we "
    "leave at its default.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    to, tc = bucketed_join_tables(spark, sf_dir)
    orders = spark.table(to)
    customer = spark.table(tc).hint("merge")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_price_cents").alias("sum_price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# sorted row-group layout — min/max data skipping inside partitions
# ---------------------------------------------------------------------------

def sorted_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage lineitem sorted-within-partitions by l_shipdate with small
    row groups (once per sf_dir).  Sorting clusters each date range
    into few row groups, so parquet min/max statistics let a date
    predicate skip most of the file — the intra-partition complement
    of directory partitioning (partition dirs prune coarsely by day /
    month; the sorted layout prunes row groups inside each file).  At
    100 TB this is the Z-order-lite that turns a time-range scan from
    full-file reads into a handful of row groups."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    path = _stage_dir(sf_dir, "sorted_lineitem", src_tables=("lineitem",))
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    (
        lineitem
        .select(
            # cast to DATE: the source column is a timestamp that
            # parquet would store as INT96, which carries NO min/max
            # statistics by spec — the very thing this layout needs.
            # DATE is INT32 with full stats, and shipdate is
            # date-valued.
            F.col("l_shipdate").cast("date").alias("l_shipdate"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("l_price_cents"),
            "l_quantity",
        )
        .repartition(4)
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        # small row groups so even test-scale files contain many —
        # the unit of skipping must exist for the layout to matter
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    return path


@query(
    "sink_sorted_rowgroup_skipping",
    "sinks",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    """,
    doc="Sorted-within-partition parquet layout certified "
    "differentially: lineitem staged sorted by l_shipdate with small "
    "row groups, then a one-year range aggregated from the sorted "
    "layout while the oracle scans the original. Because the sort "
    "clusters each date range into few row groups, the pushed range "
    "predicate (PushedFilters, plan-asserted) skips most row groups "
    "via parquet min/max stats — the intra-file complement of "
    "partition pruning; a pytest inspects the footers to prove the "
    "stats are actually disjoint (tests/test_scale.py).",
)
def sink_sorted_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = spark.read.parquet(sorted_lineitem_path(spark, sf_dir))
    return (
        back.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("l_price_cents").alias("sum_price_cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (multi-dimension) clustering — the OPTIMIZE ZORDER layout
# ---------------------------------------------------------------------------

ZBITS = 16  # bits interleaved per dimension (covers both demo key ranges)

#: Spark-side Z-value: interleave ZBITS bits of (ck, d) — odd bit
#: positions take the custkey, even take the day number.  Closed-form
#: integer HOF, identical arithmetic to the DuckDB spelling below.
_Z_SPARK = (
    f"aggregate(sequence(0, {ZBITS - 1}), 0L, (acc, i) -> acc"
    " + shiftleft(cast(shiftright(ck, i) & 1 as bigint), 2 * i + 1)"
    " + shiftleft(cast(shiftright(d, i) & 1 as bigint), 2 * i))"
)

_Z_DUCK = (
    f"CAST(list_sum(list_transform(generate_series(0, {ZBITS - 1}), i ->"
    " (((ck >> i) & 1) << (2 * i + 1)) + (((d >> i) & 1) << (2 * i))))"
    " AS BIGINT)"
)


def zorder_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders Z-ORDERED by (o_custkey, order day) with small row
    groups (once per sf_dir).  A single-column sort clusters row-group
    min/max stats on ONE dimension only; interleaving the bits of both
    keys gives every row group a tight bounding BOX in (custkey, day)
    space, so predicates on EITHER dimension skip most row groups —
    the multi-dimensional generalization of sorted_lineitem_path and
    exactly what Delta/Iceberg `OPTIMIZE ZORDER BY` does at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    path = _stage_dir(sf_dir, "zorder_orders", src_tables=("orders",))
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    (
        orders
        .select(
            F.col("o_custkey").cast("long").alias("ck"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        )
        .withColumn("z", F.expr(_Z_SPARK))
        .repartition(2)
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    return path


@query(
    "sink_zorder_skipping",
    "sinks",
    f"""
    WITH src AS (
        SELECT CAST(o_custkey AS BIGINT) AS ck,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS d,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
    ),
    zd AS (SELECT *, {_Z_DUCK} AS z FROM src)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
           MIN(z) AS min_z, MAX(z) AS max_z
    FROM zd
    WHERE ck >= 100 AND ck < 200 AND d >= 1000 AND d < 1400
    """,
    doc="Z-order clustering certified differentially: orders staged "
    f"sorted by the {ZBITS}-bit-interleaved Z-value of (custkey, order "
    "day) with small row groups; the query aggregates a BOX predicate "
    "(a custkey range AND a date range) from the Z layout — including "
    "min/max of the Z-value itself, so the bit-interleave arithmetic "
    "is certified cross-engine — while the oracle recomputes from the "
    "original table. Because Z-sorting gives every row group a tight "
    "bounding box in both dimensions, EITHER predicate prunes row "
    "groups via parquet min/max stats (footer-verified for both "
    "dimensions in tests/test_scale.py) — the property a single-column "
    "sort cannot provide, and what OPTIMIZE ZORDER buys on a 100 TB "
    "fact table queried by more than one key.",
)
def sink_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = spark.read.parquet(zorder_orders_path(spark, sf_dir))
    return (
        back.filter(
            (F.col("ck") >= 100) & (F.col("ck") < 200)
            & (F.col("d") >= 1000) & (F.col("d") < 1400)
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("price_cents").alias("sum_price_cents"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
        )
    )


# ---------------------------------------------------------------------------
# manifest-based file pruning (the lakehouse data-skipping index)
# ---------------------------------------------------------------------------

def manifest_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders range-partitioned by order date into many files
    (once per sf_dir): each file covers a narrow date range, the
    precondition for file-level skipping.  GENUINELY once: a restage
    would mint new part-file names and silently invalidate every
    manifest row already collected from the old ones — the exact
    stale-pointer hazard lakehouse formats solve with transactional
    manifests, emulated here by an idempotent-staging guard."""
    orders = load_table(spark, sf_dir, "orders")
    path = _stage_dir(sf_dir, "manifest_orders", src_tables=("orders",))
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    (
        orders
        .select(
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        )
        .repartitionByRange(16, "o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def orders_file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANIFEST of the staged layout: one row per data file with its
    min/max order date and row count — computed DISTRIBUTED in one scan
    (`input_file_name` + groupBy).  This is the metadata layer every
    lakehouse format (Delta/Iceberg/Hudi) maintains transactionally; at
    100 TB the manifest is ~files-counted (thousands of rows for
    millions of row groups), which is why planning reads manifests, not
    footers."""
    back = spark.read.parquet(manifest_orders_path(spark, sf_dir))
    return (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "sink_manifest_file_pruning",
    "sinks",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM orders
    WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
    GROUP BY o_orderstatus
    """,
    doc="Manifest-based FILE pruning, the lakehouse data-skipping "
    "index: a per-file min/max manifest (built distributed from one "
    "scan of the range-partitioned staging layout) is consulted at "
    "planning time and ONLY the files whose ranges overlap the "
    "predicate are handed to the scan — a strict subset, "
    "pytest-asserted. This is the layer ABOVE row-group skipping: "
    "vanilla parquet still schedules a task per file and prunes row "
    "groups inside; manifest pruning never schedules the "
    "non-overlapping files at all, which at 100 TB is the difference "
    "between a metadata lookup and a million no-op tasks. The file "
    "list is planning METADATA (manifest rows are file-counted, not "
    "row-counted) — collecting it to the planner is exactly what "
    "Delta/Iceberg query planning does. Results certify against the "
    "oracle's full scan of the original table.",
)
def sink_manifest_file_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    return manifest_pruned_orders(
        spark, sf_dir, datetime.date(1995, 1, 1), datetime.date(1995, 7, 1)
    )


def manifest_pruned_orders(spark: SparkSession, sf_dir: str, lo, hi) -> DataFrame:
    manifest = orders_file_manifest(spark, sf_dir)
    files = [
        r.file
        for r in manifest.filter(
            (F.col("max_date") >= F.lit(lo)) & (F.col("min_date") < F.lit(hi))
        ).collect()
    ]
    if files:
        back = spark.read.parquet(*files)
    else:
        # no manifest entry overlaps the window: the variadic reader
        # rejects zero paths, but the correct answer is the empty
        # aggregate the oracle produces — scan the staged schema with a
        # false filter (zero files scheduled after pruning, same shape)
        back = spark.read.parquet(manifest_orders_path(spark, sf_dir)).filter(F.lit(False))
    return (
        # the residual predicate still applies inside surviving files
        back.filter((F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi)))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("price_cents").alias("sum_price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# MERGE / upsert — the lakehouse corpus-maintenance shape
# ---------------------------------------------------------------------------

#: Merge scenario, deterministic from the documents table so both
#: engines can reconstruct it: the base snapshot is every doc except
#: the "new crawl" slice; the delta INSERTS that slice (doc_id % 64 ==
#: 0) and UPDATES the "recrawled, content changed" slice (doc_id % 64
#: == 17, content bumped by 1000). part = doc_id % 16, so the delta
#: touches EXACTLY partitions {0, 1} (64 ≡ 0 and 17 ≡ 1 mod 16) — the
#: strict-subset precondition for proving partition-pruned rewrite.
MERGE_N_PARTS = 16
MERGE_INSERT_MOD = 0   # doc_id % 64 == 0  → not in base, inserted by delta
MERGE_UPDATE_MOD = 17  # doc_id % 64 == 17 → in base, rewritten by delta
MERGE_DELETE_MOD = 34  # doc_id % 64 == 34 → in base, TOMBSTONED by delta


def _merge_base_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 64 != MERGE_INSERT_MOD).select(
        "doc_id",
        (F.col("doc_id") % MERGE_N_PARTS).alias("part"),
        F.col("n_chars").alias("content"),
        F.lit(1).cast("int").alias("version"),
    )


def _merge_delta_frame(
    spark: SparkSession, sf_dir: str, with_deletes: bool = False
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def slice_(mod: int, content, op: str) -> DataFrame:
        return docs.filter(F.col("doc_id") % 64 == mod).select(
            "doc_id",
            (F.col("doc_id") % MERGE_N_PARTS).alias("part"),
            content.alias("content"),
            F.lit(2).cast("int").alias("version"),
            F.lit(op).alias("op"),
        )

    delta = slice_(MERGE_INSERT_MOD, F.col("n_chars"), "U").unionByName(
        slice_(MERGE_UPDATE_MOD, F.col("n_chars") + 1000, "U")
    )
    if with_deletes:
        delta = delta.unionByName(
            slice_(MERGE_DELETE_MOD, F.lit(None).cast("long"), "D")
        )
    return delta


def merge_base_path(
    spark: SparkSession, sf_dir: str, tag: str = "merge_base"
) -> str:
    """Stage the base snapshot partitioned by ``part`` (once per
    corpus content).  The merge MUTATES this staging in place — that is
    the point: it is the writable lakehouse table the upsert maintains,
    and re-running the merge against it is idempotent (delta-wins on
    matching keys re-asserts the same rows; tombstoned keys stay
    absent).  Each registered merge query gets its OWN tag so their
    mutations never interleave."""
    path = _stage_dir(sf_dir, tag, src_tables=("documents",))
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    _merge_base_frame(spark, sf_dir).write.mode("overwrite").partitionBy(
        "part"
    ).parquet(path)
    return path


def _rmtree_any(path: str) -> None:
    """Recursive delete for plain paths and Hadoop-FS URIs — mirrors
    streaming_exec's dispatcher (imported lazily: streaming_exec
    imports this module at load, not vice versa)."""
    from tailsql_spark.plans.streaming_exec import _fs_rmtree

    _fs_rmtree(path)


def merge_apply(spark: SparkSession, base_path: str, delta: DataFrame) -> list:
    """The MERGE core shared by the batch runs and the streaming
    per-batch processor (one definition — batch and streaming cannot
    drift): compute the delta's touched partitions (planning METADATA,
    bounded by the partition count), full-outer merge ONLY those
    partitions of the base ('U' wins, 'D' tombstones remove the key,
    base-only rows survive), rewrite them via dynamic partition
    overwrite, and explicitly DROP any touched partition left with
    zero surviving rows — dynamic overwrite only replaces partitions
    PRESENT in the written data, so a fully-tombstoned partition (a
    whole-part takedown) would otherwise keep its old files and its
    legally-deleted rows would silently survive.  The merged touched
    slice is persisted before the write so the rewrite never reads the
    files it is replacing.  Returns the touched partition list."""
    delta = delta.persist()
    try:
        touched = sorted(
            r.part for r in delta.select("part").distinct().collect()
        )
        if not touched:
            return []
        base = spark.read.parquet(base_path)
        b = base.filter(F.col("part").isin(touched)).alias("b")
        d = delta.alias("d")
        merged = (
            b.join(d, F.col("b.doc_id") == F.col("d.doc_id"), "full_outer")
            .filter(F.col("d.op").isNull() | (F.col("d.op") != "D"))
            .select(
                F.coalesce(F.col("d.doc_id"), F.col("b.doc_id")).alias("doc_id"),
                F.coalesce(F.col("d.content"), F.col("b.content")).alias("content"),
                F.coalesce(F.col("d.version"), F.col("b.version")).alias("version"),
                F.coalesce(F.col("d.part"), F.col("b.part")).alias("part"),
            )
            .persist()
        )
        try:
            surviving = {
                r.part for r in merged.select("part").distinct().collect()
            }
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged.write.mode("overwrite").partitionBy("part").parquet(base_path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            for p in touched:
                if p not in surviving:
                    _rmtree_any(f"{base_path}/part={p}")
        finally:
            merged.unpersist()
    finally:
        delta.unpersist()
    return touched


def merge_upsert_run(
    spark: SparkSession, sf_dir: str, with_deletes: bool = False
):
    """Execute the MERGE and return ``(merged_df, base_path, touched)``.

    Delta-style mechanics, faithfully (see :func:`merge_apply` for the
    shared core): ONLY the delta's touched partitions are read, merged
    and rewritten; untouched partition files are never opened, never
    rewritten.  At 100 TB an incremental crawl touches a sliver of
    partitions, so the rewrite cost tracks the DELTA, not the table —
    the whole reason MERGE exists over rewrite-the-world.  Tombstones
    are the takedown path (robots retroactivity, DMCA,
    right-to-be-forgotten): physical removal from the rewritten
    partition, not a filter view.  The delta side of the join is small
    by construction (one crawl increment), so AQE broadcasts it; the
    base side reads only the touched partition directories (partition
    pruning, plan-asserted in pytest)."""
    tag = "merge_del_base" if with_deletes else "merge_base"
    base_path = merge_base_path(spark, sf_dir, tag=tag)
    delta = _merge_delta_frame(spark, sf_dir, with_deletes=with_deletes)
    touched = merge_apply(spark, base_path, delta)
    return spark.read.parquet(base_path), base_path, touched


@query(
    "sink_merge_upsert",
    "sinks",
    f"""
    WITH base AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               1 AS version
        FROM documents WHERE doc_id % 64 <> {MERGE_INSERT_MOD}
    ),
    delta AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               2 AS version
        FROM documents WHERE doc_id % 64 = {MERGE_INSERT_MOD}
        UNION ALL
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars + 1000,
               2 AS version
        FROM documents WHERE doc_id % 64 = {MERGE_UPDATE_MOD}
    ),
    merged AS (
        SELECT COALESCE(d.doc_id, b.doc_id) AS doc_id,
               COALESCE(d.part, b.part) AS part,
               COALESCE(d.content, b.content) AS content,
               COALESCE(d.version, b.version) AS version
        FROM base b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(content) AS BIGINT) AS sum_content,
           CAST(SUM(version) AS BIGINT) AS sum_version
    FROM merged GROUP BY part
    """,
    doc="Lakehouse MERGE/upsert — the incremental-crawl corpus "
    "maintenance shape: a crawl delta (new doc_ids inserted, changed "
    "docs updated, delta-wins on key) merges into a part-partitioned "
    "base snapshot by rewriting ONLY the partitions the delta touches "
    "(dynamic partition overwrite; the touched list is planning "
    "metadata like a Delta/Iceberg manifest read). Untouched "
    "partition files are byte-identical after the merge, "
    "pytest-asserted. Certified against a DuckDB FULL OUTER JOIN "
    "replay of the same base/delta construction; the per-partition "
    "aggregate result detects any lost, duplicated, or stale row.",
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged, _path, _touched = merge_upsert_run(spark, sf_dir)
    return _materialized_merge_agg(merged, "sink_merge_upsert", sf_dir)


def _merge_result_agg(merged: DataFrame) -> DataFrame:
    return merged.groupBy(F.col("part").cast("long").alias("part")).agg(
        F.count("*").alias("n_docs"),
        F.sum("content").alias("sum_content"),
        F.sum(F.col("version").cast("long")).alias("sum_version"),
    )


def _materialized_merge_agg(merged: DataFrame, name: str, sf_dir: str) -> DataFrame:
    """Aggregate and MATERIALIZE: the returned frame must not read the
    staging files a later build's dynamic overwrite will replace (the
    aliasing hazard materialize_result exists for)."""
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    return materialize_result(_merge_result_agg(merged), name, key=sf_key(sf_dir))


@query(
    "sink_merge_delete_tombstones",
    "sinks",
    f"""
    WITH base AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               1 AS version
        FROM documents WHERE doc_id % 64 <> {MERGE_INSERT_MOD}
    ),
    delta AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               2 AS version, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_INSERT_MOD}
        UNION ALL
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars + 1000,
               2 AS version, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_UPDATE_MOD}
        UNION ALL
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, NULL,
               2 AS version, 'D' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_DELETE_MOD}
    ),
    merged AS (
        SELECT COALESCE(d.doc_id, b.doc_id) AS doc_id,
               COALESCE(d.part, b.part) AS part,
               COALESCE(d.content, b.content) AS content,
               COALESCE(d.version, b.version) AS version
        FROM base b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id
        WHERE d.op IS NULL OR d.op <> 'D'
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(content) AS BIGINT) AS sum_content,
           CAST(SUM(version) AS BIGINT) AS sum_version
    FROM merged GROUP BY part
    """,
    doc="MERGE with DELETE tombstones — the takedown path an LLM "
    "corpus legally needs (robots retroactivity, DMCA, "
    "right-to-be-forgotten): the delta carries op markers and 'D' keys "
    "are PHYSICALLY REMOVED from the rewritten partitions (not hidden "
    "behind a filter view), while 'U' keys upsert and base-only rows "
    "survive — all through the same partition-pruned dynamic-overwrite "
    "mechanics as sink_merge_upsert (own base staging, so the two "
    "merges never interleave; re-running is idempotent — tombstoned "
    "keys stay absent). Certified against a DuckDB FULL OUTER JOIN + "
    "tombstone-filter replay; the per-partition aggregate catches a "
    "row deleted too many or too few.",
)
def sink_merge_delete_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged, _path, _touched = merge_upsert_run(spark, sf_dir, with_deletes=True)
    return _materialized_merge_agg(merged, "sink_merge_delete_tombstones", sf_dir)


# ---------------------------------------------------------------------------
# snapshot time travel — read-at-version over retained table snapshots
# ---------------------------------------------------------------------------

def timetravel_root(spark: SparkSession, sf_dir: str) -> str:
    """Stage a two-version table history (once per corpus content):
    ``v=1`` is the pre-merge base snapshot, ``v=2`` the state after the
    tombstone MERGE — the retained-snapshot layout behind lakehouse
    ``VERSION AS OF`` reads.  Versions are immutable once written
    (the merge materializes v=2 separately instead of mutating v=1),
    so historical reads are stable while the live table advances —
    at 100 TB the versions share unchanged files via manifests instead
    of copies; the read-at-version SEMANTICS are identical."""
    root = _stage_dir(sf_dir, "timetravel", src_tables=("documents",))
    if os.path.exists(os.path.join(root, "_DONE")):
        return root
    base = _merge_base_frame(spark, sf_dir)
    base.write.mode("overwrite").parquet(f"{root}/v=1")
    delta = _merge_delta_frame(spark, sf_dir, with_deletes=True)
    b = base.alias("b")
    d = delta.alias("d")
    merged = (
        b.join(d, F.col("b.doc_id") == F.col("d.doc_id"), "full_outer")
        .filter(F.col("d.op").isNull() | (F.col("d.op") != "D"))
        .select(
            F.coalesce(F.col("d.doc_id"), F.col("b.doc_id")).alias("doc_id"),
            F.coalesce(F.col("d.content"), F.col("b.content")).alias("content"),
            F.coalesce(F.col("d.version"), F.col("b.version")).alias("version"),
            F.coalesce(F.col("d.part"), F.col("b.part")).alias("part"),
        )
    )
    merged.write.mode("overwrite").parquet(f"{root}/v=2")
    with open(os.path.join(root, "_DONE"), "w") as fh:
        fh.write("ok")
    return root


@query(
    "sink_snapshot_time_travel",
    "sinks",
    f"""
    WITH base AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               1 AS version
        FROM documents WHERE doc_id % 64 <> {MERGE_INSERT_MOD}
    ),
    delta AS (
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars AS content,
               2 AS version, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_INSERT_MOD}
        UNION ALL
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, n_chars + 1000,
               2 AS version, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_UPDATE_MOD}
        UNION ALL
        SELECT doc_id, doc_id % {MERGE_N_PARTS} AS part, NULL,
               2 AS version, 'D' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_DELETE_MOD}
    ),
    merged AS (
        SELECT COALESCE(d.doc_id, b.doc_id) AS doc_id,
               COALESCE(d.content, b.content) AS content
        FROM base b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id
        WHERE d.op IS NULL OR d.op <> 'D'
    )
    SELECT CAST(1 AS BIGINT) AS snapshot,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(content) AS BIGINT) AS sum_content
    FROM base
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS snapshot,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(content) AS BIGINT) AS sum_content
    FROM merged
    """,
    doc="Snapshot time travel — the lakehouse VERSION AS OF read: the "
    "table history retains immutable per-version snapshots (v=1 the "
    "pre-merge base, v=2 the post-tombstone-MERGE state), and a "
    "historical query reads an old version byte-stable while the live "
    "table advances — the audit/rollback/reproduce-the-training-run "
    "capability every governed corpus needs. Both versions' aggregates "
    "certify in one row set against a DuckDB replay of the base and "
    "the merged state; the version column is Hive-partition-discovered "
    "from the v= directory layout, so version pruning is partition "
    "pruning.",
)
def sink_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = timetravel_root(spark, sf_dir)
    hist = spark.read.parquet(root)  # v= discovered as a partition column
    return (
        hist.groupBy(F.col("v").cast("long").alias("snapshot"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("content").alias("sum_content"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history — versioned rows instead of in-place upsert
# ---------------------------------------------------------------------------

_SCD2_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, n_chars AS content FROM documents
        WHERE doc_id % 64 <> {MERGE_INSERT_MOD}
    ),
    delta AS (
        SELECT doc_id, n_chars AS content, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_INSERT_MOD}
        UNION ALL
        SELECT doc_id, n_chars + 1000, 'U' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_UPDATE_MOD}
        UNION ALL
        SELECT doc_id, NULL, 'D' AS op
        FROM documents WHERE doc_id % 64 = {MERGE_DELETE_MOD}
    ),
    m AS (
        SELECT b.doc_id AS b_id, b.content AS b_content,
               d.doc_id AS d_id, d.content AS d_content, d.op
        FROM base b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id
    )
    SELECT b_id AS doc_id, b_content AS content,
           1 AS valid_from,
           CASE WHEN d_id IS NULL OR (op = 'U' AND d_content = b_content)
                THEN NULL ELSE 2 END AS valid_to,
           CASE WHEN d_id IS NULL OR (op = 'U' AND d_content = b_content)
                THEN 1 ELSE 0 END AS is_current
    FROM m WHERE b_id IS NOT NULL
    UNION ALL
    SELECT d_id, d_content, 2, NULL, 1
    FROM m
    WHERE d_id IS NOT NULL AND op = 'U'
      AND (b_id IS NULL OR d_content <> b_content)
"""


@query(
    "sink_scd2_history",
    "sinks",
    _SCD2_ORACLE,
    doc="Slowly-changing-dimension type-2 history maintenance — the "
    "versioned sibling of sink_merge_upsert for pipelines that must "
    "keep provenance instead of overwriting (what did the corpus "
    "contain when checkpoint X trained?): unchanged keys stay one "
    "current row; genuinely-changed keys close the old row "
    "(valid_to=2) AND append a new current one; inserts open at "
    "version 2; tombstones close without a successor; a no-op update "
    "(same content) closes NOTHING — change detection by value "
    "comparison, not delta presence. Implemented as ONE full-outer "
    "join producing per key an array of 0-2 version-row structs, "
    "exploded and flattened — one shuffle on the key, never a "
    "self-union of two joins. Certified against a DuckDB two-branch "
    "replay over the shared MERGE base/delta construction.",
)
def sink_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _merge_base_frame(spark, sf_dir).select("doc_id", "content")
    delta = _merge_delta_frame(spark, sf_dir, with_deletes=True).select(
        "doc_id", "content", "op"
    )
    return scd2_apply(base, delta)


def scd2_apply(
    base: DataFrame, delta: DataFrame, base_valid_from: bool = False
) -> DataFrame:
    """SCD2 core (see sink_scd2_history's doc): base(doc_id, content)
    x delta(doc_id, content, op in U/D) -> versioned history rows.

    ``base_valid_from=True`` makes the surviving/closed row keep the
    base frame's own ``valid_from`` column instead of the batch
    constant 1 — what the INCREMENTAL maintainer needs, where a
    current row may have been opened by an earlier micro-batch (and a
    replayed batch must not rewind it)."""
    j = base.alias("b").join(
        delta.alias("d"), F.col("b.doc_id") == F.col("d.doc_id"), "full_outer"
    )
    b_id, b_c = F.col("b.doc_id"), F.col("b.content")
    d_id, d_c, op = F.col("d.doc_id"), F.col("d.content"), F.col("d.op")
    vfrom = F.col("b.valid_from") if base_valid_from else F.lit(1)
    unchanged = d_id.isNull() | ((op == "U") & d_c.eqNullSafe(b_c))
    v1 = F.when(
        b_id.isNotNull(),
        F.struct(
            b_id.alias("doc_id"),
            b_c.alias("content"),
            vfrom.alias("valid_from"),
            F.when(unchanged, F.lit(None).cast("int")).otherwise(F.lit(2)).alias("valid_to"),
            F.when(unchanged, F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
        ),
    )
    new_version = d_id.isNotNull() & (op == "U") & (b_id.isNull() | (d_c != b_c))
    v2 = F.when(
        new_version,
        F.struct(
            d_id.alias("doc_id"),
            d_c.alias("content"),
            F.lit(2).alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
            F.lit(1).alias("is_current"),
        ),
    )
    rows = j.select(F.explode(F.array(v1, v2)).alias("r")).filter(
        F.col("r").isNotNull()
    )
    return rows.select("r.*")


def scd2_merge_apply(spark: SparkSession, table_root: str, delta: DataFrame) -> list:
    """Incremental SCD2 maintenance — the versioned sibling of
    :func:`merge_apply`, shared by batch replays and the streaming
    per-batch processor (one definition, no drift): list the batch's
    touched partitions (planning metadata, bounded by the partition
    count), close/append ONLY the current rows of those partitions
    through the same :func:`scd2_apply` core (existing ``valid_from``
    preserved), carry closed history rows through untouched, and
    rewrite via dynamic partition overwrite.  Per-batch cost tracks
    the batch.  Replay-idempotent: a re-applied 'U' meets the row it
    opened (content equal → no-op) and a re-applied 'D' finds no
    current row to close."""
    delta = delta.persist()
    try:
        touched = sorted(r.part for r in delta.select("part").distinct().collect())
        if not touched:
            return []
        hist = spark.read.parquet(table_root).filter(F.col("part").isin(touched))
        cur = hist.filter(F.col("is_current") == 1).select(
            "doc_id", "content", "valid_from"
        )
        closed = hist.filter(F.col("is_current") == 0).select(
            "doc_id", "content", "valid_from", "valid_to", "is_current"
        )
        applied = scd2_apply(
            cur, delta.select("doc_id", "content", "op"), base_valid_from=True
        )
        new_hist = (
            closed.unionByName(applied)
            .withColumn("part", F.col("doc_id") % MERGE_N_PARTS)
            .persist()
        )
        try:
            new_hist.count()  # materialize BEFORE overwriting what it reads
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                new_hist.write.mode("overwrite").partitionBy("part").parquet(
                    table_root
                )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
        finally:
            new_hist.unpersist()
    finally:
        delta.unpersist()
    return touched


def expire_snapshots(root: str, keep_from_version: int) -> list:
    """Snapshot-retention expiry for a ``v=N`` versioned history root
    (see :func:`timetravel_root`): physically remove every snapshot
    below ``keep_from_version`` and return the expired version ids.
    Retained versions are untouched byte-for-byte (pytest-asserted) —
    the GDPR/storage-budget half of time travel: history is kept for
    reproducibility but not forever."""
    expired = []
    for d in sorted(os.listdir(root)):
        if d.startswith("v=") and d[2:].isdigit() and int(d[2:]) < keep_from_version:
            _rmtree_any(os.path.join(root, d))
            expired.append(int(d[2:]))
    return expired


# ---------------------------------------------------------------------------
# dynamic partition pruning — runtime partition elimination via join
# ---------------------------------------------------------------------------

_DPP_ORACLE = """
    WITH yrs AS (
        SELECT DISTINCT year(o_orderdate) AS yr FROM orders
        WHERE o_orderkey % 97 = 0 AND year(o_orderdate) % 2 = 0
    )
    SELECT year(o_orderdate) AS o_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM orders JOIN yrs ON year(o_orderdate) = yr
    GROUP BY year(o_orderdate)
"""


@query(
    "join_dynamic_partition_pruning",
    "sinks",
    _DPP_ORACLE,
    doc="Dynamic partition pruning, certified: the year-partitioned "
    "orders staging joins a dim of qualifying years that is only "
    "known at RUNTIME (a data-dependent distinct over the raw table), "
    "and Catalyst injects a dynamicpruning#N subquery into the fact "
    "scan's PartitionFilters — the fact side reads ONLY the "
    "partitions the dim's runtime values name (plan-asserted in "
    "pytest; 3 of 7 year partitions here). At 100 TB this is the "
    "date-dim x fact pattern: the dim filter prunes years/days of "
    "fact files without any static predicate on the fact table. "
    "Oracle replays the same join on the raw table.",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dpp_join(spark, sf_dir)


def _dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    fact = partitioned_orders_scan(spark, sf_dir)
    yrs = (
        t["orders"]
        .filter(
            (F.col("o_orderkey") % 97 == 0)
            & (F.year(F.col("o_orderdate").cast("date")) % 2 == 0)
        )
        .select(F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .distinct()
    )
    return (
        fact.join(yrs, fact["o_year"] == yrs["yr"])
        .groupBy("o_year")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_price_cents").alias("sum_price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# point-in-time (temporal) join against a versioned dimension
# ---------------------------------------------------------------------------

#: Synthetic SCD2-style dimension geometry: 3 versions per customer,
#: version k valid from 1992-01-01 + k·(300 + c_custkey % 1500) days —
#: per-customer version boundaries spread across the order-date range
#: so every version shape (early/mid/late switch, orders before and
#: after) occurs in the corpus.
PIT_VERSIONS = 3
PIT_EPOCH = "1992-01-01"
PIT_STRIDE_BASE = 300
PIT_STRIDE_MOD = 1500


@query(
    "join_scd2_point_in_time",
    "joins",
    f"""
    WITH dim AS (
        SELECT c_custkey, k,
               CAST(DATE '{PIT_EPOCH}'
                    + (k * ({PIT_STRIDE_BASE} + c_custkey % {PIT_STRIDE_MOD}))
                      * INTERVAL 1 DAY AS TIMESTAMP) AS valid_from,
               CASE WHEN k < {PIT_VERSIONS - 1} THEN
                   CAST(DATE '{PIT_EPOCH}'
                        + ((k + 1) * ({PIT_STRIDE_BASE} + c_custkey % {PIT_STRIDE_MOD}))
                          * INTERVAL 1 DAY AS TIMESTAMP)
               END AS valid_to,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) + k AS attr_cents
        FROM customer, LATERAL unnest(range(0, {PIT_VERSIONS})) AS t(k)
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(d.k AS BIGINT) AS version,
           d.attr_cents,
           d.valid_from
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
              AND o.o_orderdate >= d.valid_from
              AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    """,
    doc="POINT-IN-TIME correct join against a versioned (SCD2-shaped) "
    "dimension: each order joins the dimension version whose "
    "[valid_from, valid_to) interval contains the order date — the "
    "temporal join every leakage-safe ML feature pipeline runs "
    "(joining TODAY's attributes onto historical facts trains on the "
    "future; joining the as-of version does not). The dimension is "
    "synthesized deterministically (3 versions per customer, "
    "content-spread validity boundaries) so both engines replay the "
    "identical construction. Scale shape: the KEY EQUALITY carries "
    "the join — Spark executes an equi-join on custkey with the "
    "interval predicate as a post-join filter, so this is never a "
    "range-only join; the version history is |dim| × versions (orders "
    "of magnitude below fact scale), so it broadcasts, and a "
    "too-large history falls back to a key shuffle, never a theta "
    "join. Intervals partition time per key, so the join is provably "
    "1:1 per fact (pytest-pinned).",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    stride = F.lit(PIT_STRIDE_BASE) + F.col("c_custkey") % PIT_STRIDE_MOD
    dim = (
        t["customer"]
        .select(
            "c_custkey",
            F.explode(F.sequence(F.lit(0), F.lit(PIT_VERSIONS - 1))).alias("k"),
            "c_acctbal",
        )
        .select(
            "c_custkey",
            "k",
            F.to_timestamp(
                F.date_add(F.lit(PIT_EPOCH).cast("date"), (F.col("k") * stride).cast("int"))
            ).alias("valid_from"),
            F.when(
                F.col("k") < PIT_VERSIONS - 1,
                F.to_timestamp(
                    F.date_add(
                        F.lit(PIT_EPOCH).cast("date"),
                        ((F.col("k") + 1) * stride).cast("int"),
                    )
                ),
            ).alias("valid_to"),
            (F.round(F.col("c_acctbal") * 100).cast("long") + F.col("k")).alias(
                "attr_cents"
            ),
        )
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        o.join(
            F.broadcast(dim),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("k").cast("long").alias("version"),
            "attr_cents",
            "valid_from",
        )
    )
