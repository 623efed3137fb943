"""The flagship tailsql pipeline, end-to-end, as certified queries.

This is the reference's whole reason to exist (``/root/reference/
README.md:22-47``): raw log lines → regex-DSL parse (typed columns,
drop-on-mismatch) → pre-window filter → SQL aggregation. Here the
"log" is synthesized deterministically from the ``events`` table
(testdata has no raw text files), the parse runs through our DSL
compiler (:mod:`tailsql_spark.dsl` — pure JVM expressions), and the
oracle recomputes the *intended* result relationally in DuckDB. If the
parse/filter/aggregate pipeline is semantically right, the two agree —
a differential test of the pipeline itself, not just of Spark SQL.

Line format mirrors the README demo (``ts method status host:port
time_used``): ``2024/04/12 22:47:42.506277 GETM SUCC localhost:7710 605``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.dsl import compile_pattern
from tailsql_spark.operators.rowfilter import apply_filter
from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

#: README-style regex DSL (cf. /root/reference/README.md:32): only
#: click/view events against port 7710 match; others are dropped by the
#: regex exactly like SETM/FAIL lines in the demo.
DEMO_PATTERN = (
    r".+ (?P<method__str>click|view) (?P<status__str>SUCC) "
    r".+7710 (?P<cents__int>[0-9]+) (?P<eid__int>[0-9]+)"
)

_LINE_SQL = (
    "concat(date_format(ts, 'yyyy/MM/dd HH:mm:ss.SSSSSS'), ' ', event_type, "
    "' SUCC localhost:7710 ', cast(cast(round(value * 100) as bigint) as string), "
    "' ', cast(event_id as string))"
)


def _lines_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["events"].select(F.expr(_LINE_SQL).alias("value"))


def _pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _lines_df(spark, sf_dir)
    parsed = compile_pattern(DEMO_PATTERN).parse_lines(lines)
    return apply_filter(parsed, "cents > 500")


REGISTRY["tailsql_parse_pipeline"] = QuerySpec(
    name="tailsql_parse_pipeline",
    category="tailsql-pipeline",
    build=lambda spark, sf_dir: (
        _pipeline(spark, sf_dir)
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("eid").alias("min_eid"),
            F.max("eid").alias("max_eid"),
        )
    ),
    # The oracle recomputes the intended semantics relationally: regex
    # match ≡ event_type in (click, view); cents ≡ round(value*100);
    # the -F filter ≡ cents > 500.
    oracle="""
    SELECT event_type AS method,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           MIN(event_id) AS min_eid,
           MAX(event_id) AS max_eid
    FROM events
    WHERE event_type IN ('click', 'view')
      AND CAST(ROUND(value * 100) AS BIGINT) > 500
    GROUP BY event_type
    """,
    doc="README demo pipeline (parse → filter → agg) differentially "
    "tested against its relational meaning.",
)


REGISTRY["tailsql_parse_typed_rows"] = QuerySpec(
    name="tailsql_parse_typed_rows",
    category="tailsql-pipeline",
    build=lambda spark, sf_dir: _pipeline(spark, sf_dir).select(
        "method", "status", "cents", "eid"
    ),
    oracle="""
    SELECT event_type AS method, 'SUCC' AS status,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           event_id AS eid
    FROM events
    WHERE event_type IN ('click', 'view')
      AND CAST(ROUND(value * 100) AS BIGINT) > 500
    """,
    doc="Row-level parse output (typed columns, drop semantics) vs relational oracle.",
)


def _merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator #8 (merge streams, ``sql/squeryer.go:410``): N sources,
    each with its OWN line format and regex DSL, parsed into per-source
    views ``t0..tN`` and combined by one SQL statement — here as a
    driver-gradable batch so the merge surface gets a hard correctness
    row, not just harness pytest coverage.

    t0: click lines ``<ts> click <user_id> <cents>``;
    t1: view lines  ``V|<user_id>|<ts>`` — deliberately different
    delimiters to prove per-source patterns are independent.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.expr(
            "concat(date_format(ts, 'yyyy/MM/dd HH:mm:ss'), ' click ', "
            "cast(user_id as string), ' ', "
            "cast(cast(round(value * 100) as bigint) as string))"
        ).alias("value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.expr(
            "concat('V|', cast(user_id as string), '|', "
            "date_format(ts, 'yyyy-MM-dd HH:mm:ss'))"
        ).alias("value")
    )
    p0 = compile_pattern(r".+ click (?P<user_id__int>[0-9]+) (?P<cents__int>[0-9]+)")
    p1 = compile_pattern(r"V\|(?P<user_id__int>[0-9]+)\|.+")
    p0.parse_lines(clicks).createOrReplaceTempView("t0")
    p1.parse_lines(views).createOrReplaceTempView("t1")
    return spark.sql(
        """
        SELECT c.user_id, n_clicks, sum_cents, n_views
        FROM (SELECT user_id, COUNT(1) AS n_clicks, SUM(cents) AS sum_cents
              FROM t0 GROUP BY user_id) c
        JOIN (SELECT user_id, COUNT(1) AS n_views
              FROM t1 GROUP BY user_id) v
          ON c.user_id = v.user_id
        """
    )


REGISTRY["tailsql_merge_sources"] = QuerySpec(
    name="tailsql_merge_sources",
    category="tailsql-pipeline",
    build=_merge_sources,
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n_clicks,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                          AS sum_cents
               FROM events WHERE event_type = 'click' GROUP BY user_id),
         v AS (SELECT user_id, COUNT(*) AS n_views
               FROM events WHERE event_type = 'view' GROUP BY user_id)
    SELECT c.user_id, n_clicks, sum_cents, n_views
    FROM c JOIN v ON c.user_id = v.user_id
    """,
    doc="Merge-streams operator (squeryer.go:410) as a certified batch: "
    "two sources with different line formats parsed by independent "
    "regex DSLs into t0/t1 views, combined by one SQL join; oracle "
    "recomputes the intended result relationally from events.",
)


def _randfilter_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator #6 (``randfilter``, ``sql/funcs.go:13-41``) certified
    deterministically: out-of-range rates keep NOTHING (including
    exactly 0 and 1 — funcs.go:23-38), so ``X or randfilter(1.0)``
    reduces to ``X`` and ``randfilter(0.0)`` to empty.  The
    probabilistic interior stays pytest-certified (band test); the
    boundary rule — the part a config typo actually hits — gets a hard
    driver row.
    """
    parsed = _pipeline(spark, sf_dir)  # already filtered cents > 500
    keep_all = apply_filter(parsed, "cents > 600 or randfilter(1.0)")
    keep_none = apply_filter(parsed, "randfilter(0.0)")
    return (
        keep_all.agg(
            F.count(F.lit(1)).alias("n_or_identity"),
            F.sum("cents").alias("sum_cents"),
        )
        .join(keep_none.agg(F.count(F.lit(1)).alias("n_rate_zero")))
    )


REGISTRY["tailsql_randfilter_bounds"] = QuerySpec(
    name="tailsql_randfilter_bounds",
    category="tailsql-pipeline",
    build=_randfilter_bounds,
    oracle="""
    WITH base AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('click', 'view')
          AND CAST(ROUND(value * 100) AS BIGINT) > 500
    )
    SELECT (SELECT COUNT(*) FROM base WHERE cents > 600) AS n_or_identity,
           (SELECT CAST(SUM(cents) AS BIGINT) FROM base WHERE cents > 600)
               AS sum_cents,
           0 AS n_rate_zero
    """,
    doc="randfilter boundary semantics (rate outside (0,1) keeps "
    "nothing) proven deterministically through the rewrite path; "
    "interior probability band is pytest-certified.",
)


def _tailn_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14: the README pipeline ingested through the PLANNER-PARTITIONED
    multi-file tail source (``format("tailn")``, `sources/tail.py`) —
    the 100 TB shape of tail ingestion (a fleet of service logs, one
    executor-read partition per grown file), vs the reference's
    single-file single-machine tail (``source/fs.go:14-71``).

    The demo log lines are staged as N REAL text files (Spark-written
    shards of the deterministic line synthesis used by
    ``tailsql_parse_pipeline``), ingested by an actual availableNow
    micro-batch stream over ``tailn``, then parsed/filtered/aggregated
    by the SAME certified DSL pipeline — so the oracle is UNCHANGED and
    any divergence indicts the source (lost/duplicated/split lines),
    not the relational tail of the query.
    """
    import shutil
    import tempfile

    from tailsql_spark.plans.streaming_exec import _run_stream
    from tailsql_spark.sources.tail import TailNDataSource

    spark.dataSource.register(TailNDataSource)
    lines = _lines_df(spark, sf_dir)
    # N real log files: distributed write, no driver materialization
    src = tempfile.mkdtemp(prefix="tailsql_tailn_src_")
    staged_dir = f"{src}/logs"
    lines.repartition(6).write.mode("overwrite").text(staged_dir)
    stream = (
        spark.readStream.format("tailn")
        .option("paths", f"{staged_dir}/part-*")
        .option("seek_to_end", "false")  # backfill: the files pre-exist
        # batch-shaped backfill wants the WHOLE fleet in the one plan
        # availableNow captures (Spark wraps plain MicroBatchStream
        # sources' availableNow around a single latestOffset call): an
        # explicit no-op cap keeps this certified ingest independent
        # of the live-tail backpressure default (16 MiB/file/batch),
        # which — since the r14 engine-call-order fix — binds on the
        # very first plan and would otherwise silently truncate a
        # future corpus whose staged shards outgrow it
        .option("max_bytes_per_batch", str(1 << 40))
        .load()
    )
    try:
        ingested = _run_stream(
            stream.select("value").writeStream.outputMode("append").format("memory"),
            "_stream_tailn_pipeline",
            spark,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
    parsed = compile_pattern(DEMO_PATTERN).parse_lines(ingested)
    return (
        apply_filter(parsed, "cents > 500")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("eid").alias("min_eid"),
            F.max("eid").alias("max_eid"),
        )
    )


REGISTRY["stream_tailn_pipeline"] = QuerySpec(
    name="stream_tailn_pipeline",
    category="tailsql-pipeline",
    build=_tailn_pipeline,
    # Identical oracle to tailsql_parse_pipeline: the tailn source must
    # be invisible — every line of every staged file delivered exactly
    # once, on line boundaries, with provenance dropped before the agg.
    oracle="""
    SELECT event_type AS method,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           MIN(event_id) AS min_eid,
           MAX(event_id) AS max_eid
    FROM events
    WHERE event_type IN ('click', 'view')
      AND CAST(ROUND(value * 100) AS BIGINT) > 500
    GROUP BY event_type
    """,
    doc="README pipeline over the planner-partitioned multi-file tail "
    "source: N staged log files -> format('tailn') availableNow stream "
    "-> DSL parse -> filter -> agg; oracle unchanged from "
    "tailsql_parse_pipeline (the source must be exactly-once).",
)
