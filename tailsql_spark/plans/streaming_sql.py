"""Event-time windowed queries over the ``events`` stream table.

The reference's windows are processing-time buffers with a broken
event-time path (SURVEY §2A bug note: ``sql/squeryer.go:172-181``
uses ``Nanosecond()`` within-second offsets). These queries implement
the *intended* semantics with real event time — ``F.window`` tumbling /
sliding assignment, ``F.session_window`` sessionization — certified
against a relational DuckDB oracle (epoch-bucket arithmetic).

Batch and streaming share these plan shapes: the same ``F.window``
aggregation runs unchanged under ``readStream`` + watermark (see
tailsql_spark/streaming). The batch forms here are what the driver can
differentially check.

Determinism notes:
* window starts are computed from epoch-floor on both sides —
  microsecond-vs-nanosecond truncation can never move a row across a
  whole-second bucket boundary (truncation only moves values toward
  the bucket start);
* sessionization pre-truncates timestamps to whole seconds on BOTH
  sides, making gap comparisons integer-exact; a gap equal to the
  threshold starts a new session (Spark's [start, last+gap) interval
  semantics, mirrored as ``>=`` in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.operators.asof import asof_join_backward
from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


@query(
    "events_tumbling_1h",
    "event-time-windows",
    """
    SELECT make_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time window ≡ reference `-w 3600:0:IDX` done right (F.window).",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )


@query(
    "events_sliding_30m_10m",
    "event-time-windows",
    """
    WITH offs AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(k))
    SELECT make_timestamp(
               (CAST(FLOOR(epoch(ts) / 600) AS BIGINT) - k) * 600 * 1000000) AS window_start,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events CROSS JOIN offs
    GROUP BY 1
    """,
    doc="Sliding 30-min window, 10-min slide: every event belongs to 3 "
    "windows (reference multi-membership, sql/squeryer.go:183-195).",
)
def events_sliding_30m_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n", "n_users")
    )


@query(
    "events_session_30m",
    "event-time-windows",
    """
    WITH e AS (
        SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts_s,
               CASE WHEN ts_s - LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s)
                         >= INTERVAL 30 MINUTE
                    OR LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e
    ),
    sess AS (
        SELECT user_id, ts_s,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts_s) AS session_start,
           MAX(ts_s) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="Session windows (30-min gap) — a strict extension over the "
    "reference (SURVEY §2E: absent there). F.session_window vs "
    "gaps-and-islands oracle.",
)
def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        "user_id", F.date_trunc("second", F.col("ts")).alias("ts_s")
    )
    return (
        e.groupBy("user_id", F.session_window("ts_s", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "asof_join_latest_order",
    "joins",
    """
    WITH r AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, r.o_orderkey,
           CAST(r.o_orderdate AS TIMESTAMP) AS matched_date
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_id < 2000) e
    ASOF JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    doc="As-of backward join (DuckDB ASOF JOIN parity) via the scalable "
    "union-merge plan in operators/asof.py — one shuffle, one sort.",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    left = t["events"].filter(F.col("event_id") < 2000).select("event_id", "user_id", "ts")
    right = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join_backward(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_orderdate"],
        inner=True,
        # the probe side is a 2000-event slice; prune the order history
        # to its users so the merge sort never sees unmatched keys
        prune_right=True,
    )
    return out.select(
        "event_id", "user_id", "o_orderkey", F.col("o_orderdate").alias("matched_date")
    )


@query(
    "range_join_error_purchase",
    "joins",
    """
    SELECT e.user_id, e.event_id AS error_id, f.event_id AS purchase_id
    FROM events e JOIN events f
      ON e.user_id = f.user_id
     AND f.ts > e.ts AND f.ts <= e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error' AND f.event_type = 'purchase'
    """,
    doc="Time-band range join: purchases within 10 min after an error, "
    "per user. Equi-join on user co-partitions; band predicate filters "
    "post-join (at scale: bucketize ts and equi-join on bucket too).",
)
def range_join_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["events"].filter(F.col("event_type") == "error").alias("e")
    f_ = t["events"].filter(F.col("event_type") == "purchase").alias("f")
    return (
        e.join(
            f_,
            (F.col("e.user_id") == F.col("f.user_id"))
            & (F.col("f.ts") > F.col("e.ts"))
            & (F.col("f.ts") <= F.col("e.ts") + F.expr("INTERVAL 10 MINUTE")),
        )
        .select(
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_id").alias("error_id"),
            F.col("f.event_id").alias("purchase_id"),
        )
    )


_FUNNEL_SQL = """
    WITH f AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_click <= t_view + INTERVAL 24 HOUR
                    THEN 1 ELSE 0 END) AS BIGINT) AS stage_click_24h,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_click <= t_view + INTERVAL 24 HOUR
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM f
"""


@query(
    "events_funnel_conversion",
    "event-analytics",
    _FUNNEL_SQL,
    doc="Ordered conversion funnel (view → click within 24 h → "
    "purchase): one grouped pass builds per-user first-touch "
    "timestamps, one reduce counts the stages — no self-joins, no "
    "row explosion, the only shuffle is the user_id groupBy.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_FUNNEL_SQL)


_RETENTION_SQL = """
    WITH first AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        FROM events
    )
    SELECT cohort,
           CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_n,
           COUNT(*) AS n_active
    FROM first JOIN act USING (user_id)
    GROUP BY 1, 2
"""


@query(
    "events_retention_cohorts",
    "event-analytics",
    _RETENTION_SQL,
    doc="Weekly retention cohorts: cohort = week of first activity, "
    "counted per subsequent active week. Week difference computed as "
    "day-diff/7 of week-truncated stamps (exact integer) because the "
    "engines' native week-diff semantics differ.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["events"]
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk")).distinct()
    return (
        first.join(act, "user_id")
        .groupBy("cohort", (F.datediff("wk", "cohort") / 7).cast("long").alias("week_n"))
        .agg(F.count("*").alias("n_active"))
    )


_TRANSITION_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
"""


@query(
    "events_transition_matrix",
    "event-analytics",
    _TRANSITION_SQL,
    doc="Event-to-event transition counts (first-order Markov matrix) "
    "per user session stream: one shuffle+sort on user_id for the "
    "LEAD window, one bounded aggregation (|types|² keys).",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "events_anomaly_hours",
    "event-analytics",
    """
    WITH hourly AS (
        SELECT event_type,
               make_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)
                              * 3600 * 1000000) AS hour,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               AVG(n) AS mean_n,
               stddev_pop(n) AS sd_n
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour, h.n,
           ROUND((h.n - s.mean_n) / s.sd_n, 6) AS z
    FROM hourly h JOIN stats s USING (event_type)
    WHERE s.sd_n > 0 AND abs((h.n - s.mean_n) / s.sd_n) > 2
    """,
    doc="Volume-anomaly detection: hourly event counts per type, "
    "flagged where the count sits more than 2 population-stddevs from "
    "that type's mean — the monitoring query a log-triage tool like "
    "the reference exists to feed. Built on the rollup layer: the "
    "stats table is |event_type|-row tiny (broadcast), so the flagging "
    "join is map-side over the already-aggregated hourly rows.",
)
def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    hourly = (
        t["events"]
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("event_type", F.col("w.start").alias("hour"), "n")
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mean_n"), F.stddev_pop("n").alias("sd_n")
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd_n")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("sd_n") > 0) & (F.abs(z) > 2))
        .select("event_type", "hour", "n", F.round(z, 6).alias("z"))
    )


@query(
    "window_cumulative_share_cut",
    "window-functions",
    """
    WITH rev AS (
        SELECT p_brand, p_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p_brand, p_partkey, rev_cents,
               SUM(rev_cents) OVER (PARTITION BY p_brand
                                    ORDER BY rev_cents DESC, p_partkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents,
               SUM(rev_cents) OVER (PARTITION BY p_brand) AS tot_cents
        FROM rev
    )
    SELECT p_brand, p_partkey, rev_cents,
           ROUND(cum_cents * 1.0 / tot_cents, 6) AS cum_share
    FROM ranked
    WHERE cum_cents - rev_cents < CAST(0.8 * tot_cents AS BIGINT) + 1
    """,
    doc="Pareto / nucleus-style cumulative-share cut: per brand, the "
    "smallest prefix of parts (by revenue, deterministic tiebreak) "
    "whose cumulative revenue reaches 80% of the brand total — the "
    "same top-p pattern used for nucleus sampling cuts over token "
    "distributions. Exact integer cents make the 80% boundary "
    "bit-identical across engines; one shuffle on the groupBy key, "
    "one window sort per brand.",
)
def window_cumulative_share_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w_cum = (
        W.partitionBy("p_brand")
        .orderBy(F.col("rev_cents").desc(), F.col("p_partkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand",
        "p_partkey",
        "rev_cents",
        F.sum("rev_cents").over(w_cum).alias("cum_cents"),
        F.sum("rev_cents").over(w_tot).alias("tot_cents"),
    )
    return ranked.filter(
        F.col("cum_cents") - F.col("rev_cents")
        < (F.lit(0.8) * F.col("tot_cents")).cast("long") + 1
    ).select(
        "p_brand",
        "p_partkey",
        "rev_cents",
        F.round(F.col("cum_cents") * 1.0 / F.col("tot_cents"), 6).alias("cum_share"),
    )


@query(
    "events_action_sequences",
    "event-analytics",
    """
    SELECT user_id, COUNT(*) AS n_events,
           md5(string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id))
               AS seq_fp
    FROM events GROUP BY user_id
    """,
    doc="Per-user ordered action sequences — the session→training-"
    "sequence construction step of a behavioral-model pipeline — "
    "certified by md5 fingerprint of the '>'-joined event-type chain "
    "(scalar output per the driver contract; the fingerprint proves "
    "ORDER, not just membership). Ordering is (epoch-micros, event_id) "
    "on BOTH engines: the parquet stores nanosecond timestamps, Spark "
    "reads micros (nanos div 1000), so the oracle orders by epoch_us "
    "too — sub-microsecond ties resolve identically via event_id. "
    "Scale: one user_id shuffle; collect_list is bounded by per-user "
    "event counts (cap with a window row_number if users are "
    "unbounded).",
)
def events_action_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("a"),
            )
        )
    )
    return t["events"].groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.md5(
            F.array_join(F.transform(seq, lambda x: x["a"]), ">").cast("binary")
        ).alias("seq_fp"),
    )


@query(
    "events_gaps_islands",
    "event-analytics",
    """
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS tu, event_id,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    ),
    marked AS (
        SELECT user_id, tu, event_id,
               CASE WHEN prev IS NULL OR tu - prev > 1800000000
                    THEN 1 ELSE 0 END AS new_island
        FROM ordered
    ),
    islands AS (
        SELECT user_id,
               SUM(new_island) OVER (PARTITION BY user_id
                                     ORDER BY tu, event_id
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT island) AS BIGINT) AS n_islands,
           CAST(MAX(cnt) AS BIGINT) AS longest_island
    FROM (SELECT user_id, island, COUNT(*) AS cnt
          FROM islands GROUP BY user_id, island)
    GROUP BY user_id
    """,
    doc="Gaps-and-islands sessionization — the lag + conditional "
    "cumulative-sum idiom (30-min gap threshold), certified identical "
    "to DuckDB's reading of the same pattern. The classic SQL "
    "alternative to session_window when downstream needs island IDS "
    "rather than window bounds. Scale: two window passes over the "
    "same user_id partitioning (one shuffle, reused), then one "
    "groupBy — ordering ties broken by event_id on both engines.",
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w_lag = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ordered = t["events"].select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        F.lag(F.unix_micros("ts")).over(w_lag).alias("prev"),
    )
    marked = ordered.withColumn(
        "new_island",
        F.when(
            F.col("prev").isNull() | (F.col("tu") - F.col("prev") > 1800000000), 1
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_cum))
    per_island = islands.groupBy("user_id", "island").agg(F.count("*").alias("cnt"))
    return per_island.groupBy("user_id").agg(
        F.countDistinct("island").alias("n_islands"),
        F.max("cnt").alias("longest_island"),
    )


# ---------------------------------------------------------------------------
# watermark lateness audit — choosing the delay before you stream
# ---------------------------------------------------------------------------

#: Prefix-scan bucket width over the dense event_id arrival order —
#: the running event-time maximum is computed as intra-bucket windows
#: plus a tiny per-bucket offset table (the sample_weighted_systematic
#: discipline), never one global-order window over the corpus.
LATENESS_BUCKET = 4096

_LATENESS_ORACLE = """
    WITH arr AS (
        SELECT event_id, epoch_us(ts) AS tu FROM events
    ),
    scanned AS (
        SELECT event_id, tu,
               MAX(tu) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS seen_max
        FROM arr
    )
    SELECT CAST(FLOOR(GREATEST(seen_max - tu, 0) / 600000000) AS BIGINT)
               AS late_10m_bucket,
           COUNT(*) AS n_events
    FROM scanned WHERE seen_max IS NOT NULL
    GROUP BY 1
"""


@query(
    "events_watermark_lateness",
    "event-analytics",
    _LATENESS_ORACLE,
    doc="Watermark-delay design audit: for each event, its LATENESS "
    "against the maximum event time already seen in arrival order "
    "(event_id is the synthetic arrival proxy) — histogrammed in "
    "10-minute buckets, this is exactly the curve that answers 'what "
    "withWatermark delay keeps X% of events' BEFORE committing state "
    "bounds to a stream. The running prefix maximum is DISTRIBUTED: "
    "intra-bucket exclusive-prefix windows (partitioned by event_id "
    "div 4096) plus a tiny broadcast table of exclusive per-bucket "
    "prefix maxima — never a global-order window over the corpus "
    "(the sample_weighted_systematic prefix-scan discipline; the "
    "oracle uses the plain global window, proving the decomposition "
    "exact).",
)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    arr = t["events"].select(
        "event_id",
        F.unix_micros("ts").alias("tu"),
        (F.col("event_id") / LATENESS_BUCKET).cast("long").alias("b"),
    )
    w_intra_excl = (
        W.partitionBy("b")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = arr.withColumn("intra_max", F.max("tu").over(w_intra_excl))
    # per-bucket maxima: corpus/4096 rows; their EXCLUSIVE prefix max
    # runs on the tiny table only
    bmax = arr.groupBy("b").agg(F.max("tu").alias("bm"))
    w_excl_b = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offs = bmax.withColumn("prev_max", F.max("bm").over(w_excl_b)).select(
        "b", "prev_max"
    )
    scanned = intra.join(F.broadcast(offs), "b").withColumn(
        "seen_max", F.greatest(F.col("intra_max"), F.col("prev_max"))
    )
    late = F.floor(
        F.greatest(F.col("seen_max") - F.col("tu"), F.lit(0)) / 600000000
    ).cast("long")
    return (
        scanned.filter(F.col("seen_max").isNotNull())
        .groupBy(late.alias("late_10m_bucket"))
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# rate anomaly detection (the alert-rule end product)
# ---------------------------------------------------------------------------

_RATE_ANOMALY_SQL = """
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS h0,
               date_trunc('hour', MAX(ts)) AS h1
        FROM events
    ),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                    FROM bounds) g
    ),
    cnts AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT g.event_type, g.h, COALESCE(c.cnt, 0) AS cnt
        FROM grid g LEFT JOIN cnts c
          ON g.event_type = c.event_type AND g.h = c.h
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s,
               CAST(SUM(cnt * cnt) AS BIGINT) AS ss
        FROM dense GROUP BY event_type
    )
    SELECT d.event_type,
           strftime(d.h, '%Y-%m-%d %H:00') AS hour,
           d.cnt,
           CASE WHEN st.n * d.cnt - st.s > 0 THEN 1 ELSE -1 END AS direction
    FROM dense d JOIN stats st ON d.event_type = st.event_type
    WHERE (st.n * d.cnt - st.s) * (st.n * d.cnt - st.s)
          > 4 * (st.n * st.ss - st.s * st.s)
"""


@query(
    "events_rate_anomaly",
    "event-analytics",
    _RATE_ANOMALY_SQL,
    doc="Rate-anomaly detection — the alert rule a log pipeline runs "
    "on itself: hourly event counts per type on a DENSE hour grid "
    "(absent hours count as zero — a silent outage is an anomaly too), "
    "flagged when the count departs the type's period mean by more "
    "than two standard deviations. The z-test is INTEGER-EXACT: "
    "(n·x − S)² > 4·(n·SS − S²) with S/SS the per-type sum and "
    "sum-of-squares, so no float mean/std ever crosses engines. Scale "
    "shape: one groupBy to hourly counts (map-side combinable), the "
    "grid and the |types|-row stats table are period-sized metadata "
    "that broadcast; the event stream is scanned once.",
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_type", "ts")
    cnts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("cnt"))
    return rate_anomaly_from_counts(cnts)


def rate_anomaly_from_counts(cnts: DataFrame) -> DataFrame:
    """Dense-grid two-sigma detection from hourly (event_type, h, cnt)
    alone — the grid bounds and the type set both derive from the
    counts (the min-ts hour always holds at least one event), so the
    mergeable count state IS the operator's entire input and the
    streaming twin folds its per-batch partials through this identical
    arithmetic."""
    bounds = cnts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = cnts.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    dense = grid.join(cnts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    stats = dense.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    return (
        dense.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            "cnt",
            F.when(dev > 0, 1).otherwise(-1).cast("long").alias("direction"),
        )
    )
