"""Distributed Bloom-filter sketch, built and probed with DataFrame ops.

Spark ships ``BloomFilterAggregate`` for its internal runtime-filter
injection but does not register ``bloom_filter_agg`` / ``might_contain``
as public SQL in this build, and ``DataFrame.stat.bloomFilter`` collects
the whole filter to the driver as a py4j object (useless inside a plan).
So the sketch here is built the way it should be at 100 TB anyway —
distributed end to end:

* **build**: BLOCKED (cache-line) addressing — seeded ``xxhash64`` 0
  picks one 64-bit word per item, hashes 1..k set k bits within it;
  ``bit_or`` per word is ONE tiny shuffle whose output is at most
  ``m_bits/64`` rows.  Partial aggregation means each map task emits at
  most ``m_bits/64`` rows regardless of input size.
* **probe**: the word table broadcasts (m=2^20 bits → 16k rows ≈ 128 KB)
  and the whole membership test is ONE broadcast hash join + one k-bit
  mask AND — the probe stream NEVER shuffles.

This is the join-pruning shape that matters at scale: a corpus-sized
stream is filtered down to (matches + false positives) *before* any
shuffle/distinct, and the exact join that follows only sees survivors.
False positives are then removed by that exact join, so operators built
on the sketch return exactly what their unsketched versions return —
which is why ``text_contamination_bloom`` certifies against the very
same DuckDB oracle as ``text_contamination_overlap``.

Extension beyond the reference surface (the reference delegates all
relational work to its embedded engine and has no sketch support);
motivated by the decontamination pipelines of large-LM training corpora
where the eval set is tiny and the corpus is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.operators.textstats import (
    CONTAM_ORACLE,
    contam_gram_arr,
    contam_grams_arrow,
    contam_is_test,
)
from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

#: Default sketch geometry: 2^20 bits / 2 in-word bits, blocked layout
#: → ~2% false-positive rate at 60k inserted items (marginally above
#: the split-bit layout's ~1.3%; fp only adds rows to the exact join),
#: 16k-row word table (128 KB broadcast).  m is a power of two so
#: ``pmod`` never biases the upper positions.
BLOOM_M_BITS = 1 << 20
BLOOM_K = 2

#: r17 scale fix: the contamination TEST split is a fixed ~10% FRACTION
#: of the corpus, so its gram population grows linearly with corpus
#: size — a fixed 2^20-bit sketch saturates (every word all-ones) past
#: ~10× sf0.1 and prunes NOTHING, and the survivor set the exact join
#: broadcasts becomes corpus-sized (measured: driver broadcast OOM at
#: 100×, 16 GB driver).  Two dials, both result-invariant (fp rate and
#: join strategy only change how many false survivors die in the exact
#: join, never which rows come out):
#:   * the sketch is sized from the source parquet footprint — one bit
#:     per source byte ≈ 16 bits per test-split gram (text ≈ 4× the
#:     zstd parquet bytes, grams ≈ bytes/6, test split 10%) — clamped
#:     to [2^20, 2^27] so the word table stays ≤ 2M rows, a safe
#:     broadcast at any corpus size;
#:   * the survivor attach broadcasts only while the corpus source is
#:     under GRAM_BROADCAST_BYTES; past it the survivors go through a
#:     plain equi-join (SMJ/AQE) — survivors scale with the test gram
#:     space here, so an unconditional broadcast hint is wrong at
#:     100 TB no matter how well the sketch prunes.
GRAM_BROADCAST_BYTES = 64 << 20


def _contam_bloom_bits(sf_dir: str) -> int:
    """Sketch size from the corpus footprint (plan-time, no Spark job;
    directory-aware via ``catalog.source_bytes``)."""
    import os

    from tailsql_spark.plans.catalog import source_bytes

    nbytes = source_bytes(os.path.join(sf_dir, "documents.parquet"))
    return 1 << max(20, min(27, nbytes.bit_length()))


def query(name: str, category: str, oracle: str | None, doc: str = "", plan=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), plan=plan,
        )
        return fn

    return deco


def _word_and_mask(col: str, m_bits: int, k: int) -> tuple:
    """(word index, k-bit in-word mask) of an item — the BLOCKED Bloom
    addressing: hash 0 picks ONE 64-bit word, hashes 1..k pick k bits
    WITHIN that word.  Both the build and the probe therefore touch
    exactly one word per item."""
    word_idx = F.pmod(F.xxhash64(F.col(col), F.lit(0)), F.lit(m_bits // 64))
    mask = None
    for i in range(1, k + 1):
        bit = F.expr(f"shiftleft(1L, int(pmod(xxhash64({col}, {i}), 64)))")
        mask = bit if mask is None else mask.bitwiseOR(bit)
    return word_idx, mask


def bloom_build(items: DataFrame, col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Aggregate ``items[col]`` into a blocked-Bloom word table
    ``(word_idx int, word long)`` — one row per 64-bit word with ≥1 set
    bit.  Blocked (cache-line) addressing: one word per item, k bits
    inside it — so the build is ONE row per item (no ×k explode) and
    the probe (below) is ONE broadcast join instead of k.  The fp rate
    for the same m is marginally worse than the classic split-bit
    layout, which only costs extra rows in the exact join downstream —
    never correctness (r7 job-count audit: the k-join probe paid one
    broadcast-build job per hash for zero semantic benefit).
    Distributed: map-side partial ``bit_or`` caps every task's output
    at m_bits/64 rows, the one shuffle moves only words."""
    word_idx, mask = _word_and_mask(col, m_bits, k)
    return (
        items.select(word_idx.alias("word_idx"), mask.alias("m"))
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("word"))
    )


def bloom_probe(
    df: DataFrame, col: str, words: DataFrame, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Keep only rows whose ``col`` *might* be in the sketch (no false
    negatives).  ONE broadcast left join of the tiny word table + one
    k-bit mask test; the probed stream never shuffles, so this composes
    with any downstream exact join as a pre-shuffle row-count
    reducer."""
    word_idx, mask = _word_and_mask(col, m_bits, k)
    wtab = words.select(F.col("word_idx").alias("_bw_idx"), F.col("word").alias("_bw"))
    out = (
        df.withColumn("_bw_idx", word_idx)
        .withColumn("_bm", mask)
        .join(F.broadcast(wtab), "_bw_idx", "left")
    )
    hit = F.coalesce(F.col("_bw"), F.lit(0)).bitwiseAND(F.col("_bm")) == F.col("_bm")
    return out.filter(hit).drop("_bw_idx", "_bm", "_bw")


@query(
    "text_contamination_bloom",
    "text-analysis",
    CONTAM_ORACLE,
    doc="The SAME contamination audit as text_contamination_overlap, "
    "restructured for the 100 TB asymmetry: the TEST-set grams (tiny) "
    "build a broadcast Bloom sketch, the corpus-side gram stream is "
    "pruned by it BEFORE any shuffle, and only survivors reach the "
    "distinct + exact join. False positives die in the exact join, so "
    "the result — and the DuckDB oracle — are identical to the "
    "unsketched operator; what changes is that the corpus-wide "
    "distinct-shuffle of train grams shrinks to (hits + ~2% fp).",
)
def text_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _contamination_bloom_scored(spark, sf_dir)


def _contamination_bloom_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-pruned contamination computation, fully LAZY.

    r17: the old shape persisted ``test_grams`` (it feeds the sketch
    build and the final join) and then had to materialize the result
    to parquet so the cache could be released — a persist-fill action,
    a distributed write and a re-read per run.  Dropping both and
    letting the test-split gram pipeline evaluate twice is faster at
    bench scale (interleaved min-of-5 at sf0.1: 1.81 s vs 2.49 s) and
    a wash at 30× (8.99 vs 9.36 s min-of-3) — the second test-side
    pass pipelines into the final join, while the persist was a
    barrier plus a corpus-proportional cache (the 'test' split is a
    fixed ~10%% FRACTION of the corpus, so caching its exploded grams
    never bounded by eval-set size anyway)."""
    from tailsql_spark.plans.catalog import load_documents_sized

    # bytes-sized split: the gram builder is an interpreted HOF and the
    # local file reads as ONE partition — unsplit, the corpus-side gram
    # pass serializes on a single core (measured 7.3 s at sf0.1 vs
    # ~1 s split; at cluster scale the input arrives pre-split).
    docs = load_documents_sized(spark, sf_dir).select(
        "doc_id", contam_is_test().alias("is_test"), F.col("text")
    )
    test_grams = (
        docs.filter(F.col("is_test"))
        .select("doc_id", F.explode_outer(contam_gram_arr()).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    # build the sketch straight off the (doc_id, g) rows: bit_or is
    # idempotent, so the per-doc duplicates a global distinct would
    # remove set the same bits (r7 job audit — the extra distinct was a
    # pure wasted exchange); and with the blocked layout the word table
    # feeds exactly ONE broadcast build, so persisting it buys nothing.
    m_bits = _contam_bloom_bits(sf_dir)
    sketch = bloom_build(test_grams.select("g"), "g", m_bits=m_bits)
    # corpus side: NO distinct before the sketch — pruning first is the
    # whole point; the survivors (test-hit grams + fp) are then distinct
    # and exact-joined exactly like the unsketched operator.  The gram
    # stream comes from the Arrow-batched builder (r15): the corpus
    # pass is the 100 TB-shaped work, and the interpreted HOF array
    # was its cost (multiset-identical, pytest-asserted).
    train_stream = contam_grams_arrow(docs.filter(~F.col("is_test")))
    train_surv = bloom_probe(
        train_stream, "g", sketch, m_bits=m_bits
    ).select("g").distinct()
    # survivors are (hits + fp) of the EVAL-set gram space.  That space
    # is a ~10% fraction of the corpus in this data model, so it is
    # broadcast-safe only while the corpus is small: under the gate the
    # exact join broadcasts the survivors and the test-gram side never
    # shuffles; past it both sides take the plain equi-join (SMJ, AQE
    # skew-split) — the scale-honest shape (guide §3.1).
    import os

    from tailsql_spark.plans.catalog import source_bytes

    surv = train_surv.withColumn("hit", F.lit(1))
    src_bytes = source_bytes(os.path.join(sf_dir, "documents.parquet"))
    if 0 < src_bytes < GRAM_BROADCAST_BYTES:
        surv = F.broadcast(surv)
    return (
        test_grams.join(surv, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0)) * 1.0 / F.count("*"), 6
            ).alias("contamination_pct"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic distinct-count sketch (bucketed-min / MinCount estimator)
# ---------------------------------------------------------------------------

KMV_K = 32                # sketch size; relative error ~ 1/sqrt(K-2) ≈ 18%
_H_SPACE = 1 << 60        # shingle_hash60 range

#: shared estimate formula: (K-1)·|H| / h_(K) when the group has ≥ K
#: distinct values, else the sketch IS the exact distinct set.  The
#: float image of h (≤2^60) and of (K-1)·2^60 round identically in both
#: engines; ONE division + round → deterministic.
_KMV_EST = (
    f"CASE WHEN cnt < {KMV_K} THEN cnt "
    f"ELSE CAST(ROUND({KMV_K - 1}.0 * {_H_SPACE}.0 / CAST(kth AS DOUBLE), 0) AS BIGINT) END"
)


@query(
    "agg_kmv_sketch",
    "sketches",
    f"""
    WITH dh AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events
    ),
    day_sk AS (
        SELECT day, h FROM (
            SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
            FROM dh
        ) WHERE rn <= {KMV_K}
    ),
    all_sk AS (
        SELECT h FROM (SELECT DISTINCT h FROM day_sk) ORDER BY h LIMIT {KMV_K}
    ),
    agg AS (
        SELECT day, COUNT(*) AS cnt, MAX(h) AS kth FROM day_sk GROUP BY day
        UNION ALL
        SELECT 'ALL' AS day, COUNT(*) AS cnt, MAX(h) AS kth FROM all_sk
    ),
    exact AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
        UNION ALL
        SELECT 'ALL' AS day, COUNT(DISTINCT user_id) AS n_exact FROM events
    )
    SELECT a.day, x.n_exact, {_KMV_EST} AS n_est
    FROM agg a JOIN exact x USING (day)
    """,
    doc="Deterministic distinct-user KMV sketch per day + merged total: "
    f"each group keeps its {KMV_K} smallest distinct 60-bit md5 hashes; "
    f"estimate = (K-1)·2^60 / h_(K) (exact count when < K values) — a "
    "mergeable sketch whose arithmetic certifies EXACTLY cross-engine, "
    "unlike the tolerance-tested HLL rows (agg_approx_sketches / "
    "agg_hll_mergeable). The ALL row IS the merge: the K smallest over "
    "the union of the daily sketches, never over raw data. Scale: "
    "per-day sketches via one distinct + per-group top-K (sort rides "
    "the day shuffle); the merge input is |days|·K rows and the global "
    "K-min is a TakeOrdered, so merged estimates never rescan the "
    "corpus — the same contract that lets a 100 TB pipeline keep "
    "per-partition sketches and combine them.",
)
def agg_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from tailsql_spark.operators.dedup import shingle_hash60

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("user_id"),
        shingle_hash60(F.col("user_id").cast("string")).alias("h"),
    )
    dh = ev.select("day", "h").distinct()
    rn = F.row_number().over(W.partitionBy("day").orderBy("h"))
    day_sk = dh.withColumn("rn", rn).filter(F.col("rn") <= KMV_K).select("day", "h")
    all_sk = day_sk.select("h").distinct().orderBy("h").limit(KMV_K)
    agg = (
        day_sk.groupBy("day")
        .agg(F.count("*").alias("cnt"), F.max("h").alias("kth"))
        .unionByName(
            all_sk.agg(F.count("*").alias("cnt"), F.max("h").alias("kth")).select(
                F.lit("ALL").alias("day"), "cnt", "kth"
            )
        )
    )
    exact = (
        ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .unionByName(
            ev.agg(F.countDistinct("user_id").alias("n_exact")).select(
                F.lit("ALL").alias("day"), "n_exact"
            )
        )
    )
    return (
        agg.join(exact, "day")
        .select("day", "n_exact", F.expr(_KMV_EST).alias("n_est"))
    )


def _kmv_est_sql(p: str) -> str:
    """The KMV estimator over a ``(cnt, kth)`` stats alias ``p`` —
    shared literal formula with _KMV_EST so every sketch row in this
    module estimates identically."""
    return (
        f"CASE WHEN {p}.cnt < {KMV_K} THEN {p}.cnt "
        f"ELSE CAST(ROUND({KMV_K - 1}.0 * {_H_SPACE}.0 / CAST({p}.kth AS DOUBLE), 0)"
        f" AS BIGINT) END"
    )


_ESTA = _kmv_est_sql("sa")
_ESTB = _kmv_est_sql("sb")
_ESTU = _kmv_est_sql("su")


@query(
    "agg_kmv_set_ops",
    "sketches",
    f"""
    WITH eh AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM eh
        ) WHERE rn <= {KMV_K}
    ),
    uni AS (SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT {KMV_K}),
    sa AS (SELECT COUNT(*) AS cnt, MAX(h) AS kth FROM sk WHERE event_type = 'click'),
    sb AS (SELECT COUNT(*) AS cnt, MAX(h) AS kth FROM sk WHERE event_type = 'purchase'),
    su AS (SELECT COUNT(*) AS cnt, MAX(h) AS kth FROM uni),
    ov AS (
        SELECT COUNT(*) AS n_overlap FROM uni u
        WHERE EXISTS (SELECT 1 FROM sk WHERE event_type = 'click' AND h = u.h)
          AND EXISTS (SELECT 1 FROM sk WHERE event_type = 'purchase' AND h = u.h)
    )
    SELECT CAST({_ESTA} AS BIGINT) AS n_est_a,
           CAST({_ESTB} AS BIGINT) AS n_est_b,
           CAST({_ESTU} AS BIGINT) AS union_est,
           CAST(ov.n_overlap AS BIGINT) AS n_overlap,
           CASE WHEN su.cnt = 0 THEN 0.0
                ELSE ROUND(ov.n_overlap * 1.0 / su.cnt, 4) END AS jaccard_est,
           CAST(CASE WHEN su.cnt = 0 THEN 0
                ELSE ROUND(ov.n_overlap * 1.0 / su.cnt * {_ESTU}, 0) END
                AS BIGINT) AS inter_est
    FROM sa, sb, su, ov
    """,
    doc=f"KMV sketch SET ALGEBRA — the mergeable-sketch operations a "
    "metrics layer runs without rescanning raw data: per-cohort "
    f"K={KMV_K} minimum-hash sketches for two event cohorts, the "
    "UNION sketch as the K smallest of the two sketches' hashes "
    "(never of raw rows), the in-sketch overlap count, and the "
    "derived Jaccard / intersection estimates "
    "(|A∩B| ≈ J(sketch) × |A∪B|_est — the classic KMV identity). "
    "Every value is deterministic md5/integer/one-rounding-per-output "
    "arithmetic, so the whole algebra certifies EXACTLY cross-engine "
    "(unlike the tolerance-tested HLL rows). Scale: sketches are "
    "per-cohort top-K rides on the cohort shuffle; the set operations "
    "touch only 2K sketch rows — constant-size state, the contract "
    "that lets 100 TB cohort overlaps come from a sketch store.",
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from tailsql_spark.operators.dedup import shingle_hash60

    t = load_tables(spark, sf_dir)
    ev = (
        t["events"]
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type", shingle_hash60(F.col("user_id").cast("string")).alias("h")
        )
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    sk = ev.withColumn("rn", rn).filter(F.col("rn") <= KMV_K).select("event_type", "h")
    a = sk.filter(F.col("event_type") == "click").select("h")
    b = sk.filter(F.col("event_type") == "purchase").select("h")
    uni = sk.select("h").distinct().orderBy("h").limit(KMV_K)

    est = _KMV_EST
    fa = a.agg(F.count("*").alias("cnt"), F.max("h").alias("kth")).select(
        F.expr(est).cast("long").alias("n_est_a")
    )
    fb = b.agg(F.count("*").alias("cnt"), F.max("h").alias("kth")).select(
        F.expr(est).cast("long").alias("n_est_b")
    )
    fu = uni.agg(F.count("*").alias("cnt"), F.max("h").alias("kth")).select(
        F.expr(est).cast("long").alias("union_est"), F.col("cnt").alias("ucnt")
    )
    fo = (
        uni.join(a, "h")
        .join(b, "h")
        .agg(F.count("*").alias("n_overlap"))
    )
    jac_raw = F.col("n_overlap") * 1.0 / F.col("ucnt")
    return (
        fa.crossJoin(fb)
        .crossJoin(fu)
        .crossJoin(fo)
        .select(
            "n_est_a",
            "n_est_b",
            "union_est",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.when(F.col("ucnt") == 0, F.lit(0.0))
            .otherwise(F.round(jac_raw, 4))
            .alias("jaccard_est"),
            F.when(F.col("ucnt") == 0, F.lit(0))
            .otherwise(F.round(jac_raw * F.col("union_est"), 0))
            .cast("long")
            .alias("inter_est"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-pruned join: the manual form of Spark's runtime-filter pushdown
# ---------------------------------------------------------------------------

_BLOOM_JOIN_ORACLE = """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
"""


@query(
    "join_bloom_pruned",
    "join-pruning",
    _BLOOM_JOIN_ORACLE,
    plan=lambda s, d: _bloom_pruned_join(s, d),
    doc="Runtime-filter join pruning, spelled out: the SELECTIVE side "
    "(urgent orders, ~20%) builds a blocked-Bloom word table; the FACT "
    "side (lineitem) is probed by the broadcast sketch BEFORE the join "
    "shuffle, so only ~matching rows (+ ~2% fp) ever move; the exact "
    "equi-join then removes false positives. The oracle is the PLAIN "
    "join — the sketch must be invisible in the result. This is the "
    "big-big join shape at 100 TB where neither side broadcasts: Spark "
    "injects this filter itself when runtime-filter thresholds fire "
    "(spark.sql.optimizer.runtime.bloomFilter); spelling it out keeps "
    "the pruning under the pipeline's control (e.g. reusing one sketch "
    "across several consumers).",
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bloom_pruned_join(spark, sf_dir)


def _bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    # build once over the selective side's join key; 16k-row word table
    words = bloom_build(urgent.select(F.col("o_orderkey").cast("string").alias("k")), "k")
    li = t["lineitem"].withColumn("_k", F.col("l_orderkey").cast("string"))
    pruned = bloom_probe(li, "_k", words).drop("_k")
    return (
        pruned.join(urgent.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("qty"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates + exact rescan
# ---------------------------------------------------------------------------

#: Heavy-hitter threshold: tokens with count * HH_K > N are reported.
#: 32 puts the cut at a >3.125% corpus share — inside the synthetic
#: corpus's 3.2-3.6% head so the certified result is non-empty at every
#: SF (16 selected nothing: no token reaches 1/16 of a 31-word
#: vocabulary).
HH_K = 32
#: Misra-Gries counters held per partition.  Any slot count >= HH_K
#: preserves the superset guarantee (undercount <= N_p/slots <=
#: N_p/HH_K); the slack just reduces decrement churn.
MG_SLOTS = 64

_HH_ORACLE = f"""
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        ) u WHERE tok <> ''
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT tok, COUNT(*) AS cnt
    FROM toks CROSS JOIN tot
    GROUP BY tok, n
    HAVING COUNT(*) * {HH_K} > n
"""


def mg_candidates(toks: DataFrame, col: str = "tok", slots: int = MG_SLOTS) -> DataFrame:
    """Per-partition Misra-Gries summaries, vectorized: each Arrow batch
    is reduced to exact ``value_counts`` (pandas, no Python row loop),
    then merged into the partition's running summary with the mergeable-
    summaries reduction (Agarwal et al., PODS'12): add counts, and if
    more than ``slots`` keys survive, subtract the (slots+1)-th largest
    count from all and keep the positive ones.  That preserves the MG
    undercount bound (<= N_p/slots), so the UNION of partition summaries
    is a SUPERSET of every token with global count > N/slots — the
    pigeonhole argument: if f_p <= N_p/slots in every partition then
    f <= N/slots.  Output is candidate tokens only (counts are
    re-derived exactly downstream; MG estimates are never reported)."""
    return mg_partition_summaries(toks, col, slots).select(col)


def mg_partition_summaries(
    toks: DataFrame, col: str = "tok", slots: int = MG_SLOTS
) -> DataFrame:
    """Per-partition Misra-Gries summaries WITH their (under)count
    estimates — ``(col, cnt_est)`` rows, at most ``slots`` per
    partition.  The estimates carry the standard MG bound (true count
    minus at most N_p/slots) and are themselves mergeable via
    :func:`mg_summary_reduce`; they are never reported as final counts
    — the exact rescan does that."""

    def _mg(batches):
        import pandas as pd

        counts: "pd.Series | None" = None
        for pdf in batches:
            bc = pdf[col].value_counts()
            counts = bc if counts is None else counts.add(bc, fill_value=0)
            if len(counts) > slots:
                counts = counts.sort_values(ascending=False)
                counts = counts.iloc[:slots] - counts.iloc[slots]
                counts = counts[counts > 0]
        if counts is None:
            yield pd.DataFrame({col: [], "cnt_est": []})
        else:
            yield pd.DataFrame(
                {col: counts.index, "cnt_est": counts.to_numpy("int64")}
            )

    return toks.mapInPandas(_mg, schema=f"{col} string, cnt_est long")


def mg_summary_reduce(
    summaries: DataFrame, col: str = "tok", slots: int = MG_SLOTS
) -> DataFrame:
    """Merge a pile of MG summaries — ``(col, cnt_est)`` rows from any
    number of partitions/micro-batches — into ONE summary of at most
    ``slots`` rows, DataFrame-side: sum estimates per key, then apply
    the PODS'12 reduction (subtract the (slots+1)-th largest total
    from all, keep positive).  Merging preserves the MG error bound
    over the COMBINED input, so the reduced summary still supersets
    every key with total count > N/slots — the property the streaming
    heavy-hitter state log relies on."""
    from pyspark.sql.window import Window as W

    summed = summaries.groupBy(col).agg(F.sum("cnt_est").alias("cnt_est"))
    rn = F.row_number().over(W.orderBy(F.col("cnt_est").desc(), F.col(col)))
    ranked = summed.withColumn("_rn", rn)
    thresh = (
        ranked.filter(F.col("_rn") == slots + 1)
        .select(F.col("cnt_est").alias("_th"))
    )
    return (
        ranked.filter(F.col("_rn") <= slots)
        .crossJoin(F.broadcast(thresh.unionByName(
            ranked.sparkSession.createDataFrame([(0,)], "_th long")
        ).agg(F.max("_th").alias("_th"))))
        .withColumn("cnt_est", F.col("cnt_est") - F.col("_th"))
        .filter(F.col("cnt_est") > 0)
        .select(col, "cnt_est")
    )


@query(
    "text_heavy_hitters",
    "sketches",
    _HH_ORACLE,
    doc="Corpus-wide heavy-hitter tokens (count*HH_K > corpus token "
    "count) via the production two-pass shape: pass 1 runs a mergeable "
    "Misra-Gries summary per partition (vectorized per Arrow batch — "
    "exact batch value_counts merged with the PODS'12 mergeable-"
    "summaries reduction), whose union is PROVABLY a superset of the "
    "true heavy hitters; pass 2 rescans only candidate tokens "
    "(broadcast semi-join) for exact counts and applies the exact "
    "integer threshold. The oracle is the plain GROUP BY + HAVING — "
    "the sketch only prunes, never decides. At 100 TB pass 1 touches "
    "every token once with O(slots) state per task and pass 2's "
    "group-by shuffles only candidate rows.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter((F.col("tok").isNotNull()) & (F.col("tok") != ""))
    )
    cands = mg_candidates(toks).distinct()
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * HH_K > F.col("n"))
        .select("tok", "cnt")
    )


# ---------------------------------------------------------------------------
# count-min sketch: point-frequency estimates, exact cross-engine
# ---------------------------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # counters per row

_CMS_SEEDS = ", ".join(f"({d})" for d in range(CMS_D))

_CMS_ORACLE = f"""
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        ) u WHERE tok <> ''
    ),
    seeds(d) AS (VALUES {_CMS_SEEDS}),
    cms AS (
        SELECT d,
               CAST(concat('0x', substr(md5(CAST(d AS VARCHAR) || tok), 1, 15))
                    AS BIGINT) % {CMS_W} AS cell,
               COUNT(*) AS c
        FROM toks CROSS JOIN seeds GROUP BY 1, 2
    ),
    topk AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
        ORDER BY cnt DESC, tok LIMIT 10
    )
    SELECT t.tok, t.cnt AS exact_cnt, MIN(m.c) AS est_cnt
    FROM topk t CROSS JOIN seeds s
    JOIN cms m
      ON m.d = s.d
     AND m.cell = CAST(concat('0x', substr(md5(CAST(s.d AS VARCHAR) || t.tok), 1, 15))
                       AS BIGINT) % {CMS_W}
    GROUP BY t.tok, t.cnt
"""


@query(
    "agg_countmin_sketch",
    "sketches",
    _CMS_ORACLE,
    doc="Count-min sketch over corpus tokens — point-frequency "
    "estimates from a fixed 4x1024 counter matrix: build explodes "
    "each token to its 4 (row, cell) coordinates (seeded 60-bit md5 "
    "hashes, the KMV convention, so both engines derive IDENTICAL "
    "cells) and one groupBy yields the <=4096-row matrix; a probe "
    "takes the min across rows, which never underestimates. The "
    "top-10 tokens' estimates are certified EXACTLY against DuckDB's "
    "replay of the same arithmetic — deterministic, unlike the "
    "tolerance-tested HLL rows. At 100 TB the matrix is a mergeable "
    "constant-size state (cells sum across shards) and the probe side "
    "is a broadcast join of the 4096-row table.",
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.operators.dedup import shingle_hash60

    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter((F.col("tok").isNotNull()) & (F.col("tok") != ""))
    )

    def cell(d: int, tok_col) -> "F.Column":
        return F.pmod(
            shingle_hash60(F.concat(F.lit(str(d)), tok_col)), F.lit(CMS_W)
        )

    coords = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cell(d, F.col("tok")).alias("cell")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("rc")
    ).select("rc.d", "rc.cell")
    cms = coords.groupBy("d", "cell").agg(F.count("*").alias("c"))

    topk = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(10)
    )
    probes = topk.select(
        "tok",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cell(d, F.col("tok")).alias("cell")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select("tok", "cnt", "rc.d", "rc.cell")
    return (
        probes.join(F.broadcast(cms), ["d", "cell"])
        .groupBy("tok", F.col("cnt").alias("exact_cnt"))
        .agg(F.min("c").alias("est_cnt"))
        .select("tok", "exact_cnt", "est_cnt")
    )
