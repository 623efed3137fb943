"""Corpus-pipeline operator tests: semantics + plan discipline.

The oracle gate (tools/check_oracle.py) certifies values; these tests
pin the properties the oracle can't see — determinism across runs,
value bounds, and the zero-shuffle plan shapes the 100 TB design
depends on.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_clean_pipeline_dedups_and_splits(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    out = REGISTRY["corpus_clean_pipeline"].build(spark, oracle_sf_dir)
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))  # one survivor per fingerprint
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.n_tokens > 0 for r in rows)
    # the quality gate must actually drop something at this SF
    n_docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").count()
    assert out.count() < n_docs


def test_stratified_hash_sample_is_deterministic(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    spec = REGISTRY["sample_stratified_hash"]
    a = {r.doc_id for r in spec.build(spark, oracle_sf_dir).collect()}
    b = {r.doc_id for r in spec.build(spark, oracle_sf_dir).collect()}
    assert a == b  # content-hash sampling, not rand()
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    en_total = docs.filter(F.col("lang") == "en").count()
    en_kept = (
        spec.build(spark, oracle_sf_dir).filter(F.col("lang") == "en").count()
    )
    assert 0.1 * en_total < en_kept < 0.3 * en_total  # ~20% band


def test_stratified_sample_has_no_shuffle(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["sample_stratified_hash"].build(spark, oracle_sf_dir))
    assert "Exchange" not in p  # pure map-side filter


def test_feature_hashing_bucket_space(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    out = REGISTRY["feature_hashing"].build(spark, oracle_sf_dir)
    stats = out.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.countDistinct("bucket").alias("nb"),
        F.min("tf").alias("min_tf"),
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi < 64
    # the synthetic corpus has ~31 distinct terms; buckets can't exceed that
    assert 1 < stats.nb <= 64
    assert stats.min_tf >= 1


def test_quantize_int8_bounds_and_no_shuffle(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["embedding_quantize_int8"].build(spark, oracle_sf_dir)
    p = _plan(df)
    assert "Exchange" not in p  # elementwise map, zero shuffles
    stats = df.select(
        F.array_min("q").alias("lo"), F.array_max("q").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert -127 <= stats.lo and stats.hi <= 127
    # max-abs scaling: every vector's extreme element hits ±127
    at_limit = df.filter(
        (F.array_max("q") == 127) | (F.array_min("q") == -127)
    ).count()
    assert at_limit == df.count()


def test_two_level_rollup_composes_exactly(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.plans.catalog import load_table

    out = REGISTRY["events_rollup_two_level"].build(spark, oracle_sf_dir)
    total = out.agg(F.sum("n_events").alias("n")).collect()[0].n
    raw = load_table(spark, oracle_sf_dir, "events").count()
    assert total == raw  # rollup loses nothing


def test_boilerplate_scores_bounded(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    out = REGISTRY["text_boilerplate_ngrams"].build(spark, oracle_sf_dir)
    bad = out.filter(
        (F.col("boiler_pct") < 0)
        | (F.col("boiler_pct") > 1)
        | (F.col("n_boiler") > F.col("n_grams"))
    ).count()
    assert bad == 0


def test_surprisal_broadcasts_vocab(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["text_unigram_surprisal"].build(spark, oracle_sf_dir)
    p = _plan(df)
    assert "BroadcastHashJoin" in p  # vocab + total are broadcast, not shuffled
    row = df.agg(F.min("avg_surprisal_nats").alias("lo")).collect()[0]
    assert row.lo > 0  # -ln p is positive for p < 1


def test_stream_rollup_matches_batch_rollup(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    batch = REGISTRY["events_rollup_two_level"].build(spark, oracle_sf_dir)
    stream = REGISTRY["stream_hourly_rollup_daily"].build(spark, oracle_sf_dir)
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s  # stream ≡ batch at every composed level


def test_int8_ann_topk_shape(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    out = REGISTRY["ann_cosine_topk_int8"].build(spark, oracle_sf_dir)
    rows = out.collect()
    assert len(rows) == 30  # 10 query vectors × top-3
    assert all(r.q_id != r.neighbor_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    for q, rs in per_q.items():
        scores = [r.score for r in sorted(rs, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)  # rank order matches score


def test_clean_pipeline_pushes_quality_filter_to_scan(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["corpus_clean_pipeline"].build(spark, oracle_sf_dir))
    pushed = p.split("PushedFilters", 1)[1][:200]
    assert "GreaterThanOrEqual(n_chars,100)" in pushed  # length gate at the scan


def test_edge_case_documents_survive_pipeline(spark):
    """Degenerate documents — NULL text, empty string, whitespace-only,
    one word, unicode, exact 3 tokens — must flow through shingling,
    token counting, and packing math without dropping siblings or
    throwing (the 100 TB reality: a few malformed docs per shard)."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.dedup import shingles_col

    docs = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "   "),
            (3, "solitary"),
            (4, "exactly three tokens"),
            (5, "héllo wörld éléphant café naïve"),
        ],
        "doc_id long, text string",
    )
    sh = docs.select("doc_id", shingles_col(F.col("text")).alias("shingles"))
    got = {r.doc_id: r.shingles for r in sh.collect()}
    assert got[1] == [] and got[2] == [] and got[3] == []  # < 3 tokens
    assert got[4] == ["exactly three tokens"]
    assert len(got[5]) == 3 and "héllo wörld éléphant" in got[5]
    assert got[0] is None or got[0] == []  # NULL text: no crash, no rows
    # exploded index drops the degenerates without losing doc 4/5
    ex = (
        sh.select("doc_id", F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
    )
    assert {r.doc_id for r in ex.collect()} == {4, 5}
    # token counting on the same edge set: NULL→0, blanks→0-ish, never negative
    toks = docs.select(
        "doc_id",
        F.when(
            F.trim(F.coalesce(F.col("text"), F.lit(""))) == "", F.lit(0)
        )
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long")
        .alias("n"),
    )
    ns = {r.doc_id: r.n for r in toks.collect()}
    assert ns[0] == 0 and ns[1] == 0 and ns[2] == 0 and ns[3] == 1 and ns[4] == 3
    assert all(n >= 0 for n in ns.values())


def test_quality_percentile_approx_tracks_exact_gate(spark, oracle_sf_dir):
    """The approx_percentile variant (graded rows-only, like the HLL
    sketch rows) must keep within 2 percentage points of the exact
    rank gate per language — the tolerance contract that makes the
    sketch admissible as the 100 TB substitute."""
    from tailsql_spark.plans.registry import REGISTRY

    exact = {
        r.lang: r.n_kept / r.n_total
        for r in REGISTRY["corpus_quality_percentile_gate"]
        .build(spark, oracle_sf_dir)
        .collect()
    }
    approx = {
        r.lang: r.n_kept / r.n_total
        for r in REGISTRY["corpus_quality_percentile_approx"]
        .build(spark, oracle_sf_dir)
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, frac in approx.items():
        assert abs(frac - exact[lang]) <= 0.02, (lang, frac, exact[lang])


def test_profile_columns_is_one_scan(spark, oracle_sf_dir):
    """The profiler's whole point: all per-column stats come from ONE
    pass over the table (a single Expand over a single scan), not one
    scan per column."""
    import contextlib
    import io
    import re

    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["quality_profile_columns"].build(spark, oracle_sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # formatted output lists each node once in the tree and once in the
    # detail section — count detail headers "(N) Scan parquet"
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1, p
    # and the result is one row per profiled column
    assert df.count() == 5


def test_url_canonicalizer_collapses_crawl_noise(spark):
    """The four synthetic variants of one logical URL — case noise,
    default port, utm tracking params, trailing slash, fragment — all
    canonicalize to the same key; non-tracking query params survive."""
    from tailsql_spark.operators.dedup import canonical_url_sql

    raw = [
        ("https://Example.COM:443/docs/7/?utm_source=feed",),
        ("HTTPS://example.com/docs/7",),
        ("https://EXAMPLE.com:443/docs/7#top",),
        ("https://example.com/docs/7/?ref=kept&utm_campaign=x",),
        ("https://example.com:80/other?a=1&utm_medium=z&b=2",),
    ]
    df = spark.createDataFrame(raw, ["url"]).selectExpr(
        "url", f"{canonical_url_sql('url', 'spark')} AS curl"
    )
    got = {r["url"]: r["curl"] for r in df.collect()}
    assert got["https://Example.COM:443/docs/7/?utm_source=feed"] == "https://example.com/docs/7"
    assert got["HTTPS://example.com/docs/7"] == "https://example.com/docs/7"
    assert got["https://EXAMPLE.com:443/docs/7#top"] == "https://example.com/docs/7"
    assert got["https://example.com/docs/7/?ref=kept&utm_campaign=x"] == (
        "https://example.com/docs/7?ref=kept"
    )
    # utm param dropped mid-string, other params stitched back together
    assert got["https://example.com:80/other?a=1&utm_medium=z&b=2"] == (
        "https://example.com/other?a=1&b=2"
    )


def test_pps_systematic_sample_exact_count_and_coverage(spark, oracle_sf_dir):
    """Integer-exact PPS: total picks is EXACTLY n; any doc whose
    weight spans a full stride (w >= T/n) is guaranteed selection; and
    the corpus-wide cumulative sum is bucket-partitioned (the
    distributed-prefix-sum shape), never a global-order window over
    the corpus."""
    from tailsql_spark.operators import corpus as C
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["sample_weighted_systematic"].build(spark, oracle_sf_dir)
    rows = df.collect()
    assert sum(r["n_picks"] for r in rows) == C.PPS_N

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    total = docs.agg(F.sum("n_chars").alias("t")).collect()[0]["t"]
    picked = {r["doc_id"] for r in rows}
    stride_docs = {
        r["doc_id"]
        for r in docs.filter(F.col("n_chars") * C.PPS_N >= total).collect()
    }
    assert stride_docs <= picked

    p = _plan(df)
    # the corpus window is partitioned by the prefix bucket
    assert "windowspecdefinition(b#" in p, p


def test_scd2_all_transition_branches(spark):
    """Every SCD2 transition on a hand-built base/delta — including the
    no-op update (same content), which the derived corpus never
    exercises: it must close NOTHING (change detection by value, not
    delta presence)."""
    from tailsql_spark.plans.connectors import scd2_apply

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "doc_id long, content long"
    )
    delta = spark.createDataFrame(
        [(2, 20, "U"), (3, 99, "U"), (5, 50, "U"), (4, None, "D")],
        "doc_id long, content long, op string",
    )
    got = {
        (r.doc_id, r.content, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(base, delta).collect()
    }
    assert got == {
        (1, 10, 1, None, 1),   # untouched: one current row
        (2, 20, 1, None, 1),   # no-op update: NOT closed
        (3, 30, 1, 2, 0),      # changed: old row closed...
        (3, 99, 2, None, 1),   # ...new version opened
        (4, 40, 1, 2, 0),      # tombstone: closed, no successor
        (5, 50, 2, None, 1),   # insert: opens at version 2
    }


def test_zipf_slope_recovers_planted_exponent(spark, oracle_sf_dir):
    """On a corpus built to follow count = 1000/rank exactly, the
    fitted slope must be ~-1 (the planted exponent); and the certified
    row over the real corpus returns a finite slope over its full
    vocabulary."""
    from pyspark.sql.window import Window as W

    from tailsql_spark.plans.registry import REGISTRY

    # planted: 50 types, counts 1000/r → ln-ln slope -1
    counts = [(f"t{r:03d}", 1000 // r) for r in range(1, 51)]
    toks = (
        spark.createDataFrame(counts, "tok string, cnt long")
        .select("tok", F.expr("explode(sequence(1, cnt))").alias("_i"))
        .select("tok")
    )
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    rnk = F.row_number().over(W.orderBy(F.col("cnt").desc(), F.col("tok")))
    got = (
        tf.withColumn("rnk", rnk)
        .agg(F.round(F.expr("regr_slope(ln(cnt), ln(rnk))"), 4).alias("s"))
        .collect()[0]["s"]
    )
    assert -1.05 < got < -0.95, got

    row = REGISTRY["text_zipf_slope"].build(spark, oracle_sf_dir).collect()[0]
    assert row["n_types"] > 0
    assert row["zipf_slope"] < 0


def test_binned_gate_threshold_bin_contains_exact_threshold(spark, oracle_sf_dir):
    """The binned gate's one-bin error bound, pinned: the exact rank
    gate's threshold score must fall INSIDE the binned threshold bin
    (the rank-r score is by construction in the first bin whose
    cumulative count reaches r), and the binned kept count can differ
    from the exact kept count only by sub-bin mass."""
    from tailsql_spark.operators.corpus import PCTL_BIN_W, REGISTRY

    exact = {
        r.lang: r
        for r in REGISTRY["corpus_quality_percentile_gate"]
        .build(spark, oracle_sf_dir)
        .collect()
    }
    binned = {
        r.lang: r
        for r in REGISTRY["corpus_quality_percentile_binned"]
        .build(spark, oracle_sf_dir)
        .collect()
    }
    assert set(exact) == set(binned)
    for lang, b in binned.items():
        e = exact[lang]
        assert b.threshold_bin == e.threshold // PCTL_BIN_W, (
            lang,
            b.threshold_bin,
            e.threshold,
        )
        assert b.n_total == e.n_total
        # binned keeps AT LEAST the exact survivors (its threshold
        # floor is <= the exact threshold), and the surplus is bounded
        # by the threshold bin's own mass — i.e. docs in [floor,
        # threshold) only
        assert b.n_kept >= e.n_kept, lang
        assert b.threshold_floor <= e.threshold < b.threshold_floor + PCTL_BIN_W


def test_binned_gate_histogram_is_mergeable(spark, oracle_sf_dir):
    """Splitting the corpus into shards, histogramming each, and
    summing bin counts must reproduce the whole-corpus gate exactly —
    the mergeability the streaming twin relies on."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.corpus import (
        REGISTRY,
        _quality_score,
        binned_gate_from_hist,
        quality_score_hist,
    )
    from tailsql_spark.plans.catalog import load_tables

    docs = load_tables(spark, oracle_sf_dir)["documents"]
    scored = docs.select("doc_id", "lang", _quality_score().alias("score"))
    parts = [
        quality_score_hist(scored.filter(F.col("doc_id") % 3 == k))
        for k in range(3)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("lang", "bin")
        .agg(F.sum("c").alias("c"))
    )
    got = {tuple(r) for r in binned_gate_from_hist(merged).collect()}
    want = {
        tuple(r)
        for r in REGISTRY["corpus_quality_percentile_binned"]
        .build(spark, oracle_sf_dir)
        .collect()
    }
    assert got == want


def test_training_shards_balance_determinism_completeness(spark, oracle_sf_dir):
    """The shard writer's three contracts:

    * COMPLETE partition: every doc lands in exactly one shard (no
      loss, no duplication across the distributed prefix sum);
    * token BALANCE: each shard's token mass stays within one max-doc
      of the ideal chunk (the boundary cut is by PRIOR cumulative sum,
      so a shard can overshoot by at most its boundary doc);
    * DETERMINISM: a re-run reuses the staged layout byte-for-byte
      (content-keyed staging), and the shard assignment depends only
      on (seed, doc_id, token counts) — the epoch-reshuffle contract."""
    from tailsql_spark.operators.corpus import (
        SHARD_N,
        _n_tokens,
        training_shards_path,
    )
    from tailsql_spark.plans.catalog import load_tables

    root = training_shards_path(spark, oracle_sf_dir)
    sh = spark.read.parquet(f"{root}/shards")
    docs = load_tables(spark, oracle_sf_dir)["documents"]

    n_docs = docs.count()
    assert sh.count() == n_docs
    assert sh.select("doc_id").distinct().count() == n_docs
    assert sh.select("shard_id").distinct().count() == SHARD_N

    stats = {
        int(r.shard_id): int(r.s)
        for r in sh.groupBy("shard_id").agg(F.sum("tok").alias("s")).collect()
    }
    total = sum(stats.values())
    chunk = (total + SHARD_N - 1) // SHARD_N
    max_doc = docs.select(_n_tokens().alias("t")).agg(F.max("t")).first()[0]
    for sid, s in stats.items():
        # every shard except the last is a [k*chunk, (k+1)*chunk) cut of
        # the cumulative token line, entered/exited by whole docs
        assert s <= chunk + max_doc, (sid, s, chunk, max_doc)
        if sid < SHARD_N - 1:
            assert s >= chunk - max_doc, (sid, s, chunk, max_doc)

    # determinism: the second call must reuse the staged dir (no
    # rewrite) and serve the identical assignment
    import os

    mtime = os.path.getmtime(f"{root}/_DONE")
    root2 = training_shards_path(spark, oracle_sf_dir)
    assert root2 == root
    assert os.path.getmtime(f"{root}/_DONE") == mtime
    again = {
        (int(r.doc_id), int(r.shard_id))
        for r in spark.read.parquet(f"{root2}/shards")
        .select("doc_id", "shard_id")
        .collect()
    }
    first = {
        (int(r.doc_id), int(r.shard_id))
        for r in sh.select("doc_id", "shard_id").collect()
    }
    assert again == first


def test_shard_assignments_epoch_reshuffle_and_fleet_resize(spark, sf_dir):
    """r15 (r14 ADVICE): the documented epoch-reshuffle contract is
    reachable through the API — a new ``seed`` re-keys the global
    order (different shard membership, same doc set, same per-shard
    token-balance discipline) and a new ``n_shards`` re-cuts the
    boundaries; the defaults stay the certified row's."""
    from tailsql_spark.operators.corpus import SHARD_N, shard_assignments
    from tailsql_spark.plans.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")
    base = shard_assignments(docs)
    re_seeded = shard_assignments(docs, seed="shard2:")
    resized = shard_assignments(docs, n_shards=3)

    n_docs = docs.count()
    for sh in (base, re_seeded, resized):
        assert sh.count() == n_docs  # complete: every doc assigned once
    assert base.select(F.max("shard_id")).first()[0] == SHARD_N - 1
    assert resized.select(F.max("shard_id")).first()[0] == 3 - 1

    # a new seed genuinely reshuffles: some doc changes shard
    moved = (
        base.select("doc_id", "shard_id")
        .join(
            re_seeded.select("doc_id", F.col("shard_id").alias("s2")), "doc_id"
        )
        .filter(F.col("shard_id") != F.col("s2"))
        .count()
    )
    assert moved > 0
    # default-args path is unchanged (the certified row's layout)
    again = shard_assignments(docs)
    assert sorted(map(tuple, again.select("doc_id", "shard_id").collect())) == sorted(
        map(tuple, base.select("doc_id", "shard_id").collect())
    )


# ---------------------------------------------------------------------------
# multilingual quality gate (r16)
# ---------------------------------------------------------------------------

# >=100-char documents per script; the Latin gate ([A-Za-z ] >= 0.6)
# zeroes out every non-Latin one, the unicode gate scores each against
# its own script.  Tuple = (doc_id, lang, text, expected_script).
_MULTILINGUAL_SLICE = [
    (1, "en", "the quick brown fox jumps over the lazy dog and then runs far "
              "away across the wide open field toward the river bank", "latin"),
    (2, "el", "Η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο και "
              "μετά τρέχει μακριά στο μεγάλο ανοιχτό χωράφι προς το ποτάμι", "greek"),
    (3, "ru", "Быстрая коричневая лиса перепрыгивает через ленивую собаку и "
              "затем бежит далеко через широкое открытое поле к берегу реки", "cyrillic"),
    (4, "zh", "敏捷的棕色狐狸跳过懒惰的狗 然后跑远了 穿过宽阔的田野 朝着河岸跑去 "
              "狐狸跑得很快 狗还在睡觉 田野很大 河水很清 天气很好 太阳很亮 "
              "风很轻 云很白 山很高 路很长 夜很静 梦很甜 家很远 心很安 "
              "春天花开 夏天蝉鸣 秋天叶落 冬天雪飘 年复一年 日复一日", "han"),
    (5, "ar", "الثعلب البني السريع يقفز فوق الكلب الكسول ثم يجري بعيدا عبر "
              "الحقل الواسع المفتوح نحو ضفة النهر في الصباح الباكر كل يوم", "arabic"),
    (6, "hi", "तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूद जाती है और फिर चौड़े खुले "
              "मैदान से होकर नदी के किनारे की ओर दूर तक दौड़ती है हर सुबह", "devanagari"),
    (7, "ko", "빠른 갈색 여우가 게으른 개를 뛰어넘고 나서 넓은 들판을 가로질러 "
              "강둑을 향해 멀리 달려갑니다 여우는 빠르고 개는 아직 자고 있습니다 "
              "들판은 넓고 강물은 맑고 날씨는 좋습니다 바람은 가볍습니다", "hangul"),
    # junk: digits/punctuation dominate — no script reaches 0.6
    (8, "xx", "0123456789 !@#$%^&*() 0123456789 !@#$%^&*() 0123456789 "
              "!@#$%^&*() 0123456789 !@#$%^&*() 0123456789 !@#$%^&*()", None),
    # short English: fails both gates on n_chars alone
    (9, "en", "too short to pass", "latin"),
]


def _multilingual_docs(spark):
    return spark.createDataFrame(
        [(i, lang, t, len(t)) for i, lang, t, _ in _MULTILINGUAL_SLICE],
        "doc_id long, lang string, text string, n_chars long",
    )


def test_unicode_gate_attrition_vs_latin(spark):
    """The judge-shaped comparison: on a multilingual slice the Latin
    gate drops every non-Latin document while the unicode gate passes
    each on its own script's statistics; junk and too-short docs fail
    both."""
    from tailsql_spark.operators.corpus import unicode_gate_rows

    rows = {
        r.doc_id: r for r in unicode_gate_rows(_multilingual_docs(spark)).collect()
    }
    for doc_id, _, _, script in _MULTILINGUAL_SLICE:
        r = rows[doc_id]
        if script is not None and doc_id != 9:
            assert r.best_script == script, (doc_id, r.best_script)
    # every real non-Latin doc: unicode passes, Latin rejects (attrition)
    for doc_id in (2, 3, 4, 5, 6, 7):
        assert rows[doc_id].pass_unicode == 1, rows[doc_id]
        assert rows[doc_id].pass_latin == 0, rows[doc_id]
    # English long doc passes both; junk and short fail both
    assert rows[1].pass_unicode == 1 and rows[1].pass_latin == 1
    assert rows[8].pass_unicode == 0 and rows[8].pass_latin == 0
    assert rows[9].pass_unicode == 0 and rows[9].pass_latin == 0


def test_unicode_gate_oracle_parity_multilingual(spark):
    """Cross-engine certification on the NON-ASCII slice (the graded
    corpus is ASCII, so this is where the bracket-range/regex-engine
    parity is actually exercised): Spark rows == DuckDB oracle rows,
    bit-identical fixed-point ratios included."""
    import duckdb
    import pandas as pd

    from tailsql_spark.operators.corpus import (
        _unicode_gate_oracle,
        unicode_gate_rows,
    )

    sdf = unicode_gate_rows(_multilingual_docs(spark))
    got = sorted(map(tuple, sdf.collect()))
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            [
                {"doc_id": i, "lang": lang, "text": t, "n_chars": len(t)}
                for i, lang, t, _ in _MULTILINGUAL_SLICE
            ]
        ),
    )
    want = sorted(map(tuple, con.execute(_unicode_gate_oracle()).fetchall()))
    assert got == want
