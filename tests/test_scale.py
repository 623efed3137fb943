"""Scale-discipline tests: the plan properties that matter at 100 TB.

These assert the *physical plan shapes* — pushdown, pruning, broadcast,
top-k, bucketed co-location — so a regression that silently de-optimizes
a query fails CI, not a cluster bill.
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


def _runtime_ops(df) -> list[str]:
    """Node names of the physical operators that execute PER QUERY.

    Walks the executed plan via the JVM tree, where InMemoryTableScan is
    a leaf — the cached relation's stored plan runs once at cache
    populate, not per query, yet explain() text inlines it (and AQE
    prints it twice: current + initial plan), so substring counts
    over-report.  This walk reflects what actually runs."""
    out: list[str] = []

    def walk(node):
        out.append(node.nodeName())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_q1_filter_pushdown_and_pruning(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["q1_pricing_summary"].build(spark, oracle_sf_dir))
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: the scan must not read unused columns
    read_schema = p.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_star_join_broadcasts_dimensions(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["join_star_5way"].build(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 3


def test_topk_uses_take_ordered(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["q3_shipping_priority"].build(spark, oracle_sf_dir))
    assert "TakeOrderedAndProject" in p  # no global sort for ORDER BY+LIMIT


def test_partitioned_write_prunes(spark, oracle_sf_dir, tmp_path):
    """Hive-style partitioned layout: a partition filter must prune at
    planning time (the 100 TB idiom: partition by time bucket)."""
    from tailsql_spark.plans.catalog import load_table

    events = load_table(spark, oracle_sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    n_all = spark.read.parquet(out).count()
    n_day = back.count()
    assert 0 < n_day < n_all
    p = _plan(back)
    # partition filter handled by the catalog, not the row scan
    assert "day" in p.split("PartitionFilters", 1)[1][:200]


def test_bucketed_join_skips_shuffle(spark, oracle_sf_dir, tmp_path):
    """bucketBy co-location: a join on the bucket key needs NO exchange
    on either side — the petabyte-join idiom."""
    from tailsql_spark.plans.catalog import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, oracle_sf_dir, "orders")
        customer = load_table(spark, oracle_sf_dir, "customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("b_orders")
        )
        (
            customer.withColumnRenamed("c_custkey", "o_custkey")
            .write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("b_customer")
        )
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        p = _plan(joined)
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "Exchange" not in p, p  # co-located: zero shuffle
        # sanity: result matches the unbucketed join
        n = joined.count()
        n_plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert n == n_plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_aqe_enabled_defaults(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_q8_broadcasts_every_dimension(spark, oracle_sf_dir):
    """Q8's 8-way join: part/supplier/nation×2/region are broadcast;
    only the fact-fact joins (lineitem-orders-customer) may shuffle."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["q8_market_share"].build(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p


def test_q17_decorrelated_single_agg_scan(spark, oracle_sf_dir):
    """The correlated-AVG is rewritten as one grouped scan joined back
    on the part key — no nested-loop re-aggregation per outer row."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["q17_small_qty_revenue"].build(spark, oracle_sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q21_semi_anti_joins(spark, oracle_sf_dir):
    """EXISTS / NOT EXISTS self-joins must decorrelate to semi / anti
    hash joins, never nested-loop subquery execution."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["q21_waiting_supplier"].build(spark, oracle_sf_dir))
    low = p.lower()
    assert "leftsemi" in low or "left semi" in low
    assert "leftanti" in low or "left anti" in low
    assert "CartesianProduct" not in p


def test_minhash_pipeline_no_quadratic_stage(spark, oracle_sf_dir):
    """The LSH pipeline must stay linear+equi-join: no cartesian or
    nested-loop stage may appear even though it self-joins twice."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["dedup_minhash_lsh"].build(spark, oracle_sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_embedding_lsh_verified_no_quadratic_stage(spark, oracle_sf_dir):
    """The scale-safe embedding near-dup (sign-LSH candidates →
    exact-cosine verify) must contain no all-pairs stage — that is the
    whole point vs dedup_embedding_cosine."""
    from tailsql_spark.plans.registry import REGISTRY

    # AQE's AdaptiveSparkPlan wrapper is childless until execution —
    # disable it for this plan-shape probe so the tree walk sees the
    # real operators (the production default stays on, test_aqe_*).
    from tailsql_spark.operators.similarity import _verified_pairs

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    caches = ()
    try:
        # the cached builder (not the registered build, which returns a
        # materialized scan): the per-query plan must read the bucket
        # cache on both self-join sides
        df, caches = _verified_pairs(spark, oracle_sf_dir)
        ops = _runtime_ops(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for frame in caches:
            frame.unpersist()
    # The O(n·L·d) plane fan-out (the one legal nested-loop: vs the
    # CONSTANT 16-row plane broadcast) lives inside the persisted bucket
    # table and is computed ONCE at cache populate — the per-query plan
    # must therefore contain ZERO nested-loop or cartesian stages: the
    # self-join reads the cache, and candidate bucketing plus the two
    # cosine-verify joins are all hash equi-joins.
    assert sum("InMemoryTableScan" in o for o in ops) >= 2, ops
    assert not any("BroadcastNestedLoopJoin" in o for o in ops), ops
    assert not any("CartesianProduct" in o for o in ops), ops


def test_repetition_score_is_pure_map(spark, oracle_sf_dir):
    """Intra-doc repetition is a projection: ZERO exchanges — the plan
    must be scan → project, whole-stage fused."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["text_repetition_score"].build(spark, oracle_sf_dir))
    assert "Exchange" not in p, p


def test_contamination_no_quadratic_stage(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["text_contamination_overlap"].build(spark, oracle_sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_format_raw_lines_is_pure_map(spark, oracle_sf_dir):
    """Executor-side formatting is a projection over the scan: ZERO
    exchanges — formatted output must never funnel through a shuffle
    (or, at cluster scale, the driver)."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["sink_format_raw_lines"].build(spark, oracle_sf_dir))
    assert "Exchange" not in p, p


def test_pack_sequences_single_shuffle(spark, oracle_sf_dir):
    """Sequence packing = window cumsum partitioned by lang + groupBy on
    (lang, bin): the groupBy keys are a superset of the window
    partition, so ONE exchange serves both — a second would mean the
    packing re-shuffles the corpus."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["corpus_pack_sequences"].build(spark, oracle_sf_dir))
    import re

    n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", p)))
    assert n_exchanges == 1, p


def test_lsh_band_broadcast_size_gated(spark, oracle_sf_dir):
    """The minhash band-table broadcast hint must follow the plan-time
    size gate: hinted under the threshold, shuffled equi-join above it
    (round-1 verdict #6)."""
    from tailsql_spark.operators import dedup

    sh = dedup.doc_shingles(spark, oracle_sf_dir)
    ex = sh.select("doc_id", F.explode_outer("shingles").alias("s")).filter(
        F.col("s").isNotNull()
    )
    sig = dedup.minhash_signatures(ex)
    hinted = _plan(dedup.lsh_candidate_pairs(sig, hint_broadcast=True))
    # The un-hinted branch must be probed with auto-broadcast OFF:
    # at sf0.01 the band table is under Spark's 10 MB
    # autoBroadcastJoinThreshold, so the optimizer would broadcast it
    # anyway and mask the gate (round-2 verdict: test bug, not product
    # bug). -1 disables the size-based auto choice, leaving only hints.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unhinted = _plan(dedup.lsh_candidate_pairs(sig, hint_broadcast=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in hinted
    assert "BroadcastHashJoin" not in unhinted  # falls back to shuffled join
    assert "CartesianProduct" not in unhinted
    # and the gate itself: sf0.01 documents are far below the threshold
    assert dedup._small_input(oracle_sf_dir) is True


def test_minhash_shuffled_branch_differential(spark, oracle_sf_dir):
    """The big-data (non-broadcast) MinHash branch must produce
    HASH-IDENTICAL results to the broadcast branch — not just the right
    plan shape (round-4 verdict #1: a result-divergence bug in the
    shuffled branch would ship to exactly the 100 TB users).  The
    shuffled variant pins its strategy with shuffle_hash hints so the
    optimizer cannot silently auto-broadcast at test scale."""
    from tailsql_spark.plans.registry import REGISTRY

    bcast = REGISTRY["dedup_minhash_lsh"].build(spark, oracle_sf_dir)
    shuf = REGISTRY["dedup_minhash_lsh_shuffled"].build(spark, oracle_sf_dir)
    # r17: the build materializes-and-releases its caches (guide §5),
    # so the executed DATAFLOW's shape is read from the plan twin
    p = _plan(REGISTRY["dedup_minhash_lsh_shuffled"].plan(spark, oracle_sf_dir))
    # the band self-join and shingle verification run shuffled...
    assert "ShuffledHashJoin" in p, p
    # ...while the collision-sized candidate set still broadcasts (that
    # hint is unconditional by design — it is tiny at any corpus size)
    rows_b = sorted(map(tuple, bcast.collect()))
    rows_s = sorted(map(tuple, shuf.collect()))
    assert rows_b == rows_s
    assert len(rows_b) > 0  # planted dups exist at every SF


def test_sink_partitioned_parquet_prunes(spark, oracle_sf_dir):
    """The certified partitioned-sink query's year predicate must be a
    PartitionFilter (directory pruning) — not a row-level filter over a
    full scan. This pins the plan the graded row relies on."""
    from tailsql_spark.plans.connectors import partitioned_orders_scan

    back = partitioned_orders_scan(spark, oracle_sf_dir).filter(F.col("o_year") == 1996)
    p = _plan(back)
    assert "o_year" in p.split("PartitionFilters", 1)[1][:200]
    # the partition column is not read from row data: it's absent from
    # the ReadSchema struct (it materializes from directory values)
    read_struct = p.split("ReadSchema", 1)[1].split(">", 1)[0]
    assert "o_year" not in read_struct


def test_logreg_steps_broadcast_weights(spark, oracle_sf_dir):
    """Every GD step must broadcast the 1-row weight table against the
    feature scan (never shuffle the corpus against it), and nothing in
    the plan may shuffle the corpus at all: gradients are plain
    partial-aggregated sums."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["quality_logreg_train"].build(spark, oracle_sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "Exchange hashpartitioning" not in p, p


def test_dsir_logratio_table_broadcasts(spark, oracle_sf_dir):
    """The token stream must join the <=10k-row log-ratio table as a
    broadcast — a shuffled join here would re-shuffle the whole corpus
    on the bucket id."""
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["sample_importance_dsir"].build(spark, oracle_sf_dir)
    p = _plan(df)
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p


def test_pq_scoring_broadcasts_lut(spark, oracle_sf_dir):
    """PQ/ADC query scoring: codebook and LUT joins must broadcast; the
    corpus-sized codes table is only ever grouped, never cross-joined."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["ann_pq_adc_topk"].build(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_substring_spans_no_quadratic_stage(spark, oracle_sf_dir):
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["dedup_substring_spans"].build(spark, oracle_sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pq_kmeans_training_stays_broadcast_shaped(spark, oracle_sf_dir):
    """Every Lloyd step of the trained-PQ build must join the corpus
    against a BROADCAST codebook (M×K rows) — the corpus is never
    shuffled against centroids — and ADC scoring keeps the broadcast
    LUT; no quadratic stage anywhere in the composed plan.  Inspects
    the COMPUTATION plan (the registry query materializes its result
    and returns a parquet-backed frame, whose plan is just a scan)."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["ann_pq_kmeans_topk"].plan(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ivfpq_stack_plan_shape(spark, oracle_sf_dir):
    """The composed IVF-PQ stack: probe table and ADC LUT broadcast,
    candidates reach scoring through equi-joins only — no cartesian
    anywhere in the full learned-cells + trained-codebooks plan.  The
    constant-side nested loops (8-centroid probe fan-out, 1-row
    count/weights broadcasts of the Lloyd chains) are the documented
    legal ones."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["ann_ivfpq_topk"].plan(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 4, p
    assert "CartesianProduct" not in p


def test_kmeans_multiprobe_probe_table_broadcasts(spark, oracle_sf_dir):
    """Learned-cell multiprobe: the |Q|×N_PROBES probe table must
    broadcast into the cell equi-join (the corpus side is probed in
    place); the only nested-loop allowed is the constant 8-centroid
    probe fan-out."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["ann_ivf_kmeans_multiprobe_topk"].plan(spark, oracle_sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_certified_bucketed_join_is_exchange_free(spark, oracle_sf_dir):
    """join_bucketed_colocated's contract: both sides bucketed on the
    join key → the join itself needs NO exchange (the only one in the
    whole plan is the final groupBy's), and the scans are bucketed.
    The in-bucket sort remains — Spark ≥3.0 ignores bucket sort order
    on read unless the legacy outputOrdering flag is set
    (SPARK-28632); it is linear per bucket, not a shuffle."""
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["join_bucketed_colocated"].build(spark, oracle_sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p, p       # the hinted merge join compiled
    assert "Bucketed: true" in p, p      # both scans read the bucket layout
    assert p.count("Exchange") == 1, p   # only the final aggregation's
    assert "Exchange" not in p.split("SortMergeJoin", 1)[1], p  # join inputs


def test_compaction_collapses_small_files(spark, oracle_sf_dir):
    """sink_compact_small_files' contract: the fragmented staging leaves
    many files per day partition; compaction leaves exactly ONE, with
    every row preserved (row preservation is also oracle-certified)."""
    import glob
    import os

    from tailsql_spark.plans.connectors import (
        _stage_dir,
        _staged_fragmented_events,
        compact_partitions,
    )

    frag = _staged_fragmented_events(spark, oracle_sf_dir)
    dest = _stage_dir(oracle_sf_dir, "compact_events_test")
    back = compact_partitions(spark, frag, dest)

    def files_per_day(root: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for d in os.listdir(root):
            if d.startswith("day="):
                out[d] = len(glob.glob(f"{root}/{d}/*.parquet"))
        return out

    before, after = files_per_day(frag), files_per_day(dest)
    assert before.keys() == after.keys() and len(after) > 0
    assert max(before.values()) > 1          # staging really fragmented
    assert set(after.values()) == {1}, after  # one file per partition
    assert back.count() == spark.read.parquet(frag).count()


def test_exact_similarity_pair_join_input_is_df_capped(spark, oracle_sf_dir):
    """The posting-list self-joins in dedup_ngram_jaccard /
    dedup_containment must consume the DF-CAPPED index: a broadcast
    LEFT-ANTI prune of hot grams sits upstream of the pair join
    (round-5 verdict #1 — without it one boilerplate shingle shared by
    D docs emits D² pair rows, which AQE cannot reduce)."""
    from tailsql_spark.plans.registry import REGISTRY

    for name in ("dedup_ngram_jaccard", "dedup_containment"):
        # the registry build materializes (parquet-scan plan); audit
        # the computation via the spec's plan builder
        p = _plan(REGISTRY[name].plan(spark, oracle_sf_dir))
        low = p.lower()
        # the hot-gram prune: a broadcast build feeding a left-anti join
        assert "leftanti" in low or "left anti" in low, (name, p)
        assert "BroadcastHashJoin" in p, (name, p)
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_bloom_probe_stream_never_shuffles(spark, oracle_sf_dir):
    """The Bloom probe's contract: the corpus-side gram stream is
    pruned by broadcast word-table joins BEFORE any shuffle — the
    probed stream itself must contain zero hash-partition exchanges
    (the survivors' distinct afterwards is the first shuffle)."""
    from pyspark.sql import functions as SF

    from tailsql_spark.operators import sketches as S
    from tailsql_spark.operators.textstats import contam_gram_arr, contam_is_test
    from tailsql_spark.plans.catalog import load_documents_sized

    docs = load_documents_sized(spark, oracle_sf_dir).select(
        "doc_id", contam_is_test().alias("is_test"), SF.col("text")
    )
    test_grams = (
        docs.filter(SF.col("is_test"))
        .select(SF.explode_outer(contam_gram_arr()).alias("g"))
        .filter(SF.col("g").isNotNull())
        .distinct()
    )
    sketch = S.bloom_build(test_grams, "g")
    train = (
        docs.filter(~SF.col("is_test"))
        .select(SF.explode_outer(contam_gram_arr()).alias("g"))
        .filter(SF.col("g").isNotNull())
    )
    p = _plan(S.bloom_probe(train, "g", sketch))
    probe_section = p.split("== Physical Plan ==", 1)[-1]
    # the sketch build itself aggregates (one exchange); the PROBE path
    # over the train stream must only broadcast — count hash exchanges
    # and require they all belong to the word-table build side
    # blocked layout: exactly one broadcast join probes the one word
    # the item's k bits live in
    assert probe_section.count("BroadcastHashJoin") >= 1, p
    import re

    # every hashpartitioning exchange must sit under a BroadcastExchange
    # build (word table aggregation), never on the probe stream: the
    # probe stream's lineage (text scan → explode) contains none.
    n_hash_ex = len(re.findall(r"Exchange hashpartitioning", probe_section))
    n_bcast = len(re.findall(r"BroadcastExchange", probe_section))
    assert n_bcast >= 1, p
    assert n_hash_ex <= n_bcast, p


def test_df_cap_kills_boilerplate_pair_blowup(spark):
    """Behavioral proof of the cap: a gram planted in 100 > DF_CAP docs
    produces ZERO pairs (uncapped it would emit 4 950), while two docs
    sharing only RARE grams still pair."""
    from pyspark.sql import functions as SF

    from tailsql_spark.operators import dedup

    boiler = "all rights reserved legal notice"  # 5 tokens → 3 shingles
    rare = "quick brown fox jumps high"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(100)] + [(1000, rare), (1001, rare)],
        "doc_id long, text string",
    )
    sh = docs.select("doc_id", dedup.shingles_col(SF.col("text")).alias("shingles"))
    kept, sizes, ex_cache = dedup.capped_posting_index(sh)
    # every boilerplate gram (df=100) is pruned; rare grams survive
    assert kept.filter(SF.col("doc_id") < 100).count() == 0
    assert kept.filter(SF.col("doc_id") >= 1000).count() > 0
    pairs = dedup.ngram_jaccard_from_shingles(sh).collect()
    ex_cache.unpersist()
    assert sorted((r.id_a, r.id_b) for r in pairs) == [(1000, 1001)]
    # the SAME capped builder is dedup_minhash_recall's ground truth
    # (r7 verdict: the audit metric's truth join must not mint D² pairs
    # from one boilerplate shingle) — prove the cap holds at the
    # recall threshold too
    truth = dedup.ngram_jaccard_from_shingles(
        sh, threshold=dedup.JACCARD_THRESHOLD
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in truth) == [(1000, 1001)]


def test_minhash_recall_zero_truth_guard(spark, tmp_path):
    """r7 ADVICE: on a corpus with NO true pairs at the Jaccard
    threshold the recall metric must report a DEFINED vacuous 1.0 —
    not a NULL from a 0/0 division (the oracle guards identically, so
    certification holds on degenerate inputs)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tailsql_spark.plans.registry import REGISTRY

    sf = str(tmp_path / "sfnodup")
    shutil.copytree("/root/testdata/sf0.001", sf)
    t = pq.read_table(f"{sf}/documents.parquet")
    texts = pa.array(
        [
            f"wholly unique text {i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
            for i in range(t.num_rows)
        ]
    )
    t = t.set_column(t.schema.get_field_index("text"), "text", texts)
    pq.write_table(t, f"{sf}/documents.parquet")

    r = REGISTRY["dedup_minhash_recall"].build(spark, sf).collect()[0]
    assert r.n_truth == 0
    assert r.recall == 1.0


def test_sorted_layout_rowgroup_stats_enable_skipping(spark, oracle_sf_dir):
    """sink_sorted_rowgroup_skipping's contract: the sorted write
    yields files with MANY row groups whose l_shipdate min/max ranges
    are ordered and (near-)disjoint, so a date range matches only a
    strict subset of row groups — and the range predicate is pushed to
    the scan. Unsorted data would give every row group ~the full date
    span and zero skipping."""
    import glob

    import pyarrow.parquet as pq

    from tailsql_spark.plans.connectors import sorted_lineitem_path
    from tailsql_spark.plans.registry import REGISTRY

    path = sorted_lineitem_path(spark, oracle_sf_dir)
    files = glob.glob(f"{path}/*.parquet")
    assert files
    total_rgs = matching = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        spans = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["l_shipdate"]).statistics
            spans.append((st.min, st.max))
        total_rgs += len(spans)
        # sorted within the file: each row group starts at or after
        # the previous one's max
        assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)), f
        import datetime

        d97, d98 = datetime.date(1997, 1, 1), datetime.date(1998, 1, 1)
        matching += sum(1 for lo, hi in spans if hi >= d97 and lo < d98)
    assert total_rgs >= 8, total_rgs        # row groups exist to skip
    assert 0 < matching < total_rgs         # the range skips most of them
    p = _plan(REGISTRY["sink_sorted_rowgroup_skipping"].build(spark, oracle_sf_dir))
    assert "l_shipdate" in p.split("PushedFilters", 1)[1][:300], p


# ---------------------------------------------------------------------------
# ANN index QUALITY floors: recall regressions must fail CI, not ship
# ---------------------------------------------------------------------------

def _mean_recall(df) -> float:
    rows = df.collect()
    assert rows, "recall frame is empty"
    return sum(r.recall for r in rows) / len(rows)


def test_learned_ivf_recall_floor(spark, oracle_sf_dir):
    """The certified recall metric gains a QUALITY gate: the oracle only
    proves Spark and DuckDB compute the same recall — a seed or probe
    change could degrade the index with every hash still matching.
    Measured 0.80 at sf0.01; floor at 0.7."""
    from tailsql_spark.plans.registry import REGISTRY

    mean = _mean_recall(REGISTRY["ann_ivf_recall_at_k"].build(spark, oracle_sf_dir))
    assert mean >= 0.7, f"learned-IVF recall@3 degraded: {mean:.3f} < 0.7"


def test_multiprobe_recall_at_least_own_cell(spark, oracle_sf_dir):
    """Multiprobe's candidate set is a superset of own-cell IVF's (probe
    1 is provably the query's own cell), so its recall can never be
    lower — if it is, the probe selection broke."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.similarity import (
        RECALL_K,
        _kmeans_multiprobe_ranked,
        _recall_vs_brute,
    )
    from tailsql_spark.plans.registry import REGISTRY

    ivf = _mean_recall(REGISTRY["ann_ivf_recall_at_k"].build(spark, oracle_sf_dir))
    mp3 = (
        _kmeans_multiprobe_ranked(spark, oracle_sf_dir, cache=False)[0]
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    mp = _mean_recall(_recall_vs_brute(spark, oracle_sf_dir, mp3))
    assert mp >= ivf, f"multiprobe recall {mp:.3f} < own-cell IVF {ivf:.3f}"
    assert mp >= 0.7, f"multiprobe recall@3 degraded: {mp:.3f} < 0.7"


def test_recall_gate_fires_on_degraded_index(spark, oracle_sf_dir):
    """Prove the floor can FAIL: feed the shared recall metric a
    deliberately degraded index (the brute-force *worst* 3 neighbors
    per query — what a broken distance or seed collapse produces) and
    assert the measured recall lands far below the floor.  Guards
    against the metric being vacuously 1.0."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from tailsql_spark.operators.similarity import (
        RECALL_K,
        _recall_vs_brute,
        _scored,
    )

    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").asc(), F.col("neighbor_id").desc()
    )
    worst3 = (
        _scored(spark, oracle_sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    degraded = _mean_recall(_recall_vs_brute(spark, oracle_sf_dir, worst3))
    assert degraded < 0.3, f"degraded index scored {degraded:.3f} — gate is vacuous"


def test_ivfpq_recall_recovers_on_structured_corpus(spark, oracle_sf_dir):
    """The r6 diagnosis, now a gate: the same compressed IVF-PQ stack
    that lands ~0.17 on noise-floor cosines must land ≥ 0.6 on the
    planted-group corpus (measured 0.967 at sf0.01) — quantization
    loses noise-floor rankings, not separable structure.  If this
    floor fires while the unstructured metric is unchanged, the index
    pipeline itself regressed."""
    from tailsql_spark.plans.registry import REGISTRY

    mean = _mean_recall(
        REGISTRY["ann_ivfpq_recall_structured"].build(spark, oracle_sf_dir)
    )
    assert mean >= 0.6, f"IVF-PQ structured recall degraded: {mean:.3f} < 0.6"


def test_zorder_layout_prunes_both_dimensions(spark, oracle_sf_dir):
    """sink_zorder_skipping's contract: the Z-sorted layout gives every
    row group a tight bounding box in (custkey, day) space, so a range
    predicate on EITHER dimension matches a strict subset of row groups
    — the property single-column sorting provides for one dimension
    only.  Verified straight from the parquet footers."""
    import glob

    import pyarrow.parquet as pq

    from tailsql_spark.plans.connectors import zorder_orders_path

    path = zorder_orders_path(spark, oracle_sf_dir)
    files = glob.glob(f"{path}/*.parquet")
    assert files
    spans: dict[str, list] = {"ck": [], "d": []}
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            for col in ("ck", "d"):
                st = md.row_group(rg).column(idx[col]).statistics
                spans[col].append((st.min, st.max))
    total = len(spans["ck"])
    assert total >= 8, total  # row groups exist to skip
    # the certified query's box predicate, dimension by dimension
    ck_hit = sum(1 for lo, hi in spans["ck"] if hi >= 100 and lo < 200)
    d_hit = sum(1 for lo, hi in spans["d"] if hi >= 1000 and lo < 1400)
    assert 0 < ck_hit < total, (ck_hit, total)  # custkey range prunes
    assert 0 < d_hit < total, (d_hit, total)    # date range prunes TOO


def test_manifest_pruning_reads_strict_file_subset(spark, oracle_sf_dir):
    """sink_manifest_file_pruning's contract: the manifest consultation
    hands the scan a STRICT subset of the staged files (file-level
    skipping), and the pruned read still returns exactly the rows the
    full scan's predicate keeps."""
    import datetime

    from tailsql_spark.plans.connectors import (
        manifest_orders_path,
        orders_file_manifest,
    )

    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 7, 1)
    manifest = orders_file_manifest(spark, oracle_sf_dir).collect()
    n_total = len(manifest)
    surviving = [r for r in manifest if r.max_date >= lo and r.min_date < hi]
    assert n_total >= 8, n_total
    assert 0 < len(surviving) < n_total, (len(surviving), n_total)
    # correctness of the pruning rule: rows outside surviving files
    # cannot satisfy the predicate
    full = spark.read.parquet(manifest_orders_path(spark, oracle_sf_dir))
    n_pred = full.filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
    ).count()
    pruned = spark.read.parquet(*[r.file for r in surviving])
    n_pruned = pruned.filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
    ).count()
    assert n_pred == n_pruned > 0


def test_manifest_pruning_empty_window_returns_empty(spark, oracle_sf_dir):
    """r7 ADVICE: a predicate window no manifest entry overlaps must
    short-circuit to the empty aggregate the oracle would produce —
    not throw on the zero-path variadic reader."""
    import datetime

    from tailsql_spark.plans.connectors import manifest_pruned_orders

    out = manifest_pruned_orders(
        spark, oracle_sf_dir, datetime.date(2050, 1, 1), datetime.date(2050, 7, 1)
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "o_orderstatus",
        "n",
        "sum_price_cents",
    ]


def test_cache_using_queries_release_their_persists(spark, oracle_sf_dir):
    """The materialize-and-release discipline as a gate: every query
    that persists intermediate frames must UNPERSIST them before
    returning (its result reads materialized parquet, not cached
    lineage).  A leak here is a session-lifetime memory hold that
    compounds across a long-lived service running the registry — the
    exact class the r7 sign-LSH fix closed."""
    from tailsql_spark.plans.registry import REGISTRY

    CACHE_USERS = [
        "text_bpe_train",
        "text_contamination_bloom",
        "ann_signlsh_bucket_pairs",
        "dedup_embedding_lsh_verified",
        "graph_triangle_counts",
        "ann_ivfpq_topk",
    ]

    def n_persisted() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    spark.catalog.clearCache()
    # settle the baseline deterministically: earlier tests' plain cached
    # stragglers are safe to unpersist.  localCheckpoint-backed RDDs are
    # SKIPPED (r9 ADVICE): a locally-checkpointed RDD cannot be
    # recomputed, so blanket-unpersisting one that a session-lifetime
    # frame still references would break that frame on later access.
    # connected_components now releases its superseded rounds itself,
    # so the only checkpointed leftovers are FINAL fixpoints of earlier
    # tests' frames — those stay, and the gate below is a DELTA check
    # against the settled baseline rather than an absolute zero.
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        if not rdd.rdd().isLocallyCheckpointed():
            rdd.unpersist()
    base = n_persisted()
    for name in CACHE_USERS:
        REGISTRY[name].build(spark, oracle_sf_dir)
        # <= not ==: the async ContextCleaner may collect a dead final
        # checkpoint mid-loop, shrinking the count; a LEAK only ever
        # grows it
        got = n_persisted()
        assert got <= base, f"{name} leaked a persisted frame ({got} > {base})"
        base = got


def test_minhash_recall_floor(spark, oracle_sf_dir):
    """The dedup analogue of the ANN recall floors: banded candidate
    generation must find ≥ 90% of the true Jaccard-threshold pairs
    (measured 1.0 at sf0.01 — every planted near-dup pair collides in
    at least one band). A band/hash-count change that silently starts
    missing pairs fails here, not in a corpus audit months later."""
    from tailsql_spark.plans.registry import REGISTRY

    r = REGISTRY["dedup_minhash_recall"].build(spark, oracle_sf_dir).collect()[0]
    assert r.n_truth > 0
    assert r.recall >= 0.9, f"minhash candidate recall degraded: {r.recall}"


def test_staging_invalidated_when_source_regenerates(spark, tmp_path):
    """r7 ADVICE: the idempotent-staging guards fold a CONTENT
    fingerprint (file sizes/mtimes) of the source table into the
    staging key, so a corpus REGENERATED at the same absolute path
    mints a fresh staging dir instead of silently reusing stale staged
    data — which would diverge from the oracle (it reads the fresh
    table) with no invalidation path. The prior-fingerprint staging is
    swapped out, not leaked."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from tailsql_spark.plans.connectors import sorted_lineitem_path

    sf = tmp_path / "sfregen"
    sf.mkdir()
    src = "/root/testdata/sf0.001/lineitem.parquet"
    dst = str(sf / "lineitem.parquet")
    (shutil.copy if os.path.isfile(src) else shutil.copytree)(src, dst)
    p1 = sorted_lineitem_path(spark, str(sf))
    n1 = spark.read.parquet(p1).count()

    # regenerate the corpus at the SAME path with different content
    t = pq.read_table(dst)
    half = t.num_rows // 2
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    pq.write_table(t.slice(0, half), dst)

    p2 = sorted_lineitem_path(spark, str(sf))
    assert p2 != p1, "regenerated corpus must not reuse the stale staging"
    assert spark.read.parquet(p2).count() == half != n1
    assert not os.path.exists(p1), "stale staging must be swapped out, not leaked"


def test_merge_upsert_rewrites_only_touched_partitions(spark, oracle_sf_dir):
    """sink_merge_upsert's Delta-style contract: the crawl delta
    touches partitions {0, 1} by construction, so the merge must (a)
    partition-prune the base read to those directories, (b) rewrite
    them via dynamic partition overwrite, and (c) leave every other
    partition's files BYTE-IDENTICAL (same names, sizes, mtimes) — the
    difference between rewrite-the-delta and rewrite-the-world at
    100 TB."""
    import glob
    import os
    import shutil

    from tailsql_spark.plans.connectors import merge_base_path, merge_upsert_run

    # restage from scratch so the base is the pre-merge snapshot
    shutil.rmtree(merge_base_path(spark, oracle_sf_dir), ignore_errors=True)
    base = merge_base_path(spark, oracle_sf_dir)

    def snap():
        return {
            f: (os.stat(f).st_size, os.stat(f).st_mtime_ns)
            for f in glob.glob(f"{base}/part=*/*.parquet")
        }

    before = snap()
    assert before, "staged base must contain partition files"
    merged, path, touched = merge_upsert_run(spark, oracle_sf_dir)
    assert path == base and touched == [0, 1]
    after = snap()

    def is_touched(f):
        return any(f"/part={t}/" in f for t in touched)

    assert {f: v for f, v in before.items() if not is_touched(f)} == {
        f: v for f, v in after.items() if not is_touched(f)
    }, "untouched partitions must be byte-identical after the merge"
    tb = {f: v for f, v in before.items() if is_touched(f)}
    ta = {f: v for f, v in after.items() if is_touched(f)}
    assert tb != ta, "touched partitions must actually rewrite"

    # (a) the base side of the merge is partition-pruned, not a full scan
    pruned = spark.read.parquet(base).filter(F.col("part").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan


def test_merge_tombstones_physically_remove_rows(spark, oracle_sf_dir):
    """sink_merge_delete_tombstones' takedown contract: 'D' keys are
    physically absent from the merged table (not filtered at read
    time), the delta's three slices touch partitions {0, 1, 2} only,
    and re-running the merge is idempotent — tombstoned keys stay
    absent, nothing resurrects or double-deletes."""
    import shutil

    from tailsql_spark.plans.connectors import (
        MERGE_DELETE_MOD,
        merge_base_path,
        merge_upsert_run,
    )

    shutil.rmtree(
        merge_base_path(spark, oracle_sf_dir, tag="merge_del_base"),
        ignore_errors=True,
    )
    merged, _path, touched = merge_upsert_run(spark, oracle_sf_dir, with_deletes=True)
    assert touched == [0, 1, 2]
    assert merged.filter(F.col("doc_id") % 64 == MERGE_DELETE_MOD).count() == 0
    n1 = merged.count()
    assert n1 > 0
    merged2, _path2, _t2 = merge_upsert_run(spark, oracle_sf_dir, with_deletes=True)
    assert merged2.count() == n1
    assert merged2.filter(F.col("doc_id") % 64 == MERGE_DELETE_MOD).count() == 0


def test_merge_drops_fully_tombstoned_partition(spark, tmp_path):
    """The r8 review's sharpest finding, pinned: dynamic partition
    overwrite only replaces partitions PRESENT in the written data, so
    a delta that tombstones EVERY remaining key of a partition (a
    whole-part takedown — exactly the legal-removal path) must have
    that partition explicitly dropped, or its deleted rows silently
    survive the merge."""
    from tailsql_spark.plans.connectors import merge_apply

    base_path = str(tmp_path / "tomb_base")
    spark.createDataFrame(
        [(1, 0, 10, 1), (2, 0, 20, 1), (3, 1, 30, 1)],
        "doc_id long, part long, content long, version int",
    ).write.partitionBy("part").parquet(base_path)

    # tombstone BOTH docs of part 0; update the part-1 doc
    delta = spark.createDataFrame(
        [(1, 0, None, 2, "D"), (2, 0, None, 2, "D"), (3, 1, 33, 2, "U")],
        "doc_id long, part long, content long, version int, op string",
    )
    touched = merge_apply(spark, base_path, delta)
    assert touched == [0, 1]
    got = {(r.doc_id, r.part, r.content, r.version)
           for r in spark.read.parquet(base_path).collect()}
    assert got == {(3, 1, 33, 2)}, got
    import os

    assert not os.path.exists(f"{base_path}/part=0"), (
        "fully-tombstoned partition directory must be dropped"
    )


def test_merge_apply_empty_delta_is_noop(spark, tmp_path):
    """An empty crawl increment must touch nothing: no partitions
    listed, no rewrite, base files byte-identical."""
    import glob
    import os

    from tailsql_spark.plans.connectors import merge_apply

    base_path = str(tmp_path / "noop_base")
    spark.createDataFrame(
        [(1, 0, 10, 1)], "doc_id long, part long, content long, version int"
    ).write.partitionBy("part").parquet(base_path)
    before = {
        f: os.stat(f).st_mtime_ns for f in glob.glob(f"{base_path}/part=*/*.parquet")
    }
    delta = spark.createDataFrame(
        [], "doc_id long, part long, content long, version int, op string"
    )
    assert merge_apply(spark, base_path, delta) == []
    after = {
        f: os.stat(f).st_mtime_ns for f in glob.glob(f"{base_path}/part=*/*.parquet")
    }
    assert after == before


def test_time_travel_version_pruning(spark, oracle_sf_dir):
    """sink_snapshot_time_travel's VERSION AS OF contract: a
    historical read filters the version partition column, so version
    selection is catalog-level partition pruning — the newer
    snapshot's files are never scheduled."""
    from tailsql_spark.plans.connectors import timetravel_root

    root = timetravel_root(spark, oracle_sf_dir)
    old = spark.read.parquet(root).filter(F.col("v") == 1)
    plan = old._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "v" in plan.split("PartitionFilters", 1)[1][:160]
    assert old.count() > 0


def test_banded_range_join_is_equi_not_nested_loop(spark, oracle_sf_dir):
    """The decomposition's point: join_theta_range compiles to a
    nested-loop join (no equi key); join_banded_range over the SAME
    semantics must compile to a hash/sort-merge EQUI join on the band
    — and return identical results."""
    from tailsql_spark.plans.registry import REGISTRY

    theta = _plan(REGISTRY["join_theta_range"].build(spark, oracle_sf_dir))
    banded = _plan(REGISTRY["join_banded_range"].build(spark, oracle_sf_dir))
    assert "BroadcastNestedLoopJoin" in theta, theta
    assert "BroadcastNestedLoopJoin" not in banded, banded
    assert ("SortMergeJoin" in banded) or ("HashJoin" in banded), banded

    a = sorted(map(tuple, REGISTRY["join_theta_range"].build(spark, oracle_sf_dir).collect()))
    b = sorted(map(tuple, REGISTRY["join_banded_range"].build(spark, oracle_sf_dir).collect()))
    assert a == b


def test_dynamic_partition_pruning_fires(spark, oracle_sf_dir):
    """join_dynamic_partition_pruning's contract: the year-partitioned
    fact scan carries a dynamicpruning subquery in its
    PartitionFilters — the runtime values of the dim join key prune
    fact partitions at execution time, with no static year predicate
    on the fact. Results must equal the unpartitioned plain join."""
    from pyspark.sql import functions as SF

    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["join_dynamic_partition_pruning"].build(spark, oracle_sf_dir)
    p = _plan(df)
    assert "dynamicpruningexpression" in p, p

    got = {r.o_year: (r.n, r.sum_price_cents) for r in df.collect()}
    t = load_tables(spark, oracle_sf_dir)
    yr = SF.year(SF.col("o_orderdate").cast("date"))
    yrs = (
        t["orders"]
        .filter((SF.col("o_orderkey") % 97 == 0) & (yr % 2 == 0))
        .select(yr.alias("yr"))
        .distinct()
    )
    plain = (
        t["orders"]
        .withColumn("o_year", yr)
        .join(yrs, SF.col("o_year") == SF.col("yr"))
        .groupBy("o_year")
        .agg(
            SF.count("*").alias("n"),
            SF.sum(SF.round(SF.col("o_totalprice") * 100, 0).cast("long")).alias(
                "sum_price_cents"
            ),
        )
    )
    want = {r.o_year: (r.n, r.sum_price_cents) for r in plain.collect()}
    assert got == want
    # the dim predicate selects a strict subset of years: pruning is real
    n_years_all = t["orders"].select(yr).distinct().count()
    assert 0 < len(got) < n_years_all


def test_watermark_lateness_prefix_scan_is_bucketed(spark, oracle_sf_dir):
    """The lateness audit's running max must equal the global-order
    window's answer while the corpus-sized window stays partitioned by
    the prefix bucket (only the tiny per-bucket table is globally
    ordered)."""
    from pyspark.sql import functions as SF
    from pyspark.sql.window import Window as PW

    from tailsql_spark.plans.catalog import load_tables
    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["events_watermark_lateness"].build(spark, oracle_sf_dir)
    got = {r.late_10m_bucket: r.n_events for r in df.collect()}

    ev = load_tables(spark, oracle_sf_dir)["events"].select(
        "event_id", SF.unix_micros("ts").alias("tu")
    )
    w = PW.orderBy("event_id").rowsBetween(PW.unboundedPreceding, -1)
    plain = (
        ev.withColumn("seen_max", SF.max("tu").over(w))
        .filter(SF.col("seen_max").isNotNull())
        .groupBy(
            SF.floor(
                SF.greatest(SF.col("seen_max") - SF.col("tu"), SF.lit(0)) / 600000000
            )
            .cast("long")
            .alias("late_10m_bucket")
        )
        .agg(SF.count("*").alias("n_events"))
    )
    want = {r.late_10m_bucket: r.n_events for r in plain.collect()}
    assert got == want
    p = _plan(df)
    assert "windowspecdefinition(b#" in p, p


def test_zipf_rank_never_global_windows_type_table(spark, oracle_sf_dir):
    """The Zipf rank must be distributed: the only window that touches
    the type table (ordering by tok) is partitioned by (cnt, prefix
    bucket); the sole unpartitioned window runs on the metadata-sized
    bucket table (the sample_weighted_systematic pattern)."""
    import re

    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["text_zipf_slope"].build(spark, oracle_sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs, p
    for spec in specs:
        if "tok#" in spec:
            # type-table window: must carry the bucket partition columns
            assert "cnt#" in spec and "pb#" in spec, spec


def test_unigram_rank_never_global_windows_piece_table(spark, oracle_sf_dir):
    """The unigram-LM piece rank must be distributed (the r9 verdict's
    parameter cliff, removed): the only window that touches the piece
    table (ordering by piece) is partitioned by (cnt, prefix bucket);
    the sole unpartitioned window runs on the metadata-sized bucket
    table — the text_zipf_slope pattern."""
    import re

    from tailsql_spark.operators.textstats import (
        unigram_piece_ranks,
        unigram_seed_pieces,
        unigram_words,
    )

    p = _plan(unigram_piece_ranks(unigram_seed_pieces(unigram_words(spark, oracle_sf_dir))))
    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs, p
    for spec in specs:
        if "piece#" in spec:
            assert "cnt#" in spec and "pb#" in spec, spec


def test_bm25_query_terms_broadcast_onto_postings(spark, oracle_sf_dir):
    """BM25: the query-term table, the per-term df table, and the
    1-row corpus stats must all BROADCAST onto the tf posting list —
    the corpus never shuffles on anything query-sized — and top-k is
    TWO-LEVEL (r10): the window that sees raw candidates must carry
    the salt partition column, so no single task ever sorts more than
    the 1/BM25_SALTS stratum of one qid's candidate set; the sole
    qid-only window runs on the <= k*salts partial winners (the
    text_zipf_slope assertion pattern)."""
    import re

    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["text_bm25_topk"].build(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "CartesianProduct" not in p, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs, p
    # every window is qid-partitioned (never empty-partition), and the
    # candidate-facing level also partitions by salt
    assert all(spec.startswith("qid#") for spec in specs), specs
    assert any("salt#" in spec for spec in specs), specs
    # the qid-only final window exists and is fed by the partial filter
    assert any("salt#" not in spec for spec in specs), specs
    assert "prnk" in p, p


def test_bm25_index_bucket_fn_parity(spark):
    """The driver-side bucket planner and the Spark writer's bucket
    column must agree token-for-token — the indexed probe reads ONLY
    the buckets the Python side names, so a divergence silently drops
    a query term's postings."""
    from tailsql_spark.operators.textstats import (
        BM25_QUERIES,
        bm25_term_bucket_col,
        bm25_term_bucket_py,
    )

    toks = sorted({t for _, q in BM25_QUERIES for t in q.split(" ")})
    toks += ["", "Ünïcode", "\x0btab", "a" * 64, "0", "the"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r.tok: r.b
        for r in df.select("tok", bm25_term_bucket_col("tok").alias("b")).collect()
    }
    assert got == {t: bm25_term_bucket_py(t) for t in toks}


def test_bm25_indexed_probe_prunes_bucket_dirs(spark, oracle_sf_dir):
    """text_bm25_topk_indexed's contract (r14 — STRONGER than the old
    partition-IN-filter assertion): the probe scan's input files are
    EXACTLY the probed bucket directories, constructed from the shared
    md5 arithmetic without ever listing the partitioned root (at the
    100x corpus, root discovery stats every dialed bucket dir per
    query — the cost that turned the 10x-flat probe into a 4.4x one);
    the query's buckets are a strict subset of the on-disk buckets and
    the served result equals the per-run query row-for-row."""
    import os

    from tailsql_spark.operators.textstats import (
        BM25_INDEX_BUCKETS,
        BM25_QUERIES,
        bm25_bucket_count,
        bm25_index_meta,
        bm25_index_path,
        bm25_term_bucket_py,
    )
    from tailsql_spark.plans.registry import REGISTRY

    root = bm25_index_path(spark, oracle_sf_dir)
    meta = bm25_index_meta(root)
    nb = int(meta["n_buckets"])
    # the dial bit: sf0.01's posting count demands more than the base
    assert nb == bm25_bucket_count(int(meta["n_postings"])) and nb > BM25_INDEX_BUCKETS, meta
    on_disk = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(f"{root}/postings")
        if d.startswith("tb=")
    )
    # most buckets are populated (a tiny-sf vocab may leave some empty —
    # an absent dir is pruned trivially); the query's buckets must be a
    # STRICT subset of what's on disk, so the probe provably skips
    # populated directories
    assert len(on_disk) >= nb // 2, (nb, on_disk)
    buckets = sorted({bm25_term_bucket_py(t, nb) for _, q in BM25_QUERIES for t in q.split(" ")})
    assert 0 < len(buckets) < len(on_disk), (buckets, on_disk)
    assert set(on_disk) - set(buckets), (on_disk, buckets)  # dirs the probe never reads
    served = REGISTRY["text_bm25_topk_indexed"].build(spark, oracle_sf_dir)
    # the scan plans ONLY the probed bucket dirs: every input file of
    # the postings read lives under a probed tb= dir, and no unprobed
    # bucket dir contributes a file (stats/doc tables excluded by path)
    post_files = [f for f in served.inputFiles() if "/postings/tb=" in f]
    assert post_files, served.inputFiles()
    scanned = {
        int(f.split("/postings/tb=", 1)[1].split("/", 1)[0]) for f in post_files
    }
    assert scanned <= set(buckets), (sorted(scanned), buckets)
    # serving equals the per-run query exactly
    key = lambda r: (r.qid, r.rnk)  # noqa: E731
    got = sorted(served.collect(), key=key)
    want = sorted(REGISTRY["text_bm25_topk"].build(spark, oracle_sf_dir).collect(), key=key)
    assert got == want


def test_ivf_indexed_probe_prunes_cell_dirs(spark, oracle_sf_dir):
    """ann_ivf_topk_indexed's contract: the candidate scan carries a
    static partition IN-filter on the cell column, the request's
    probed cells are a STRICT subset of the on-disk cells, the index
    geometry is the DIALED count (non-default at this sf — the dial
    provably bit), and the served ranking equals an independent
    recomputation against freshly-assigned dialed cells (guards stale
    or mis-routed index reuse without relying on the index files)."""
    import os

    from tailsql_spark.operators.similarity import (
        N_CELLS,
        N_QUERIES_IDX,
        as_double,
        assign_cells,
        dot,
        ivf_cell_count,
        ivf_index_meta,
        ivf_index_path,
        load_tables,
        norm,
    )
    from pyspark.sql import Window as W
    from tailsql_spark.plans.registry import REGISTRY

    root = ivf_index_path(spark, oracle_sf_dir)
    meta = ivf_index_meta(root)
    nc = int(meta["n_cells"])
    # the dial bit: sf0.01's 500 vectors demand more than the base count
    assert nc == ivf_cell_count(int(meta["n_vecs"])) and nc > N_CELLS, meta
    on_disk = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(f"{root}/cells")
        if d.startswith("cell=")
    )
    assert len(on_disk) >= nc // 2, (nc, on_disk)
    served = REGISTRY["ann_ivf_topk_indexed"].build(spark, oracle_sf_dir)
    # r14 (stronger than the old PartitionFilters assertion): the
    # candidate scan's input files are EXACTLY the probed cell dirs,
    # constructed by path without listing the partitioned root
    cell_files = [f for f in served.inputFiles() if "/cells/cell=" in f]
    assert cell_files, served.inputFiles()
    scanned = {
        int(f.split("/cells/cell=", 1)[1].split("/", 1)[0]) for f in cell_files
    }
    got = sorted(served.collect())
    # strict subset: a 3-query request provably skips populated dirs
    emb = (
        load_tables(spark, oracle_sf_dir)["embeddings"]
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .withColumn("nrm", norm(F.col("v")))
    )
    seeds = emb.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"), F.col("nrm").alias("sn")
    )
    fresh = assign_cells(emb, seeds)
    probed = {
        int(r.cell)
        for r in fresh.filter(F.col("vec_id") < N_QUERIES_IDX).collect()
    }
    assert 0 < len(probed) < len(on_disk), (probed, on_disk)
    assert scanned <= probed, (sorted(scanned), sorted(probed))
    # equals an independent in-memory recomputation over dialed cells
    q = fresh.filter(F.col("vec_id") < N_QUERIES_IDX).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell").alias("qcell"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = fresh.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("ccell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    want = sorted(
        F.broadcast(q)
        .join(c, (F.col("qcell") == F.col("ccell")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .collect()
    )
    assert got == want


def test_ivf_indexed_topk_is_two_level_salted(spark, oracle_sf_dir):
    """The indexed probes' final ranking must be the salted two-level
    top-k (the bm25_rank discipline): two window stages — a partial
    per-(query, salt) pass before the per-query final — so a hot cell
    never funnels its whole candidate set through ONE task."""
    from tailsql_spark.plans.registry import REGISTRY

    for name in ("ann_ivf_topk_indexed", "ann_ivf_multiprobe_topk_indexed"):
        p = _plan(REGISTRY[name].build(spark, oracle_sf_dir))
        assert p.count("windowspecdefinition(query_id") >= 2, (name, p)
        assert "salt" in p, (name, p)
        assert "CartesianProduct" not in p, (name, p)


def test_ivf_indexed_multiprobe_recall_floor(spark, oracle_sf_dir):
    """Index-quality gate for the PERSISTED index: multiprobe recall@3
    holds the floor, and per-query recall is monotone — probing more
    cells can only add candidates, so multiprobe recall >= single-probe
    recall for every query."""
    from tailsql_spark.operators.similarity import (
        N_QUERIES_IDX,
        RECALL_K,
        _ann_salted_topk,
        _ivf_indexed_scored,
        _recall_vs_brute,
    )
    from tailsql_spark.plans.registry import REGISTRY

    multi = {
        int(r.query_id): float(r.recall)
        for r in REGISTRY["ann_ivf_indexed_recall_at_k"].build(spark, oracle_sf_dir).collect()
    }
    assert len(multi) == N_QUERIES_IDX
    assert sum(multi.values()) / len(multi) >= 0.85, multi
    one3 = (
        _ann_salted_topk(_ivf_indexed_scored(spark, oracle_sf_dir, n_probes=1))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    single = {
        int(r.query_id): float(r.recall)
        for r in _recall_vs_brute(
            spark, oracle_sf_dir, one3, n_queries=N_QUERIES_IDX
        ).collect()
    }
    assert all(multi[qid] >= single[qid] for qid in multi), (multi, single)


def test_doubling_dial_properties():
    """The shared dial: base below target, doubling at decade
    boundaries, cap respected, and the SQL CASE ladder enumerates the
    identical mapping (DuckDB-evaluated at the exact boundaries, where
    a float log2 would wobble)."""
    import duckdb

    from tailsql_spark.operators.dial import dial_case_sql, doubling_dial

    base, target, cap = 8, 32, 1024
    assert doubling_dial(0, base, target, cap) == base
    assert doubling_dial(base * target, base, target, cap) == base  # exact fit stays
    assert doubling_dial(base * target + 1, base, target, cap) == 2 * base
    assert doubling_dial(10**12, base, target, cap) == cap
    con = duckdb.connect()
    for n in [0, 1, base * target - 1, base * target, base * target + 1,
              4 * base * target, 4 * base * target + 1, cap * target, cap * target + 7]:
        sql = dial_case_sql(str(n), base, target, cap)
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        assert got == doubling_dial(n, base, target, cap), (n, got)


def test_doubling_dial_cap_not_power_of_two_multiple():
    """When cap is NOT base*2^k the doubling loop overshoots past cap;
    the builder must clamp to cap exactly as the CASE ladder's ELSE
    branch does, or the two 'cannot drift' twins disagree at the cap
    boundary (latent while all call sites use power-of-two caps)."""
    import duckdb

    from tailsql_spark.operators.dial import dial_case_sql, doubling_dial

    base, target, cap = 16, 10, 100
    assert doubling_dial(10**9, base, target, cap) == cap  # not 128
    con = duckdb.connect()
    for n in [0, 159, 160, 161, 639, 640, 641, 999, 1000, 1001, 10**9]:
        sql = dial_case_sql(str(n), base, target, cap)
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        assert got == doubling_dial(n, base, target, cap), (n, got)


def test_ivf_dial_shrinks_probed_fraction():
    """The dial's point, as a property: at a fixed request size, the
    probed fraction (nprobe / cell count) SHRINKS as the corpus grows a
    decade — per-request cost tracks the request, not the corpus."""
    from tailsql_spark.operators.similarity import N_PROBES, ivf_cell_count

    small, big = ivf_cell_count(500), ivf_cell_count(500 * 100)
    assert big > small
    assert N_PROBES / big < N_PROBES / small


def test_bm25_dial_shrinks_probed_fraction():
    """Same property for the BM25 term buckets: a fixed query's probed
    bucket set is bounded by its term count, so its probed FRACTION of
    the index shrinks as the posting count dials the bucket count up."""
    from tailsql_spark.operators.textstats import (
        BM25_QUERIES,
        bm25_bucket_count,
        bm25_term_bucket_py,
    )

    toks = sorted({t for _, q in BM25_QUERIES for t in q.split(" ")})
    small, big = bm25_bucket_count(11_695), bm25_bucket_count(11_695 * 100)
    assert big > small
    frac_small = len({bm25_term_bucket_py(t, small) for t in toks}) / small
    frac_big = len({bm25_term_bucket_py(t, big) for t in toks}) / big
    assert frac_big < frac_small, (frac_small, frac_big)


def test_bm25_index_build_is_idempotent(spark, oracle_sf_dir):
    """A same-corpus rebuild must REUSE the staged index (fingerprint
    guard), not rewrite it — the stale-pointer discipline every staged
    layout in connectors.py follows."""
    import os

    from tailsql_spark.operators.textstats import bm25_index_path

    root = bm25_index_path(spark, oracle_sf_dir)
    marker = f"{root}/postings/_SUCCESS"
    before = os.path.getmtime(marker)
    assert bm25_index_path(spark, oracle_sf_dir) == root
    assert os.path.getmtime(marker) == before


def test_audio_fp_hot_frames_pruned_before_pairing(spark, oracle_sf_dir):
    """Audio CDC dedup: the hot-frame prune must be a broadcast
    anti-join applied BEFORE the pair self-join, and the best-match
    window must partition by doc id (never a global order)."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["multimodal_audio_fp_dedup"].build(spark, oracle_sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition(id" in p, p


def test_video_dedup_hot_bands_pruned_before_pairing(spark, oracle_sf_dir):
    """Video dedup: boilerplate frame bands prune via broadcast
    anti-join BEFORE the pair self-join; best-match window partitions
    by doc id; never a cartesian stage (the audio discipline)."""
    from tailsql_spark.plans.registry import REGISTRY

    p = _plan(REGISTRY["multimodal_video_dedup"].build(spark, oracle_sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition(id" in p, p


def test_point_in_time_join_is_keyed_equi_join_and_1to1(spark, oracle_sf_dir):
    """The temporal join must compile to a KEY equi-join (broadcast
    hash join on custkey) with the interval predicate as a filter —
    never a nested-loop/theta join — and intervals partition time per
    key, so every fact row matches exactly one dimension version."""
    from pyspark.sql import functions as F

    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["join_scd2_point_in_time"].build(spark, oracle_sf_dir)
    p = _plan(df)
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
    n_orders = spark.read.parquet(f"{oracle_sf_dir}/orders.parquet").count()
    assert df.count() == n_orders  # 1:1 — no order lost, none duplicated
    assert df.groupBy("o_orderkey").count().filter(F.col("count") > 1).count() == 0


def test_global_window_detector_and_allowlist(spark):
    """r13: tools/plan_audit.py's single-partition-WindowExec rule.  A
    deliberately GLOBAL window (ordered or unordered) is flagged; a
    partitioned window — ordered or not (the unordered shape prints
    the same two bracket groups on the node line, the false-positive
    class the windowspecdefinition parse exists for) — is not.  And
    every allowlist entry must still name a registered query."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import Window as W

    from tools.plan_audit import _ALLOWED_GLOBAL_WINDOW, global_window_count

    df = spark.range(10).withColumn("g", F.col("id") % 2)

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    assert (
        global_window_count(
            plan(df.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("id"))))
        )
        == 0
    )
    assert (
        global_window_count(plan(df.withColumn("n", F.count("*").over(W.partitionBy("g")))))
        == 0
    )
    assert (
        global_window_count(plan(df.withColumn("rn", F.row_number().over(W.orderBy("id")))))
        == 1
    )
    assert (
        global_window_count(plan(df.withColumn("s", F.sum("id").over(W.partitionBy()))))
        == 1
    )
    from tailsql_spark.plans.registry import REGISTRY

    stale = [n for n in _ALLOWED_GLOBAL_WINDOW if n not in REGISTRY]
    assert stale == [], f"global-window allowlist names unknown queries: {stale}"


def test_no_unallowlisted_global_windows_in_graded_window(spark, oracle_sf_dir):
    """Every driver-graded BATCH query must be free of single-partition
    WindowExec nodes unless explicitly allowlisted — the graded subset
    of the full tools/plan_audit.py sweep, cheap enough for CI."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.plan_audit import _ALLOWED_GLOBAL_WINDOW, global_window_count

    from tailsql_spark.plans.registry import GRADED_WINDOW, REGISTRY

    bad: list[str] = []
    for name in GRADED_WINDOW:
        spec = REGISTRY[name]
        if spec.category == "streaming-executed" or name in _ALLOWED_GLOBAL_WINDOW:
            continue
        df = (spec.plan or spec.build)(spark, oracle_sf_dir)
        n = global_window_count(df._jdf.queryExecution().executedPlan().toString())
        if n:
            bad.append(f"{name} x{n}")
    assert bad == [], f"unallowlisted global windows in graded queries: {bad}"


def test_training_shards_prefix_sum_never_global_over_corpus(spark, oracle_sf_dir):
    """The shard writer's distributed prefix sum: the corpus-sized
    running token sum is a window PARTITIONED by the key prefix, and
    the ONLY single-partition WindowExec in the plan is the one over
    the 4096-row bucket-totals table — the shape that survives 100 TB
    (a global corpus window would funnel every row through one task)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.plan_audit import global_window_count

    from tailsql_spark.operators.corpus import shard_assignments
    from tailsql_spark.plans.catalog import load_tables

    docs = load_tables(spark, oracle_sf_dir)["documents"].select(
        "doc_id", "lang", "text"
    )
    plan = (
        shard_assignments(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert global_window_count(plan) == 1, plan  # bucket-offsets only
    # ...plus the corpus-sized intra window, PARTITIONED by the key
    # prefix b (windowspecdefinition's leading arg is the partition col)
    assert "windowspecdefinition(b#" in plan, plan


def test_arrow_shingle_hashes_match_jvm(spark, oracle_sf_dir):
    """r15: the big-data branch's Arrow-batched exploded shingle-hash
    builder must be VALUE-IDENTICAL to the JVM expression chain it
    replaces (ASCII \\s+ tokenization of space-trimmed lowercased
    text, per-doc distinct 3-gram shingles, md5[:15] 60-bit hashes) —
    asserted both ways with exceptAll over every corpus row, so a
    Python/Java regex or lowercasing divergence fails loudly instead
    of silently shifting near-dup pairs at scale."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.dedup import (
        doc_shingle_hashes_arrow,
        doc_shingles,
        shingle_hash60,
    )
    from tailsql_spark.plans.catalog import load_documents_sized

    jvm = (
        doc_shingles(spark, oracle_sf_dir)
        .select("doc_id", F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", shingle_hash60(F.col("s")).alias("x"))
    )
    arrow = doc_shingle_hashes_arrow(load_documents_sized(spark, oracle_sf_dir))
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
    assert arrow.count() == jvm.count() > 0


def test_arrow_minhash_sigs_match_groupby(spark, oracle_sf_dir):
    """r17: the small-branch Arrow per-doc signature builder (numpy
    minima inside the shingle stage — no exploded transfer, no doc_id
    groupBy) must be BIT-IDENTICAL to the explode + groupBy signature
    chain over the real corpus: same h0..h15, same n_sh, same shingle
    set per doc."""
    from tailsql_spark.operators.dedup import (
        N_HASHES,
        doc_minhash_sigs_arrow,
        doc_shingle_hashes_arrow,
        minhash_signatures,
    )
    from tailsql_spark.plans.catalog import load_documents_sized

    docs = load_documents_sized(spark, oracle_sf_dir)
    cols = ["doc_id", *[f"h{i}" for i in range(N_HASHES)], "n_sh"]
    jvm = (
        minhash_signatures(doc_shingle_hashes_arrow(docs), with_sets=True)
        .select(cols + [F.sort_array("xs").alias("xs")])
    )
    arrow = doc_minhash_sigs_arrow(docs, with_sets=True).select(
        cols + [F.sort_array("xs").alias("xs")]
    )
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
    assert arrow.count() == jvm.count() > 0


def test_corpus_proportional_broadcast_hints_are_size_gated(
    spark, oracle_sf_dir, monkeypatch
):
    """r17: every broadcast hint whose side grows WITH the corpus —
    dedup cluster labels (survivor attaches), the corpus vocabulary /
    bigram count tables, the BPE symbol table, the candidate-graph
    degree tables — follows the plan-time size gate
    (``dedup._small_input``).  Forcing the gate OFF must leave every
    result IDENTICAL (a hint may only change cost, never rows), and
    the label attach must really lose its hint (probed with
    auto-broadcast disabled, the established gate-test discipline)."""
    from tailsql_spark.operators import dedup
    from tailsql_spark.plans.registry import REGISTRY

    names = [
        "corpus_curation_survivors",
        "dedup_survivor_stats",
        "text_unigram_surprisal",
        "text_bigram_surprisal",
        "text_bpe_tokenize",
        "graph_triangle_counts",
    ]
    before = {
        n: sorted(map(tuple, REGISTRY[n].build(spark, oracle_sf_dir).collect()))
        for n in names
    }
    monkeypatch.setattr(dedup, "BROADCAST_INPUT_BYTES", 0)  # every gate OFF
    for n in names:
        got = sorted(map(tuple, REGISTRY[n].build(spark, oracle_sf_dir).collect()))
        assert got == before[n], n
        assert len(got) > 0, n
    # the hint is really gone: with auto-broadcast off, the survivor
    # label attach (join on l_doc) must not plan as a broadcast join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = (
            REGISTRY["dedup_survivor_stats"]
            .build(spark, oracle_sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    lab_joins = [
        ln for ln in p.splitlines() if "Join" in ln and "l_doc" in ln
    ]
    assert lab_joins and all("Broadcast" not in ln for ln in lab_joins), p
