#!/usr/bin/env python
"""Physical-plan audit over the whole registry.

Prints one line per certified query: join strategies, shuffle count,
and scan pushdown markers — the at-a-glance check that no operator
silently de-optimized. Run after plan-affecting changes:

    python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Queries whose BroadcastNestedLoopJoins are AUDITED constant-side
#: patterns (each justified in the operator docstring): the broadcast
#: side is a fixed-size table — the 10-row ANN query block, the 16-row
#: hyperplane seeds, the |cells|-row centroid table — so the "nested
#: loop" is a linear scan × constant, never data × data.  A bnlj in any
#: query NOT listed here is flagged as unexpected.
_ALLOWED_BNLJ: dict[str, str] = {
    "ann_centroid_update": "constant seed-centroid broadcast",
    "ann_cosine_topk": "10-row query-block broadcast (brute baseline)",
    "ann_cosine_topk_int8": "10-row query-block broadcast",
    "ann_ivf_assign": "constant seed-centroid broadcast",
    "ann_ivf_kmeans_multiprobe_topk": "Lloyd centroid broadcasts per iteration",
    "ann_ivf_kmeans_topk": "Lloyd centroid broadcasts per iteration",
    "ann_ivf_multiprobe_topk": "constant seed-centroid broadcast",
    "ann_ivf_indexed_recall_at_k": "query-block ground-truth broadcast (brute side)",
    "ann_ivf_recall_at_k": "centroid broadcasts + query-block ground truth",
    "ann_ivf_topk": "constant seed-centroid broadcast",
    "ann_ivfpq_recall_at_k": "query-block ground-truth broadcast",
    "ann_ivfpq_recall_structured": "centroid/query-block broadcasts (structured slice)",
    "ann_ivfpq_topk": "Lloyd centroid broadcasts per iteration",
    "ann_kmeans_lloyd": "Lloyd centroid broadcasts per iteration",
    "ann_signlsh_bucket_pairs": "16-row hyperplane-seed broadcast",
    "dedup_embedding_cosine": "documented brute-force small-corpus baseline",
    "dedup_embedding_lsh_verified": "16-row hyperplane-seed broadcast",
    "dedup_semantic": "centroid broadcasts (SemDeDup cells)",
    "join_theta_range": "genuine theta join — the certified range-join row",
    "graph_triangle_counts": "16-row hyperplane-seed broadcast (candidate graph)",
    # the serving probe reads the PERSISTED 1-row (n_docs, sum_dl)
    # stats table from parquet, so the scalar-aggregate heuristic that
    # clears the per-run query's identical cross join cannot see it
    "text_bm25_topk_indexed": "1-row persisted corpus-stats broadcast",
}


#: Queries whose GLOBAL (no partition spec) Window nodes are AUDITED
#: metadata/model-sized frames or surface-demanded semantics.  A
#: single-partition WindowExec pulls its entire input through ONE task
#: — at 100 TB that is THE scale killer — so it is only acceptable
#: when (a) the frame is provably bounded (bucket-count / sketch-width
#: / model-sized rows), or (b) the delegated SQL query ITSELF asks for
#: a global rank (the engine must honor the user's semantics; the row
#: count is the user's problem, and the surface demo tables are dims).
#: A global window in any query NOT listed here is flagged.
_ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    # exclusive prefix max over PER-BUCKET maxima: corpus/4096 rows
    # (streaming_sql.py 'per-bucket maxima' comment) — bounded
    "events_watermark_lateness": "bucket-maxima table (corpus/4096 rows)",
    # exclusive prefix sum over PER-BUCKET weight totals
    # (corpus.py 'per-bucket totals' comment) — bounded
    "sample_weighted_systematic": "bucket-totals table (corpus/PPS_BUCKET rows)",
    "sink_training_shards": "bucket-offsets table (4096 key-prefix rows)",
    # rank offsets over the (cnt, prefix) bucket table — metadata-sized
    # (textstats.py 'distributed rank' comment); the type table itself
    # ranks under a partitioned window
    "text_zipf_slope": "rank-offset bucket table (distinct cnt x prefixes)",
    # §2B window-function SURFACE queries: the user's SQL itself asks
    # for a global ORDER BY rank — the engine must honor the
    # semantics; both run over a dimension-sized table in the demo
    "window_rank_dense_ntile": "SQL semantics: global RANK/NTILE (surface query)",
    "window_rank_distribution": "SQL semantics: global PERCENT_RANK/CUME_DIST (surface query)",
}


def global_window_count(plan: str) -> int:
    """Number of physical Window nodes with NO partition spec.

    Counting bracket groups on the node line is ambiguous (a
    partitioned-but-unordered window also prints two), so the rule
    parses the node's ``windowspecdefinition(...)`` arguments instead:
    partition columns are the leading top-level args that are neither
    sort orders (`` ASC``/`` DESC`` suffix) nor the
    ``specifiedwindowframe(...)`` terminator.  Zero partition columns
    = a single-partition WindowExec.  Matches only the exact
    ``Window`` node, never ``WindowGroupLimit`` variants."""
    import re

    n = 0
    for line in plan.splitlines():
        if re.search(r"(?:^|[\s\-+:*\)\(])Window \[", line) is None:
            continue
        i = line.find("windowspecdefinition(")
        if i < 0:
            continue
        args = _top_level_args(line[i + len("windowspecdefinition(") :])
        n_part = 0
        for a in args:
            a = a.strip()
            if a.startswith("specifiedwindowframe(") or re.search(
                r"\b(ASC|DESC)\b", a
            ):
                break
            n_part += 1
        if n_part == 0:
            n += 1
    return n


def _top_level_args(s: str) -> list[str]:
    """Args of an already-opened paren group: split on depth-0 commas,
    stop at the group's closing paren."""
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        args.append("".join(cur))
    return args


def main() -> None:
    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    names = sys.argv[1:] or sorted(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged = 0
    allowlisted = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.category == "streaming-executed":
            print(f"{name:40s} (streaming-executed: audited by its own run)")
            continue
        try:
            df = (spec.plan or spec.build)(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name:40s} ERROR {exc}")
            flagged += 1
            continue
        marks = {
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "xchg": plan.count("Exchange"),
            "cart": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
        }
        # A BroadcastNestedLoopJoin is linear when the broadcast side is
        # a global (ungrouped) aggregate — a 1-row scalar join, Spark's
        # compilation of "cross join with a total". Only flag BNLJ when
        # no scalar aggregate feeds it (a real theta/cross join); those
        # that remain are either ALLOWLISTED below (audited
        # constant-broadcast patterns, justification recorded here and
        # in each docstring) or genuinely unexpected — keeping the
        # allowlist explicit means a NEW nested loop stands out instead
        # of hiding among 19 known flags.
        scalar_bcast = "keys=[], functions=[" in plan
        allowed = _ALLOWED_BNLJ.get(name)
        gwin = global_window_count(plan)
        gwin_allowed = _ALLOWED_GLOBAL_WINDOW.get(name)
        warn = ""
        if marks["cart"]:
            warn = " <-- CARTESIAN"
            flagged += 1
        elif marks["bnlj"] and not scalar_bcast and allowed is None:
            warn = " <-- NON-EQUI JOIN (unexpected: not allowlisted)"
            flagged += 1
        elif gwin and gwin_allowed is None:
            warn = f" <-- GLOBAL WINDOW x{gwin} (single-partition WindowExec: not allowlisted)"
            flagged += 1
        elif marks["bnlj"] and allowed:
            warn = f" (bnlj allowlisted: {allowed})"
            allowlisted += 1
        elif gwin and gwin_allowed:
            warn = f" (global window allowlisted: {gwin_allowed})"
            allowlisted += 1
        print(
            f"{name:40s} bhj={marks['bhj']} smj={marks['smj']} "
            f"shj={marks['shj']} bnlj={marks['bnlj']} "
            f"exchanges={marks['xchg']}{warn}"
        )
    print(
        f"\n{len(names)} plans audited, {flagged} UNEXPECTED flags, "
        f"{allowlisted} allowlisted (justification printed per row)"
    )


if __name__ == "__main__":
    main()
