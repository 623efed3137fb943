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


def main() -> None:
    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    names = sys.argv[1:] or sorted(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged = 0
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
        # that remain are intentional bounded-side baselines (brute
        # ANN, theta joins) and must say so in their docstring.
        scalar_bcast = "keys=[], functions=[" in plan
        warn = ""
        if marks["cart"]:
            warn = " <-- CARTESIAN"
        elif marks["bnlj"] and not scalar_bcast:
            warn = " <-- NON-EQUI JOIN (intentional? check docstring)"
        if warn:
            flagged += 1
        print(
            f"{name:40s} bhj={marks['bhj']} smj={marks['smj']} "
            f"shj={marks['shj']} bnlj={marks['bnlj']} "
            f"exchanges={marks['xchg']}{warn}"
        )
    print(f"\n{len(names)} plans audited, {flagged} flagged")


if __name__ == "__main__":
    main()
