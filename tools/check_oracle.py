#!/usr/bin/env python
"""Local differential-oracle gate: run every registered query through
Spark AND its DuckDB oracle SQL, compare row count + column names +
order-insensitive values. Mirrors the driver's CORRECTNESS check so
failures surface before a round ends.

Usage: python tools/check_oracle.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries pre-round; this collapses representation noise only
        return f"{v:.6g}" if v == v else "nan"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    args: list[str] = []
    sf_dir = SF_DIR
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif not a.startswith("--"):
            args.append(a)

    from tailsql_spark.plans.registry import REGISTRY
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    names = args or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(REGISTRY)}")
        return 2
    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.build(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle (rows-only, {len(srows)} rows)")
            n_skip += 1
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            s_n = norm_rows(scols, [[r[c] for c in scols] for r in srows])
            d_n = norm_rows(dcols, drows)
            if s_n != d_n:
                diffs = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
                only_s = [r for r in s_n if r not in set(d_n)][:2]
                only_d = [r for r in d_n if r not in set(s_n)][:2]
                problems.append(f"values differ; first diffs={diffs} only_spark={only_s} only_duck={only_d}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
