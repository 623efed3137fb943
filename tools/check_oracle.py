#!/usr/bin/env python
"""Local differential-oracle gate: run every registered query through
Spark AND its DuckDB oracle SQL, compare row count + column names +
order-insensitive values. Mirrors the driver's CORRECTNESS check so
failures surface before a round ends.

Driver-strict since round 2: both sides are fetched through pandas
(the driver's path), cells are compared with TYPE TAGS and FULL float
precision.  This is what exposes DuckDB's HUGEINT-for-SUM(BIGINT)
(float64 via pandas) against Spark's LongType (int64) — the sole root
cause of the 12 round-1 hash failures.  The mirror must be at least as
strict as the thing it mirrors.

Usage: python tools/check_oracle.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import datetime
import math
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    """Type-tagged, full-precision cell normalization.

    int vs float vs Decimal are DISTINCT (the driver's hash is
    type-sensitive); floats use repr() (shortest round-trip = full
    precision).  Temporal values normalize representation (Timestamp vs
    datetime, ns vs us) but not type-vs-value — the driver demonstrably
    accepts equal timestamps across engines (scalar_date_funcs green in
    r01).
    """
    # NaN floats first (NaN != NaN breaks tuple comparison)
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        return f"float:{v!r}"
    if isinstance(v, Decimal):
        # Normalize trailing zeros so 3.50 == 3.5, but keep the tag
        # distinct from float: a Decimal on one side only is a bug.
        return f"dec:{v.normalize()}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return "str:" + str(v)


def _df_to_cells(df) -> list[list]:
    """pandas DataFrame -> list of python-typed rows.

    .tolist() per column converts numpy scalars to native python
    (int64->int, float64->float) while preserving the int/float dtype
    distinction — which is exactly where HUGEINT-vs-LongType surfaces.
    """
    import numpy as np
    import pandas as pd

    cols = []
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            cols.append([None if pd.isnull(x) else x.to_pydatetime() for x in s])
        else:
            vals = s.tolist()
            out = []
            for x in vals:
                if isinstance(x, np.ndarray):
                    x = x.tolist()
                elif isinstance(x, pd.Timestamp):
                    x = x.to_pydatetime()
                elif x is pd.NaT:
                    x = None
                out.append(x)
            cols.append(out)
    return [list(row) for row in zip(*cols)] if cols else []


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
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle (rows-only, {len(spdf)} rows)")
            n_skip += 1
            continue
        try:
            dpdf = con.execute(spec.oracle).df()
            dcols = list(dpdf.columns)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if not problems:
            s_n = norm_rows(scols, _df_to_cells(spdf[scols]))
            d_n = norm_rows(dcols, _df_to_cells(dpdf[dcols]))
            if s_n != d_n:
                diffs = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
                sset, dset = set(d_n), set(s_n)
                only_s = [r for r in s_n if r not in sset][:2]
                only_d = [r for r in d_n if r not in dset][:2]
                problems.append(
                    f"values differ; first diffs={diffs} only_spark={only_s} only_duck={only_d}"
                )
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
