"""The doubling dial for persisted-layout bucket/cell counts, shared
by the serving indexes (BM25 term buckets, IVF cells) and mirrored by
the streaming state's ``state_bucket_count`` (streaming_exec.py).

One rule, two materializations that CANNOT drift: the Python builder
picks the count with :func:`doubling_dial`, and the DuckDB content
oracle recomputes the identical count from the identical row count via
the CASE ladder :func:`dial_case_sql` generates FROM THE SAME
constants.  The ladder enumerates exactly the doubling loop's steps in
pure integer comparisons — no log2/float anywhere, so there is no
boundary where float rounding could make the two sides disagree.

Why a dial at all: a fixed bucket count is wrong at both ends — too
many buckets at small corpora (tiny fragmented files, probe overhead)
and, fatally, too few at 100 TB (each probed directory degenerates
toward a full scan).  Doubling from the base keeps rows/bucket at or
under the target, so a probe's per-bucket read stays task-sized as the
corpus grows three decades.
"""

from __future__ import annotations


def doubling_dial(n_rows: int, base: int, target: int, cap: int) -> int:
    """Smallest power-of-two multiple of ``base`` whose buckets hold at
    most ``target`` rows each, capped at ``cap``: doubles from ``base``
    while ``n_rows > buckets * target``."""
    b = base
    while b < cap and n_rows > b * target:
        b *= 2
    # The loop can overshoot when cap is not base*2^k (base=16,
    # cap=100 doubles to 128); dial_case_sql's ELSE branch returns cap
    # exactly, so clamp here or the two "cannot drift" twins would
    # disagree at the cap boundary.
    return min(b, cap)


def dial_case_sql(n_expr: str, base: int, target: int, cap: int) -> str:
    """The SQL twin of :func:`doubling_dial`: a CASE ladder over the
    row-count expression ``n_expr`` with one WHEN per doubling step —
    integer-exact, generated from the same constants the Python side
    uses, so the oracle's count equals the builder's by construction."""
    whens = []
    b = base
    while b < cap:
        whens.append(f"WHEN ({n_expr}) <= {b * target} THEN {b}")
        b *= 2
    return "CASE " + " ".join(whens) + f" ELSE {cap} END"
