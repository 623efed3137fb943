"""As-of (backward) join — delegated-dialect capability re-built Spark-first.

The reference's embedded DuckDB dialect includes ``ASOF JOIN``
(SURVEY §2B "joins — as-of"); Spark has no native as-of join, so this
implements the scalable *union-merge* formulation:

1. normalize both sides to (key, ts, payload...) and tag them;
2. union and shuffle ONCE on key (window partition);
3. per key, ordered by (ts, side-tag), carry the most recent right-side
   payload forward with ``last(..., ignorenulls=True)``;
4. keep left rows; matched payload is the as-of match.

Why this beats the naive range-join: a range join on ``r.ts <= l.ts``
is O(|L|·|R|) per key for Catalyst (BNLJ); the union-merge is one
shuffle + one sort — O((|L|+|R|) log) per partition, the same plan
shape DuckDB's ASOF executes natively, and it scales to 100 TB because
it is just a window over a single co-partitioned sort (AQE handles
skewed keys).

Determinism: right rows are pre-deduped to one row per (key, ts) by a
caller-supplied tiebreak — engines disagree on which tied row wins
otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    inner: bool = True,
    prune_right: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key.

    ``right`` must already be unique per (on, right_ts); callers dedupe
    with their own tiebreak to keep results engine-deterministic.

    ``prune_right``: semi-join the right side down to keys that exist on
    the left before the merge. When the left is selective (a filtered
    probe against a large history table — the common as-of shape), this
    keeps the single shuffle+sort proportional to the MATCHED key set
    instead of the full right table; Spark plans the semi join as a
    broadcast when the left is small enough, so the prune itself adds
    no shuffle. Leave off when left keys ≈ right keys (pure overhead).
    """
    if prune_right:
        right = right.join(
            F.broadcast(left.select(on).distinct()), on, "left_semi"
        )
    lcols = left.columns
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_payload],
    )
    # superset schema: left payload nulls on right rows and vice versa
    for c in right_payload:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    r = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        "__ts",
        "__side",
        *right_payload,
    )
    unioned = l.select(r.columns).unionByName(r)
    # right rows sort BEFORE left rows at equal ts → `<=` semantics
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in unioned.columns],
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__m_{c}")
            for c in right_payload
        ],
    )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(c) for c in right_payload],
    )
    if inner:
        pred: Column = F.col(right_payload[0]).isNotNull()
        out = out.filter(pred)
    return out
