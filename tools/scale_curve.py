#!/usr/bin/env python
"""Measured scale curve for the LLM-pipeline headliners (r8).

The repo's 100 TB claims were plan-SHAPE assertions until this round;
this tool converts them into measured wall-time ratios.  It derives an
N× corpus from $SPARK_GRAFT_SF_DIR (default sf0.1) by a DETERMINISTIC
SALTED SELF-UNION — never touching the read-only testdata:

* ``documents``: each of the N replicas remaps ``doc_id → doc_id·N +
  rep`` and suffixes every TOKEN with ``~rep``.  Token-salting is a
  bijection on shingles, so within-replica Jaccard structure is
  preserved exactly while cross-replica Jaccard is 0 — the near-dup
  pair population scales exactly N×, not N²× (suffixing whole docs
  would make every doc near-identical to its 9 clones and the verify
  stage would blow up by construction, not by operator defect).
* ``embeddings``: ``vec_id → vec_id·N + rep``, vectors unchanged — the
  fixed query block (vec_id < N_QUERIES) probes an N× index, the
  production shape of index growth.
* the other eight tables copy verbatim (the headliners don't scan
  them; the catalog loads their footers only).

For each headline query it reports min-of-3 wall seconds at 1× and N×
and the time ratio.  Interpretation notes belong in SCALING.md's
"Measured scale curve" section, which this prints a ready-to-paste
markdown table for.

Usage: python tools/scale_curve.py [--factor 10] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = (
    "dedup_minhash_lsh",
    "text_contamination_bloom",
    "ann_ivfpq_topk",
    "corpus_curation_survivors",
)

COPY_TABLES = (
    "region nation customer supplier part orders lineitem events".split()
)


def build_scaled_corpus(spark, src: str, factor: int) -> str:
    from pyspark.sql import functions as F

    from tailsql_spark.plans.connectors import _stage_dir

    # keyed by source path AND content fingerprint (the _stage_dir
    # discipline): a regenerated or different source corpus mints a
    # fresh scaled corpus instead of silently reusing a stale one
    dest = _stage_dir(src, f"scale{factor}x",
                      src_tables=("documents", "embeddings"))
    if os.path.exists(os.path.join(dest, "_DONE")):
        return dest
    os.makedirs(dest, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    docs = spark.read.parquet(f"{src}/documents.parquet")
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(split(text, ' '),"
                " w -> concat(w, '~', CAST(rep AS STRING))))"
            ).alias("text"),
            "lang",
            "source",
            "n_chars",  # original value: per-replica gate behavior identical
        )
        .repartition(4 * factor)
        .write.mode("overwrite")
        .parquet(f"{dest}/documents.parquet")
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(4 * factor)
        .write.mode("overwrite")
        .parquet(f"{dest}/embeddings.parquet")
    )
    for tbl in COPY_TABLES:
        s, d = f"{src}/{tbl}.parquet", f"{dest}/{tbl}.parquet"
        if os.path.isfile(s):
            shutil.copy(s, d)
        else:
            shutil.copytree(s, d, dirs_exist_ok=True)
    with open(f"{dest}/_DONE", "w") as fh:
        fh.write("ok")
    return dest


def time_query(spark, name: str, sf_dir: str, runs: int) -> float:
    from tailsql_spark.plans.registry import REGISTRY

    spec = REGISTRY[name]
    spec.build(spark, sf_dir).toPandas()  # warmup: codegen + JIT
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=list(HEADLINERS))
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tailsql_spark.session import get_spark

    spark = get_spark(app_name="tailsql_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_scaled_corpus(spark, src, args.factor)
    print(f"# scaled corpus at {dest}", file=sys.stderr)

    rows = []
    for name in args.queries:
        t1 = time_query(spark, name, src, args.runs)
        tn = time_query(spark, name, dest, args.runs)
        rows.append(
            {
                "query": name,
                "t_1x_sec": round(t1, 3),
                f"t_{args.factor}x_sec": round(tn, 3),
                "ratio": round(tn / t1, 2),
            }
        )
        print(f"# {name}: 1x={t1:.3f}s {args.factor}x={tn:.3f}s "
              f"ratio={tn / t1:.2f}", file=sys.stderr)

    print(json.dumps({"factor": args.factor, "runs": args.runs, "rows": rows}))
    # ready-to-paste markdown
    print(f"\n| query | 1× sec | {args.factor}× sec | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(
            f"| {r['query']} | {r['t_1x_sec']} | "
            f"{r[f't_{args.factor}x_sec']} | {r['ratio']} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
