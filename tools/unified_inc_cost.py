#!/usr/bin/env python
"""Per-batch cost of the UNIFIED-CURATION streaming twin vs corpus
scale (r13 — VERDICT r11 #7 / r12 #8).

``stream_unified_curation`` is documented as the 100 TB curation path;
this measures that claim the way tools/incremental_cost.py measures
the MinHash probe: seed the composed state at 1x and at --factor x,
then time ONE fixed probe batch through the SAME
``_unified_batch_processor`` (text DAG sub-states + all three modality
posting logs under one batch id).  Flat t_batch across scales = the
claim, measured.

Seeding runs the processor itself over the whole seed corpus as one
giant batch — byte-identical to streamed accumulation, and seeding
cost is not what this measures.  The probe batch is sf0.001's docs,
re-id'd far above any corpus and token-salted so it collides with
nothing — identical content at every scale.

Prints one JSON line {"factor": N, "rows": [{"scale", "seed_docs",
"t_batch_sec"}...]} plus a markdown table on stderr.

Usage: python tools/unified_inc_cost.py [--factor 10] [--runs 2]
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


def _seed_roots(spark, root: str, docs):
    from tailsql_spark.plans.streaming_exec import _mh_bucketed_seed

    bands_root, ex_root, out_root = _mh_bucketed_seed(
        docs.select("doc_id", "text"), root
    )
    for sub, schema in (
        ("edges", "id_a long, id_b long"),
        ("labels", "doc_id long, cluster_id long"),
        ("attrs", "doc_id long, lang string, fingerprint string, n_tokens long"),
        ("ph", "doc_id long, b0 long, b1 long, b2 long, b3 long"),
        ("fpa", "doc_id long, fh string"),
        ("fpv", "doc_id long, fh string"),
    ):
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            f"{root}/{sub}/seed"
        )
    return bands_root, ex_root, out_root


def seed_and_probe(spark, docs_path: str, probe_df, runs: int) -> dict:
    from tailsql_spark.plans.streaming_exec import (
        _audio_fp_batch_processor,
        _cc_batch_processor,
        _curation_batch_processor,
        _minhash_bucketed_processor,
        _phash_batch_processor,
        _unified_batch_processor,
        _video_fp_batch_processor,
    )

    docs = spark.read.parquet(docs_path).select(
        "doc_id", "lang", "text", "n_chars"
    )
    n_seed = docs.count()

    best = float("inf")
    for _ in range(runs):
        root = tempfile.mkdtemp(prefix="tailsql_unicost_")
        try:
            bands_root, ex_root, out_root = _seed_roots(spark, root, docs)
            process = _unified_batch_processor(
                _curation_batch_processor(
                    _minhash_bucketed_processor(bands_root, ex_root, out_root),
                    _cc_batch_processor(f"{root}/edges", f"{root}/labels"),
                    f"{root}/attrs",
                    out_root,
                ),
                _phash_batch_processor(f"{root}/ph"),
                _audio_fp_batch_processor(f"{root}/fpa"),
                _video_fp_batch_processor(f"{root}/fpv"),
            )
            t_seed0 = time.perf_counter()
            process(docs, 0)  # the accumulated state, byte-identical
            t_seed = time.perf_counter() - t_seed0
            t0 = time.perf_counter()
            process(probe_df, 1)
            best = min(best, time.perf_counter() - t0)
            print(
                f"#   seed batch {t_seed:.1f}s; probe {time.perf_counter()-t0:.2f}s",
                file=sys.stderr,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return {"seed_docs": n_seed, "t_batch_sec": round(best, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    src_1x = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from tailsql_spark.session import get_spark
    from tools.scale_curve import build_scaled_corpus

    spark = get_spark(app_name="tailsql_unified_inc_cost")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_scaled_corpus(spark, src_1x, args.factor)

    probe = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
            "lang",
            F.expr(
                "concat_ws(' ', transform(split(text, ' '), w -> concat(w, '~p')))"
            ).alias("text"),
            "n_chars",
        )
    )
    n_probe = probe.count()

    rows = []
    for label, path in (
        ("1x", f"{src_1x}/documents.parquet"),
        (f"{args.factor}x", f"{dest}/documents.parquet"),
    ):
        r = seed_and_probe(spark, path, probe, args.runs)
        r.update({"scale": label, "batch_docs": n_probe})
        rows.append(r)
        print(
            f"# {label}: seed={r['seed_docs']} docs, probe {n_probe} docs "
            f"→ {r['t_batch_sec']} s",
            file=sys.stderr,
        )

    print(json.dumps({"factor": args.factor, "runs": args.runs,
                      "probe_docs": n_probe, "rows": rows}))
    print("\n| seed corpus | seed docs | probe-batch sec |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['scale']} | {r['seed_docs']} | {r['t_batch_sec']} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
