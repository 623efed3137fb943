#!/usr/bin/env python
"""A/B harness for the modality-stage variants of the unified curation
report at 100x (r16) — one session, one untimed warmup per variant,
then min-of-N interleaved so JVM/Python-worker startup and codegen are
out of the numbers (the bench.py discipline)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tailsql_spark.operators.multimodal import (  # noqa: E402
    AUDIO_DF_CAP,
    AUDIO_MIN_SHARED,
    VIDEO_DF_CAP,
    VIDEO_MIN_SHARED,
    _posting_minp,
    _unified_media_row,
    audio_posting_rows,
    phash_hash_groups,
    posting_kept,
    posting_match_pairs,
    synth_media,
    unified_image_row,
    video_band_postings,
)
from tailsql_spark.session import get_spark  # noqa: E402
from tools.scale_curve import build_scaled_corpus  # noqa: E402


def minp_explode(ids, ff, df_cap, min_shared):
    pairs = posting_match_pairs(posting_kept(ff, df_cap), min_shared)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("id"), F.col("id_b").alias("p")),
                F.struct(F.col("id_b").alias("id"), F.col("id_a").alias("p")),
            )
        ).alias("s")
    ).select("s.id", "s.p")
    mn = sym.groupBy("id").agg(F.min("p").alias("minp"))
    return ids.join(mn, ids["doc_id"] == mn["id"], "left").select("doc_id", "minp")


def main() -> None:
    runs = int(os.environ.get("AB_RUNS", "3"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tailsql_mm_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = build_scaled_corpus(spark, src, 100)
    media = synth_media(spark, sf)
    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    video = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    img = media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    ids_a, ids_v = audio.select("doc_id"), video.select("doc_id")

    def row_current_audio():
        return _unified_media_row(
            "audio", _posting_minp(ids_a, audio_posting_rows(audio),
                                   AUDIO_DF_CAP, AUDIO_MIN_SHARED)
        ).collect()

    def row_persist_audio():
        ff = audio_posting_rows(audio).persist()
        try:
            return _unified_media_row(
                "audio", _posting_minp(ids_a, ff, AUDIO_DF_CAP, AUDIO_MIN_SHARED)
            ).collect()
        finally:
            ff.unpersist()

    def row_persist_explode_audio():
        ff = audio_posting_rows(audio).persist()
        try:
            return _unified_media_row(
                "audio", minp_explode(ids_a, ff, AUDIO_DF_CAP, AUDIO_MIN_SHARED)
            ).collect()
        finally:
            ff.unpersist()

    def row_persist_pairs_audio():
        ff = audio_posting_rows(audio).persist()
        pairs = posting_match_pairs(
            posting_kept(ff, AUDIO_DF_CAP), AUDIO_MIN_SHARED
        ).persist()
        try:
            sym = pairs.select(
                F.col("id_a").alias("id"), F.col("id_b").alias("p")
            ).unionByName(pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("p")))
            mn = sym.groupBy("id").agg(F.min("p").alias("minp"))
            flags = ids_a.join(mn, ids_a["doc_id"] == mn["id"], "left").select(
                "doc_id", "minp"
            )
            return _unified_media_row("audio", flags).collect()
        finally:
            pairs.unpersist()
            ff.unpersist()

    def row_current_video():
        return _unified_media_row(
            "video", _posting_minp(ids_v, video_band_postings(video),
                                   VIDEO_DF_CAP, VIDEO_MIN_SHARED)
        ).collect()

    def row_persist_video():
        vf = video_band_postings(video).persist()
        try:
            return _unified_media_row(
                "video", _posting_minp(ids_v, vf, VIDEO_DF_CAP, VIDEO_MIN_SHARED)
            ).collect()
        finally:
            vf.unpersist()

    def row_current_image():
        return unified_image_row(phash_hash_groups(img)).collect()

    def row_persist_image():
        grp = phash_hash_groups(img).persist()
        try:
            return unified_image_row(grp).collect()
        finally:
            grp.unpersist()

    variants = {
        "audio_current": row_current_audio,
        "audio_persist": row_persist_audio,
        "audio_persist_explode": row_persist_explode_audio,
        "audio_persist_pairs": row_persist_pairs_audio,
        "video_current": row_current_video,
        "video_persist": row_persist_video,
        "image_current": row_current_image,
        "image_persist": row_persist_image,
    }
    expected: dict[str, object] = {}
    # untimed warmup, also records expected rows for equality checking
    for name, fn in variants.items():
        expected[name] = fn()
    base = {k.split("_")[0]: v for k, v in expected.items() if k.endswith("_current")}
    for name, got in expected.items():
        assert got == base[name.split("_")[0]], f"{name} result drift: {got}"
    best: dict[str, float] = {k: float("inf") for k in variants}
    for _ in range(runs):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, sec in best.items():
        print(f"{name:24s} {sec:7.2f}s")


if __name__ == "__main__":
    main()
