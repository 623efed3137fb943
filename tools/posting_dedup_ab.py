#!/usr/bin/env python
"""A/B the r17 §10 in-stage posting dedup (per-doc (doc_id, fh) dedup
inside the Arrow decode stage, no Spark-side ``.distinct()``) against
the pre-change shape (raw emission + distinct) for the audio and video
dedup engines — one session, untimed warmup, min-of-N interleaved
(the bench.py discipline), result-equality checked by full-row
checksum.  Default corpus: SPARK_GRAFT_SF_DIR scaled by AB_FACTOR
(default 100)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tailsql_spark.operators.multimodal import (  # noqa: E402
    VIDEO_DF_CAP,
    VIDEO_MIN_SHARED,
    _video_band_postings_pdf,
    audio_fingerprint_frames,
    audio_near_groups,
    audio_posting_rows,
    audio_tokens,
    synth_media,
    video_band_postings,
)
from tailsql_spark.session import get_spark  # noqa: E402
from tools.scale_curve import build_scaled_corpus  # noqa: E402


def audio_posting_rows_spark_distinct(audio):
    """The pre-§10 audio builder: raw frame emission + Spark distinct."""

    def fingerprint(batches):
        for pdf in batches:
            ids, fhs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fh in audio_fingerprint_frames(audio_tokens(bytes(payload))):
                    ids.append(doc_id)
                    fhs.append(int(fh, 16))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fh": pd.Series(fhs, dtype="int64"),
                }
            )

    return audio.mapInPandas(fingerprint, schema="doc_id long, fh long").distinct()


def video_band_postings_spark_distinct(videos):
    """The pre-§10 video builder: raw band emission + Spark distinct."""

    def emit(batches):
        for pdf in batches:
            yield _video_band_postings_pdf(pdf, as_long=True)

    return videos.mapInPandas(emit, schema="doc_id long, fh long").distinct()


def main() -> None:
    runs = int(os.environ.get("AB_RUNS", "3"))
    factor = int(os.environ.get("AB_FACTOR", "100"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tailsql_posting_dedup_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = build_scaled_corpus(spark, src, factor) if factor > 1 else src
    media = synth_media(spark, sf)
    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    video = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    ids_a, ids_v = audio.select("doc_id"), video.select("doc_id")

    def run_audio(post):
        df = audio_near_groups(ids_a, post)
        df.write.format("noop").mode("overwrite").save()
        return df

    def run_video(post):
        df = audio_near_groups(
            ids_v, post, df_cap=VIDEO_DF_CAP, min_shared=VIDEO_MIN_SHARED
        )
        df.write.format("noop").mode("overwrite").save()
        return df

    variants = {
        "audio_distinct": lambda: run_audio(audio_posting_rows_spark_distinct(audio)),
        "audio_instage": lambda: run_audio(audio_posting_rows(audio)),
        "video_distinct": lambda: run_video(video_band_postings_spark_distinct(video)),
        "video_instage": lambda: run_video(video_band_postings(video)),
    }

    def checksum(df):
        return df.agg(
            F.count("*"),
            F.sum(F.hash("doc_id", "n_frames", "n_matches",
                         "best_match_doc", "best_common")),
        ).collect()[0]

    # untimed warmup + result-equality check per modality
    sums = {name: checksum(fn()) for name, fn in variants.items()}
    assert sums["audio_distinct"] == sums["audio_instage"], sums
    assert sums["video_distinct"] == sums["video_instage"], sums
    print(f"# checksums equal: audio={tuple(sums['audio_instage'])} "
          f"video={tuple(sums['video_instage'])}", flush=True)

    best: dict[str, float] = {k: float("inf") for k in variants}
    for r in range(runs):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"round {r} {name:15s} {dt:7.2f}s", flush=True)
    print(f"# factor={factor} min-of-{runs}")
    for name, sec in best.items():
        print(f"{name:15s} {sec:7.2f}s")


if __name__ == "__main__":
    main()
