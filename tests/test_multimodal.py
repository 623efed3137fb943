"""decode_image guard behavior (round-5 verdict #2, hardened in r6).

The decoder may use PIL only for payloads carrying a BINARY image
magic signature; everything else — including PIL-decodable ASCII
formats like netpbm — takes the deterministic byte-length fake.  That
makes "installing PIL never changes the certified queries' results on
a text corpus" a provable property: the certified multimodal oracles
encode the fake's formula, and text payloads can never reach PIL.
"""

from __future__ import annotations

import contextlib
import sys
import types

PNGISH = b"\x89PNG\r\n\x1a\nfake-but-magic-prefixed"


def _fake_dims(payload: bytes) -> dict:
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n // 7) % 64}


@contextlib.contextmanager
def _fake_pil(open_fn):
    """Install a minimal fake PIL/PIL.Image into sys.modules."""
    pil = types.ModuleType("PIL")
    image = types.ModuleType("PIL.Image")
    image.open = open_fn
    pil.Image = image
    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image")}
    sys.modules["PIL"] = pil
    sys.modules["PIL.Image"] = image
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@contextlib.contextmanager
def _no_pil():
    """Force `import PIL.Image` to raise ImportError even when a real
    PIL is installed (None in sys.modules blocks the import)."""
    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image")}
    sys.modules["PIL"] = None
    sys.modules.pop("PIL.Image", None)
    try:
        yield
    finally:
        sys.modules.pop("PIL", None)
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v


def test_decode_image_falls_back_without_pil():
    """A magic-prefixed payload with NO importable PIL → ImportError
    path → deterministic fake."""
    from tailsql_spark.operators.multimodal import decode_image

    with _no_pil():
        assert decode_image(PNGISH) == _fake_dims(PNGISH)


def test_decode_image_uses_pil_for_magic_payloads():
    from tailsql_spark.operators.multimodal import decode_image

    class _Im:
        width, height = 640, 480

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    with _fake_pil(lambda buf: _Im()):
        assert decode_image(PNGISH) == {"width": 640, "height": 480}


def test_decode_image_with_pil_present_never_raises_on_bad_payload():
    """The round-5 defect: PIL being importable must not break the
    pipeline — an undecodable magic-prefixed payload takes the fake."""
    from tailsql_spark.operators.multimodal import decode_image

    def _raise(buf):
        raise OSError("cannot identify image file")

    with _fake_pil(_raise):
        assert decode_image(PNGISH) == _fake_dims(PNGISH)


def test_text_payloads_never_reach_pil():
    """The r6 hardening: a TEXT payload PIL could decode (netpbm is
    valid ASCII) must still take the deterministic fake — the magic
    gate, not codec availability, decides.  A fake PIL that would
    happily return wrong dims proves PIL was never consulted."""
    from tailsql_spark.operators.multimodal import decode_image

    class _EvilIm:
        width, height = 4, 4

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    netpbm = b"P1 4 4\n0 1 0 1 0 1 0 1 0 1 0 1 0 1 0 1"
    # ASCII image magics (GIF87a / BM / RIFF) can legitimately start a
    # TEXT document — the binary (non-UTF-8) requirement must keep
    # those on the fake path too, not just magic-less text
    gif_prose = b"GIF87a is an image container format from 1987, ..."
    with _fake_pil(lambda buf: _EvilIm()):
        assert decode_image(netpbm) == _fake_dims(netpbm)
        assert decode_image(gif_prose) == _fake_dims(gif_prose)


def test_multimodal_metadata_formula_end_to_end(spark, oracle_sf_dir):
    """End-to-end invariant: the certified query's dims follow the
    deterministic-fake formula over the whole synthetic corpus.  Note:
    mapInPandas runs in separate Python worker processes that resolve
    imports independently, so driver-side sys.modules patches cannot
    reach them — the guard itself is covered by the unit tests above;
    this test pins the formula the oracles encode (which the
    magic-byte gate guarantees for text payloads in ANY environment,
    PIL installed or not)."""
    from pyspark.sql import functions as F

    from tailsql_spark.plans.registry import REGISTRY

    df = REGISTRY["multimodal_metadata"].build(spark, oracle_sf_dir)
    bad = df.filter(
        (F.col("width") != 16 + F.col("n_bytes") % 64)
        | (F.col("height") != 16 + F.floor(F.col("n_bytes") / 7) % 64)
    ).count()
    assert bad == 0


def test_phash_fake_path_is_pil_independent():
    """Text payloads (valid UTF-8) take the deterministic fake path
    whether or not PIL is importable: force_fake and the default gate
    must agree on every synthetic payload shape."""
    from tailsql_spark.operators.multimodal import phash_bands

    for payload in (
        b"plain prose payload",
        b"GIF87a looks like a magic but is valid UTF-8 prose",
        b"",
        "unicode éü text".encode("utf-8"),
    ):
        assert phash_bands(payload) == phash_bands(payload, force_fake=True)
        # deterministic across calls
        assert phash_bands(payload) == phash_bands(payload)


def test_phash_bands_match_sql_nibble_arithmetic():
    """The Python fake path and the oracle's SQL nibble arithmetic are
    the same function: replay the SQL construction in DuckDB over raw
    strings and compare band ints."""
    import duckdb

    from tailsql_spark.operators.multimodal import (
        _phash_band_sql_exprs,
        phash_bands,
    )

    exprs = ", ".join(_phash_band_sql_exprs())
    for text in ("hello world", "a", "", "the quick brown fox"):
        got = phash_bands(text.encode("utf-8"), force_fake=True)
        row = duckdb.sql(
            "WITH h AS (SELECT md5($t) || md5($t || 'a') || md5($t || 'b') AS hx) "
            f"SELECT {exprs} FROM h".replace("$t", f"'{text}'")
        ).fetchone()
        assert tuple(row) == got, text


def test_phash_banding_lossless_for_hamming_ball(spark):
    """Pigeonhole certification on adversarial band vectors: the banded
    candidate path finds EXACTLY the brute-force pairs at distance <=
    PHASH_HAMMING_MAX — including planted near-dups at distances 1..3
    and excluding a distance-4 pair that still shares no band."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        phash_near_groups,
    )

    base = [0xAAAA, 0x5555, 0x0F0F, 0x3333]
    rows = [(1, *base, 1)]
    # distances 1..3: flip that many bits spread across bands
    flips = [(0, 0), (1, 3), (2, 7), (3, 11)]
    for d in (1, 2, 3):
        v = list(base)
        for k, bit in flips[:d]:
            v[k] ^= 1 << bit
        rows.append((10 + d, *v, 1))
    # distance 4, one flip in every band: shares NO band with base
    v4 = [b ^ (1 << (2 * k)) for k, b in enumerate(base)]
    rows.append((40, *v4, 1))
    # far-away group, random-ish
    rows.append((99, 0x1234, 0x8765, 0x4321, 0x9ABC, 1))
    grp = spark.createDataFrame(
        rows, "canonical_doc long, b0 long, b1 long, b2 long, b3 long, n_docs long"
    )
    out = {r.canonical_doc: r for r in phash_near_groups(grp).collect()}
    # brute force
    import itertools

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a[1:5], b[1:5]))

    want_near = {r[0]: [] for r in rows}
    for a, b in itertools.combinations(rows, 2):
        d = ham(a, b)
        if d <= PHASH_HAMMING_MAX:
            want_near[a[0]].append(d)
            want_near[b[0]].append(d)
    assert len(out) == len(rows)
    for doc, ds in want_near.items():
        assert out[doc].n_near_groups == len(ds), doc
        assert out[doc].min_hamming == (min(ds) if ds else None), doc
    # the planted near-dups really were found through bands
    assert out[1].n_near_groups >= 3 and out[40].min_hamming != 4


def test_audio_cdc_realignment_property():
    """The FastCDC property: inserting a token changes only the chunk
    containing the edit — every frame after the next boundary hashes
    identically, so shifted duplicates still share most frames.
    Fixed-offset chunking loses all post-edit frames; CDC must not."""
    import random

    from tailsql_spark.operators.multimodal import audio_fingerprint_frames

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(200)]
    for trial in range(25):
        toks = [rng.choice(vocab) for _ in range(rng.randint(20, 120))]
        frames = audio_fingerprint_frames(toks)
        pos = rng.randrange(len(toks))
        edited = toks[:pos] + ["INSERTED"] + toks[pos:]
        frames2 = audio_fingerprint_frames(edited)
        # frames strictly before the edited chunk are byte-identical
        # (prefix preserved), and the suffix after the edit's chunk
        # re-aligns: the shared-set size must cover every frame except
        # those overlapping the single edited chunk.
        lost = set(frames) - set(frames2)
        # the edit damages at most 1 chunk of the original (the chunk
        # containing the insertion point), so at most one DISTINCT
        # frame can disappear — everything after re-aligns
        assert len(lost) <= 1, (trial, toks, pos)


def test_audio_tokens_real_wav_path():
    """A genuine binary WAV payload decodes through stdlib wave into
    hex PCM windows; the same bytes with the magic broken fall back to
    the fake path."""
    import io
    import wave

    from tailsql_spark.operators.multimodal import (
        AUDIO_PCM_WINDOW,
        audio_tokens,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        # 1500 samples of a ramp — 3000 PCM bytes, genuinely binary
        wv.writeframes(
            b"".join(
                (i % 251 - 125).to_bytes(2, "little", signed=True)
                for i in range(1500)
            )
        )
    payload = buf.getvalue()
    assert payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"
    toks = audio_tokens(payload)
    # 3000 bytes / 512-byte windows -> 6 windows, hex-encoded
    assert len(toks) == -(-3000 // AUDIO_PCM_WINDOW)
    assert all(set(t) <= set("0123456789abcdef") for t in toks)
    # deterministic
    assert toks == audio_tokens(payload)


def test_audio_text_payload_never_reaches_wave():
    """A valid-UTF-8 payload that happens to start with RIFF..WAVE
    stays on the fake (whitespace-token) path — the binary gate, same
    provable property as the PIL gate."""
    from tailsql_spark.operators.multimodal import audio_tokens

    payload = b"RIFFxxxxWAVE this is prose that mimics a wav header"
    assert audio_tokens(payload) == payload.decode("utf-8").split(" ")


def test_audio_frames_match_sql_chunk_arithmetic():
    """Python CDC chunking and the oracle's SQL prefix-sum chunking are
    the same function: replay the SQL construction in DuckDB over a raw
    token list and compare frame-hash sets in order."""
    import duckdb

    from tailsql_spark.operators.multimodal import (
        audio_fingerprint_frames,
        audio_tokens,
    )

    for text in (
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "solo",
        "  padded   with   runs\tof\nwhitespace  ",
    ):
        toks = audio_tokens(text.encode("utf-8"))
        got = audio_fingerprint_frames(toks)
        want = [
            r[0]
            for r in duckdb.sql(
                """
                WITH audio AS (
                    SELECT list_filter(regexp_split_to_array($t, '\\s+'),
                                       x -> x <> '') AS ws
                ),
                words AS (SELECT k AS pos, ws[k + 1] AS word
                          FROM audio, LATERAL unnest(range(0, len(ws))) AS t(k)),
                flagged AS (SELECT pos, word,
                                   CASE WHEN substr(md5(word), 1, 1)
                                        IN ('0','1','2','3') THEN 1 ELSE 0 END AS bdy
                            FROM words),
                chunks AS (SELECT pos, word,
                                  COALESCE(SUM(bdy) OVER (ORDER BY pos
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS cid
                           FROM flagged)
                SELECT substr(md5(string_agg(word, ' ' ORDER BY pos)), 1, 15) AS fh
                FROM chunks GROUP BY cid ORDER BY cid
                """.replace("$t", "'" + text.replace("'", "''") + "'")
            ).fetchall()
        ]
        assert got == want, text


def test_audio_near_groups_df_cap_kills_hot_frames(spark):
    """A frame present in > AUDIO_DF_CAP docs (corpus boilerplate) must
    be pruned BEFORE pairing: plant one hot frame across 70 docs plus a
    genuine 2-frame match pair, and assert only the pair survives."""
    from tailsql_spark.operators.multimodal import (
        AUDIO_DF_CAP,
        audio_near_groups,
    )

    rows = [(i, "hotframe") for i in range(AUDIO_DF_CAP + 6)]
    rows += [(1000, "fa"), (1000, "fb"), (1001, "fa"), (1001, "fb")]
    ff = spark.createDataFrame(rows, "doc_id long, fh string")
    ids = ff.select("doc_id").distinct()
    out = {r.doc_id: r for r in audio_near_groups(ids, ff).collect()}
    assert out[1000].n_matches == 1 and out[1000].best_match_doc == 1001
    assert out[1001].best_common == 2
    # every hot-frame-only doc: no frames kept, no matches
    assert all(
        out[i].n_frames == 0 and out[i].n_matches == 0
        for i in range(AUDIO_DF_CAP + 6)
    )


def test_video_frame_bands_deterministic_and_codec_gated():
    """Per-(payload, frame) dHash bands are deterministic, per-frame
    distinct, and a valid-UTF-8 payload wearing a video magic stays on
    the fake path (the binary gate — same provable codec-independence
    as the PIL/wave gates)."""
    from tailsql_spark.operators.multimodal import (
        PHASH_BANDS,
        VIDEO_FRAME_CHARS,
        phash_bands,
        video_frame_bands,
    )

    p = ("scene one " * 10 + "scene two " * 10).encode()  # spans 2+ frames
    b0 = video_frame_bands(p, 0)
    assert b0 == video_frame_bands(p, 0)
    assert len(b0) == PHASH_BANDS and all(0 <= b < 1 << 16 for b in b0)
    assert b0 != video_frame_bands(p, 1)  # different segments, different hash
    # fake path == chained-md5 phash over the frame's payload SEGMENT
    # (the contract the SQL oracle replays) — content-keyed, so a
    # second video sharing the segment shares the hash position-free
    seg = p.decode()[:VIDEO_FRAME_CHARS].encode()
    assert b0 == phash_bands(seg, force_fake=True)
    assert video_frame_bands(p[: 2 * VIDEO_FRAME_CHARS] + b" tail differs", 0) == b0
    # UTF-8 text with an MP4 magic prefix never reaches a decoder
    mp4ish = b"\x00\x00\x00 ftypisom prose pretending to be a movie"
    assert mp4ish.decode("utf-8") and video_frame_bands(mp4ish, 0) == phash_bands(
        mp4ish[:VIDEO_FRAME_CHARS], force_fake=True
    )


def test_video_near_groups_exact_dup_and_threshold(spark):
    """Two identical payloads share EVERY band posting and must match
    with best_common = their posting count; a single-band random
    collision (< VIDEO_MIN_SHARED) must NOT match."""
    from pyspark.sql import functions as F

    from tailsql_spark.operators.multimodal import (
        VIDEO_DF_CAP,
        VIDEO_MIN_SHARED,
        audio_near_groups,
        video_band_postings,
    )

    payload = b"duplicated clip payload with enough bytes to span frames"
    rows = [(1, bytearray(payload)), (2, bytearray(payload)), (3, bytearray(b"unrelated third clip"))]
    vids = spark.createDataFrame(rows, "doc_id long, payload binary")
    post = video_band_postings(vids)
    n_postings = {r.doc_id: r.n for r in post.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    out = {
        r.doc_id: r
        for r in audio_near_groups(
            post.select("doc_id").distinct(), post,
            df_cap=VIDEO_DF_CAP, min_shared=VIDEO_MIN_SHARED,
        ).collect()
    }
    assert out[1].best_match_doc == 2 and out[2].best_match_doc == 1
    assert out[1].best_common == n_postings[1] == n_postings[2]
    assert out[3].n_matches == 0 and out[3].best_match_doc is None


def test_long_posting_keys_bit_identical_to_string_forms(spark):
    """r17 narrowed the batch posting shuffle keys (guide §2.3): audio
    fh = int(hex15, 16) (15 md5 nibbles = 60 bits, injective into
    int64), video fh = band_idx * 2**16 + band_value (bands are 16-bit,
    injective).  Pin both encodings bit-identical to the string
    definitions the oracles replay, over real decode paths."""
    import pandas as pd

    from tailsql_spark.operators.multimodal import (
        _video_band_postings_pdf,
        audio_fingerprint_frames,
        audio_posting_rows,
        audio_tokens,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (3, "solo"),
        (4, "shared scene content across two clips " * 12),
        (5, "shared scene content across two clips " * 12 + " trailer"),
    ]
    # audio: the Spark builder's long keys == int(hex frames, 16)
    audio = spark.createDataFrame(
        [(i, bytearray(t.encode("utf-8"))) for i, t in texts],
        "doc_id long, payload binary",
    )
    got = {(r.doc_id, r.fh) for r in audio_posting_rows(audio).collect()}
    want = {
        (i, int(fh, 16))
        for i, t in texts
        for fh in audio_fingerprint_frames(audio_tokens(t.encode("utf-8")))
    }
    assert got == want
    assert audio_posting_rows(audio).schema["fh"].dataType.typeName() == "long"
    # video: as_long postings decode exactly to the string postings
    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series([i for i, _ in texts], dtype="int64"),
            "payload": [t.encode("utf-8") for _, t in texts],
        }
    )
    s = _video_band_postings_pdf(pdf)
    lg = _video_band_postings_pdf(pdf, as_long=True)
    dec = {
        (d, f"{fh >> 16}:{fh & 0xFFFF}")
        for d, fh in zip(lg["doc_id"], lg["fh"])
    }
    assert dec == set(zip(s["doc_id"], s["fh"]))
    assert str(lg["fh"].dtype) == "int64"


def test_posting_builders_dedup_in_stage(spark):
    """r17 §10: the audio/video posting builders dedup (doc_id, fh)
    INSIDE the Arrow stage — a doc is one input row, so the distinct
    is per-doc local and needs no Spark-side shuffle.  Pin (a) the
    output duplicate-free, (b) multiset-identical to the old
    mapInPandas(raw).distinct() formulation, (c) the builder plan
    Exchange-free.  The corpus plants heavy IN-DOC repetition so the
    raw emission genuinely contains duplicates."""
    import pandas as pd

    from tailsql_spark.operators.multimodal import (
        _video_band_postings_pdf,
        audio_fingerprint_frames,
        audio_posting_rows,
        audio_tokens,
        video_band_postings,
    )

    texts = [
        (1, "loop segment alpha beta gamma delta " * 30),
        (2, "loop segment alpha beta gamma delta " * 30 + " coda"),
        (3, "x y z w " * 50),
    ]
    rows = [(i, bytearray(t.encode("utf-8"))) for i, t in texts]
    audio = spark.createDataFrame(rows, "doc_id long, payload binary")

    # raw (duplicate-carrying) emission really has duplicates
    n_raw = sum(
        len(audio_fingerprint_frames(audio_tokens(t.encode("utf-8"))))
        for _, t in texts
    )
    built = audio_posting_rows(audio)
    got = built.collect()
    assert n_raw > len(got), "corpus must plant in-doc duplicate frames"
    # duplicate-free and equal to the old Spark-side distinct
    want = {
        (i, int(fh, 16))
        for i, t in texts
        for fh in audio_fingerprint_frames(audio_tokens(t.encode("utf-8")))
    }
    assert len(got) == len(want) and {(r.doc_id, r.fh) for r in got} == want
    plan = built._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    video = spark.createDataFrame(rows, "doc_id long, payload binary")
    vbuilt = video_band_postings(video)
    vgot = vbuilt.collect()
    vpdf = pd.DataFrame(
        {
            "doc_id": pd.Series([i for i, _ in texts], dtype="int64"),
            "payload": [t.encode("utf-8") for _, t in texts],
        }
    )
    vraw = _video_band_postings_pdf(vpdf, as_long=True)
    assert len(vraw) > len(vgot), "corpus must plant in-doc duplicate bands"
    vwant = set(map(tuple, vraw.drop_duplicates().itertuples(index=False)))
    assert len(vgot) == len(vwant) and {(r.doc_id, r.fh) for r in vgot} == vwant
    vplan = vbuilt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in vplan, vplan
