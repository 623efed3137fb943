"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension operators (BASELINE.json north star). Image/audio/video
content is carried as an opaque ``binary`` column with typed metadata;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through
row-at-a-time Python.

The decoder uses PIL when present and the payload decodes, and a
deterministic fake otherwise (see :func:`decode_image` — this
container ships no codecs, and the synthetic corpus is text bytes, so
the fake path is what the oracles certify): the Spark-side plumbing —
schema, binary Arrow transfer, batch iteration, partition layout, UDF
signature — is real and oracle-tested end-to-end via those
deterministic decodes (pure arithmetic on byte length, reproducible
in SQL).

Scale notes: binary payloads dominate bytes, not rows — at 100 TB the
working rules are (1) keep metadata in separate, narrow columns so
metadata-only queries never touch the blobs (parquet column pruning
does this for free); (2) size partitions by bytes not rows
(``maxPartitionBytes``); (3) never ``collect``/``groupBy`` raw blobs —
aggregate extracted features instead.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

MEDIA_TYPES = ("image", "audio", "video")


def query(name: str, category: str, oracle: str | None, doc: str = "", plan=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), plan=plan,
        )
        return fn

    return deco


#: magic-byte signatures of the image containers the real decoder is
#: allowed to touch.  The magic alone is NOT a sufficient gate —
#: ``GIF87a``/``BM``/``RIFF`` are printable ASCII, and netpbm headers
#: are pure text — so :func:`decode_image` ALSO requires the payload
#: to not be valid UTF-8: real image bodies contain invalid UTF-8
#: byte sequences, while any text corpus is UTF-8 by construction.
#: Together the two checks make "installing PIL never changes the
#: certified results on a text corpus" a provable property, not an
#: accident of which codecs are present.
_IMAGE_MAGIC = (
    b"\x89PNG\r\n\x1a\n",  # PNG
    b"\xff\xd8\xff",       # JPEG
    b"GIF87a", b"GIF89a",  # GIF
    b"BM",                 # BMP
    b"RIFF",               # WEBP (RIFF container)
    b"II*\x00", b"MM\x00*",  # TIFF
)


def _is_binary(payload: bytes) -> bool:
    """True iff the payload is NOT valid UTF-8 text."""
    try:
        payload.decode("utf-8")
        return False
    except UnicodeDecodeError:
        return True


def decode_image(payload: bytes) -> dict:
    """Decode an image payload to (width, height).

    Uses PIL when it is importable AND the payload carries an image
    magic signature AND is genuinely binary (not valid UTF-8) AND
    decodes; otherwise falls back to a deterministic fake keyed off
    byte length so the full pipeline stays testable in a codec-free
    container.  The binary+magic gate (see ``_IMAGE_MAGIC``) keeps
    text payloads — including ASCII-magic'd or PIL-decodable text
    like 'GIF87a…' prose or netpbm — on the fake path, so the
    certified queries' results are identical with or without PIL
    installed.
    """
    if payload.startswith(_IMAGE_MAGIC) and _is_binary(payload):
        try:
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(payload)) as im:
                return {"width": int(im.width), "height": int(im.height)}
        except Exception:
            pass
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n // 7) % 64}


def synth_media_rows(docs: DataFrame) -> DataFrame:
    """The per-row media projection (documents' utf-8 bytes as
    payloads, media type round-robined by doc_id) — pure, so the
    streaming twins can derive each BATCH's media rows from the batch's
    documents through the identical rule as the batch operators."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary corpus: documents' utf-8 bytes as payloads,
    media type round-robined by doc_id. Stands in for real blobs with
    identical plumbing."""
    return synth_media_rows(load_tables(spark, sf_dir)["documents"])


@query(
    "multimodal_metadata",
    "multimodal",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           CAST(length(text) AS BIGINT)          AS n_bytes,
           md5(text)                             AS content_md5,
           CAST(16 + length(text) % 64 AS BIGINT)        AS width,
           CAST(16 + (length(text) // 7) % 64 AS BIGINT) AS height,
           CAST(1 + length(text) % 30 AS BIGINT)         AS n_frames
    FROM documents
    """,
    doc="Binary decode/feature-extract stage: Arrow-batched mapInPandas "
    "over (doc_id, payload, media_type) emitting typed metadata; decode "
    "stubbed deterministically (no codecs in container), plumbing real.",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir)

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            decoded = payloads.map(decode_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": decoded.map(lambda d: d["width"]).astype("int64"),
                    "height": decoded.map(lambda d: d["height"]).astype("int64"),
                    "n_frames": (1 + n_bytes % 30).astype("int64"),
                }
            )

    return media.mapInPandas(
        extract,
        schema=(
            "doc_id long, media_type string, n_bytes long, content_md5 string, "
            "width long, height long, n_frames long"
        ),
    )


@query(
    "multimodal_frame_sample",
    "multimodal",
    """
    SELECT doc_id, CAST(unnest(range(0, 1 + length(text) % 30, 5)) AS BIGINT) AS frame_idx
    FROM documents
    WHERE CAST(doc_id % 3 AS INT) = 2
    """,
    doc="Frame sampling for video payloads: every 5th frame index "
    "exploded to rows (the shape a frame-decode stage consumes).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal_metadata(spark, sf_dir)
    return (
        meta.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("frame_idx"),
        )
        .select("doc_id", F.col("frame_idx").cast("long"))
    )


@query(
    "multimodal_stats_by_type",
    "multimodal",
    """
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(MAX(length(text)) AS BIGINT) AS max_bytes
    FROM documents GROUP BY 1
    """,
    doc="Metadata-only aggregation: must never touch payload bytes "
    "(column pruning keeps the scan narrow).",
)
def multimodal_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir)
    return (
        media.select("media_type", F.length("payload").cast("long").alias("nb"))
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("nb").alias("total_bytes"),
            F.max("nb").alias("max_bytes"),
        )
    )


@query(
    "multimodal_resize_plan",
    "multimodal",
    """
    SELECT doc_id,
           CAST(16 + length(text) % 64 AS BIGINT)        AS width,
           CAST(16 + (length(text) // 7) % 64 AS BIGINT) AS height,
           CAST(CASE WHEN greatest(16 + length(text) % 64, 16 + (length(text) // 7) % 64) > 48
                     THEN (16 + length(text) % 64) * 48
                          // greatest(16 + length(text) % 64, 16 + (length(text) // 7) % 64)
                     ELSE 16 + length(text) % 64 END AS BIGINT) AS out_w,
           CAST(CASE WHEN greatest(16 + length(text) % 64, 16 + (length(text) // 7) % 64) > 48
                     THEN (16 + (length(text) // 7) % 64) * 48
                          // greatest(16 + length(text) % 64, 16 + (length(text) // 7) % 64)
                     ELSE 16 + (length(text) // 7) % 64 END AS BIGINT) AS out_h
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
    """,
    doc="Resize stage for image payloads: aspect-preserving max-edge-48 "
    "target computed in exact integer math (w·48 // max(w,h)). The "
    "actual pixel resample is the stubbed codec step; the dimension "
    "plan, batch shape, and Arrow path are the real plumbing.",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal_metadata(spark, sf_dir)
    images = meta.filter(F.col("media_type") == "image")

    def plan_resize(batches):
        target = 48
        for pdf in batches:
            w, h = pdf["width"], pdf["height"]
            mx = pd.concat([w, h], axis=1).max(axis=1)
            scale_needed = mx > target
            out_w = w.where(~scale_needed, (w * target) // mx)
            out_h = h.where(~scale_needed, (h * target) // mx)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_w": out_w.astype("int64"),
                    "out_h": out_h.astype("int64"),
                }
            )

    return images.mapInPandas(
        plan_resize,
        schema="doc_id long, width long, height long, out_w long, out_h long",
    )


@query(
    "multimodal_feature_extract",
    "multimodal",
    f"""
    SELECT doc_id,
           {", ".join(f"CAST(concat('0x', substr(md5(text), {1 + 4 * k}, 4)) AS BIGINT) AS f{k}" for k in range(4))}
    FROM documents
    """,
    doc="Feature-extraction stage: payload → fixed-width integer "
    "feature vector (deterministic md5-derived fake standing in for a "
    "real encoder; a production encoder swaps the batch body, not the "
    "schema). Graded variant emits the 4 features as SCALAR columns "
    "f0..f3 (the driver's pandas canonicalizer cannot sort array "
    "cells — round-2 verdict); multimodal_feature_vector below keeps "
    "the array<bigint> shape the similarity/ANN operators consume.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir)

    def extract(batches):
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            cols = {"doc_id": pdf["doc_id"]}
            for k in range(4):
                cols[f"f{k}"] = digests.map(
                    lambda d, k=k: int(d[4 * k : 4 * k + 4], 16)
                ).astype("int64")
            yield pd.DataFrame(cols)

    return media.mapInPandas(
        extract, schema="doc_id long, f0 long, f1 long, f2 long, f3 long"
    )


@query(
    "multimodal_feature_vector",
    "multimodal",
    """
    SELECT doc_id,
           [CAST(concat('0x', substr(md5(text), 1 + 4 * k, 4)) AS BIGINT)
            FOR k IN range(0, 4)] AS features
    FROM documents
    """,
    doc="Array-shaped feature output (array<bigint>) for composition "
    "with the similarity/ANN operators. Values are identical to "
    "multimodal_feature_extract's f0..f3 — certified there with a "
    "driver-gradable scalar schema; this variant stays ungraded "
    "because top-level array columns break the driver canonicalizer.",
)
def multimodal_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    scalars = multimodal_feature_extract(spark, sf_dir)
    return scalars.select(
        "doc_id", F.array(*[F.col(f"f{k}") for k in range(4)]).alias("features")
    )


# ---------------------------------------------------------------------------
# perceptual-hash (dHash) image near-dup dedup
# ---------------------------------------------------------------------------

#: dHash geometry: a 9x8 grayscale thumbnail; bit j (row r = j//8,
#: col c = j%8) is 1 iff pixel(r,c) < pixel(r,c+1). 64 bits, split
#: into 4 bands of 16 bits for Hamming-ball candidate generation:
#: by pigeonhole, any pair within Hamming distance PHASH_HAMMING_MAX
#: (= bands - 1) leaves at least one band untouched, so banding is
#: LOSSLESS for the <= 3 ball (property-tested against brute force).
PHASH_BANDS = 4
PHASH_HAMMING_MAX = PHASH_BANDS - 1


#: persist-dial crossover for the modality engines (r16): below this
#: source footprint the cache barrier costs more than the avoided
#: recompute (measured at sf0.1, 0.6 MB: video row 2.46 s persisted vs
#: 1.76 s pipelined), above it decode-once wins (measured at 100x,
#: 84 MB: 3.9 s persisted vs 5.0 s).  Its own dial, NOT dedup's 256 MB
#: broadcast gate — that one answers "does the band table fit on the
#: driver", this one answers "is the decode worth materializing".
PERSIST_INPUT_BYTES = 4 << 20


def _big_corpus(sf_dir: str) -> bool:
    """Plan-time size gate for the modality engines' persist dials —
    the same source-footprint discipline as dedup's broadcast gate
    (directory-aware via ``catalog.source_bytes``), with the persist
    crossover threshold above."""
    from tailsql_spark.plans.catalog import source_bytes

    return source_bytes(f"{sf_dir}/documents.parquet") >= PERSIST_INPUT_BYTES


def _phash_bands_from_pixels(px: list) -> tuple:
    """4x16-bit dHash bands from a row-major 9x8 pixel list."""
    bands = [0, 0, 0, 0]
    for j in range(64):
        r, c = divmod(j, 8)
        if px[r * 9 + c] < px[r * 9 + c + 1]:
            bands[j // 16] |= 1 << (j % 16)
    return tuple(bands)


def phash_bands(payload: bytes, force_fake: bool = False) -> tuple:
    """Perceptual dHash of an image payload as 4x16-bit band ints.

    Real path (PIL importable AND payload carries image magic AND is
    genuinely binary AND decodes): grayscale 9x8 thumbnail, adjacent-
    pixel gradient bits — the standard dHash.  Fake path (everything
    else — the whole synthetic corpus, by the same binary+magic gate
    as :func:`decode_image`): the 72 "pixels" are the first 72 nibbles
    of a 3-chained md5 over the raw payload bytes, bit rule identical —
    deterministic and replayable in SQL (md5(text) chains), so the
    certified results are the same with or without PIL installed."""
    if not force_fake and payload.startswith(_IMAGE_MAGIC) and _is_binary(payload):
        try:
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(payload)) as im:
                px = list(im.convert("L").resize((9, 8)).getdata())
            return _phash_bands_from_pixels(px)
        except Exception:
            pass
    hx = (
        hashlib.md5(payload).hexdigest()
        + hashlib.md5(payload + b"a").hexdigest()
        + hashlib.md5(payload + b"b").hexdigest()
    )
    return _phash_bands_from_pixels([int(ch, 16) for ch in hx[:72]])


def _phash_band_sql_exprs() -> list:
    """The fake path's band arithmetic as SQL (both dialects): nibble
    i of the chained-md5 hex string ``hx`` via instr/substr (the
    dedup_simhash construction), dHash bit rule inlined per bit."""
    px = lambda i: f"(instr('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1)"  # noqa: E731
    exprs = []
    for k in range(PHASH_BANDS):
        terms = []
        for j in range(16 * k, 16 * k + 16):
            r, c = divmod(j, 8)
            terms.append(
                f"(CASE WHEN {px(r * 9 + c)} < {px(r * 9 + c + 1)}"
                f" THEN {1 << (j % 16)} ELSE 0 END)"
            )
        exprs.append("CAST(" + " + ".join(terms) + f" AS BIGINT) AS b{k}")
    return exprs


def _phash_hamming_sql(a: str, b: str) -> str:
    return (
        "("
        + " + ".join(
            f"bit_count(xor({a}.b{k}, {b}.b{k}))" for k in range(PHASH_BANDS)
        )
        + ")"
    )


_PHASH_ORACLE = f"""
    WITH img AS (
        SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
    ),
    ph AS (SELECT doc_id, {", ".join(_phash_band_sql_exprs())} FROM img),
    grp AS (
        SELECT b0, b1, b2, b3, MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_docs
        FROM ph GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
        -- brute force over distinct hashes: certifies the Spark side's
        -- banded candidate generation as LOSSLESS for the <= ball
        SELECT a.canonical_doc AS id_a, b.canonical_doc AS id_b,
               {_phash_hamming_sql('a', 'b')} AS hamming
        FROM grp a JOIN grp b ON a.canonical_doc < b.canonical_doc
        WHERE {_phash_hamming_sql('a', 'b')} <= {PHASH_HAMMING_MAX}
    ),
    near AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_near_groups,
               CAST(MIN(hamming) AS BIGINT) AS min_hamming
        FROM (SELECT id_a AS id, hamming FROM pairs
              UNION ALL SELECT id_b AS id, hamming FROM pairs) u
        GROUP BY id
    )
    SELECT g.canonical_doc, g.n_docs,
           COALESCE(n.n_near_groups, 0) AS n_near_groups,
           n.min_hamming
    FROM grp g LEFT JOIN near n ON g.canonical_doc = n.id
"""


@query(
    "multimodal_phash_dedup",
    "multimodal",
    _PHASH_ORACLE,
    plan=lambda s, d: phash_near_groups(
        phash_hash_groups(synth_media(s, d).filter(F.col("media_type") == "image")),
        persist_grp=_big_corpus(d),
    ),
    doc="Perceptual-hash (dHash) image near-dup dedup — the image-side "
    "twin of MinHash that any multimodal training corpus runs: payloads "
    "hash to 64-bit dHashes in an Arrow-batched mapInPandas stage (real "
    "PIL thumbnail gradient when the payload is a genuine image, the "
    "deterministic chained-md5 fake otherwise — same binary+magic gate "
    "as decode_image, so certified results are PIL-independent), "
    "identical hashes collapse in one exact groupBy, and near-dup "
    "GROUPS meet through 4x16-bit Hamming-ball banding (pigeonhole: "
    "any pair within distance 3 shares a band) before an exact "
    "bit_count verify — never an all-pairs join. The DuckDB oracle "
    "replays the identical nibble arithmetic from chained md5(text) "
    "and brute-forces the distance ball over distinct hashes, so a "
    "banding recall loss would surface as a row mismatch. At 100 TB: "
    "one groupBy shuffle on the 64-bit hash, then banding over "
    "DISTINCT hashes only; band width is the dial — b bands of 64/b "
    "bits cover distance b-1 and bucket population is n_groups/2^(64/b), "
    "so a web-scale corpus widens bands (2x32-bit for d<=1) or "
    "multi-probes rather than letting 16-bit buckets grow quadratic.",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir).filter(F.col("media_type") == "image")
    caches: list = []
    out = phash_near_groups(
        phash_hash_groups(media), persist_grp=_big_corpus(sf_dir), caches=caches
    )
    return _materialize_release(out, "multimodal_phash_dedup", sf_dir, caches)


def _materialize_release(
    df: DataFrame, name: str, sf_dir: str, caches: list
) -> DataFrame:
    """Release the size-gated persists a query build registered (r17,
    ADVICE r16 / guide §5): the registry queries return lazy frames, so
    a persist inside the build would otherwise leak MEMORY_AND_DISK
    blocks per big-corpus invocation on a long-lived driver.  With any
    cache registered, the (report-sized) result is materialized through
    the session warehouse — the ``_capped_pair_query`` discipline — and
    every handle unpersisted; with none (the bench/test sizes), the
    frame passes through untouched and the plan is byte-identical."""
    if not caches:
        return df
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    try:
        return materialize_result(df, name, key=sf_key(sf_dir))
    finally:
        for c in caches:
            c.unpersist()


def phash_rows(images: DataFrame) -> DataFrame:
    """(doc_id, b0..b3) dHash rows for an (doc_id, payload) image frame
    — the Arrow-batched decode+hash stage, factored for reuse by the
    dedup query and the curation composition."""

    def hash_batches(batches):
        for pdf in batches:
            bands = pdf["payload"].map(lambda b: phash_bands(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        f"b{k}": bands.map(lambda t, k=k: t[k]).astype("int64")
                        for k in range(PHASH_BANDS)
                    },
                }
            )

    return images.mapInPandas(
        hash_batches, schema="doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


def phash_hash_groups(images: DataFrame) -> DataFrame:
    """Exact-duplicate collapse: one row per DISTINCT dHash with its
    canonical (min) doc and member count."""
    bcols = [f"b{k}" for k in range(PHASH_BANDS)]
    return phash_rows(images).groupBy(*bcols).agg(
        F.min("doc_id").alias("canonical_doc"), F.count("*").alias("n_docs")
    )


def phash_group_pairs(grp: DataFrame) -> DataFrame:
    """Banded Hamming-ball CANDIDATE→VERIFIED pairs between distinct-
    hash group canonicals: (id_a, id_b, hamming) with id_a < id_b and
    hamming <= PHASH_HAMMING_MAX.  Factored from phash_near_groups so
    the multimodal curation composition consumes the identical pair
    semantics (no drift between the per-modality report and the
    composed one)."""
    bcols = [f"b{k}" for k in range(PHASH_BANDS)]
    bands = grp.select(
        "canonical_doc",
        *bcols,
        F.posexplode(F.array(*[F.col(c) for c in bcols])).alias(
            "band_idx", "band_val"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.canonical_doc") < F.col("b.canonical_doc")),
        )
        .select(
            F.col("a.canonical_doc").alias("id_a"),
            F.col("b.canonical_doc").alias("id_b"),
        )
        .distinct()
    )
    ga = grp.select(
        F.col("canonical_doc").alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in bcols],
    )
    gb = grp.select(
        F.col("canonical_doc").alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in bcols],
    )
    hamming = sum(
        F.expr(f"bit_count(a_b{k} ^ b_b{k})") for k in range(PHASH_BANDS)
    )
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )


def phash_near_groups(
    grp: DataFrame, persist_grp: bool = False, caches: list | None = None
) -> DataFrame:
    """Banded Hamming-ball neighbor stats over a (b0..b3,
    canonical_doc, n_docs) group frame — factored so the losslessness
    property test can drive it with synthetic band vectors.
    ``persist_grp`` caches the group table (it feeds the band explode
    twice, both verify-join sides, and the final outer join — five
    plan uses of a frame bounded by |distinct hashes|) — size-gated by
    the caller, see :func:`audio_near_groups`.  ``caches`` collects the
    persisted handle so the query entry point can release it after the
    result is materialized (r17, guide §5: a long-lived driver must not
    leak MEMORY_AND_DISK blocks per invocation)."""
    if persist_grp:
        grp = grp.persist()
        if caches is not None:
            caches.append(grp)
    near = (
        _sym_pairs(phash_group_pairs(grp), carry=("hamming",))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_near_groups"),
            F.min("hamming").alias("min_hamming"),
        )
    )
    return (
        grp.join(near, grp["canonical_doc"] == near["id"], "left")
        .select(
            "canonical_doc",
            "n_docs",
            F.coalesce(F.col("n_near_groups"), F.lit(0)).alias("n_near_groups"),
            "min_hamming",
        )
    )


# ---------------------------------------------------------------------------
# audio fingerprint near-dup dedup (content-defined chunking)
# ---------------------------------------------------------------------------

#: Content-defined chunking parameters for the audio fingerprint.  A
#: token closes a chunk when its md5's first nibble falls below
#: AUDIO_BDY_NIBBLES (probability 4/16 -> ~4-token average chunks), so
#: chunk boundaries are chosen by CONTENT, not position: an insertion
#: re-aligns at the next boundary and every later chunk hashes
#: identically (the FastCDC property — the reason fixed-offset frame
#: hashes miss shifted duplicates while CDC frames still meet).
AUDIO_BDY_NIBBLES = frozenset("0123")
#: frames seen in more than this many docs are corpus-wide boilerplate
#: (silence, ubiquitous riffs) and carry no dedup signal — pruned by a
#: broadcast anti-join BEFORE the pair self-join, same discipline as
#: dedup.DF_CAP, so no hot frame can emit a quadratic pair blowup.
AUDIO_DF_CAP = 64
#: a pair is a match when it shares at least this many distinct frames.
AUDIO_MIN_SHARED = 2
#: real-path decode geometry: raw PCM windows of this many bytes.
AUDIO_PCM_WINDOW = 512

_WAVE_MAGIC_PREFIX = b"RIFF"
_WAVE_MAGIC_FORMAT = b"WAVE"


def audio_tokens(payload: bytes) -> list:
    """Decode an audio payload to the token stream the fingerprint
    chunks over.

    Real path (RIFF/WAVE magic AND genuinely binary AND the stdlib
    ``wave`` reader accepts it): raw PCM frame bytes split into
    :data:`AUDIO_PCM_WINDOW`-byte windows, each hex-encoded — the
    per-window unit a spectral fingerprinter would featurize.  Fake
    path (everything else — the whole synthetic corpus, by the same
    binary+magic gate as :func:`decode_image`): the payload's utf-8
    whitespace tokens.  Text payloads are valid UTF-8 by construction
    so they can never reach the real branch: the certified results are
    identical whether or not any audio stack is present."""
    if (
        payload.startswith(_WAVE_MAGIC_PREFIX)
        and payload[8:12] == _WAVE_MAGIC_FORMAT
        and _is_binary(payload)
    ):
        try:
            import io
            import wave

            with wave.open(io.BytesIO(payload), "rb") as wv:
                pcm = wv.readframes(wv.getnframes())
            return [
                pcm[i : i + AUDIO_PCM_WINDOW].hex()
                for i in range(0, len(pcm), AUDIO_PCM_WINDOW)
            ]
        except Exception:
            pass
    import re

    # explicit class = RE2's \s exactly ([\t\n\f\r ]): Python's ASCII \s
    # also matches \x0b (vertical tab), which DuckDB's RE2 oracles do
    # not — a \x0b-bearing payload would otherwise tokenize differently
    # across engines (r9 ADVICE; the CDC fuzz alphabet now includes
    # \x0b to prove the equality).
    return [
        w
        for w in re.split(r"[ \t\n\f\r]+", payload.decode("utf-8", "replace"))
        if w
    ]


def audio_fingerprint_frames(tokens: list) -> list:
    """CDC frame hashes, in chunk order, for a token stream.

    A chunk is the run of tokens up to and including the next boundary
    token (md5 first nibble in :data:`AUDIO_BDY_NIBBLES`); the frame
    hash is the first 15 md5 nibbles of the space-joined chunk (15 so
    the hex fits signed int64 if a consumer ever casts it)."""
    frames, chunk = [], []
    for tok in tokens:
        chunk.append(tok)
        if hashlib.md5(tok.encode("utf-8")).hexdigest()[0] in AUDIO_BDY_NIBBLES:
            frames.append(hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()[:15])
            chunk = []
    if chunk:
        frames.append(hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()[:15])
    return frames


def _audio_post_sql() -> str:
    """The audio CDC posting CTE chain ending in ``ff`` (DISTINCT
    doc_id, fh) — factored so the per-modality oracle and the composed
    curation oracle replay the IDENTICAL chunking arithmetic."""
    return """audio AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 1
    ),
    words AS (
        SELECT doc_id, k AS pos, ws[k + 1] AS word
        FROM audio, LATERAL unnest(range(0, len(ws))) AS t(k)
    ),
    flagged AS (
        SELECT doc_id, pos, word,
               CASE WHEN substr(md5(word), 1, 1) IN ('0','1','2','3')
                    THEN 1 ELSE 0 END AS bdy
        FROM words
    ),
    chunks AS (
        SELECT doc_id, pos, word,
               COALESCE(SUM(bdy) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
        FROM flagged
    ),
    frames AS (
        SELECT doc_id,
               substr(md5(string_agg(word, ' ' ORDER BY pos)), 1, 15) AS fh
        FROM chunks GROUP BY doc_id, cid
    ),
    ff AS (SELECT DISTINCT doc_id, fh FROM frames)"""


_AUDIO_FP_ORACLE = f"""
    WITH {_audio_post_sql()},
    hot AS (SELECT fh FROM ff GROUP BY fh HAVING COUNT(*) > {AUDIO_DF_CAP}),
    kept AS (SELECT f.doc_id, f.fh FROM ff f
             WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.fh = f.fh)),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {AUDIO_MIN_SHARED}
    ),
    sym AS (SELECT id_a AS id, id_b AS partner, n_common FROM pairs
            UNION ALL SELECT id_b, id_a, n_common FROM pairs),
    stats AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_matches FROM sym GROUP BY id),
    best AS (
        SELECT id, partner AS best_match_doc, CAST(n_common AS BIGINT) AS best_common
        FROM (SELECT id, partner, n_common,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY n_common DESC, partner) AS rn
              FROM sym) r
        WHERE rn = 1
    )
    SELECT a.doc_id,
           COALESCE(s.n, 0) AS n_frames,
           COALESCE(st.n_matches, 0) AS n_matches,
           b.best_match_doc,
           b.best_common
    FROM audio a
    LEFT JOIN sizes s  ON a.doc_id = s.doc_id
    LEFT JOIN stats st ON a.doc_id = st.id
    LEFT JOIN best b   ON a.doc_id = b.id
"""


@query(
    "multimodal_audio_fp_dedup",
    "multimodal",
    _AUDIO_FP_ORACLE,
    plan=lambda s, d: audio_near_groups(
        synth_media(s, d).filter(F.col("media_type") == "audio").select("doc_id"),
        audio_posting_rows(
            synth_media(s, d).filter(F.col("media_type") == "audio")
        ),
        persist_base=_big_corpus(d),
    ),
    doc="Audio fingerprint near-dup dedup — the audio-side twin of "
    "MinHash/dHash, built on CONTENT-DEFINED CHUNKING (the FastCDC "
    "idea): the Arrow-batched decode stage tokenizes each payload "
    "(real path: stdlib-wave PCM windows behind the binary+RIFF/WAVE "
    "gate; fake path for the utf-8 synthetic corpus: whitespace "
    "tokens), chunk boundaries are picked by token-content hash "
    "(p=1/4 -> ~4-token chunks) so an insertion re-aligns at the next "
    "boundary and every later frame hash survives — fixed-offset "
    "frames miss shifted duplicates entirely (measured: 1 aligned-"
    "chunk pair vs 212 CDC pairs on the same corpus). Matching is a "
    "fingerprint-DB probe: distinct (doc, frame) postings, df > "
    f"{AUDIO_DF_CAP} boilerplate frames pruned by broadcast anti-join "
    "BEFORE the pair self-join (no hot frame can emit a quadratic "
    f"blowup), pairs sharing >= {AUDIO_MIN_SHARED} frames, per-doc "
    "best match via a doc-partitioned window (never global order). "
    "The DuckDB oracle replays the identical chunking arithmetic "
    "(prefix-sum of md5-nibble boundary flags) and the same cap, so a "
    "chunking or pruning divergence surfaces as a hash mismatch. At "
    "100 TB: the CDC index is |tokens|/4 rows — 4x smaller than a "
    "stride-1 shingle index for the same recall class — one distinct+"
    "groupBy shuffle on the frame hash, and the decode stage is "
    "embarrassingly parallel over payload bytes.",
)
def multimodal_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir).filter(F.col("media_type") == "audio")
    caches: list = []
    out = audio_near_groups(
        media.select("doc_id"), audio_posting_rows(media),
        persist_base=_big_corpus(sf_dir), caches=caches,
    )
    return _materialize_release(out, "multimodal_audio_fp_dedup", sf_dir, caches)


def audio_posting_rows(audio: DataFrame) -> DataFrame:
    """DISTINCT (doc_id, fh) CDC frame postings for an (doc_id,
    payload) audio frame — the Arrow-batched decode+chunk stage,
    factored for reuse by the dedup query and the curation
    composition."""

    def fingerprint(batches):
        for pdf in batches:
            ids, fhs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # r17 (guide §2.3): the 15-hex frame hash is exactly
                # 60 bits by construction (audio_fingerprint_frames
                # truncates md5 to 15 nibbles "so the hex fits
                # signed int64"), so int(fh, 16) is an INJECTIVE
                # re-encoding — every downstream use (df-cap groupBy,
                # anti-join, pair equi-join) only tests fh equality,
                # and 8-byte long keys shuffle ~half the bytes of
                # 15-char strings.  The streaming twin keeps its own
                # string-typed state log; its results are fh-free so
                # the two representations never meet.
                # r17 §10 (guide §2.4): the (doc_id, fh) DISTINCT is
                # per-doc LOCAL by construction — a doc is ONE input
                # row, decoded entirely inside this batch — so dedup
                # happens here (a per-doc set, sorted for
                # deterministic output under task retry) and the
                # downstream .distinct()'s full-posting-table
                # Exchange disappears.  Duplicates also die BEFORE
                # the Arrow→JVM transfer instead of after it.
                for fh in sorted(
                    {
                        int(fh, 16)
                        for fh in audio_fingerprint_frames(
                            audio_tokens(bytes(payload))
                        )
                    }
                ):
                    ids.append(doc_id)
                    fhs.append(fh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fh": pd.Series(fhs, dtype="int64"),
                }
            )

    return audio.mapInPandas(fingerprint, schema="doc_id long, fh long")


# ---------------------------------------------------------------------------
# video near-dup dedup (frame-sampled dHash signatures)
# ---------------------------------------------------------------------------

#: banded per-frame matching threshold: a pair of videos is a near-dup
#: candidate-match when it shares at least this many distinct
#: (band_idx, band_value) frame-band postings.  One shared band can be
#: a random 16-bit collision; two independent ones essentially cannot.
#: A truly duplicated frame contributes 4 shared bands, and a frame
#: within Hamming distance PHASH_HAMMING_MAX contributes >= 1
#: (pigeonhole over the 4x16-bit split — the property the phash tests
#: pin), so one shared near-identical frame pair plus any second
#: frame-band overlap crosses the threshold.
VIDEO_MIN_SHARED = 2
#: frame bands seen in more than this many videos are corpus-wide
#: boilerplate (intros, slates, black frames) — pruned by broadcast
#: anti-join BEFORE the pair join, the audio AUDIO_DF_CAP discipline.
VIDEO_DF_CAP = 64
#: frame sampling stride (every 5th frame), the multimodal_frame_sample
#: geometry — a signature never touches more than n_frames/5 decodes.
VIDEO_FRAME_STEP = 5
#: fake-path frame geometry: frame i's content is the payload's i-th
#: fixed-width character segment.  A frame IS a segment of the stream,
#: so two videos sharing scenes share segment content at their frame
#: boundaries — which makes the matching path genuinely exercised on
#: the synthetic corpus (near-dup documents share aligned prefixes) at
#: the sf0.01 correctness gate, not just on planted fixtures.  No CDC
#: needed (the audio divergence): frame boundaries come from the
#: decoder, not byte offsets, so they are already insertion-stable in
#: a real container.
VIDEO_FRAME_CHARS = 64

_VIDEO_MAGIC_MP4 = b"ftyp"      # at offset 4 of an ISO-BMFF file
_VIDEO_MAGIC_MKV = b"\x1aE\xdf\xa3"
_VIDEO_MAGIC_AVI = b"AVI "      # at offset 8 of a RIFF container


def _is_video_payload(payload: bytes) -> bool:
    return (
        payload[4:8] == _VIDEO_MAGIC_MP4
        or payload.startswith(_VIDEO_MAGIC_MKV)
        or (payload.startswith(b"RIFF") and payload[8:12] == _VIDEO_MAGIC_AVI)
    )


def video_frame_bands(payload: bytes, frame_idx: int) -> tuple:
    """dHash bands of one sampled video frame.

    Real path (video container magic AND genuinely binary AND a frame
    decoder importable): decode frame ``frame_idx``, grayscale 9x8
    thumbnail, the standard dHash — this container ships no video
    codec, so the import fails and the branch is exercised only where
    PyAV exists; the magic+binary gate gives the same provable
    codec-independence property as :func:`decode_image` (a text corpus
    is valid UTF-8, so installing a codec never changes certified
    results).  Fake path: :func:`phash_bands`'s chained-md5 pixels
    over the frame's :data:`VIDEO_FRAME_CHARS`-character payload
    SEGMENT — deterministic, content-keyed (shared scenes → shared
    hashes, position-free), and replayable in SQL as
    md5(substring(text, ...)) chains."""
    if _is_video_payload(payload) and _is_binary(payload):
        try:
            import io

            import av  # noqa: F401 — optional frame decoder, absent here

            with av.open(io.BytesIO(payload)) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    if i == frame_idx:
                        px = list(
                            frame.to_image().convert("L").resize((9, 8)).getdata()
                        )
                        return _phash_bands_from_pixels(px)
        except Exception:
            pass
    s = payload.decode("utf-8", "replace")
    seg = s[frame_idx * VIDEO_FRAME_CHARS : (frame_idx + 1) * VIDEO_FRAME_CHARS]
    return phash_bands(seg.encode("utf-8"), force_fake=True)


def _video_band_postings_pdf(pdf, as_long: bool = False):
    """(doc_id, fh) band postings for one Arrow batch of video payloads:
    frame count = 1 + chars // VIDEO_FRAME_CHARS (content-derived, so a
    sampled frame always covers real payload), sampled every
    VIDEO_FRAME_STEP (the multimodal_frame_sample stride), each frame's
    4 dHash bands posted as 'band_idx:band_value' strings — or, with
    ``as_long`` (r17, guide §2.3), as the INJECTIVE 18-bit long
    ``band_idx * 2**16 + band_value`` (bands are 16-bit by the dHash
    construction, band_idx < 4): downstream only tests fh equality, so
    the narrower key shuffles fewer bytes.  The streaming state log
    keeps the string form (its on-disk schema is pinned); the two
    representations never meet — both ends' results are fh-free."""
    ids: list = []
    fhs: list = []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        p = bytes(payload)
        n_frames = 1 + len(p.decode("utf-8", "replace")) // VIDEO_FRAME_CHARS
        for fi in range(0, n_frames, VIDEO_FRAME_STEP):
            for k, b in enumerate(video_frame_bands(p, fi)):
                ids.append(doc_id)
                fhs.append((k << 16) | b if as_long else f"{k}:{b}")
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "fh": pd.Series(fhs, dtype="int64" if as_long else "object"),
        }
    )


def video_band_postings(videos: DataFrame) -> DataFrame:
    """DISTINCT (doc_id, fh) frame-band postings for a (doc_id,
    payload) video frame — the signature table both the batch and
    streaming dedups match on."""

    def emit(batches):
        for pdf in batches:
            # r17 §10 (guide §2.4): every video's bands are emitted
            # inside ONE output pdf (a video is one input row), so
            # per-batch drop_duplicates IS the exact (doc_id, fh)
            # dedup and the downstream .distinct()'s
            # full-posting-table Exchange disappears; duplicates die
            # before the Arrow→JVM transfer.  (The streaming state
            # writer calls `_video_band_postings_pdf` directly and
            # keeps its own distinct — its log stores distinct
            # postings either way.)
            yield _video_band_postings_pdf(pdf, as_long=True).drop_duplicates()

    return videos.mapInPandas(emit, schema="doc_id long, fh long")


def _video_fh_sql() -> str:
    """The fake path's per-frame band postings as a DuckDB CTE chain
    ending in ``post`` (DISTINCT doc_id, fh): sampled frame indices,
    chained-md5 'pixels' per (doc, frame), the inlined dHash bit rule
    (shared with the phash oracle), bands unnested as 'k:value'."""
    return f"""vids AS (
        SELECT doc_id, text FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    ),
    vframes AS (
        SELECT doc_id,
               substring(text, CAST(fi AS INT) * {VIDEO_FRAME_CHARS} + 1,
                         {VIDEO_FRAME_CHARS}) AS seg
        FROM vids, LATERAL unnest(
            range(0, 1 + length(text) // {VIDEO_FRAME_CHARS},
                  {VIDEO_FRAME_STEP})) AS t(fi)
    ),
    fhx AS (
        SELECT doc_id,
               md5(seg) || md5(seg || 'a') || md5(seg || 'b') AS hx
        FROM vframes
    ),
    fbands AS (SELECT doc_id, {", ".join(_phash_band_sql_exprs())} FROM fhx),
    post AS (
        SELECT DISTINCT doc_id, fh FROM (
            SELECT doc_id,
                   unnest(['0:' || CAST(b0 AS VARCHAR), '1:' || CAST(b1 AS VARCHAR),
                           '2:' || CAST(b2 AS VARCHAR), '3:' || CAST(b3 AS VARCHAR)]) AS fh
            FROM fbands
        )
    )"""


_VIDEO_ORACLE = f"""
    WITH {_video_fh_sql()},
    hot AS (SELECT fh FROM post GROUP BY fh HAVING COUNT(*) > {VIDEO_DF_CAP}),
    kept AS (SELECT p.doc_id, p.fh FROM post p
             WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.fh = p.fh)),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {VIDEO_MIN_SHARED}
    ),
    sym AS (SELECT id_a AS id, id_b AS partner, n_common FROM pairs
            UNION ALL SELECT id_b, id_a, n_common FROM pairs),
    stats AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_matches FROM sym GROUP BY id),
    best AS (
        SELECT id, partner AS best_match_doc, CAST(n_common AS BIGINT) AS best_common
        FROM (SELECT id, partner, n_common,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY n_common DESC, partner) AS rn
              FROM sym) r
        WHERE rn = 1
    )
    SELECT v.doc_id,
           COALESCE(s.n, 0) AS n_sig_bands,
           COALESCE(st.n_matches, 0) AS n_matches,
           b.best_match_doc,
           b.best_common
    FROM vids v
    LEFT JOIN sizes s  ON v.doc_id = s.doc_id
    LEFT JOIN stats st ON v.doc_id = st.id
    LEFT JOIN best b   ON v.doc_id = b.id
"""


@query(
    "multimodal_video_dedup",
    "multimodal",
    _VIDEO_ORACLE,
    plan=lambda s, d: audio_near_groups(
        synth_media(s, d).filter(F.col("media_type") == "video").select("doc_id"),
        video_band_postings(
            synth_media(s, d)
            .filter(F.col("media_type") == "video")
            .select("doc_id", "payload")
        ),
        df_cap=VIDEO_DF_CAP,
        min_shared=VIDEO_MIN_SHARED,
        persist_base=_big_corpus(d),
    ).withColumnRenamed("n_frames", "n_sig_bands"),
    doc="Video near-dup dedup — the last member of the multimodal "
    "dedup triad (text MinHash / image dHash / audio CDC): each video "
    "decodes only its SAMPLED frames (every "
    f"{VIDEO_FRAME_STEP}th of the multimodal_frame_sample geometry) in "
    "an Arrow-batched mapInPandas stage, each frame hashes to a 64-bit "
    "dHash (real decode behind a video-magic + binary gate with the "
    "same provable codec-independence as decode_image; the fake path "
    "chained-md5-hashes the frame's fixed-width payload SEGMENT — "
    "content-keyed, so shared scenes share hashes position-free), and "
    "the video's SIGNATURE is its distinct set of 4x16-bit frame "
    "bands. Matching "
    "is banded per-frame with a shared-band threshold (the "
    "audio_near_groups engine verbatim): corpus-wide boilerplate bands "
    f"(df > {VIDEO_DF_CAP}: intros, slates, black frames) prune by "
    "broadcast anti-join BEFORE the pair self-join, pairs sharing >= "
    f"{VIDEO_MIN_SHARED} bands match (one near-identical frame pair "
    "shares >= 1 band by the pigeonhole property the phash tests pin; "
    "a duplicated frame shares 4), per-video best match via a "
    "doc-partitioned window. The DuckDB oracle replays the identical "
    "frame sampling, nibble arithmetic, cap, and threshold. At 100 TB: "
    "decode cost is frames/stride per video and never re-runs for "
    "matching; the posting table is 4 rows per sampled frame, one "
    "distinct + one groupBy shuffle; no all-pairs stage exists.",
)
def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir).filter(F.col("media_type") == "video")
    post = video_band_postings(media.select("doc_id", "payload"))
    caches: list = []
    out = audio_near_groups(
        media.select("doc_id"), post,
        df_cap=VIDEO_DF_CAP, min_shared=VIDEO_MIN_SHARED,
        persist_base=_big_corpus(sf_dir), caches=caches,
    ).withColumnRenamed("n_frames", "n_sig_bands")
    return _materialize_release(out, "multimodal_video_dedup", sf_dir, caches)


def posting_kept(ff: DataFrame, df_cap: int) -> DataFrame:
    """df-capped postings: frames/bands seen in more than ``df_cap``
    docs are corpus-wide boilerplate, pruned by broadcast anti-join
    BEFORE any pairing."""
    hot = (
        ff.groupBy("fh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("fh")
    )
    return ff.join(F.broadcast(hot), "fh", "left_anti")


def posting_match_pairs(kept: DataFrame, min_shared: int) -> DataFrame:
    """(id_a, id_b, n_common) matches over df-capped postings: pairs
    sharing >= ``min_shared`` distinct posting keys, id_a < id_b.
    Factored so audio, video, and the composed curation report all run
    the identical matching rule."""
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_shared)
    )


def _sym_pairs(pairs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Symmetrize (id_a, id_b[, carry...]) match pairs into
    (id, partner[, carry...]) in ONE pass: explode a two-struct array
    instead of unioning two selects of the pair frame.  The union
    shape planned the ENTIRE pair pipeline (decode → distinct →
    df-cap → self-join → groupBy) twice, once per branch — at 100x
    sf0.1 that union was the single largest line in the modality
    stages' wall time (r16 A/B, min-of-3: audio row 10.3 → 6.1 s,
    video 9.8 → 3.9 s with the posting base persisted).  Exploding a
    2-element array costs one narrow projection and keeps the pair
    plan singular."""

    def _side(a: str, b: str):
        return F.struct(
            F.col(a).alias("id"),
            F.col(b).alias("partner"),
            *[F.col(c) for c in carry],
        )

    return pairs.select(
        F.explode(F.array(_side("id_a", "id_b"), _side("id_b", "id_a"))).alias("s")
    ).select("s.*")


def audio_near_groups(
    audio_ids: DataFrame,
    ff: DataFrame,
    df_cap: int = AUDIO_DF_CAP,
    min_shared: int = AUDIO_MIN_SHARED,
    persist_base: bool = False,
    caches: list | None = None,
) -> DataFrame:
    """Fingerprint-DB matching over distinct (doc_id, fh) postings —
    factored so the realignment property test can drive it with
    synthetic frame sets, and so the video dedup can reuse the engine
    with its own cap/threshold.

    Plan discipline (r16): the symmetrized pair view is one explode
    (not a union that would plan the pair join twice — a win at every
    scale: video row 1.97 → 1.76 s at sf0.1, 9.8 → 5.0 s at 100×),
    and best-match + match-count come out of ONE window pass over it.
    ``persist_base`` additionally persists the posting base (decode
    ONCE — it feeds the df-cap count, the size count, and both sides
    of the pair self-join; at 100 TB this is the posting-index
    materialization a deployment does anyway) — SIZE-GATED by the
    caller because the barrier + cache write costs more than the
    avoided recompute on small inputs (measured at sf0.1: persist
    2.46 s vs 1.76 s without; at 100×: 3.9 s with vs 5.0 s without —
    the same crossover as dedup's broadcast/shuffled branch).
    ``caches`` collects the persisted handle for caller-side release
    (r17, guide §5 — see :func:`phash_near_groups`)."""
    if persist_base:
        ff = ff.persist()
        if caches is not None:
            caches.append(ff)
    kept = posting_kept(ff, df_cap)
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    sym = _sym_pairs(posting_match_pairs(kept, min_shared), carry=("n_common",))
    from pyspark.sql import Window as W

    w = W.partitionBy("id")
    best = (
        sym.select(
            "id",
            "partner",
            "n_common",
            F.row_number()
            .over(w.orderBy(F.col("n_common").desc(), F.col("partner")))
            .alias("rn"),
            F.count("*").over(w).alias("n_matches"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "id",
            F.col("partner").alias("best_match_doc"),
            F.col("n_common").cast("long").alias("best_common"),
            "n_matches",
        )
    )
    return (
        audio_ids.join(sizes, "doc_id", "left")
        .join(best, audio_ids["doc_id"] == best["id"], "left")
        .drop(best["id"])
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_frames"),
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
            "best_match_doc",
            "best_common",
        )
    )


# ---------------------------------------------------------------------------
# composed multimodal curation report (r10)
# ---------------------------------------------------------------------------

def _mm_curation_ctes() -> str:
    """The three modality-dedup CTE chains (image exact-group collapse
    + banded near pairs + per-canonical minp; audio CDC postings +
    df-cap + minp; video frame-segment band postings + df-cap + minp),
    every fragment SHARED with its per-modality oracle — factored so
    the multimodal report AND the corpus-wide unified report compose
    the identical definitions."""
    img_pairs = _phash_hamming_sql("a", "b")
    return f"""cimg AS (
        SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
    ),
    cph AS (SELECT doc_id, {", ".join(_phash_band_sql_exprs())} FROM cimg),
    cgrp AS (
        SELECT b0, b1, b2, b3, MIN(doc_id) AS canonical_doc, COUNT(*) AS n_docs
        FROM cph GROUP BY 1, 2, 3, 4
    ),
    cgp AS (
        SELECT a.canonical_doc AS id_a, b.canonical_doc AS id_b
        FROM cgrp a JOIN cgrp b ON a.canonical_doc < b.canonical_doc
        WHERE {img_pairs} <= {PHASH_HAMMING_MAX}
    ),
    cgsym AS (SELECT id_a AS id, id_b AS p FROM cgp
              UNION ALL SELECT id_b, id_a FROM cgp),
    cgmin AS (SELECT id, MIN(p) AS minp FROM cgsym GROUP BY id),
    {_audio_post_sql()},
    a_hot AS (SELECT fh FROM ff GROUP BY fh HAVING COUNT(*) > {AUDIO_DF_CAP}),
    a_kept AS (SELECT f.doc_id, f.fh FROM ff f
               WHERE NOT EXISTS (SELECT 1 FROM a_hot h WHERE h.fh = f.fh)),
    a_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM a_kept a JOIN a_kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {AUDIO_MIN_SHARED}
    ),
    a_sym AS (SELECT id_a AS id, id_b AS p FROM a_pairs
              UNION ALL SELECT id_b, id_a FROM a_pairs),
    a_min AS (SELECT id, MIN(p) AS minp FROM a_sym GROUP BY id),
    {_video_fh_sql()},
    v_hot AS (SELECT fh FROM post GROUP BY fh HAVING COUNT(*) > {VIDEO_DF_CAP}),
    v_kept AS (SELECT p.doc_id, p.fh FROM post p
               WHERE NOT EXISTS (SELECT 1 FROM v_hot h WHERE h.fh = p.fh)),
    v_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM v_kept a JOIN v_kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {VIDEO_MIN_SHARED}
    ),
    v_sym AS (SELECT id_a AS id, id_b AS p FROM v_pairs
              UNION ALL SELECT id_b, id_a FROM v_pairs),
    v_min AS (SELECT id, MIN(p) AS minp FROM v_sym GROUP BY id)"""


def _mm_curation_oracle() -> str:
    """One corpus-level report from all three modality dedups, every
    fragment SHARED with its per-modality oracle (the band arithmetic,
    the CDC chunking chain, the frame-segment chain), so the composed
    row and the per-modality rows cannot drift.  Survivor rule is
    greedy KEEP-FIRST by doc id (a doc is dropped iff it has a match
    partner with a smaller id) — the one-pass curation rule; the
    transitive-closure variant stays certified separately on the text
    family (dedup_clusters)."""
    return f"""
    WITH {_mm_curation_ctes()},
    img_row AS (
        SELECT 'image' AS media_type,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_docs >= 2 OR minp IS NOT NULL
                             THEN n_docs ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > canonical_doc
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
        FROM cgrp LEFT JOIN cgmin ON cgrp.canonical_doc = cgmin.id
    ),
    audio_row AS (
        SELECT 'audio' AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN minp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > au.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
        FROM audio au LEFT JOIN a_min ON au.doc_id = a_min.id
    ),
    video_row AS (
        SELECT 'video' AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN minp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > v.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
        FROM vids v LEFT JOIN v_min ON v.doc_id = v_min.id
    )
    SELECT * FROM img_row
    UNION ALL SELECT * FROM audio_row
    UNION ALL SELECT * FROM video_row
    """


def _posting_minp(
    ids: DataFrame,
    ff: DataFrame,
    df_cap: int,
    min_shared: int,
    persist_base: bool = False,
    caches: list | None = None,
) -> DataFrame:
    """(doc_id, minp) over a posting modality: each doc's smallest
    match partner (NULL = unmatched), via the shared pairing engine.
    Explode-symmetrized pairs (r16): the pair join plans exactly once.
    ``persist_base`` caches the posting table (decode once) — size-
    gated by the caller, see :func:`audio_near_groups`; ``caches``
    collects the handle for caller-side release (r17, guide §5)."""
    if persist_base:
        ff = ff.persist()
        if caches is not None:
            caches.append(ff)
    sym = _sym_pairs(posting_match_pairs(posting_kept(ff, df_cap), min_shared))
    mn = sym.groupBy("id").agg(F.min("partner").alias("minp"))
    return ids.join(mn, ids["doc_id"] == mn["id"], "left").select("doc_id", "minp")


def _keepfirst_row(tag: str, flags: DataFrame) -> DataFrame:
    """(media_type, n_docs, n_matched, n_survivors) from per-doc
    (doc_id, minp) flags under the keep-first rule."""
    return flags.agg(
        F.lit(tag).alias("media_type"),
        F.count("*").alias("n_docs"),
        F.sum(F.col("minp").isNotNull().cast("long")).alias("n_matched"),
        F.sum(
            (F.col("minp").isNull() | (F.col("minp") > F.col("doc_id"))).cast("long")
        ).alias("n_survivors"),
    )


@query(
    "multimodal_curation_survivors",
    "multimodal",
    _mm_curation_oracle(),
    plan=lambda s, d: _mm_curation_frame(s, d),
    doc="The corpus-level MULTIMODAL curation report — the composed row "
    "the text family already has (corpus_curation_survivors), extended "
    "across modalities: every payload runs its modality's near-dup "
    "detector (image dHash groups + banded Hamming pairs, audio CDC "
    "frame postings, video frame-segment band postings — each via the "
    "SAME factored engines as its certified per-modality query), and "
    "the report counts, per modality, the docs, the matched docs, and "
    "the survivors under the greedy KEEP-FIRST rule (a doc is dropped "
    "iff some match partner has a smaller id; exact-duplicate members "
    "count as matched with only the canonical surviving). The oracle "
    "composes the identical per-modality CTE fragments, so the "
    "composition cannot drift from the parts. Transitive-closure "
    "survivorship stays certified on the text family "
    "(dedup_clusters/dedup_survivor_stats); keep-first is the one-pass "
    "rule a streaming curation front-end applies. Scale: the three "
    "detectors share nothing but the payload scan — one decode pass "
    "per modality, df-capped pairings, never all-pairs, and the final "
    "report is three 1-row aggregates.",
)
def multimodal_curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    caches: list = []
    out = _mm_curation_frame(spark, sf_dir, caches=caches)
    return _materialize_release(out, "multimodal_curation_survivors", sf_dir, caches)


def _mm_curation_frame(
    spark: SparkSession, sf_dir: str, caches: list | None = None
) -> DataFrame:
    media = synth_media(spark, sf_dir)
    big = _big_corpus(sf_dir)
    # image: exact-group collapse + banded near pairs between canonicals
    grp = phash_hash_groups(
        media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    )
    if big:
        grp = grp.persist()
        if caches is not None:
            caches.append(grp)
    gsym = _sym_pairs(phash_group_pairs(grp).select("id_a", "id_b"))
    gmin = gsym.groupBy("id").agg(F.min("partner").alias("minp"))
    img = grp.join(gmin, grp["canonical_doc"] == gmin["id"], "left")
    img_row = img.agg(
        F.lit("image").alias("media_type"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(
            F.when(
                (F.col("n_docs") >= 2) | F.col("minp").isNotNull(), F.col("n_docs")
            ).otherwise(F.lit(0))
        ).alias("n_matched"),
        F.sum(
            (F.col("minp").isNull() | (F.col("minp") > F.col("canonical_doc"))).cast(
                "long"
            )
        ).alias("n_survivors"),
    )
    # audio + video: the shared posting engine under each modality's dials
    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    audio_row = _keepfirst_row(
        "audio",
        _posting_minp(
            audio.select("doc_id"), audio_posting_rows(audio),
            AUDIO_DF_CAP, AUDIO_MIN_SHARED, persist_base=big, caches=caches,
        ),
    )
    video = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    video_row = _keepfirst_row(
        "video",
        _posting_minp(
            video.select("doc_id"), video_band_postings(video),
            VIDEO_DF_CAP, VIDEO_MIN_SHARED, persist_base=big, caches=caches,
        ),
    )
    return img_row.unionByName(audio_row).unionByName(video_row)


# ---------------------------------------------------------------------------
# the corpus-wide UNIFIED curation report: text DAG + all three modalities
# ---------------------------------------------------------------------------

def _unified_curation_oracle() -> str:
    """Text curation DAG (quality gate → exact dedup → near-dup closure
    survivors → token budget) UNIONed with the three modality keep-first
    dedup rows, EVERY fragment the exact shared definition of its
    standalone oracle (_CLEAN_CTES/_CLEAN_SELECT, _CC_ORACLE_CTES,
    _mm_curation_ctes) — the composition cannot drift from any part."""
    from tailsql_spark.operators.corpus import _CLEAN_CTES, _CLEAN_SELECT
    from tailsql_spark.operators.graphs import _CC_ORACLE_CTES

    return f"""
    WITH RECURSIVE {_CLEAN_CTES},
    cleaned AS ({_CLEAN_SELECT}),
    {_CC_ORACLE_CTES},
    {_mm_curation_ctes()},
    text_row AS (
        SELECT 'text' AS media_type,
               CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_survivors,
               CAST(SUM(c.n_tokens) AS BIGINT) AS n_tokens
        FROM cleaned c LEFT JOIN labels l ON c.doc_id = l.doc_id
        WHERE l.doc_id IS NULL OR l.doc_id = l.cluster_id
    ),
    img_row AS (
        SELECT 'image' AS media_type,
               CAST(SUM(n_docs) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > canonical_doc
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
               CAST(0 AS BIGINT) AS n_tokens
        FROM cgrp LEFT JOIN cgmin ON cgrp.canonical_doc = cgmin.id
    ),
    audio_row AS (
        SELECT 'audio' AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > au.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
               CAST(0 AS BIGINT) AS n_tokens
        FROM audio au LEFT JOIN a_min ON au.doc_id = a_min.id
    ),
    video_row AS (
        SELECT 'video' AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN minp IS NULL OR minp > v.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
               CAST(0 AS BIGINT) AS n_tokens
        FROM vids v LEFT JOIN v_min ON v.doc_id = v_min.id
    )
    SELECT * FROM text_row
    UNION ALL SELECT * FROM img_row
    UNION ALL SELECT * FROM audio_row
    UNION ALL SELECT * FROM video_row
    """


def _unified_media_row(tag: str, flags: DataFrame) -> DataFrame:
    """(media_type, n_total, n_survivors, n_tokens=0) from per-doc
    (doc_id, minp) keep-first flags."""
    return flags.agg(
        F.lit(tag).alias("media_type"),
        F.count("*").alias("n_total"),
        F.sum(
            (F.col("minp").isNull() | (F.col("minp") > F.col("doc_id"))).cast("long")
        ).alias("n_survivors"),
        F.lit(0).cast("long").alias("n_tokens"),
    )


def unified_image_row(
    grp: DataFrame, persist_grp: bool = False, caches: list | None = None
) -> DataFrame:
    """The image row of the unified report from dHash exact groups
    (b0..b3, canonical_doc, n_docs): banded near pairs between
    canonicals → per-canonical minp → keep-first survivors over group
    members.  Factored so the batch report and the streaming twin (grp
    aggregated from the hash-row state log) share one definition.
    ``persist_grp`` is size-gated by the caller (see
    :func:`audio_near_groups`); ``caches`` collects the handle for
    caller-side release (r17, guide §5)."""
    if persist_grp:
        grp = grp.persist()
        if caches is not None:
            caches.append(grp)
    gsym = _sym_pairs(phash_group_pairs(grp).select("id_a", "id_b"))
    gmin = gsym.groupBy("id").agg(F.min("partner").alias("minp"))
    return (
        grp.join(gmin, grp["canonical_doc"] == gmin["id"], "left")
        .agg(
            F.lit("image").alias("media_type"),
            F.sum("n_docs").alias("n_total"),
            F.sum(
                (F.col("minp").isNull() | (F.col("minp") > F.col("canonical_doc"))).cast(
                    "long"
                )
            ).alias("n_survivors"),
            F.lit(0).cast("long").alias("n_tokens"),
        )
    )


def _unified_branch_builders(
    spark: SparkSession, sf_dir: str, caches: dict[str, list] | None = None
) -> dict:
    """The four INDEPENDENT branch-row builders of the unified report
    (text DAG, image, audio, video), factored so the threaded build
    and the lazy plan twin compose the identical definitions.
    ``caches`` (r17, guide §5) collects each branch's size-gated
    persisted handles under its tag so the threaded build can release
    them once the branch row is materialized."""
    from tailsql_spark.operators.corpus import corpus_clean_pipeline, unified_text_row
    from tailsql_spark.operators.dedup import _small_input, dedup_minhash_lsh
    from tailsql_spark.operators.graphs import connected_components

    docs = load_tables(spark, sf_dir)["documents"]
    media = synth_media(spark, sf_dir)
    big = _big_corpus(sf_dir)

    def _c(tag: str) -> list | None:
        return None if caches is None else caches.setdefault(tag, [])

    def text_row() -> DataFrame:
        # text: the exact corpus_curation_survivors composition, totaled
        cleaned = corpus_clean_pipeline(spark, sf_dir)
        labels = connected_components(
            dedup_minhash_lsh(spark, sf_dir, caches=_c("text")),
            caches=_c("text"),
        )
        return unified_text_row(
            cleaned, labels, docs, hint_broadcast=_small_input(sf_dir)
        )

    def img_row() -> DataFrame:
        return unified_image_row(
            phash_hash_groups(
                media.filter(F.col("media_type") == "image").select("doc_id", "payload")
            ),
            persist_grp=big,
            caches=_c("image"),
        )

    def audio_row() -> DataFrame:
        audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
        return _unified_media_row(
            "audio",
            _posting_minp(
                audio.select("doc_id"), audio_posting_rows(audio),
                AUDIO_DF_CAP, AUDIO_MIN_SHARED, persist_base=big,
                caches=_c("audio"),
            ),
        )

    def video_row() -> DataFrame:
        video = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
        return _unified_media_row(
            "video",
            _posting_minp(
                video.select("doc_id"), video_band_postings(video),
                VIDEO_DF_CAP, VIDEO_MIN_SHARED, persist_base=big,
                caches=_c("video"),
            ),
        )

    return {"text": text_row, "image": img_row, "audio": audio_row, "video": video_row}


def _unified_curation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPUTATION as one lazy union — what the threaded build
    executes branch-by-branch; kept as the ``plan`` twin so the plan
    audit / de-optimization gate sees the real dataflow, not the
    4-row parquet scan the materialized build returns."""
    b = _unified_branch_builders(spark, sf_dir)
    return (
        b["text"]().unionByName(b["image"]())
        .unionByName(b["audio"]())
        .unionByName(b["video"]())
    )


@query(
    "corpus_unified_curation",
    "corpus-pipeline",
    _unified_curation_oracle(),
    plan=_unified_curation_plan,
    doc="THE corpus-wide curation report, one certified row per media "
    "type: text runs the full DAG (quality gate → exact dedup → "
    "MinHash-LSH near-dup transitive-closure survivors → surviving "
    "token budget) and each binary modality runs its near-dup detector "
    "under the greedy keep-first rule — the numbers a multimodal "
    "training run is provisioned from, per modality, in one query. "
    "Composes five certified operators through their OWN code paths "
    "(corpus_clean_pipeline, dedup_minhash_lsh + connected_components, "
    "the factored phash/audio/video posting engines); the oracle "
    "composes the identical CTE fragments, so the composition cannot "
    "drift from any part. Scale: the text label table broadcasts into "
    "the survivor filter (cleaned corpus never reshuffled after its "
    "dedup groupBy), each modality decodes once with df-capped "
    "pairings and no all-pairs stage, and the report is four 1-row "
    "aggregates unioned.",
)
def corpus_unified_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 (guide §2.6 — overlap independent jobs): the four branch
    rows share NOTHING but the document scan, yet the old lazy-union
    build ran them nearly sequentially — the text branch's
    connected-components fixpoint is driver-EAGER (checkpoint + count
    actions at build time), so the three modality pipelines sat idle
    behind it, and the final action's 50-job AQE cascade was itself
    mostly sequential.  Each branch now materializes its 1-row
    aggregate from its own driver thread (FIFO scheduling backfills
    the branch tails into each other's idle executors) and the build
    returns the union of the four tiny parquet reads.  Work is
    identical and computed fresh per invocation — only the wall-clock
    overlaps: interleaved min-of-5 at sf0.1, 4.98 s vs 6.39 s.  The
    ``plan`` twin (_unified_curation_plan) keeps the real dataflow
    auditable."""
    import threading

    from pyspark import inheritable_thread_target

    from tailsql_spark.plans.catalog import sf_key

    caches: dict[str, list] = {}
    builders = _unified_branch_builders(spark, sf_dir, caches=caches)
    wh = spark.conf.get("spark.sql.warehouse.dir")
    dest = f"{wh.rstrip('/')}/tailsql_results/corpus_unified_curation_{sf_key(sf_dir)}"
    errs: list[BaseException] = []

    def run(tag: str, build) -> None:
        try:
            spark.sparkContext.setJobDescription(f"corpus_unified_curation: {tag} branch")
            build().write.mode("overwrite").parquet(f"{dest}/{tag}")
        except BaseException as e:  # noqa: BLE001 — re-raised on the main thread
            errs.append(e)
        finally:
            # r17 (guide §5): the branch row is on disk — release the
            # branch's size-gated persists so repeated invocations on a
            # long-lived driver cannot accumulate cache blocks
            for h in caches.get(tag, []):
                h.unpersist()

    threads = [
        threading.Thread(
            target=inheritable_thread_target(run), args=(tag, build),
            name=f"unified-{tag}",
        )
        for tag, build in builders.items()
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    out: DataFrame | None = None
    for tag in ("text", "image", "audio", "video"):
        part = spark.read.parquet(f"{dest}/{tag}")
        out = part if out is None else out.unionByName(part)
    return out
