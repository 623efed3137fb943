"""Cross-engine parity of the Arrow-batched gram/shingle builders on
NON-ASCII text (r16, VERDICT r15 ask #1).

The r15 Arrow twins (``dedup.doc_shingle_hashes_arrow``,
``textstats.contam_grams_arrow``) originally lowercased in Python, which
matches JVM ``lower()`` only on ASCII — ``str.lower`` and
``UTF8String.toLowerCase`` disagree on Turkish dotted-I, Greek final
sigma, and other contextual case folds, so a multilingual corpus (the
NORM for an LLM pipeline) could silently shift near-dup pairs or MISS
real contamination.  r16 pins the one lowering JVM-side, BEFORE the
mapInPandas boundary; after that the Python stage is case-free (ASCII
``\\s+`` / literal-space tokenization, utf-8 md5), so parity holds for
any unicode input by construction — independent of which Unicode
version either engine's case tables ship.  These tests prove it
empirically with exceptAll over a corpus built from the known
divergence classes (contextual final sigma, Turkish dotted-I,
combining marks, astral-plane codepoints, Cherokee's late-added case
mappings, non-ASCII whitespace), and separately pin the JVM lowering
the shared gram bytes derive from so an engine upgrade that changes it
fails loudly instead of silently re-keying persisted hashes.
"""

from pyspark.sql import functions as F

# One text per divergence class; each has >=5 space-separated tokens so
# both the 3-gram shingles and the 5-gram contamination windows fire.
UNICODE_TEXTS = [
    # Turkish dotted/dotless I: İ lowers to i̇ (i + combining dot) in
    # both engines' default locale, I lowers to plain i — but ONLY if
    # the same engine does the lowering.
    "İstanbul DENİZ ve Iğdır KIŞIN çok İYİ olur",
    # Greek final sigma: contextual lowering (ς word-final, σ medial)
    # — correctness depends on WHICH engine's case tables run, so the
    # one lowering must be pinned to one engine.
    "ΟΔΟΣ ΣΟΦΙΑΣ ΚΑΙ ΑΛΗΘΕΙΑΣ ΤΕΛΟΣ ΟΔΟΣ",
    # German sharp S, including capital ẞ (lowers to ß).
    "STRASSE Größe ẞ weiß GROSS STRAẞE",
    # Combining marks: composed and decomposed forms must hash as the
    # distinct byte sequences they are (no engine normalizes).
    "café déjà vu naïve résumé encore",
    # CJK (no case, multi-byte utf-8 through md5 on both sides).
    "中文 分词 测试 数据 流水线 样本 中文 测试",
    # Emoji / astral-plane codepoints (4-byte utf-8, surrogate-pair
    # handling differs between engines' string internals).
    "🚀 rocket 🚀 data 🧪 lab test 🚀",
    # Fullwidth Latin: lowers to fullwidth lowercase in both engines.
    "ＡＢＣ ｄｅｆ ＧＨＩ ｊｋｌ ＭＮＯ ＡＢＣ",
    # Ligatures (already lowercase; simple lowering must NOT expand
    # ﬁ -> fi the way casefold would).
    "ﬁle ﬂow oﬃce ﬁt ﬁnal ﬁle",
    # Unicode whitespace INSIDE tokens: U+00A0/U+2009 are \\s in a
    # unicode-aware regex but NOT in either engine's default ASCII
    # class — they must stay inside tokens, not split them.
    "a b c d e f g h a b",
    # Cherokee gained lowercase mappings in Unicode 8 — a Unicode-
    # version-skew canary (harmless now that only the JVM lowers).
    "ᏣᎳᎩ ᎦᏬᏂᎯᏍᏗ syllabary ᏣᎳᎩ text here",
    # ASCII whitespace-run / trim edge cases ride along.
    "  leading  DOUBLE\tspace\nand newline trailing  ",
    "",
    "   ",
    "two tokens",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(UNICODE_TEXTS)], "doc_id long, text string"
    )


def test_arrow_shingle_hashes_match_jvm_unicode(spark):
    """Arrow shingle-hash builder ≡ JVM HOF chain on non-ASCII text,
    both directions, duplicates included."""
    from tailsql_spark.operators.dedup import (
        doc_shingle_hashes_arrow,
        shingle_hash60,
        shingles_col,
    )

    docs = _docs(spark)
    jvm = (
        docs.select("doc_id", F.explode_outer(shingles_col(F.col("text"))).alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", shingle_hash60(F.col("s")).alias("x"))
    )
    arrow = doc_shingle_hashes_arrow(docs)
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
    assert arrow.count() == jvm.count() > 0


def test_arrow_contam_grams_match_jvm_unicode(spark):
    """Arrow contamination gram stream ≡ exploded JVM 5-gram array on
    non-ASCII text — the safety-relevant one: a corpus-side/eval-side
    gram mismatch would silently MISS contamination."""
    from tailsql_spark.operators.textstats import (
        contam_gram_arr,
        contam_grams_arrow,
    )

    docs = _docs(spark)
    jvm = docs.select(F.explode_outer(contam_gram_arr()).alias("g")).filter(
        F.col("g").isNotNull()
    )
    arrow = contam_grams_arrow(docs)
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
    assert arrow.count() == jvm.count() > 0


def test_jvm_lowering_is_the_contract(spark):
    """Pin the ONE lowering both Arrow twins now share: JVM ``lower()``
    with contextual final sigma (ΟΔΟΣ → οδος ending in ς).  This
    interpreter's ``str.lower`` happens to agree on final sigma, but
    the contract must not depend on that — Python's case tables track
    the interpreter's Unicode version while the JVM's track the JRE's,
    and locale-sensitive folds (Turkish İ/ı, Cherokee, additions in
    newer Unicode) can skew between them.  r16 removes Python from the
    casing path entirely; this test pins the JVM behavior the shared
    gram bytes are derived from, so a Spark upgrade that changes it
    fails loudly here rather than silently re-keying every persisted
    shingle/gram hash."""
    jvm_lower = spark.createDataFrame([("ΟΔΟΣ",)], "t string").select(
        F.lower("t").alias("l")
    ).head()[0]
    assert jvm_lower == "οδος"
    assert jvm_lower.endswith("ς")  # contextual final sigma
    # and the Turkish capital dotted İ: default-locale lowering is
    # i + COMBINING DOT ABOVE (2 codepoints), not plain i
    ist = spark.createDataFrame([("İZMİR",)], "t string").select(
        F.lower("t").alias("l")
    ).head()[0]
    assert ist == "i̇zmi̇r"


def test_arrow_minhash_sigs_match_groupby_unicode(spark):
    """r17 Arrow per-doc signature builder ≡ the explode + groupBy
    signature chain on non-ASCII text: h0..h15 and n_sh bit-identical,
    and the carried xs set equal as a SET per doc (collect_set order
    is arbitrary on the JVM side; array_intersect, the only consumer,
    is order-insensitive)."""
    from tailsql_spark.operators.dedup import (
        doc_minhash_sigs_arrow,
        doc_shingle_hashes_arrow,
        minhash_signatures,
        N_HASHES,
    )

    docs = _docs(spark)
    cols = ["doc_id", *[f"h{i}" for i in range(N_HASHES)], "n_sh"]
    jvm = minhash_signatures(doc_shingle_hashes_arrow(docs), with_sets=True)
    arrow = doc_minhash_sigs_arrow(docs, with_sets=True)
    a = jvm.select(cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = arrow.select(cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0
    sets_jvm = {
        r["doc_id"]: frozenset(r["xs"]) for r in jvm.select("doc_id", "xs").collect()
    }
    sets_arrow = {
        r["doc_id"]: frozenset(r["xs"]) for r in arrow.select("doc_id", "xs").collect()
    }
    assert sets_jvm == sets_arrow
