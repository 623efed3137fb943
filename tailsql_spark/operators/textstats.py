"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Extensions beyond the reference surface (BASELINE.json north star),
each a linear, shuffle-free projection over ``documents`` — the ideal
100 TB shape (pure map; Catalyst fuses everything into one codegen
stage over the parquet scan, reading only ``doc_id``/``text``).

All heuristics are deliberately closed-form (regexp counts + arithmetic)
so the DuckDB oracle certifies them exactly; swapping in a model-based
scorer later only changes the Pandas-UDF body, not the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tailsql_spark.plans.catalog import QuerySpec, load_tables

REGISTRY: dict[str, QuerySpec] = {}

#: tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic (language with the highest hit DENSITY wins;
#: ties → alphabetical, deterministically).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "los", "que", "y", "una", "por"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

_PUNCT_RE = r"[.,!?;:]"
_BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def query(name: str, category: str, oracle: str | None, doc: str = "", plan=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, category=category, build=fn, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), plan=plan,
        )
        return fn

    return deco


def _profile_re(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def _hits(text: Column, words: list[str]) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(_profile_re(words)), F.lit(0)))


@query(
    "text_langid",
    "text-analysis",
    # language = argmax over stopword hit counts; ties broken by
    # alphabetical language code via the CASE evaluation order.
    f"""
    WITH hits AS (
        SELECT doc_id,
               {", ".join(
                   f"len(regexp_extract_all(lower(text), '{_profile_re(ws)}')) AS n_{lang}"
                   for lang, ws in sorted(LANG_PROFILES.items()))}
        FROM documents
    )
    SELECT doc_id,
           CASE
               WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
               WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
               WHEN n_es >= n_fr THEN 'es'
               ELSE 'fr'
           END AS predicted_lang,
           {", ".join(f"n_{lang}" for lang in sorted(LANG_PROFILES))}
    FROM hits
    """,
    doc="Stopword-profile language ID: per-language hit counts via one "
    "regexp pass each, argmax with deterministic tie-break.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    langs = sorted(LANG_PROFILES)
    hit_cols = [
        _hits(F.col("text"), LANG_PROFILES[lang]).cast("long").alias(f"n_{lang}")
        for lang in langs
    ]
    scored = docs.select("doc_id", *hit_cols)
    pred = (
        F.when(
            (F.col("n_de") >= F.col("n_en"))
            & (F.col("n_de") >= F.col("n_es"))
            & (F.col("n_de") >= F.col("n_fr")),
            "de",
        )
        .when((F.col("n_en") >= F.col("n_es")) & (F.col("n_en") >= F.col("n_fr")), "en")
        .when(F.col("n_es") >= F.col("n_fr"), "es")
        .otherwise("fr")
    )
    return scored.select("doc_id", pred.alias("predicted_lang"), *[f"n_{l}" for l in langs])


@query(
    "text_quality_score",
    "text-analysis",
    f"""
    WITH m AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(lower(text), '{_profile_re(LANG_PROFILES["en"])}')) AS BIGINT) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_chars_m, n_words, n_punct, n_stop,
           ROUND(n_punct * 1.0 / n_chars_m, 6) AS punct_ratio,
           ROUND(n_stop * 1.0 / n_words, 6) AS stopword_ratio,
           ROUND((n_chars_m - n_words + 1) * 1.0 / n_words, 6) AS avg_word_len,
           ROUND(LEAST(1.0, n_words / 100.0) * 0.5
                 + LEAST(1.0, n_stop * 5.0 / n_words) * 0.3
                 + (1.0 - LEAST(1.0, n_punct * 10.0 / n_chars_m)) * 0.2, 6) AS quality
    FROM m
    """,
    doc="Closed-form quality score: length / punctuation / stopword-"
    "density mix in [0,1]; the components are the standard heuristic "
    "pre-filters of LLM data pipelines.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    text = F.col("text")
    m = t["documents"].select(
        "doc_id",
        F.length(text).cast("long").alias("n_chars_m"),
        F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(text, F.lit(_PUNCT_RE), F.lit(0))).cast("long").alias("n_punct"),
        _hits(text, LANG_PROFILES["en"]).cast("long").alias("n_stop"),
    )
    quality = (
        F.least(F.lit(1.0), F.col("n_words") / 100.0) * 0.5
        + F.least(F.lit(1.0), F.col("n_stop") * 5.0 / F.col("n_words")) * 0.3
        + (1.0 - F.least(F.lit(1.0), F.col("n_punct") * 10.0 / F.col("n_chars_m"))) * 0.2
    )
    return m.select(
        "doc_id",
        "n_chars_m",
        "n_words",
        "n_punct",
        "n_stop",
        F.round(F.col("n_punct") / F.col("n_chars_m"), 6).alias("punct_ratio"),
        F.round(F.col("n_stop") / F.col("n_words"), 6).alias("stopword_ratio"),
        F.round((F.col("n_chars_m") - F.col("n_words") + 1) / F.col("n_words"), 6).alias(
            "avg_word_len"
        ),
        F.round(quality, 6).alias("quality"),
    )


@query(
    "text_token_count",
    "text-analysis",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS BIGINT) AS bpe_ish_tokens,
           CAST(CEIL(length(text) / 4.0) AS BIGINT) AS chars_div4
    FROM documents
    """,
    doc="Token counting: whitespace tokens, a BPE-ish word/punct regex "
    "split, and the chars/4 rule-of-thumb — the three standard budget "
    "estimators.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    text = F.col("text")
    return t["documents"].select(
        "doc_id",
        F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(_BPE_TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length(text) / 4.0).cast("long").alias("chars_div4"),
    )


@query(
    "text_fingerprint",
    "text-analysis",
    """
    SELECT doc_id,
           md5(lower(text)) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(
               regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS shuffle_invariant_md5
    FROM documents
    """,
    doc="Document fingerprints: raw content hash + a word-order-"
    "invariant hash (sorted distinct token bag) that catches shuffled "
    "near-copies exact dedup misses.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    low = F.lower(F.col("text"))
    bag = F.array_join(
        F.array_sort(F.array_distinct(F.regexp_extract_all(low, F.lit("[a-z0-9]+"), F.lit(0)))),
        " ",
    )
    return t["documents"].select(
        "doc_id",
        F.md5(low.cast("binary")).alias("content_md5"),
        F.md5(bag.cast("binary")).alias("shuffle_invariant_md5"),
    )


_TFIDF_SQL = """
    WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents) u
        WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
"""


@query(
    "text_tfidf_topk",
    "text-analysis",
    _TFIDF_SQL,
    doc="TF-IDF top-3 terms per document. Three aggregations (term "
    "frequency, document frequency, corpus size) + one equi-join on "
    "term + one per-doc top-k window — every stage shuffles on a "
    "bounded key space (terms or docs), nothing quadratic. The corpus "
    "size is a 1-row broadcast. ln() rounded to 6 dp for cross-engine "
    "determinism.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select("doc_id", F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter((F.col("tok").isNotNull()) & (F.col("tok") != ""))
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", F.col("rnk").cast("long").alias("rnk"))
    )


@query(
    "text_boilerplate_ngrams",
    "text-analysis",
    """
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws,
               len(string_split(lower(text), ' ')) AS n
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                       || ws[i+3] || ' ' || ws[i+4] FOR i IN range(1, n - 3)]) AS g
        FROM toks WHERE n >= 5
    ),
    docfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           ROUND(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS boiler_pct
    FROM grams JOIN docfreq USING (g)
    GROUP BY doc_id
    """,
    doc="Cross-document boilerplate detection (the C4/RefinedWeb "
    "recipe): a word 5-gram appearing in >= 5 distinct documents is "
    "boilerplate; each doc is scored by the share of its distinct "
    "5-grams that are boilerplate. Two shuffles — distinct (doc, gram) "
    "pairs, then gram doc-frequency — both keyed on uniformly-hashed "
    "strings. The (doc, gram) pair set is cached because the DAG reads "
    "it twice (df build + rejoin); at 100 TB you'd materialize it "
    "columnar instead. Mirrors the reference's per-window regex "
    "filtering generalized to corpus statistics.",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = F.split(F.lower(F.col("text")), " ")
    n = F.size(ws)
    gram_arr = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(0), n - 5),
            lambda i: F.concat_ws(" ", ws[i], ws[i + 1], ws[i + 2], ws[i + 3], ws[i + 4]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        t["documents"]
        .select("doc_id", F.explode_outer(gram_arr).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
        .cache()
    )
    docfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    return (
        grams.join(docfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 5, 1).otherwise(0)).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            F.round(F.col("n_boiler") * 1.0 / F.col("n_grams"), 6).alias("boiler_pct"),
        )
    )


@query(
    "text_unigram_surprisal",
    "text-analysis",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    clean AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM clean GROUP BY term),
    tot AS (SELECT SUM(cnt) AS total FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(ln(total * 1.0 / cnt)), 6) AS avg_surprisal_nats
    FROM clean JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="Unigram language-model quality score: average per-token "
    "surprisal -ln p(term) under the corpus unigram distribution — the "
    "cheap perplexity proxy used to rank documents before an expensive "
    "model pass. The unigram table is vocabulary-sized (tiny vs the "
    "corpus) so Spark broadcasts it; the corpus total is a 1-row "
    "broadcast; scoring is then map-side — the only real shuffle is "
    "the final per-doc aggregation.",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select("doc_id", F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("term"))
        .filter((F.col("term").isNotNull()) & (F.col("term") != ""))
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    # the vocabulary grows with the corpus (Heaps' law, unbounded with
    # noise/unicode): broadcast-hint it only under the source-size
    # gate; past it the planner/AQE picks the join (r17, guide §3.1)
    from tailsql_spark.operators.dedup import _small_input

    if _small_input(sf_dir):
        vocab = F.broadcast(vocab)
    return (
        toks.join(vocab, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("total") * 1.0 / F.col("cnt"))), 6).alias(
                "avg_surprisal_nats"
            ),
        )
    )


# ---------------------------------------------------------------------------
# round-2 additions: repetition, PII scrubbing, contamination
# ---------------------------------------------------------------------------

@query(
    "text_repetition_score",
    "text-analysis",
    """
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws,
               len(string_split(lower(text), ' ')) AS n
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, n - 1)]
                   AS grams
        FROM toks WHERE n >= 3
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           ROUND(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 6) AS dup_frac
    FROM g WHERE len(grams) > 0
    """,
    doc="Intra-document repetition (Gopher quality signal): share of "
    "word 3-grams that are repeats of an earlier 3-gram in the same "
    "doc. PURE MAP — per-row array building and dedup inside one "
    "codegen stage over the scan; zero shuffles at any corpus size.",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = F.split(F.lower(F.col("text")), " ")
    n = F.size(ws)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(" ", ws[i], ws[i + 1], ws[i + 2]),
        ),
    )
    return (
        t["documents"]
        .select("doc_id", grams.alias("grams"))
        .filter(F.col("grams").isNotNull() & (F.size("grams") > 0))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
            F.round(
                1.0 - F.size(F.array_distinct("grams")) * 1.0 / F.size("grams"), 6
            ).alias("dup_frac"),
        )
    )


# Identical regex set on both engines (RE2 and Java agree on this
# subset). Counts run on the raw text; scrubbing is sequential
# email -> ip -> phone so digit runs inside an already-scrubbed IP are
# not double-counted in the output string.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
_PII_PHONE = r"\b[0-9]{7,12}\b"


@query(
    "text_pii_scrub",
    "text-analysis",
    f"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.7 tel 5551' || CAST(1000000 + doc_id AS VARCHAR) AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT)  AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IPV4}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM seeded
    """,
    doc="PII scrubbing for training corpora: count + redact emails, "
    "IPv4s, long digit runs. The deterministic seeded suffix (built "
    "from doc_id on BOTH engines) guarantees non-trivial matches on "
    "synthetic text; the scrubbed md5 proves byte-identical "
    "replacement. Pure map over the scan - no shuffle.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 5551"),
        (F.col("doc_id") + 1000000).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(seeded, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return t["documents"].select(
        "doc_id",
        F.size(F.regexp_extract_all(seeded, F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long").alias("n_email"),
        F.size(F.regexp_extract_all(seeded, F.lit(_PII_IPV4), F.lit(0)))
        .cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(seeded, F.lit(_PII_PHONE), F.lit(0)))
        .cast("long").alias("n_phone"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


def contam_is_test() -> Column:
    """Deterministic train/test split flag: md5 band over doc_id (the
    same rule as ``sample_hash_split``) — ~10% of docs are 'test'."""
    return F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2) < "1a"


def contam_gram_arr() -> Column:
    """Word 5-gram array of lowercased text (single-space split — the
    contamination operators' shared tokenization; NULL for <5 tokens)."""
    ws = F.split(F.lower(F.col("text")), " ")
    n = F.size(ws)
    return F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(0), n - 5),
            lambda i: F.concat_ws(" ", ws[i], ws[i + 1], ws[i + 2], ws[i + 3], ws[i + 4]),
        ),
    )


def contam_grams_arrow(docs) -> "DataFrame":
    """The corpus-side contamination gram STREAM — one Arrow-batched
    pass emitting every word 5-gram (duplicates included, exactly as
    ``explode_outer(contam_gram_arr())`` filtered non-null; multiset
    equality pytest-asserted both ways).  Exists for the same reason
    as ``dedup.doc_shingle_hashes_arrow`` (r15): the lambda-HOF gram
    builder runs interpreted, and the train-side gram pass is the
    100 TB-shaped work of the Bloom decontamination probe.  The case
    fold runs JVM-SIDE (``F.lower`` before the mapInPandas boundary,
    r16) so this stream and the eval-set side's
    ``split(lower(text), " ")`` share ONE lowering by construction —
    Python ``str.lower`` and ``UTF8String.toLowerCase`` disagree on
    dotted-I / final-sigma style edge cases, and a silent corpus-vs-
    eval gram mismatch here would MISS real contamination.  Inside the
    batch, Python ``str.split(" ")`` matches Spark's literal-space
    split (limit −1: empty tokens kept, including trailing — no
    unicode involvement in a literal-byte split) and ``" ".join``
    matches ``concat_ws`` over possibly-empty tokens; multiset
    equality is pytest-asserted on ASCII AND unicode corpora.  Used
    only on the corpus-side stream of ``text_contamination_bloom``;
    the eval-set side and the per-doc operators keep the JVM array
    (their inputs are tiny or need the array shape)."""

    def build(batches):
        import pandas as pd

        for pdf in batches:
            out: list[str] = []
            for text in pdf["text"]:
                ws = text.split(" ")
                n = len(ws)
                if n < 5:
                    continue
                out.extend(" ".join(ws[i : i + 5]) for i in range(n - 4))
            yield pd.DataFrame({"g": pd.Series(out, dtype="object")})

    # the ONE lowering, JVM-side (see docstring)
    return docs.select(F.lower("text").alias("text")).mapInPandas(
        build, schema="g string"
    )


#: Exact contamination audit — shared verbatim by the inverted-index
#: operator below and the Bloom-prefiltered one in operators/sketches.py
#: (the sketch only prunes the probe stream; survivors are exact-joined,
#: so both compute the identical result).
CONTAM_ORACLE = """
    WITH split AS (
        SELECT doc_id, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' AS is_test
        FROM documents
    ),
    toks AS (
        SELECT doc_id, is_test, string_split(lower(text), ' ') AS ws,
               len(string_split(lower(text), ' ')) AS n
        FROM split
    ),
    grams AS (
        SELECT DISTINCT doc_id, is_test,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                       || ws[i+3] || ' ' || ws[i+4] FOR i IN range(1, n - 3)]) AS g
        FROM toks WHERE n >= 5
    ),
    train_grams AS (SELECT DISTINCT g FROM grams WHERE NOT is_test)
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
           ROUND(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS contamination_pct
    FROM grams t LEFT JOIN train_grams tr USING (g)
    WHERE t.is_test
    GROUP BY t.doc_id
    """


@query(
    "text_contamination_overlap",
    "text-analysis",
    CONTAM_ORACLE,
    doc="Train/test contamination audit: share of each TEST doc's "
    "distinct word 5-grams that appear anywhere in the TRAIN split "
    "(same md5 band rule as sample_hash_split). Inverted-index "
    "equi-join on the gram string - the decontamination shape that "
    "scales: distinct (doc,gram) pairs, distinct train grams, one "
    "hash join; nothing quadratic, skew split by AQE.",
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    grams = (
        t["documents"]
        .select("doc_id", contam_is_test().alias("is_test"), F.explode_outer(contam_gram_arr()).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    train_grams = grams.filter(~F.col("is_test")).select("g").distinct()
    return (
        grams.filter(F.col("is_test"))
        .join(train_grams.withColumn("hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0)) * 1.0 / F.count("*"), 6
            ).alias("contamination_pct"),
        )
    )


WINNOW_K = 5   # character n-gram width
WINNOW_W = 8   # winnowing window: one fingerprint per W consecutive grams


@query(
    "text_winnow_fingerprints",
    "text-analysis",
    f"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN length(s) >= {WINNOW_K}
                    THEN [CAST(('0x' || substr(md5(substr(s, i, {WINNOW_K})), 1, 8)) AS BIGINT)
                          FOR i IN range(1, length(s) - {WINNOW_K} + 2)]
                    ELSE [] END AS g
        FROM norm
    ),
    fps AS (
        SELECT doc_id,
               CASE WHEN len(g) >= {WINNOW_W}
                    THEN [list_min(g[j : j + {WINNOW_W} - 1])
                          FOR j IN range(1, len(g) - {WINNOW_W} + 2)]
                    ELSE [] END AS f
        FROM grams
    )
    SELECT doc_id, CAST(unnest(list_distinct(f)) AS BIGINT) AS fingerprint
    FROM fps
    """,
    doc="Winnowing fingerprints (the MOSS scheme): hash every "
    f"{WINNOW_K}-char gram of normalized text, keep the MINIMUM hash "
    f"of each sliding window of {WINNOW_W} grams, emit the distinct "
    "survivors. Guarantees any shared substring of length "
    f">= {WINNOW_K}+{WINNOW_W}-1 chars yields at least one shared "
    "fingerprint — the exact-substring-overlap detector that "
    "complements MinHash's whole-document similarity. Pure per-doc "
    "projection (zero shuffles before the dedup groupBy a consumer "
    "would add); fingerprints join doc pairs via an inverted index, "
    "never all-pairs.",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return winnow_fingerprints(t["documents"])


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, fingerprint) winnow rows.  Factored so
    the MOSS guarantee (any shared normalized substring of length
    >= K+W-1 chars yields a shared fingerprint) is property-testable
    on synthetic docs (tests/test_properties.py)."""
    k, w = WINNOW_K, WINNOW_W
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z0-9]", "").alias("s"),
    )
    grams = norm.select(
        "doc_id",
        F.expr(
            f"CASE WHEN length(s) >= {k} THEN "
            f"transform(sequence(1, length(s) - {k} + 1), "
            f"  i -> cast(conv(substring(md5(cast(substring(s, i, {k}) as binary)), 1, 8), 16, 10) as bigint)) "
            f"ELSE array() END"
        ).alias("g"),
    )
    fps = grams.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(g) >= {w} THEN "
            f"transform(sequence(1, size(g) - {w} + 1), "
            f"  j -> array_min(slice(g, j, {w}))) "
            f"ELSE array() END"
        ).alias("f"),
    )
    return fps.select(
        "doc_id",
        F.explode(F.array_distinct("f")).alias("fingerprint"),
    )


WINNOW_SHARED_MIN = 3  # report pairs sharing at least this many fingerprints

_WINNOW_FP_CTE = f"""
    norm AS (
        SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN length(s) >= {WINNOW_K}
                    THEN [CAST(('0x' || substr(md5(substr(s, i, {WINNOW_K})), 1, 8)) AS BIGINT)
                          FOR i IN range(1, length(s) - {WINNOW_K} + 2)]
                    ELSE [] END AS g
        FROM norm
    ),
    fp AS (
        SELECT doc_id, unnest(list_distinct(
                   CASE WHEN len(g) >= {WINNOW_W}
                        THEN [list_min(g[j : j + {WINNOW_W} - 1])
                              FOR j IN range(1, len(g) - {WINNOW_W} + 2)]
                        ELSE [] END)) AS fingerprint
        FROM grams
    )
"""


@query(
    "dedup_winnow_pairs",
    "dedup",
    f"""
    WITH {_WINNOW_FP_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {WINNOW_SHARED_MIN}
    """,
    doc="Exact-substring-overlap pairs: join the winnowing inverted "
    f"index on fingerprint, keep pairs sharing >= {WINNOW_SHARED_MIN} "
    "fingerprints. Winnowing guarantees coverage of every shared run "
    f"of {WINNOW_K}+{WINNOW_W}-1+ chars, so copied passages surface "
    "even when whole-document similarity (MinHash) is low — the "
    "license-boilerplate / quotation detector. Equi-join on the "
    "fingerprint key only: candidate cost scales with collisions, "
    "never all-pairs.",
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = text_winnow_fingerprints(spark, sf_dir)
    # fp self-joins below: without a persist the per-char gram + window
    # winnow chain — the expensive interpreted-HOF stage — is computed
    # once per join side (the sign-LSH/minhash lesson).  Two narrow
    # scalar columns: cheap to cache at any corpus size.
    fp = fp.persist()
    fp.count()
    a = fp.select(F.col("doc_id").alias("id_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("fp2"))
    return (
        a.join(b, (F.col("fingerprint") == F.col("fp2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_SHARED_MIN)
    )


@query(
    "text_bpe_pair_counts",
    "text-analysis",
    r"""
    WITH words AS (
        SELECT w FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ) WHERE len(w) >= 2
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> substring(w, CAST(i AS INT), 2))) AS pair
        FROM words
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair ASC LIMIT 20
    """,
    doc="One BPE-training step: corpus-wide adjacent symbol-pair "
    "frequencies (the statistic every merge iteration of byte-pair "
    "encoding maximizes), top-20 with a deterministic tie-break. "
    "Scale: explode(word → overlapping char pairs) is a pure map; the "
    "only shuffle is the pair groupBy (map-side combined — pair "
    "cardinality is tiny vs corpus size), then a TakeOrdered top-k. "
    "Iterating = re-running with the merged symbol table applied.",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    words = (
        t["documents"]
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# iterated BPE training: the full tokenizer-vocabulary merge loop
# ---------------------------------------------------------------------------

#: merge steps in the certified training loop — enough to exercise the
#: re-pairing semantics (a merged symbol must be able to win a LATER
#: step, e.g. (aa, a) after (a, a)); the oracle unrolls one CTE block
#: per step, so keep it Lloyd-sized.
BPE_MERGES = 3


def _bpe_step_ctes(r: int) -> str:
    """One unrolled DuckDB merge step: best pair by (count desc, pair
    asc), greedy left-to-right non-overlapping merge via island parity
    (see ``_bpe_apply_merge`` for the shared semantics)."""
    return f"""
    b{r} AS (
        SELECT sym AS l, nxt AS r2, SUM(cnt) AS n FROM e{r} WHERE nxt IS NOT NULL
        GROUP BY sym, nxt ORDER BY n DESC, sym ASC, nxt ASC LIMIT 1
    ),
    m{r} AS (
        SELECT w, pos FROM (
            SELECT w, pos, pos - MIN(pos) OVER (PARTITION BY w, grp) AS off
            FROM (
                SELECT e.w, e.pos,
                       e.pos - ROW_NUMBER() OVER (PARTITION BY e.w ORDER BY e.pos) AS grp
                FROM e{r} e, b{r} b
                WHERE e.sym = b.l AND e.nxt = b.r2
            )
        ) WHERE off % 2 = 0
    ),
    ne{r} AS (
        SELECT e.w, e.cnt, e.pos,
               CASE WHEN ml.pos IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END AS sym
        FROM e{r} e
        LEFT JOIN m{r} ml ON ml.w = e.w AND ml.pos = e.pos
        LEFT JOIN m{r} mr ON mr.w = e.w AND mr.pos = e.pos - 1
        WHERE mr.pos IS NULL
    ),
    e{r + 1} AS (
        SELECT w, cnt,
               ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos, sym,
               LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        FROM ne{r}
    )"""


def _bpe_train_oracle() -> str:
    head = r"""
    WITH words AS (
        SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ) WHERE len(w) >= 2 GROUP BY w
    ),
    e1 AS (
        SELECT w, cnt, i AS pos, substring(w, CAST(i AS INT), 1) AS sym,
               CASE WHEN i < len(w) THEN substring(w, CAST(i + 1 AS INT), 1) END AS nxt
        FROM words, unnest(generate_series(1, len(w))) AS t(i)
    ),"""
    tail = " UNION ALL ".join(
        f"SELECT {r} AS step, l AS pair_left, r2 AS pair_right,"
        f" l || r2 AS merged, CAST(n AS BIGINT) AS n FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return (
        head
        + ",".join(_bpe_step_ctes(r) for r in range(1, BPE_MERGES + 1))
        + f"\n    SELECT * FROM ({tail}) ORDER BY step"
    )


def _bpe_apply_merge(e: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one BPE merge to the exploded symbol table ``e`` ``(w, cnt,
    pos, sym, nxt)`` given the 1-row winning pair ``best (l, r2, n)``.

    Greedy left-to-right NON-overlapping semantics, declaratively: a
    position merges iff it matches the pair AND sits at an even offset
    within its maximal run of consecutive matches (runs only exist when
    l = r2 — for l ≠ r2 adjacent matches would force l = r2).  Right
    halves of merged pairs are dropped via an equi anti-condition, then
    positions are RENUMBERED contiguous (row_number per word) before the
    per-word LEAD recomputes the successor — the run/right-half logic
    above joins on ``pos ± 1``, so contiguity is an invariant every step
    must restore, not a nicety (a gapped pos after step k would let the
    right half of a step-k+1 merge survive as a phantom symbol).  All
    per-word windows are vocab-keyed (the word-TYPE table, never the
    corpus), the classic BPE trick that makes training
    corpus-size-independent."""
    matches = e.join(
        F.broadcast(best), (e.sym == best.l) & (e.nxt == best.r2)
    ).select("w", "pos")
    wrn = W.partitionBy("w").orderBy("pos")
    m = (
        matches.withColumn("grp", F.col("pos") - F.row_number().over(wrn))
        .withColumn("off", F.col("pos") - F.min("pos").over(W.partitionBy("w", "grp")))
        .filter(F.col("off") % 2 == 0)
        .select("w", F.col("pos").alias("mpos"))
    )
    ml = m.select("w", F.col("mpos").alias("pos"), F.lit(1).alias("mleft"))
    mr = m.select("w", (F.col("mpos") + 1).alias("pos"), F.lit(1).alias("mright"))
    ne = (
        e.join(ml, ["w", "pos"], "left")
        .join(mr, ["w", "pos"], "left")
        .filter(F.col("mright").isNull())
        .select(
            "w", "cnt", "pos",
            F.when(F.col("mleft").isNotNull(), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return (
        ne.withColumn("pos", F.row_number().over(wrn))
        .withColumn("nxt", F.lead("sym").over(wrn))
    )


def bpe_corpus_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus-wide pass of BPE training: the distinct word-TYPE
    frequency table (everything after it is vocab-sized)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _bpe_train_frames(spark: SparkSession, sf_dir: str, cache: bool = True):
    """(merges, final_syms, caches) over the ``documents`` corpus — see
    :func:`bpe_train_merges` for the loop itself."""
    return bpe_train_merges(bpe_corpus_words(spark, sf_dir), cache=cache)


class _SpoolHandle:
    """Release handle for a training spool directory — duck-typed to
    the ``unpersist()`` contract every (result, caches) builder in this
    repo uses, so callers release parquet spools and persisted frames
    with the same finally loop."""

    def __init__(self, path: str):
        self.path = path

    def unpersist(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)


def bpe_train_merges(
    words: DataFrame, n_steps: int = BPE_MERGES, cache: bool = True
):
    """(merges, final_syms, caches): the n_steps BPE training trajectory
    over a ``(w, cnt)`` word-frequency frame, the symbol table AFTER the
    last merge (the trained vocabulary's segmentation of every word —
    what tokenization applies), and the release handles the chain pins.

    LINEAGE TRUNCATION, not just caching: each step consumes the prior
    symbol table ~4× (pair count, match probe, two merge joins), and
    Catalyst plans are TREES — building step n+1 directly on step n's
    frame compounds the logical plan ~4^n, so by ~5 steps the
    OPTIMIZER, not the data, is the bottleneck (measured: analysis
    explodes before any task runs).  Like the connected-components
    loop, every step therefore spools its (vocab-sized) symbol table to
    parquet and rebuilds from the scan — plan size stays CONSTANT per
    step, the shape a production trainer running thousands of merges
    needs.  ``final_syms`` is lazy — the train query never pays for the
    last application; only the tokenizer does.  The plan audit passes
    ``cache=False`` (lazy chain, no spool — fine at the certified
    depth it inspects).  Factored off the corpus so the merge semantics
    are property-testable against a pure-Python BPE reference on
    arbitrary word sets (the property test runs PAST the certified
    depth, which is exactly what caught the plan blowup)."""
    wrn = W.partitionBy("w").orderBy("pos")
    e = (
        words.select(
            "w", "cnt",
            F.posexplode(
                F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            ).alias("pos0", "sym"),
        )
        .select("w", "cnt", (F.col("pos0") + 1).alias("pos"), "sym")
        .withColumn("nxt", F.lead("sym").over(wrn))
    )
    caches: list = []
    spool: str | None = None
    if cache:
        import tempfile

        spool = tempfile.mkdtemp(prefix="tailsql_bpe_spool_")
        caches.append(_SpoolHandle(spool))
    spark = words.sparkSession
    steps: list[DataFrame] = []
    for step in range(1, n_steps + 1):
        if cache:
            e.write.mode("overwrite").parquet(f"{spool}/e{step}")
            e = spark.read.parquet(f"{spool}/e{step}")
        best = (
            e.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r2"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r2"))
            .limit(1)
        )
        if cache:
            best.write.mode("overwrite").parquet(f"{spool}/b{step}")
            best = spark.read.parquet(f"{spool}/b{step}")
        steps.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("l").alias("pair_left"),
                F.col("r2").alias("pair_right"),
                F.concat("l", "r2").alias("merged"),
                F.col("n").cast("long").alias("n"),
            )
        )
        e = _bpe_apply_merge(e, best)
    merges = steps[0]
    for s in steps[1:]:
        merges = merges.unionByName(s)
    return merges.orderBy("step"), e, tuple(caches)


@query(
    "text_bpe_train",
    "text-analysis",
    _bpe_train_oracle(),
    plan=lambda s, d: _bpe_train_frames(s, d, cache=False)[0],
    doc=f"The ITERATED BPE training loop ({BPE_MERGES} merge steps), "
    "trajectory-certified like ann_kmeans_lloyd: each step counts "
    "corpus-weighted adjacent symbol-pair frequencies over the distinct "
    "WORD-TYPE table, picks the winner deterministically (count desc, "
    "pair asc) and applies the greedy non-overlapping merge so the new "
    "symbol re-pairs in the NEXT step — the vocabulary-evolution table "
    "(step, pair, merged, count) hash-matches DuckDB's unrolled-CTE "
    "replay exactly (integer counts, lexicographic ties). Scale: the "
    "symbol table is vocab-sized (distinct words × chars), NEVER "
    "corpus-sized — the one corpus-wide pass is the word groupBy; each "
    "step is one map-combined pair agg + a broadcast 1-row winner + "
    "per-word windows on the vocab key. Merge semantics (runs of a "
    "repeated symbol merge left-to-right, non-overlapping) are the "
    "island-parity rule, identical in both engines.",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _final, caches = _bpe_train_frames(spark, sf_dir)
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    try:
        return materialize_result(merges, "text_bpe_train", key=sf_key(sf_dir))
    finally:
        for frame in caches:
            frame.unpersist()


# ---------------------------------------------------------------------------
# BATCHED BPE training: top-k non-interacting merges per round
# ---------------------------------------------------------------------------

#: merges applied per round in the batched trainer and rounds in the
#: certified query.  k=2 keeps the oracle's unrolled greedy-selection
#: CTEs readable while exercising the interaction rule; the Spark
#: trainer takes any k.
BPE_BATCH_K = 2
BPE_BATCH_ROUNDS = 3


def _select_disjoint_pairs(ranked_rows, k: int):
    """Greedy top-k SYMBOL-DISJOINT pair selection over a ranked
    (count desc, pair asc) candidate list — the batched-BPE interaction
    rule: a pair joins the batch iff it shares no symbol with any
    higher-ranked selected pair.  Disjoint pairs cannot overlap in any
    word and cannot change each other's counts (merging (a,b) only
    creates/destroys pairs touching a or b), so the batch applies
    simultaneously with the same island-parity machinery as a single
    merge."""
    sel: list = []
    used: set[str] = set()
    for row in ranked_rows:
        if len(sel) == k:
            break
        if row.l in used or row.r2 in used:
            continue
        sel.append(row)
        used.update((row.l, row.r2))
    return sel


def bpe_train_merges_batched(
    words: DataFrame,
    n_rounds: int = BPE_BATCH_ROUNDS,
    k: int = BPE_BATCH_K,
    cache: bool = True,
):
    """(merges, final_syms, caches): BATCHED BPE training — per round,
    ONE pair-count aggregation selects the greedy top-k symbol-disjoint
    pairs and ONE merge pass applies them all, so a vocabulary of V
    merges costs ~2·V/k sequential stage launches instead of the
    1-at-a-time trainer's ~2·V (the launch-bound cost of deep training
    loops; see SCALING.md).  With k=1 the trajectory IS the sequential
    trainer's, pytest-certified; for k>1 each round's selection comes
    from the SAME count table, so a newly-created symbol can only start
    winning at the next round — the standard batched-BPE approximation,
    property-tested against a pure-Python replica of exactly these
    semantics.

    The candidate ranking is read back in a bounded prefix (64 rows,
    widened ×4 until the greedy selection fills or candidates run
    out) — planning metadata like a manifest read, never corpus-sized.
    Per-round lineage truncation (parquet spool) as in
    :func:`bpe_train_merges`."""
    wrn = W.partitionBy("w").orderBy("pos")
    e = (
        words.select(
            "w", "cnt",
            F.posexplode(
                F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            ).alias("pos0", "sym"),
        )
        .select("w", "cnt", (F.col("pos0") + 1).alias("pos"), "sym")
        .withColumn("nxt", F.lead("sym").over(wrn))
    )
    caches: list = []
    spool: str | None = None
    if cache:
        import tempfile

        spool = tempfile.mkdtemp(prefix="tailsql_bpe_batch_spool_")
        caches.append(_SpoolHandle(spool))
    spark = words.sparkSession
    out_rows: list[tuple] = []
    for rnd in range(1, n_rounds + 1):
        if cache:
            e.write.mode("overwrite").parquet(f"{spool}/e{rnd}")
            e = spark.read.parquet(f"{spool}/e{rnd}")
        counts = (
            e.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r2"))
            .agg(F.sum("cnt").alias("n"))
        )
        m = 64
        while True:
            top = counts.orderBy(F.desc("n"), F.asc("l"), F.asc("r2")).limit(m).collect()
            sel = _select_disjoint_pairs(top, k)
            if len(sel) == k or len(top) < m:
                break
            m *= 4  # pathological corpora only: widen the prefix
        if not sel:
            break
        for i, row in enumerate(sel, 1):
            out_rows.append((rnd, i, row.l, row.r2, row.l + row.r2, int(row.n)))
        best = spark.createDataFrame(
            [(r.l, r.r2) for r in sel], "l string, r2 string"
        )
        e = _bpe_apply_merge(e, best)
    merges = spark.createDataFrame(
        out_rows,
        "round long, sel_rank long, pair_left string, pair_right string,"
        " merged string, n long",
    )
    return merges.orderBy("round", "sel_rank"), e, tuple(caches)


def _bpe_batch_step_ctes(r: int) -> str:
    """One unrolled batched round (k=2): rank ALL pairs, select the
    top-1 plus the best pair symbol-disjoint from it, then apply both
    merges in one island-parity pass (disjoint pairs can never be
    adjacent in a word, so runs stay single-pair and the sequential
    parity rule carries over verbatim)."""
    return f"""
    pc{r} AS (
        SELECT sym AS l, nxt AS r2, SUM(cnt) AS n FROM be{r} WHERE nxt IS NOT NULL
        GROUP BY sym, nxt
    ),
    rk{r} AS (
        SELECT l, r2, n, ROW_NUMBER() OVER (ORDER BY n DESC, l ASC, r2 ASC) AS rk
        FROM pc{r}
    ),
    sa{r} AS (SELECT l, r2, n FROM rk{r} WHERE rk = 1),
    sb{r} AS (
        SELECT r.l, r.r2, r.n FROM rk{r} r, sa{r} s
        WHERE r.l <> s.l AND r.l <> s.r2 AND r.r2 <> s.l AND r.r2 <> s.r2
        ORDER BY r.rk LIMIT 1
    ),
    sel{r} AS (
        SELECT l, r2, n, 1 AS sel_rank FROM sa{r}
        UNION ALL SELECT l, r2, n, 2 FROM sb{r}
    ),
    bm{r} AS (
        SELECT w, pos FROM (
            SELECT w, pos, pos - MIN(pos) OVER (PARTITION BY w, grp) AS off
            FROM (
                SELECT e.w, e.pos,
                       e.pos - ROW_NUMBER() OVER (PARTITION BY e.w ORDER BY e.pos) AS grp
                FROM be{r} e JOIN sel{r} b ON e.sym = b.l AND e.nxt = b.r2
            )
        ) WHERE off % 2 = 0
    ),
    bne{r} AS (
        SELECT e.w, e.cnt, e.pos,
               CASE WHEN ml.pos IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END AS sym
        FROM be{r} e
        LEFT JOIN bm{r} ml ON ml.w = e.w AND ml.pos = e.pos
        LEFT JOIN bm{r} mr ON mr.w = e.w AND mr.pos = e.pos - 1
        WHERE mr.pos IS NULL
    ),
    be{r + 1} AS (
        SELECT w, cnt,
               ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos, sym,
               LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        FROM bne{r}
    )"""


def _bpe_batch_oracle() -> str:
    head = r"""
    WITH words AS (
        SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ) WHERE len(w) >= 2 GROUP BY w
    ),
    be1 AS (
        SELECT w, cnt, i AS pos, substring(w, CAST(i AS INT), 1) AS sym,
               CASE WHEN i < len(w) THEN substring(w, CAST(i + 1 AS INT), 1) END AS nxt
        FROM words, unnest(generate_series(1, len(w))) AS t(i)
    ),"""
    tail = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, CAST(sel_rank AS BIGINT) AS sel_rank,"
        f" l AS pair_left, r2 AS pair_right, l || r2 AS merged,"
        f" CAST(n AS BIGINT) AS n FROM sel{r}"
        for r in range(1, BPE_BATCH_ROUNDS + 1)
    )
    return (
        head
        + ",".join(_bpe_batch_step_ctes(r) for r in range(1, BPE_BATCH_ROUNDS + 1))
        + f"\n    SELECT * FROM ({tail}) ORDER BY round, sel_rank"
    )


@query(
    "text_bpe_train_batched",
    "text-analysis",
    _bpe_batch_oracle(),
    doc=f"BATCHED BPE training ({BPE_BATCH_ROUNDS} rounds × top-"
    f"{BPE_BATCH_K} symbol-disjoint merges): each round's ONE pair "
    "count feeds a greedy rank-ordered selection of non-interacting "
    "pairs (no shared symbol — such merges commute and cannot overlap "
    "in any word, so one simultaneous island-parity pass applies the "
    "whole batch), collapsing a V-merge vocabulary from ~2·V to "
    f"~2·V/{BPE_BATCH_K} sequential stage launches — the r7 verdict's "
    "launch-bound headroom for production-depth trainers. Certified "
    "against DuckDB's unrolled replay of the SAME ranked selection + "
    "batch merge; pytest pins k=1 to the sequential trajectory and a "
    "property test replays arbitrary word sets past the certified "
    "depth against a pure-Python reference.",
)
def text_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _final, caches = bpe_train_merges_batched(bpe_corpus_words(spark, sf_dir))
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    try:
        return materialize_result(merges, "text_bpe_train_batched", key=sf_key(sf_dir))
    finally:
        for frame in caches:
            frame.unpersist()


def _bpe_tokenize_oracle() -> str:
    """Per-doc subword token counts under the trained vocabulary: the
    train chain's ``e{BPE_MERGES+1}`` IS the vocabulary's segmentation
    of every word type — count symbols per word, weight by the doc's
    word instances (words below the training length floor count 1)."""
    head = r"""
    WITH words AS (
        SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ) WHERE len(w) >= 2 GROUP BY w
    ),
    e1 AS (
        SELECT w, cnt, i AS pos, substring(w, CAST(i AS INT), 1) AS sym,
               CASE WHEN i < len(w) THEN substring(w, CAST(i + 1 AS INT), 1) END AS nxt
        FROM words, unnest(generate_series(1, len(w))) AS t(i)
    ),"""
    tail = f"""
    nsyms AS (SELECT w, COUNT(*) AS n_sym FROM e{BPE_MERGES + 1} GROUP BY w),
    dwords AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    )
    SELECT d.doc_id,
           CAST(SUM(CASE WHEN len(d.w) >= 2 THEN ns.n_sym ELSE 1 END) AS BIGINT)
               AS n_tokens
    FROM dwords d LEFT JOIN nsyms ns ON ns.w = d.w
    WHERE len(d.w) >= 1
    GROUP BY d.doc_id"""
    return head + ",".join(_bpe_step_ctes(r) for r in range(1, BPE_MERGES + 1)) + "," + tail


def _bpe_tokenize_counts(spark: SparkSession, sf_dir: str, cache: bool = True):
    """(out, caches): the tokenize computation (pre-materialization) —
    the plan audit passes ``cache=False`` so it inspects the real
    computation, not a materialized scan, and leaks no persists."""
    _merges, final_syms, caches = _bpe_train_frames(spark, sf_dir, cache=cache)
    t = load_tables(spark, sf_dir)
    nsyms = final_syms.groupBy("w").agg(F.count("*").alias("n_sym"))
    dwords = (
        t["documents"]
        .select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.length("w") >= 1)
    )
    # nsyms is one row per distinct corpus word — vocabulary-sized, so
    # the hint is size-gated like every vocab attach (r17, guide §3.1)
    from tailsql_spark.operators.dedup import _small_input

    if _small_input(sf_dir):
        nsyms = F.broadcast(nsyms)
    out = (
        dwords.join(nsyms, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.length("w") >= 2, F.col("n_sym")).otherwise(F.lit(1))
            ).cast("long").alias("n_tokens")
        )
    )
    return out, caches


@query(
    "text_bpe_tokenize",
    "text-analysis",
    _bpe_tokenize_oracle(),
    plan=lambda s, d: _bpe_tokenize_counts(s, d, cache=False)[0],
    doc=f"Tokenizer INFERENCE under the trained BPE vocabulary: the "
    f"{BPE_MERGES}-step training chain's final symbol table is the "
    "vocabulary's segmentation of every word TYPE; per-doc subword "
    "token counts are one corpus word pass joined to that vocab-sized "
    "table (words under the length floor count 1 token). Train + apply "
    "in one certified composition — the oracle replays the identical "
    "chain and weights by word instances. Scale: training stays "
    "vocab-sized; inference is one corpus pass + a broadcast "
    "vocab join + one doc_id agg — the exact shape of production "
    "tokenizer counting jobs.",
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, caches = _bpe_tokenize_counts(spark, sf_dir)
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    try:
        return materialize_result(out, "text_bpe_tokenize", key=sf_key(sf_dir))
    finally:
        for frame in caches:
            frame.unpersist()


# ---------------------------------------------------------------------------
# bigram LM quality scoring (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------

BACKOFF = 0.4  # Stupid Backoff weight for unseen bigrams


@query(
    "text_bigram_surprisal",
    "text-analysis",
    f"""
    WITH fw AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents
    ),
    toks AS (SELECT doc_id, unnest(ws) AS term FROM fw),
    uni AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    tot AS (SELECT SUM(cnt) AS total FROM uni),
    pairs AS (
        SELECT doc_id, ws[CAST(i + 1 AS INT)] AS w1, ws[CAST(i + 2 AS INT)] AS w2
        FROM fw, unnest(generate_series(0, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 2
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM pairs GROUP BY w1, w2)
    SELECT p.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(ln(1.0 / (CASE WHEN b.bcnt IS NOT NULL
                    THEN b.bcnt * 1.0 / u1.cnt
                    ELSE {BACKOFF} * u2.cnt * 1.0 / t.total END))), 6)
               AS avg_surprisal_nats
    FROM pairs p
    LEFT JOIN bi b USING (w1, w2)
    JOIN uni u1 ON u1.term = p.w1
    JOIN uni u2 ON u2.term = p.w2
    CROSS JOIN tot t
    GROUP BY p.doc_id
    """,
    doc=f"Bigram language-model quality score with Stupid Backoff "
    f"(α={BACKOFF}): per-token surprisal -ln p(w2|w1), where p is the "
    "corpus bigram MLE when the bigram was seen and α·p_unigram(w2) "
    "otherwise — the CCNet-style perplexity proxy one rank up from "
    "text_unigram_surprisal, sensitive to word ORDER, not just word "
    "choice. Scale: bigram construction is a map-side array transform "
    "(no per-doc window shuffle); the bigram and unigram count tables "
    "are vocabulary-sized and broadcast; the corpus total is a 1-row "
    "broadcast; scoring is map-side with one final per-doc agg — the "
    "same plan shape as the certified unigram operator, and the same "
    "ROUND(AVG(ln(·)),6) cross-engine exactness device.",
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    fw = t["documents"].select(
        "doc_id", F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("ws")
    )
    toks = fw.select("doc_id", F.explode("ws").alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = uni.agg(F.sum("cnt").alias("total"))
    pairs = fw.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2),"
                " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("cnt").alias("u1cnt"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("cnt").alias("u2cnt"))
    # uni/bigram count tables grow with the corpus vocabulary: hint
    # only under the source-size gate (r17, guide §3.1); tot is 1 row
    from tailsql_spark.operators.dedup import _small_input

    if _small_input(sf_dir):
        bi, u1, u2 = F.broadcast(bi), F.broadcast(u1), F.broadcast(u2)
    p = F.when(
        F.col("bcnt").isNotNull(), F.col("bcnt") * F.lit(1.0) / F.col("u1cnt")
    ).otherwise(F.lit(BACKOFF) * F.col("u2cnt") * F.lit(1.0) / F.col("total"))
    return (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.lit(1.0) / p)), 6).alias("avg_surprisal_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf-law fit: corpus-health diagnostic
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        ) u WHERE tok <> ''
    ),
    tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    ranked AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk FROM tf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(regr_slope(ln(cnt), ln(rnk)), 4) AS zipf_slope,
           ROUND(regr_intercept(ln(cnt), ln(rnk)), 4) AS zipf_intercept
    FROM ranked
"""


@query(
    "text_zipf_slope",
    "text-analysis",
    _ZIPF_ORACLE,
    doc="Zipf-law fit over the token rank-frequency curve: OLS slope "
    "of ln(count) against ln(rank) — natural corpora sit near -1; a "
    "slope collapsing toward 0 flags template/boilerplate floods and "
    "one diving below -1.5 flags a head-heavy (deduplication-starved) "
    "mix, so this is the one-number corpus-health dial quality "
    "dashboards track per source/snapshot. One token pass + one "
    "vocab-sized shuffle; the rank is a DISTRIBUTED rank, never a "
    "global-order window over the vocabulary (at web scale the type "
    "table is 1e8-1e9 rows): types bucket by (cnt, 2-char token "
    "prefix) — order-compatible with the (cnt DESC, tok) sort key "
    "because UTF-8 prefix comparison agrees with full-string "
    "comparison in both engines — rank = broadcast per-bucket offset "
    "(prefix sum over the tiny bucket table) + intra-bucket "
    "row_number, the sample_weighted_systematic pattern. regr_slope "
    "aggregates map-side. Rounded to 4 dp for cross-engine float "
    "determinism (engines agree to ~1e-14; the summation-order slack "
    "is 10 orders below the rounding step).",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter((F.col("tok").isNotNull()) & (F.col("tok") != ""))
    )
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # distributed rank over (cnt DESC, tok ASC): bucket by the sort-key
    # prefix (cnt, first two token chars); all rows of a bucket are
    # contiguous in the global order, so global rank = bucket offset +
    # intra-bucket row_number. The offset prefix sum windows only the
    # bucket table (distinct cnt x distinct prefixes — metadata-sized),
    # never the type table; the heavy cnt=1 stratum is split across
    # prefix buckets instead of one straggler task.
    tf = tf.withColumn("pb", F.substring("tok", 1, 2))
    bkt = tf.groupBy("cnt", "pb").agg(F.count("*").alias("bn"))
    offs = bkt.withColumn(
        "off",
        F.sum("bn").over(W.orderBy(F.col("cnt").desc(), F.col("pb"))) - F.col("bn"),
    ).select("cnt", "pb", "off")
    intra = F.row_number().over(
        W.partitionBy("cnt", "pb").orderBy(F.col("tok"))
    )
    ranked = (
        tf.withColumn("intra", intra)
        .join(F.broadcast(offs), ["cnt", "pb"])
        .withColumn("rnk", F.col("off") + F.col("intra"))
    )
    return ranked.agg(
        F.count("*").alias("n_types"),
        F.round(F.expr("regr_slope(ln(cnt), ln(rnk))"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(ln(cnt), ln(rnk))"), 4).alias("zipf_intercept"),
    )


_DECONTAM_ORACLE = """
    WITH split AS (
        SELECT doc_id, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' AS is_test
        FROM documents
    ),
    toks AS (
        SELECT doc_id, is_test, string_split(lower(text), ' ') AS ws,
               len(string_split(lower(text), ' ')) AS n
        FROM split
    ),
    grams AS (
        SELECT DISTINCT doc_id, is_test,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                       || ws[i+3] || ' ' || ws[i+4] FOR i IN range(1, n - 3)]) AS g
        FROM toks WHERE n >= 5
    ),
    test_grams AS (SELECT DISTINCT g FROM grams WHERE is_test)
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN te.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test_hits,
           CAST(CASE WHEN SUM(CASE WHEN te.g IS NOT NULL THEN 1 ELSE 0 END) * 5
                          < COUNT(*)
                     THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM grams t LEFT JOIN test_grams te USING (g)
    WHERE NOT t.is_test
    GROUP BY t.doc_id
"""


@query(
    "corpus_decontaminated",
    "text-analysis",
    _DECONTAM_ORACLE,
    doc="The decontamination FILTTER the audit feeds (the audit scores "
    "test docs; training pipelines must drop TRAIN docs): each train "
    "doc's distinct 5-grams probe the eval-set gram index, and the doc "
    "is kept only while test-hit grams stay under 20% of its grams "
    "(exact integer rule n_hits*5 < n_grams — no float threshold). "
    "Same inverted-index equi-join scale shape as the audit: distinct "
    "(doc, gram) pairs, a tiny distinct test-gram set (broadcastable "
    "at 100 TB — the eval set is fixed-size), one hash join, nothing "
    "quadratic; composes with the Bloom pre-prune exactly like "
    "text_contamination_bloom when the corpus side dominates.",
)
def corpus_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    grams = (
        t["documents"]
        .select(
            "doc_id",
            contam_is_test().alias("is_test"),
            F.explode_outer(contam_gram_arr()).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    test_grams = grams.filter(F.col("is_test")).select("g").distinct()
    scored = (
        grams.filter(~F.col("is_test"))
        .join(test_grams.withColumn("hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_test_hits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "n_test_hits",
        F.when(F.col("n_test_hits") * 5 < F.col("n_grams"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("kept"),
    )


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) tokenizer trainer
# ---------------------------------------------------------------------------

#: Unigram-LM trainer shape: seed pieces are all substrings up to
#: UNI_PIECE_MAX chars of the word-type table (single chars included,
#: so segmentation is always feasible); words longer than UNI_WORD_MAX
#: are excluded from training (the long tail a production trainer
#: pre-splits); the certified query runs UNI_ROUNDS EM rounds.
UNI_PIECE_MAX = 6
UNI_WORD_MAX = 16
UNI_ROUNDS = 2
#: seed-vocabulary cap (SentencePiece's seed prune): only the top
#: UNI_SEED_CAP pieces by (cnt DESC, piece ASC) rank enter the model
#: each round — plus ALL single-character pieces, so every word stays
#: segmentable by construction.  The cap is what makes the broadcast
#: model MODEL-sized by construction rather than by parameter accident
#: (the r9 verdict's UNI_PIECE_MAX=3 cliff): piece length can now be a
#: realistic 6 while the driver dict and broadcast stay <= cap +
#: alphabet entries.  192 genuinely bites on the synthetic corpus
#: (259 distinct depth-6 seed pieces at sf0.01).
UNI_SEED_CAP = 192
_UNI_SEP = "\x1f"


def unigram_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-TYPE frequency table for unigram-LM training: the one
    corpus-wide pass (everything after is vocab-sized)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        # explicit class = RE2's \s exactly: Java's \s also matches \x0b
        # (vertical tab), the DuckDB oracle's string_split_regex('\s+')
        # does not (r9 ADVICE) — pin the tokenizer to the intersection
        .select(F.explode(F.split(F.lower(F.trim("text")), "[ \t\n\f\r]+")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= UNI_WORD_MAX))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_seed_pieces(words: DataFrame) -> DataFrame:
    """Seed vocabulary: corpus-weighted counts of every substring of
    length 1..UNI_PIECE_MAX over the word types (overlapping occurrences
    counted) — one explode + one vocab-keyed groupBy."""
    return (
        words.select(
            F.col("cnt"),
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)), i -> "
                    f"transform(sequence(1, least({UNI_PIECE_MAX}, length(w) - i + 1)),"
                    " l -> substring(w, i, l))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def unigram_piece_ranks(pieces: DataFrame) -> DataFrame:
    """DISTRIBUTED (cnt DESC, piece ASC) rank over the piece table —
    the bucketed prefix-sum pattern (text_zipf_slope): pieces bucket by
    (cnt, 2-char piece prefix), which is order-compatible with the
    sort key because UTF-8 prefix comparison agrees with full-string
    comparison; global rank = broadcast per-bucket offset (prefix sum
    over the metadata-sized bucket table) + intra-bucket row_number.
    No global-order window ever touches the piece table, so a
    vocab-scale seed table (realistic piece lengths, web-scale
    alphabets) ranks without a single-task sort — the r9 verdict's
    parameter cliff, removed."""
    tf = pieces.withColumn("pb", F.substring("piece", 1, 2))
    bkt = tf.groupBy("cnt", "pb").agg(F.count("*").alias("bn"))
    offs = bkt.withColumn(
        "off",
        F.sum("bn").over(W.orderBy(F.col("cnt").desc(), F.col("pb"))) - F.col("bn"),
    ).select("cnt", "pb", "off")
    intra = F.row_number().over(W.partitionBy("cnt", "pb").orderBy(F.col("piece")))
    return (
        tf.withColumn("intra", intra)
        .join(F.broadcast(offs), ["cnt", "pb"])
        .select("piece", (F.col("off") + F.col("intra")).alias("rk"))
    )


def unigram_piece_costs(pieces: DataFrame) -> dict:
    """Integer-exact piece costs: rank pieces by (cnt DESC, piece ASC)
    and charge bit_length(rank) — under a Zipf law ln p ~ -s ln rank,
    so minimizing sum log2(rank) IS the Viterbi objective of a fitted
    Zipf unigram LM, with the +1/piece floor acting as a shortness
    prior.  Integer costs make the E-step argmax engine-exact (no
    float-log comparisons to drift cross-engine).

    r10: the rank is distributed (:func:`unigram_piece_ranks`) and the
    model is CAPPED before collection — rank <= UNI_SEED_CAP, plus all
    single-char pieces so segmentability is unconditional.  Only the
    capped set reaches the driver and the broadcast, so the MODEL
    (like logreg weights / k-means centroids in mlprep) is bounded by
    the cap, not by the vocabulary; the collect also truncates
    per-round lineage, so plan size stays constant in depth like the
    BPE spool.  Costs keep the UNCAPPED global rank (a surviving
    piece's cost never depends on what was pruned around it)."""
    ranked = unigram_piece_ranks(pieces).filter(
        (F.col("rk") <= UNI_SEED_CAP) | (F.length("piece") == 1)
    )
    rows = ranked.collect()  # capped: model-sized by construction
    return {r.piece: r.rk.bit_length() for r in rows}


def unigram_viterbi(w: str, costs: dict) -> list:
    """Min-cost segmentation of ``w`` into pieces from ``costs``; ties
    by (fewer pieces, then lexicographic path) — the identical rule the
    DuckDB oracle's unrolled DP applies, with the same below-printable
    separator so path comparison agrees byte-for-byte."""
    best: list = [None] * (len(w) + 1)
    best[0] = (0, 0, "")
    for j in range(1, len(w) + 1):
        cand = None
        for length in range(1, min(UNI_PIECE_MAX, j) + 1):
            prev = best[j - length]
            if prev is None:
                continue
            piece = w[j - length : j]
            c = costs.get(piece)
            if c is None:
                continue
            path = piece if prev[2] == "" else prev[2] + _UNI_SEP + piece
            t = (prev[0] + c, prev[1] + 1, path)
            if cand is None or t < cand:
                cand = t
        best[j] = cand
    return best[len(w)][2].split(_UNI_SEP) if best[len(w)] else []


def unigram_em_round(
    words: DataFrame, costs: dict, broadcasts: list | None = None
) -> DataFrame:
    """One hard-EM round: E-step Viterbi-segments every word TYPE in an
    Arrow-batched mapInPandas stage under the broadcast cost model;
    M-step re-counts piece usage corpus-weighted (one vocab-keyed
    groupBy).  Pieces with zero usage drop out — the prune step; every
    word stays segmentable because single-char pieces survive the cap
    unconditionally.  ``broadcasts`` (r9 ADVICE): the caller that
    MATERIALIZES the returned frame owns the broadcast lifecycle —
    pass a list to collect the round's broadcast and destroy it after
    materialization, so repeated builds never accumulate session-
    lifetime broadcast state."""
    sc = words.sparkSession.sparkContext
    bc = sc.broadcast(costs)
    if broadcasts is not None:
        broadcasts.append(bc)

    def seg(batches):
        import pandas as pd

        c = bc.value
        for pdf in batches:
            out_p: list = []
            out_c: list = []
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                for piece in unigram_viterbi(w, c):
                    out_p.append(piece)
                    out_c.append(int(cnt))
            yield pd.DataFrame(
                {
                    "piece": pd.Series(out_p, dtype="object"),
                    "cnt": pd.Series(out_c, dtype="int64"),
                }
            )

    used = words.mapInPandas(seg, schema="piece string, cnt long")
    return used.groupBy("piece").agg(F.sum("cnt").alias("cnt"))


def unigram_lm_train(
    words: DataFrame, n_rounds: int = UNI_ROUNDS, broadcasts: list | None = None
) -> DataFrame:
    """(round, piece, cnt) trajectory: round 0 = seed substring counts,
    round r = the r-th EM round's M-step counts.  Each round's model
    collect truncates lineage, so depth never grows the plan."""
    traj = unigram_seed_pieces(words)
    out = traj.select(
        F.lit(0).cast("long").alias("round"), "piece", F.col("cnt").cast("long")
    )
    cur = traj
    for r in range(1, n_rounds + 1):
        cur = unigram_em_round(words, unigram_piece_costs(cur), broadcasts)
        out = out.unionByName(
            cur.select(
                F.lit(r).cast("long").alias("round"),
                "piece",
                F.col("cnt").cast("long"),
            )
        )
    return out


def _unigram_dp_ctes(r: int) -> list:
    """Unrolled Viterbi DP for round ``r`` as DuckDB CTEs: d{r}_j holds
    the lexicographic-min (cost, np, path) state for every word's
    length-j prefix; transitions come from the last 1..UNI_PIECE_MAX
    characters matching a piece."""
    parts = [
        f"d{r}_0 AS MATERIALIZED (SELECT w, cnt, CAST(0 AS BIGINT) AS cost, 0 AS np,"
        " '' AS path FROM uwords)"
    ]
    for j in range(1, UNI_WORD_MAX + 1):
        branches = []
        for length in range(1, min(UNI_PIECE_MAX, j) + 1):
            branches.append(f"""
            SELECT d.w, d.cnt, d.cost + p.cost AS cost, d.np + 1 AS np,
                   CASE WHEN d.path = '' THEN p.piece
                        ELSE d.path || chr(31) || p.piece END AS path
            FROM d{r}_{j - length} d JOIN p{r} p
              ON length(p.piece) = {length}
             AND p.piece = substring(d.w, {j - length + 1}, {length})
            WHERE length(d.w) >= {j}""")
        u = " UNION ALL ".join(branches)
        parts.append(f"""d{r}_{j} AS MATERIALIZED (
            SELECT w, cnt, cost, np, path FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY w ORDER BY cost, np, path) AS rn
                FROM ({u})
            ) WHERE rn = 1)""")
    best = " UNION ALL ".join(
        f"SELECT w, cnt, path FROM d{r}_{j} WHERE length(w) = {j}"
        for j in range(1, UNI_WORD_MAX + 1)
    )
    parts.append(f"best{r} AS MATERIALIZED ({best})")
    parts.append(f"""m{r} AS (
        SELECT piece, SUM(cnt) AS cnt FROM (
            SELECT unnest(string_split(path, chr(31))) AS piece, cnt
            FROM best{r}
        ) GROUP BY 1)""")
    return parts


def _unigram_oracle_parts(n_rounds: int) -> list:
    """Shared CTE chain: word types, seed, then per round the cost
    table p{r} and the unrolled DP ending in m{r}."""
    parts = [
        r"""uwords AS MATERIALIZED (
        SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ) WHERE length(w) >= 1 AND length(w) <= """
        + str(UNI_WORD_MAX)
        + " GROUP BY w)",
        f"""seed AS MATERIALIZED (
        SELECT substring(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
               SUM(cnt) AS cnt
        FROM uwords,
             unnest(generate_series(1, length(w))) AS t(i),
             unnest(generate_series(1, {UNI_PIECE_MAX})) AS u(l)
        WHERE i + l - 1 <= length(w)
        GROUP BY 1)""",
    ]
    for r in range(1, n_rounds + 1):
        src = "seed" if r == 1 else f"m{r - 1}"
        # the r10 seed-prune: rank <= cap OR single-char (always kept),
        # cost = bit_length of the UNCAPPED global rank — identical to
        # unigram_piece_costs
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT piece, CAST(length(bin(rk)) AS BIGINT) AS cost"
            " FROM (SELECT piece, ROW_NUMBER() OVER (ORDER BY cnt DESC,"
            f" piece ASC) AS rk FROM {src})"
            f" WHERE rk <= {UNI_SEED_CAP} OR length(piece) = 1)"
        )
        parts += _unigram_dp_ctes(r)
    return parts


def _unigram_oracle() -> str:
    parts = _unigram_oracle_parts(UNI_ROUNDS)
    tail = " UNION ALL ".join(
        [
            "SELECT CAST(0 AS BIGINT) AS round, piece, CAST(cnt AS BIGINT)"
            " AS cnt FROM seed"
        ]
        + [
            f"SELECT CAST({r} AS BIGINT), piece, CAST(cnt AS BIGINT) FROM m{r}"
            for r in range(1, UNI_ROUNDS + 1)
        ]
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {tail}"


@query(
    "text_unigram_lm_train",
    "text-analysis",
    _unigram_oracle(),
    doc=f"Unigram-LM (SentencePiece-style) tokenizer trainer, "
    f"trajectory-certified at {UNI_ROUNDS} hard-EM rounds: seed = all "
    f"substrings to {UNI_PIECE_MAX} chars of the word-type table, "
    f"pruned to the top {UNI_SEED_CAP} by frequency rank plus all "
    "single-char pieces (SentencePiece's seed prune — segmentability "
    "unconditional, model bounded by the cap, not the vocabulary); "
    "E-step Viterbi-segments every word TYPE under integer-exact piece "
    "costs (bit_length of the piece's UNCAPPED frequency rank — the "
    "Zipf-LM surrogate that keeps the argmax engine-exact, no float "
    "logs); M-step re-counts piece usage; unused pieces prune out. The "
    "E-step runs as Arrow-batched mapInPandas with the capped model "
    "BROADCAST (the mlprep weights pattern, destroyed after the "
    "materialized write) and each round's model collect truncates "
    "lineage, so plan size is constant in depth like batched BPE. The "
    "DuckDB oracle unrolls the identical DP (per-prefix lexicographic-"
    "min states, same tie rule, same cap rule, same below-printable "
    "path separator). Scale: the corpus appears ONLY in the word-type "
    "groupBy; seeding and M-step are vocab-keyed shuffles; the rank is "
    "DISTRIBUTED (bucketed prefix sum — no global-order window ever "
    "touches the piece table, plan-asserted); segmentation is "
    "embarrassingly parallel over word types with a cap-bounded "
    "broadcast. A property test replays arbitrary word sets one round "
    "PAST the certified depth against a pure-Python replica, and a "
    "cap-bite test pins the prune rule at a forced-small cap.",
    # the certified build materializes (its returned frame is a scan):
    # hand plan-shape tooling the live computation instead
    plan=lambda s, d: unigram_lm_train(unigram_words(s, d)),
)
def text_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    bcs: list = []
    traj = unigram_lm_train(unigram_words(spark, sf_dir), broadcasts=bcs)
    out = materialize_result(traj, "text_unigram_lm_train", key=sf_key(sf_dir))
    # the materialized write executed every EM stage: the per-round
    # broadcast models are dead — release them (r9 ADVICE)
    for bc in bcs:
        bc.destroy()
    return out


def _unigram_tokenize_oracle() -> str:
    """Tokenize under the TRAINED model: one more cost table from the
    final round's counts, one more unrolled DP pass for the word-type
    segmentation, then the per-doc aggregation (out-of-scope words —
    longer than UNI_WORD_MAX — fall back to one piece per char, the
    same rule both engines apply)."""
    fr = UNI_ROUNDS + 1  # segmentation-only pass under the final model
    parts = _unigram_oracle_parts(fr)
    # m{fr} is never consumed: best{fr} carries the final segmentation
    tail = f""",
    nsyms AS MATERIALIZED (
        SELECT w,
               CAST(length(path) - length(replace(path, chr(31), '')) + 1
                    AS BIGINT) AS np
        FROM best{fr}
    ),
    dwords AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(CASE WHEN length(d.w) <= {UNI_WORD_MAX} THEN n.np
                         ELSE length(d.w) END) AS BIGINT) AS n_pieces
    FROM dwords d LEFT JOIN nsyms n ON d.w = n.w
    WHERE length(d.w) >= 1
    GROUP BY d.doc_id"""
    return "WITH " + ",\n    ".join(parts) + tail


@query(
    "text_unigram_tokenize",
    "text-analysis",
    _unigram_tokenize_oracle(),
    doc="Tokenization under the TRAINED unigram LM (the apply half of "
    "text_unigram_lm_train, as bpe_tokenize is to bpe_train): the "
    "final model's costs segment every word TYPE once (Viterbi, "
    "broadcast model, Arrow-batched), and per-doc subword counts come "
    "from joining the doc's word instances against the type-level "
    "segmentation — the corpus is touched exactly twice (word groupBy, "
    "doc join), never re-segmented per instance. Words beyond the "
    f"training length cap fall back to one piece per char. Certified "
    "against the oracle's additional unrolled DP pass over the same "
    "trained counts.",
    # materializing build → audit the live computation (see lm_train)
    plan=lambda s, d: _unigram_tokenize_out(s, d, []),
)
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailsql_spark.plans.catalog import materialize_result, sf_key

    bcs: list = []
    out = _unigram_tokenize_out(spark, sf_dir, bcs)
    res = materialize_result(out, "text_unigram_tokenize", key=sf_key(sf_dir))
    for b in bcs:  # all stages executed by the materialized write (r9 ADVICE)
        b.destroy()
    return res


def _unigram_tokenize_out(spark: SparkSession, sf_dir: str, bcs: list) -> DataFrame:
    """The LAZY tokenize computation (train + segment + per-doc agg),
    shared by the certified materializing build and the plan-shape
    audit (QuerySpec.plan) so materialization never blinds the
    de-optimization gate.  Created broadcasts append to ``bcs``; the
    caller that executes the frame owns their destruction."""
    words = unigram_words(spark, sf_dir)
    cur = unigram_seed_pieces(words)
    for _ in range(UNI_ROUNDS):
        cur = unigram_em_round(words, unigram_piece_costs(cur), bcs)
    costs = unigram_piece_costs(cur)
    bc = spark.sparkContext.broadcast(costs)
    bcs.append(bc)

    def npieces(batches):
        import pandas as pd

        c = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "np": pd.Series(
                        [len(unigram_viterbi(w, c)) for w in pdf["w"]],
                        dtype="int64",
                    ),
                }
            )

    wordp = words.mapInPandas(npieces, schema="w string, np long")
    t = load_tables(spark, sf_dir)
    dwords = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), "[ \t\n\f\r]+")).alias("w"),
        )
        .filter(F.length("w") >= 1)
    )
    return (
        dwords.join(wordp, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("np"), F.length("w").cast("long"))).alias(
                "n_pieces"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

#: Okapi BM25 constants (the standard defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5
#: the retrieval workload: fixed multi-term queries over the corpus
#: vocabulary — the probe set a decontamination/quality pipeline runs
#: against its training corpus.
BM25_QUERIES = (
    ("q1", "hash join"),
    ("q2", "window agg"),
    ("q3", "fast scan filter"),
    ("q4", "stream batch merge"),
    ("q5", "customer order query"),
    ("q6", "vector column data"),
)

_BM25_QUERY_VALUES = ", ".join(
    f"('{qid}', '{q}', '{tok}')"
    for qid, q in BM25_QUERIES
    for tok in q.split(" ")
)

#: Per-term weight, written with IDENTICAL expression structure on both
#: engines so the doubles agree bitwise before the micro-unit round:
#: idf = ln(1 + (N - df + 0.5)/(df + 0.5));
#: w   = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)).
#: The weight is quantized to BIGINT micro-units BEFORE the per-doc sum
#: (the repo's _cents discipline): summing doubles is order-dependent
#: across engines, summing int64 micro-units is exact, and the final
#: score divides once — so ranking and output are cross-engine stable.
_BM25_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM docs),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ws) AS tok FROM docs)
        GROUP BY doc_id, tok
    ),
    qterms(qid, query, tok) AS (VALUES {_BM25_QUERY_VALUES}),
    dfreq AS (
        SELECT tf.tok, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf WHERE tf.tok IN (SELECT DISTINCT tok FROM qterms)
        GROUP BY tf.tok
    ),
    scored AS (
        SELECT q.qid, q.query, t.doc_id,
               CAST(ROUND(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * l.dl / (s.sum_dl * 1.0 / s.n_docs)))
                   * 1000000.0) AS BIGINT) AS w_u
        FROM tf t
        JOIN qterms q ON t.tok = q.tok
        JOIN dfreq d ON t.tok = d.tok
        JOIN dl l ON t.doc_id = l.doc_id
        CROSS JOIN stats s
    ),
    agg AS (
        SELECT qid, query, doc_id,
               CAST(SUM(w_u) AS BIGINT) AS score_u,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM scored GROUP BY qid, query, doc_id
    )
    SELECT qid, query, doc_id,
           CAST(score_u AS DOUBLE) / 1000000.0 AS score,
           n_terms, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY score_u DESC, doc_id) AS rnk FROM agg) r
    WHERE rnk <= {BM25_TOPK}
"""


@query(
    "text_bm25_topk",
    "text-analysis",
    _BM25_ORACLE,
    doc="Okapi BM25 top-k retrieval over the corpus — the probe shape "
    "a training-data pipeline runs for retrieval-based "
    "decontamination, eval-set leakage checks, and targeted curation. "
    "Term frequencies and doc lengths come from one tokenize pass; "
    "the tiny query-term table BROADCASTS onto the tf posting list so "
    "only matching postings survive (the corpus never shuffles on "
    "anything query-sized); document frequencies for the handful of "
    "query terms aggregate from the already-filtered postings; corpus "
    "N/avgdl ride a broadcast 1-row stats table. Per-term BM25 "
    "weights are quantized to int64 micro-units BEFORE the per-doc "
    "sum (float sums are order-dependent across engines; int sums are "
    "exact), and top-k is TWO-LEVEL: per-(qid, hash-salt) partial "
    "top-k first, then the final per-qid window over <= k*salts "
    "partial winners — a common-term query's corpus-scale candidate "
    "set never funnels through one window task (r10; exactness "
    "argued at bm25_rank). At 100 TB: cost is one groupBy over "
    "(doc, term) postings + a broadcast probe; the persisted "
    "term-bucketed serving twin is text_bm25_topk_indexed.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    dl = docs.select("doc_id", F.size("ws").cast("long").alias("dl"))
    qterms = spark.createDataFrame(
        [
            (qid, q, tok)
            for qid, q in BM25_QUERIES
            for tok in q.split(" ")
        ],
        "qid string, query string, tok string",
    )
    # r17 (guide §2.3 — filter before the exchange): the broadcast
    # query-term semi-join prunes the exploded token stream BEFORE the
    # (doc, tok) groupBy, so the tf shuffle carries only query-term
    # postings instead of the full corpus vocabulary (the old plan
    # aggregated every token and threw the non-matches away one join
    # later).  tf is then already query-term-only, so dfreq needs no
    # second semi-join.  Values unchanged (the pruned rows never
    # contributed to any surviving aggregate); sf0.1 min-of-5
    # interleaved: 1.70 s vs 1.95 s.
    toks = docs.select("doc_id", F.explode("ws").alias("tok"))
    tf = (
        toks.join(F.broadcast(qterms.select("tok").distinct()), "tok", "left_semi")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    matched = tf.join(F.broadcast(qterms), "tok")
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    return bm25_rank(matched.join(dl, "doc_id"), dfreq, stats)


#: salt fan-out for the two-level top-k: the per-(qid, salt) partial
#: pass bounds what any one task ever sorts to candidates/BM25_SALTS,
#: and the final per-qid window sees <= BM25_TOPK * BM25_SALTS rows.
BM25_SALTS = 16


def bm25_rank(matched: DataFrame, dfreq: DataFrame, stats: DataFrame) -> DataFrame:
    """Score + rank the already-probed postings.

    ``matched`` is (qid, query, doc_id, tok, tf, dl) — only postings
    for query terms; ``dfreq`` is (tok, df); ``stats`` is the 1-row
    (n_docs, sum_dl) corpus table.  Factored so the streaming twin
    scores its merged incremental state through the IDENTICAL
    arithmetic as the batch query (shared-code certification: the two
    cannot drift).

    Top-k is TWO-LEVEL (r10, the text_zipf_slope discipline): a query
    containing a common term has corpus-scale candidates, and a single
    per-qid window would pull all of them through ONE task.  Candidates
    first take a per-(qid, salt) partial top-k — hash(doc_id) salting
    spreads one qid's candidate set over BM25_SALTS tasks — and only
    the <= k×salts partial winners reach the final per-qid window.
    Exact: every global top-k row is, a fortiori, in its own salt
    stratum's top-k, so the partial pass never discards a winner."""
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    w = (
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    scored = (
        matched.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("w_u", F.round(w * 1000000.0, 0).cast("long"))
    )
    agg = scored.groupBy("qid", "query", "doc_id").agg(
        F.sum("w_u").alias("score_u"), F.count("*").alias("n_terms")
    )
    order = (F.col("score_u").desc(), F.col("doc_id"))
    partial = (
        agg.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(BM25_SALTS)))
        .withColumn(
            "prnk", F.row_number().over(W.partitionBy("qid", "salt").orderBy(*order))
        )
        .filter(F.col("prnk") <= BM25_TOPK)
    )
    win = W.partitionBy("qid").orderBy(*order)
    return (
        partial.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= BM25_TOPK)
        .select(
            "qid",
            "query",
            "doc_id",
            (F.col("score_u").cast("double") / 1000000.0).alias("score"),
            "n_terms",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# persisted term-bucketed BM25 posting index — the serving shape
# ---------------------------------------------------------------------------

#: BASE term-bucket count for the persisted posting index.  The bucket
#: function is md5-derived (first 4 hex nibbles mod buckets) so all
#: three parties agree on it EXACTLY: the Spark writer (F.conv on
#: F.md5), the DuckDB content oracle (CAST(concat('0x', substr(md5..)
#: idiom), and the Python planner that turns a query's tokens into the
#: bucket list the probe scans.
BM25_INDEX_BUCKETS = 16
#: r11 dial: target postings per bucket.  The builder counts the
#: posting set once and doubles the bucket count from the base until
#: postings/bucket fits the target (the state_bucket_count /
#: ivf_cell_count discipline applied to the serving layout); the
#: content oracle recomputes the identical count via the shared
#: integer-exact CASE ladder.  At 100 TB the target would be a task's
#: worth of postings (~1e7); the test-scale constant keeps the dial
#: OBSERVABLE at certification scale (sf0.01's ~11.7k postings dial to
#: 32 buckets — the certification row is green at a NON-default count).
BM25_POSTINGS_PER_BUCKET = 512
BM25_BUCKET_MAX = 65536


def bm25_bucket_count(n_postings: int) -> int:
    """The dialed term-bucket count for ``n_postings`` index rows."""
    from tailsql_spark.operators.dial import doubling_dial

    return doubling_dial(
        n_postings, BM25_INDEX_BUCKETS, BM25_POSTINGS_PER_BUCKET, BM25_BUCKET_MAX
    )


def bm25_term_hash_col(tok) -> Column:
    """Spark-side raw term hash: first 4 md5 nibbles of the utf-8 token
    as a long (0..65535) — the pre-mod key the bucket functions and the
    manifest pruner share."""
    return F.conv(F.substring(F.md5(F.col(tok).cast("binary")), 1, 4), 16, 10).cast(
        "long"
    )


def bm25_term_bucket_col(tok, nb: int = BM25_INDEX_BUCKETS) -> Column:
    """Spark-side term bucket: raw md5 term hash mod ``nb``."""
    return F.pmod(bm25_term_hash_col(tok), F.lit(nb))


def bm25_term_hash_py(tok: str) -> int:
    """Driver-side twin of :func:`bm25_term_hash_col`."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:4], 16)


def bm25_term_bucket_py(tok: str, nb: int = BM25_INDEX_BUCKETS) -> int:
    """Driver-side twin of :func:`bm25_term_bucket_col` (pinned equal
    by a pytest property): lets query planning compute the bucket list
    without a Spark job."""
    return bm25_term_hash_py(tok) % nb


def bm25_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the FULL inverted index once per corpus: tf postings
    (tok, doc_id, tf, dl) for every term, written partitionBy(term
    bucket) — a probe's partition filter prunes to the query terms'
    bucket DIRECTORIES at planning time — plus the 1-row (n_docs,
    sum_dl) corpus stats as a sibling table.  Idempotent-staging
    guarded on the documents fingerprint (the manifest_orders_path
    discipline): regenerating the corpus mints a fresh index, same-
    corpus rebuilds reuse.  At 100 TB this is the classic serving
    build: one tokenize pass + one shuffle on (doc, term), then one
    shuffle by bucket so each bucket dir is a few large files, not
    tasks × buckets fragments."""
    import json

    from tailsql_spark.plans.connectors import _stage_dir
    from tailsql_spark.plans.streaming_exec import _fs_exists, _fs_write_text_atomic

    # the tag carries a LAYOUT VERSION (the ivf_index_path discipline):
    # a pre-dial staged index (fixed 16 buckets, no meta) must never be
    # silently reused by the dialed probes
    root = _stage_dir(sf_dir, "bm25_index_v2", src_tables=("documents",))
    post_dir = f"{root}/postings"
    stat_dir = f"{root}/stats"
    # staged-index check through the Hadoop-FS dispatcher, so an index
    # root on hdfs://// object storage reuses correctly too
    if (
        _fs_exists(f"{post_dir}/_SUCCESS")
        and _fs_exists(f"{stat_dir}/_SUCCESS")
        and _fs_exists(f"{root}/_index_meta.json")
    ):
        return root
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    dl = docs.select("doc_id", F.size("ws").cast("long").alias("dl"))
    tf = (
        docs.select("doc_id", F.explode("ws").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    ).persist()
    # the dial: one posting count picks the bucket count (r11); the
    # content oracle recomputes the same count via the shared ladder
    n_post = tf.count()
    nb = bm25_bucket_count(n_post)
    post = tf.join(dl, "doc_id").withColumn("tb", bm25_term_bucket_col("tok", nb))
    (
        post.repartition(min(nb, 1024), "tb")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(post_dir)
    )
    tf.unpersist()
    dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")).write.mode(
        "overwrite"
    ).parquet(stat_dir)
    _fs_write_text_atomic(
        f"{root}/_index_meta.json",
        json.dumps({"n_buckets": nb, "n_postings": n_post}),
    )
    return root


def bm25_index_meta(root: str) -> dict:
    """The index's recorded geometry ({n_buckets, n_postings})."""
    import json

    from tailsql_spark.plans.streaming_exec import _fs_read_text

    return json.loads(_fs_read_text(f"{root}/_index_meta.json"))


def _bm25_sink_oracle() -> str:
    from tailsql_spark.operators.dial import dial_case_sql

    nb_sql = dial_case_sql(
        "SELECT COUNT(*) FROM tf",
        BM25_INDEX_BUCKETS,
        BM25_POSTINGS_PER_BUCKET,
        BM25_BUCKET_MAX,
    )
    return f"""
    WITH docs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ws) AS tok FROM docs)
        GROUP BY doc_id, tok
    )
    SELECT CAST(concat('0x', substr(md5(tok), 1, 4)) AS BIGINT)
               % ({nb_sql}) AS tb,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(SUM(tf) AS BIGINT) AS sum_tf
    FROM tf GROUP BY 1
    """


@query(
    "sink_bm25_index",
    "sinks",
    _bm25_sink_oracle(),
    doc="The persisted BM25 posting index, certified by CONTENT: the "
    "per-bucket (distinct terms, postings, total tf) profile is read "
    "back from the index files ON DISK and must match the oracle's "
    "recomputation from the raw corpus with the identical md5-derived "
    "bucket arithmetic — so a writer bug (dropped postings, wrong "
    "bucket routing, partial overwrite) surfaces as a hash mismatch "
    "even before any query probes the index. The build is one "
    "tokenize pass + one (doc, term) groupBy + one bucket shuffle; "
    "the layout is partitionBy(term bucket), the inverted-index "
    "serving shape text_bm25_topk_indexed prunes against. r11: the "
    "bucket count is DIALED (bm25_bucket_count keeps postings/bucket "
    "at the target) and the oracle recomputes the same count through "
    "the shared CASE ladder — this row green at a non-default count "
    "certifies the dial itself.",
)
def sink_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = bm25_index_path(spark, sf_dir)
    post = spark.read.parquet(f"{root}/postings")
    return post.groupBy(F.col("tb").cast("long").alias("tb")).agg(
        F.countDistinct("tok").alias("n_terms"),
        F.count("*").alias("n_postings"),
        F.sum("tf").alias("sum_tf"),
    )


@query(
    "text_bm25_topk_indexed",
    "text-analysis",
    _BM25_ORACLE,
    doc="BM25 top-k served from the PERSISTED term-bucketed posting "
    "index (the production serving shape the per-run text_bm25_topk "
    "docstring names): query planning maps the query's tokens to "
    "their md5 buckets DRIVER-SIDE (pinned equal to the writer's "
    "bucket column by a pytest property), and the probe scans ONLY "
    "those bucket directories — a static partition IN-filter, plan-"
    "asserted as a strict file subset — with the token equality "
    "pushed into the surviving files' row groups. df/doc-length ride "
    "the postings rows, corpus N/avgdl come from the 1-row stats "
    "table, and scoring/ranking run through the SAME bm25_rank code "
    "as the per-run query, certified against the SAME oracle. At "
    "100 TB: a query touches q-terms buckets out of thousands — "
    "index-bucket reads, never a corpus tokenize.",
)
def text_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    root = bm25_index_path(spark, sf_dir)
    nb = int(bm25_index_meta(root)["n_buckets"])
    toks = sorted({tok for _, q in BM25_QUERIES for tok in q.split(" ")})
    buckets = sorted({bm25_term_bucket_py(tok, nb) for tok in toks})
    # r14: hand the scan the probed bucket DIRECTORIES directly instead
    # of an IN-filter over the partitioned root — partition discovery
    # on the root lists EVERY tb= dir before pruning, a per-query
    # planning cost that grows with the dialed bucket count, not the
    # probe (measured at the 100x corpus: 32768 bucket dirs turned the
    # 10x-flat probe into a 4.4x one; the IVF probe stayed 1.24x
    # precisely because it reads manifest-resolved leaf dirs).  Bucket
    # paths are known by CONSTRUCTION (tb = md5 % nb — the same
    # arithmetic the writer partitioned by), so planning stats only
    # the |query terms| probed dirs; an absent dir just means an empty
    # bucket at small corpora.
    probe_dirs = [
        d
        for d in (f"{root}/postings/tb={b}" for b in buckets)
        if os.path.exists(d)
    ]
    if probe_dirs:
        src = spark.read.parquet(*probe_dirs)
    else:  # degenerate corpus: every probed bucket empty
        src = spark.read.parquet(f"{root}/postings").filter(
            F.col("tb").isin(buckets)
        )
    post = (
        # the token equality pushes into the surviving files' row groups
        src.filter(F.col("tok").isin(toks)).select("tok", "doc_id", "tf", "dl")
    )
    stats = spark.read.parquet(f"{root}/stats")
    dfreq = post.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = spark.createDataFrame(
        [(qid, q, tok) for qid, q in BM25_QUERIES for tok in q.split(" ")],
        "qid string, query string, tok string",
    )
    matched = post.join(F.broadcast(qterms), "tok")
    return bm25_rank(matched, dfreq, stats)
