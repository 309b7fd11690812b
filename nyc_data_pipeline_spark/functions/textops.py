"""Text-analysis operators over the documents table (north-star M4):
token counting, quality scoring, language ID, fingerprinting, n-gram
frequency.

All pure Catalyst expressions (regexp_count, higher-order array
functions) — per-row string work stays in the JVM, which is exactly
where a 100 TB corpus needs it: these plans are scan → project →
(small) aggregate with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .text import (
    duck_bigrams,
    duck_norm_text,
    duck_token_hashes,
    duck_tokens,
    spark_bigrams,
    spark_norm_text,
    spark_token_hashes,
    spark_tokens,
)

_BPEISH = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
_PUNCT = r"[.,!?;:]"


def _sp(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal:
    Spark processes backslash escapes inside '...' (so '\\b' would become
    a backspace); DuckDB string literals do not."""
    return pattern.replace("\\", "\\\\")

_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "les", "des", "et", "une"],
}


def _alt(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(len({duck_tokens('text')}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{_BPEISH}')) AS INTEGER) AS n_bpeish_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace/alnum tokens and a BPE-ish
    regex segmentation (word pieces + isolated punctuation) — the
    pre-tokenizer count an LLM data pipeline budgets by."""
    d = load_table(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        "n_chars",
        f"size({spark_tokens('text')}) AS n_tokens",
        f"regexp_count(text, '{_sp(_BPEISH)}') AS n_bpeish_tokens",
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars, {duck_tokens('text')} AS toks,
               CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS INTEGER) AS n_punct,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['en'])}')) AS INTEGER) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_words,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(toks, x -> CAST(length(x) AS BIGINT))),
                (a, b) -> a + b) AS DOUBLE) / len(toks) AS avg_word_len,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_stop AS DOUBLE) / len(toks) AS stopword_ratio,
           0.5 * least(len(toks) / 100.0, 1.0)
             + 0.3 * (1.0 - least(abs((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(toks, x -> CAST(length(x) AS BIGINT))),
                       (a, b) -> a + b) AS DOUBLE) / len(toks)) - 4.5) / 4.5, 1.0))
             + 0.2 * least((CAST(n_stop AS DOUBLE) / len(toks)) * 5.0, 1.0) AS quality_score
    FROM t
    WHERE len(toks) > 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / word-shape / punctuation /
    stopword-density), the C4-style filter signal.  The score formula
    text is identical in both engines, so doubles match exactly."""
    d = load_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    total_len = (
        f"aggregate(transform({toks}, x -> CAST(length(x) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    awl = f"CAST({total_len} AS DOUBLE) / size({toks})"
    stop = f"regexp_count(lower(text), '{_sp(_alt(_STOPWORDS['en']))}')"
    return (
        d.selectExpr(
            "doc_id",
            f"size({toks}) AS n_words",
            f"{awl} AS avg_word_len",
            f"CAST(regexp_count(text, '{_PUNCT}') AS DOUBLE) / n_chars AS punct_ratio",
            f"CAST({stop} AS DOUBLE) / size({toks}) AS stopword_ratio",
            f"0.5 * least(size({toks}) / 100.0, 1.0) "
            f"+ 0.3 * (1.0 - least(abs(({awl}) - 4.5) / 4.5, 1.0)) "
            f"+ 0.2 * least((CAST({stop} AS DOUBLE) / size({toks})) * 5.0, 1.0)"
            " AS quality_score",
        )
        .filter(F.col("n_words") > 0)
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['en'])}')) AS INTEGER) AS c_en,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['es'])}')) AS INTEGER) AS c_es,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['de'])}')) AS INTEGER) AS c_de,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['fr'])}')) AS INTEGER) AS c_fr
        FROM documents
    )
    SELECT doc_id, lang, c_en, c_es, c_de, c_fr,
           CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
                WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
                WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
                WHEN c_fr > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM c
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic family): count
    per-language stopword hits, argmax with a fixed tiebreak order.
    The fixture labels are synthetic, so the interesting output is the
    deterministic per-language evidence counts, not accuracy."""
    d = load_table(spark, sf_dir, "documents")
    counts = {
        lang: f"regexp_count(lower(text), '{_sp(_alt(words))}')"
        for lang, words in _STOPWORDS.items()
    }
    return d.selectExpr(
        "doc_id",
        "lang",
        *[f"{expr} AS c_{lang}" for lang, expr in counts.items()],
        "CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en' "
        "WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es' "
        "WHEN c_de >= c_fr AND c_de > 0 THEN 'de' "
        "WHEN c_fr > 0 THEN 'fr' ELSE 'unknown' END AS predicted_lang",
    ).selectExpr("doc_id", "lang", "c_en", "c_es", "c_de", "c_fr", "predicted_lang")


@register(
    "text_fingerprint",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5({duck_norm_text('text')}) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
    FROM fp
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (the portable
    digest — see fn_hash_digests), with each doc pointed at the lowest
    doc_id sharing its fingerprint (canonical representative)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    fp = d.selectExpr("doc_id", f"md5({spark_norm_text('text')}) AS fingerprint")
    w = Window.partitionBy("fingerprint")
    return fp.withColumn("canonical_id", F.min("doc_id").over(w))


BOILERPLATE_DF_FRAC = 0.05  # a bigram in > 5% of docs is corpus-common
BOILERPLATE_MAX_RATIO = 0.8


@register(
    "text_boilerplate_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {duck_tokens('text')} AS toks FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct({duck_token_hashes(duck_bigrams('toks'))}) AS gs
        FROM t WHERE len(toks) >= 2
    ),
    pairs AS (SELECT doc_id, unnest(gs) AS gram FROM g),
    freq AS (SELECT gram, COUNT(*) AS df FROM pairs GROUP BY gram),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.df > {BOILERPLATE_DF_FRAC} * nd.n_docs
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           CAST(SUM(CASE WHEN f.df > {BOILERPLATE_DF_FRAC} * nd.n_docs
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS boilerplate_ratio,
           CAST(SUM(CASE WHEN f.df > {BOILERPLATE_DF_FRAC} * nd.n_docs
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             <= {BOILERPLATE_MAX_RATIO} AS keep
    FROM pairs p JOIN freq f ON p.gram = f.gram, nd
    GROUP BY p.doc_id
    """,
)
def text_boilerplate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by n-gram document frequency (the
    RefinedWeb/CCNet-style repetition filter): a doc whose word bigrams
    mostly also appear in many OTHER docs is template/boilerplate text,
    not original content.  The df threshold is RELATIVE (> 5% of corpus
    docs) so the verdicts are scale-invariant — an absolute count would
    silently reclassify everything at 10x the corpus.

    Scale shape: grams are hashed to int64 (portable hash) BEFORE the
    shuffle, so the df aggregation shuffles fixed-width keys, not
    strings; per-doc distinct grams bound df counting to one row per
    (doc, gram); the corpus doc count joins in as a 1-row broadcast
    (no collect).  Two hash-agg shuffles + one join keyed on the gram
    hash — linear in total gram count, independent of duplication
    depth."""
    d = load_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    grams = (
        d.selectExpr("doc_id", f"{toks} AS toks")
        .filter(F.size("toks") >= 2)
        .selectExpr(
            "doc_id",
            f"array_distinct({spark_token_hashes(spark_bigrams('toks'))}) AS gs",
        )
    )
    pairs = grams.selectExpr("doc_id", "explode(gs) AS gram")
    freq = pairs.groupBy("gram").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    common = F.sum(
        F.when(
            F.col("df") > BOILERPLATE_DF_FRAC * F.col("n_docs"), 1
        ).otherwise(0)
    ).cast("bigint")
    return (
        pairs.join(freq, "gram")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            common.alias("n_common"),
        )
        .selectExpr(
            "doc_id",
            "n_grams",
            "n_common",
            "CAST(n_common AS DOUBLE) / n_grams AS boilerplate_ratio",
            f"CAST(n_common AS DOUBLE) / n_grams <= {BOILERPLATE_MAX_RATIO} AS keep",
        )
    )


@register(
    "text_ngram_freq",
    oracle=f"""
    WITH t AS (SELECT {duck_tokens('text')} AS toks FROM documents),
    grams AS (SELECT unnest({duck_bigrams('toks')}) AS bigram
              FROM t WHERE len(toks) >= 2)
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level word-bigram frequency, top-20 (n-gram statistics for
    contamination/boilerplate detection).  explode → count is one
    shuffle; at 100 TB this is the canonical map-side-combine win."""
    d = load_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    return (
        d.selectExpr(f"{toks} AS toks")
        .filter(F.size("toks") >= 2)
        .selectExpr(f"explode({spark_bigrams('toks')}) AS bigram")
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )
