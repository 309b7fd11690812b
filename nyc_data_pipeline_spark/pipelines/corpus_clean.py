"""End-to-end corpus-cleaning pipeline (the LLM-training-data funnel).

Composes the engine's text-analysis and dedup operators into the
standard pre-training curation sequence and reports the survivor
funnel — the shape every large-scale data pipeline runs before
tokenization (C4/RefinedWeb/FineWeb all follow it):

  0. raw            — every document;
  1. lang           — stopword-profile language ID keeps English;
  2. quality        — length + punctuation-density heuristics;
  3. exact_dedup    — md5-fingerprint keep-one (lowest doc_id);
  4. near_dedup     — MinHash+LSH keep-one over the exact survivors.

Output: one row per stage (stage, n_docs, n_tokens) — the funnel a
curation team actually reviews ("how much did each filter cost us?").

Scale shape: stages 0-3 are ONE corpus pass — flags are computed in a
single projection, exact-dedup canonical ids with one window over the
fingerprint hash (one shuffle), and the funnel is a conditional
aggregate unpivoted with stack().  Near-dedup adds the linear keep-one
LSH (two hash-agg shuffles over survivors only).  No stage re-reads
the corpus; nothing is quadratic; every per-row expression is
whole-stage-codegen'd Catalyst (zero Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..dedup.minhash import BANDS, K, _band_key, _duck_sig, minhash_lsh_keep_one
from ..functions.text import (
    duck_norm_text,
    duck_token_hashes,
    duck_tokens,
    spark_norm_text,
    spark_token_hashes,
    spark_tokens,
)
from ..functions.textops import _alt, _sp, _PUNCT, _STOPWORDS
from ..registry import register

MIN_TOKENS = 10
MAX_PUNCT_RATIO = 0.2

_STAGES = ["0_raw", "1_lang", "2_quality", "3_exact_dedup", "4_near_dedup"]


def _flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass: per-doc token count, stage-survival flags, and
    the exact-dedup canonical id (single window shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    counts = {
        lang: f"regexp_count(lower(text), '{_sp(_alt(words))}')"
        for lang, words in _STOPWORDS.items()
    }
    base = d.selectExpr(
        "doc_id",
        "text",
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS n_tokens",
        f"CAST(regexp_count(text, '{_PUNCT}') AS DOUBLE) / n_chars AS punct_ratio",
        f"md5({spark_norm_text('text')}) AS fingerprint",
        *[f"{expr} AS c_{lang}" for lang, expr in counts.items()],
    ).selectExpr(
        "*",
        "CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 "
        "THEN true ELSE false END AS lang_pass",
    )
    flagged = base.select(
        "doc_id",
        "text",
        "n_tokens",
        "fingerprint",
        "lang_pass",
        (
            F.col("lang_pass")
            & (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
        ).alias("quality_pass"),
    )
    # Exact dedup among quality survivors only: the canonical id is the
    # min doc_id of the QUALIFYING members of each fingerprint group, so
    # a filtered-out doc never "shadows" a surviving duplicate.
    w = Window.partitionBy("fingerprint")
    return flagged.withColumn(
        "exact_keep",
        F.col("quality_pass")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("quality_pass"), F.col("doc_id"))).over(w)
        ),
    )


def curate_documents(docs: DataFrame) -> DataFrame:
    """Streaming-safe curation: quality filter + exact dedup, no windows.

    The batch funnel (`pipeline_corpus_clean`) dedups with a window over
    the fingerprint — correct in batch, but window functions don't run
    under Structured Streaming.  This variant is the incremental form:
    stateless flag projection + ``dropDuplicates(["fingerprint"])``
    (keyed state, append mode, no event-time requirement), so the SAME
    function serves batch and readStream (tests/test_streaming.py
    asserts stream == batch).  Output columns are chosen so the result
    is invariant to WHICH duplicate survives: same-fingerprint docs have
    identical normalized text, hence identical token sequence, hence
    identical (predicted_lang, n_tokens).

    At scale: dedup state is one short md5 key per UNIQUE qualifying
    document — the streaming twin of the exact-hash shuffle, with
    state size bounded by distinct-fingerprint count (use
    dropDuplicatesWithinWatermark when the corpus has event time and
    re-crawl duplicates arrive within a bounded horizon).
    """
    counts = {
        lang: f"regexp_count(lower(text), '{_sp(_alt(words))}')"
        for lang, words in _STOPWORDS.items()
    }
    base = docs.selectExpr(
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS n_tokens",
        f"CAST(regexp_count(text, '{_PUNCT}') AS DOUBLE) / n_chars AS punct_ratio",
        f"md5({spark_norm_text('text')}) AS fingerprint",
        *[f"{expr} AS c_{lang}" for lang, expr in counts.items()],
    ).selectExpr(
        "n_tokens",
        "punct_ratio",
        "fingerprint",
        "CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en' "
        "WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es' "
        "WHEN c_de >= c_fr AND c_de > 0 THEN 'de' "
        "WHEN c_fr > 0 THEN 'fr' ELSE 'unknown' END AS predicted_lang",
    )
    q = base.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    )
    return q.select("fingerprint", "predicted_lang", "n_tokens").dropDuplicates(
        ["fingerprint"]
    )


@register(
    "stream_corpus_curate",
    oracle=f"""
    WITH base AS (
        SELECT CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS DOUBLE) / n_chars
                 AS punct_ratio,
               md5({duck_norm_text('text')}) AS fingerprint,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['en'])}')) AS INTEGER) AS c_en,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['es'])}')) AS INTEGER) AS c_es,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['de'])}')) AS INTEGER) AS c_de,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['fr'])}')) AS INTEGER) AS c_fr
        FROM documents
    ),
    pl AS (
        SELECT *,
               CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
                    WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
                    WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
                    WHEN c_fr > 0 THEN 'fr' ELSE 'unknown' END AS predicted_lang
        FROM base
    ),
    q AS (
        SELECT * FROM pl
        WHERE n_tokens >= {MIN_TOKENS} AND punct_ratio <= {MAX_PUNCT_RATIO}
    )
    SELECT fingerprint,
           min(predicted_lang) AS predicted_lang,
           min(n_tokens) AS n_tokens
    FROM q GROUP BY fingerprint
    """,
)
def stream_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-family × curation: the incremental (streaming-safe) corpus
    curation — quality filter + keyed exact dedup.  This batch twin is
    oracle-refereed; the streaming test runs the identical function
    under readStream and asserts set equality."""
    return curate_documents(load_table(spark, sf_dir, "documents"))


def _oracle_ctes() -> str:
    """The funnel's CTE chain through `joined` (doc-level survivor
    flags) — shared by the stage-report oracle below and the
    export-ready composition (pipelines/export_ready.py)."""
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH base AS (
        SELECT doc_id, text,
               CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS DOUBLE) / n_chars
                 AS punct_ratio,
               md5({duck_norm_text('text')}) AS fingerprint,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['en'])}')) AS INTEGER) AS c_en,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['es'])}')) AS INTEGER) AS c_es,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['de'])}')) AS INTEGER) AS c_de,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['fr'])}')) AS INTEGER) AS c_fr
        FROM documents
    ),
    flagged AS (
        SELECT *,
               (c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0)
                 AS lang_pass,
               (c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0
                AND n_tokens >= {MIN_TOKENS}
                AND punct_ratio <= {MAX_PUNCT_RATIO}) AS quality_pass
        FROM base
    ),
    exact AS (
        SELECT *,
               quality_pass AND doc_id = min(CASE WHEN quality_pass THEN doc_id END)
                 OVER (PARTITION BY fingerprint) AS exact_keep
        FROM flagged
    ),
    -- near-dedup: MinHash keep-one over the exact survivors only
    th AS (
        SELECT doc_id,
               list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems
        FROM exact WHERE exact_keep
    ),
    sigs AS (
        SELECT doc_id,
               {sig_exprs}
        FROM th
    ),
    bands AS (
        {band_selects}
    ),
    bucket_reps AS (
        SELECT band, bkey, min(doc_id) AS bucket_rep
        FROM bands GROUP BY band, bkey
    ),
    labels AS (
        SELECT b.doc_id, min(r.bucket_rep) AS rep_id
        FROM bands b
        JOIN bucket_reps r ON b.band = r.band AND b.bkey = r.bkey
        GROUP BY b.doc_id
    ),
    joined AS (
        SELECT e.*, (l.rep_id = e.doc_id) AS near_keep
        FROM exact e LEFT JOIN labels l ON e.doc_id = l.doc_id
    )"""


def _oracle() -> str:
    return _oracle_ctes() + """,
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS raw_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS raw_toks,
               CAST(SUM(CASE WHEN lang_pass THEN 1 ELSE 0 END) AS BIGINT) AS lang_docs,
               CAST(SUM(CASE WHEN lang_pass THEN n_tokens ELSE 0 END) AS BIGINT) AS lang_toks,
               CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS q_docs,
               CAST(SUM(CASE WHEN quality_pass THEN n_tokens ELSE 0 END) AS BIGINT) AS q_toks,
               CAST(SUM(CASE WHEN exact_keep THEN 1 ELSE 0 END) AS BIGINT) AS e_docs,
               CAST(SUM(CASE WHEN exact_keep THEN n_tokens ELSE 0 END) AS BIGINT) AS e_toks,
               CAST(SUM(CASE WHEN COALESCE(near_keep, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_,
               CAST(SUM(CASE WHEN COALESCE(near_keep, false) THEN n_tokens ELSE 0 END) AS BIGINT) AS n_toks
        FROM joined
    )
    SELECT '0_raw' AS stage, raw_docs AS n_docs, raw_toks AS n_tokens FROM agg
    UNION ALL SELECT '1_lang', lang_docs, lang_toks FROM agg
    UNION ALL SELECT '2_quality', q_docs, q_toks FROM agg
    UNION ALL SELECT '3_exact_dedup', e_docs, e_toks FROM agg
    UNION ALL SELECT '4_near_dedup', n_docs_, n_toks FROM agg
    """


@register("pipeline_corpus_clean", oracle=_oracle())
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-stage curation funnel: raw → lang → quality → exact-dedup →
    near-dedup, reporting surviving (docs, tokens) per stage."""
    # _flags is one corpus pass of regexp counting + the fingerprint
    # window, and it feeds BOTH the near-dedup branch and the final
    # funnel join — a diamond that otherwise re-runs the pass per
    # branch (profiled as twin 3.6 s map stages at sf0.1).  Pin it.
    flagged = persist_scoped("corpus_clean.flags", _flags(spark, sf_dir))
    survivors = flagged.filter("exact_keep").selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    labels = minhash_lsh_keep_one(survivors)
    joined = flagged.join(
        labels.withColumnRenamed("rep_id", "rep_id_"), on="doc_id", how="left"
    ).withColumn("near_keep", F.coalesce(F.col("rep_id_") == F.col("doc_id"), F.lit(False)))
    agg = joined.agg(
        F.count("*").alias("raw_docs"),
        F.sum("n_tokens").alias("raw_toks"),
        F.sum(F.when(F.col("lang_pass"), 1).otherwise(0)).cast("bigint").alias("lang_docs"),
        F.sum(F.when(F.col("lang_pass"), F.col("n_tokens")).otherwise(0)).alias("lang_toks"),
        F.sum(F.when(F.col("quality_pass"), 1).otherwise(0)).cast("bigint").alias("q_docs"),
        F.sum(F.when(F.col("quality_pass"), F.col("n_tokens")).otherwise(0)).alias("q_toks"),
        F.sum(F.when(F.col("exact_keep"), 1).otherwise(0)).cast("bigint").alias("e_docs"),
        F.sum(F.when(F.col("exact_keep"), F.col("n_tokens")).otherwise(0)).alias("e_toks"),
        F.sum(F.when(F.col("near_keep"), 1).otherwise(0)).cast("bigint").alias("n_docs_"),
        F.sum(F.when(F.col("near_keep"), F.col("n_tokens")).otherwise(0)).alias("n_toks"),
    )
    return agg.selectExpr(
        "stack(5, "
        "'0_raw', raw_docs, raw_toks, "
        "'1_lang', lang_docs, lang_toks, "
        "'2_quality', q_docs, q_toks, "
        "'3_exact_dedup', e_docs, e_toks, "
        "'4_near_dedup', n_docs_, n_toks"
        ") AS (stage, n_docs, n_tokens)"
    )
