"""Text-analysis operators over the documents table (north-star M4):
token counting, quality scoring, language ID, fingerprinting, n-gram
frequency.

All pure Catalyst expressions (regexp_count, higher-order array
functions) — per-row string work stays in the JVM, which is exactly
where a 100 TB corpus needs it: these plans are scan → project →
(small) aggregate with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..registry import register
from .text import (
    HASH_MOD,
    duck_bigrams,
    duck_ngram_hashes,
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


def gram_id_rows(d: DataFrame, n: int, distinct: bool = True) -> DataFrame:
    """(doc_id, gram) rows of word-n-gram ids per document (distinct
    per doc by default; ``distinct=False`` keeps the positional
    multiset — SimHash voting needs every occurrence).

    The scale-and-speed shape for shingle operators (see
    text.duck_ngram_hashes for why not an array lambda): tokens are
    hashed ONCE per doc (the only interpreted lambda, linear in chars),
    posexploded, and consecutive hashes combine into gram ids with
    lead() windows — entirely codegen'd built-ins.  ``spread`` gives
    the hash projection compute-parallelism independent of input-split
    count; the window reuses the same doc_id partitioning (no second
    exchange); dropDuplicates bounds downstream work to one row per
    (doc, gram)."""
    hs = spread(d.select("doc_id", "text"), "doc_id").selectExpr(
        "doc_id", f"{spark_token_hashes(spark_tokens('text'))} AS hs"
    )
    pairs = hs.select("doc_id", F.posexplode("hs").alias("pos", "h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    acc = F.col("h")
    for j in range(1, n):
        acc = (acc * 31 + F.lead("h", j).over(w)) % HASH_MOD
    rows = (
        pairs.withColumn("gram", acc)
        .filter(F.col("gram").isNotNull())
        .select("doc_id", "gram")
    )
    return rows.dropDuplicates() if distinct else rows


BOILERPLATE_DF_FRAC = 0.05  # a bigram in > 5% of docs is corpus-common
BOILERPLATE_MAX_RATIO = 0.8


@register(
    "text_boilerplate_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {duck_token_hashes(duck_tokens('text'))} AS hs
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct({duck_ngram_hashes('hs', 2)}) AS gs
        FROM t WHERE len(hs) >= 2
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

    Scale shape: gram ids are rolling combinations of per-token int64
    hashes (see gram_id_rows — tokens hashed once, no gram
    strings), so the df aggregation shuffles fixed-width keys; per-doc
    distinct grams bound df counting to one row per (doc, gram); the
    corpus doc count joins in as a 1-row broadcast (no collect).  Two
    hash-agg shuffles + one join keyed on the gram id — linear in total
    gram count, independent of duplication depth."""
    d = load_table(spark, sf_dir, "documents")
    from ..catalog import persist_scoped

    # pairs feeds the df aggregation AND the per-doc join side — the
    # decontaminate/bm25 diamond; pin the fixed-width gram rows once.
    pairs = persist_scoped("boilerplate.grams", gram_id_rows(d, 2))
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


TFIDF_TOP_K = 3


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               unnest({duck_token_hashes(duck_tokens('text'))}) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM t GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, score, rk FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf * nd.n_docs AS DOUBLE) / df.df AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * nd.n_docs AS DOUBLE) / df.df DESC,
                            tf.term
               ) AS rk
        FROM tf JOIN df USING (term), nd
    ) WHERE rk <= {TFIDF_TOP_K}
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} salient terms per document by TF-IDF-style
    weighting.  The weight is the LINEAR idf form ``tf * N / df`` (one
    exact integer product, one IEEE double division) instead of
    ``tf * ln(N/df)`` — for a fixed corpus the two produce the same
    per-doc ranking (ln is monotone in N/df only; across different tf
    the orders can differ, but the linear form is itself a standard
    salience weight), and it is bit-reproducible across engines where
    libm ``ln`` is not.

    Scale shape: tf is a hash-agg on (doc_id, term-hash); df reuses the
    tf frame (term-keyed agg — vocabulary-sized, so the tf⋈df join
    SHUFFLES on term rather than broadcasting a corpus-scale vocab);
    the corpus doc count is a 1-row broadcast; top-k per doc is a
    window on doc_id.  Everything keys on int64 hashes, never strings.
    """
    return tfidf_topterms(load_table(spark, sf_dir, "documents"))


def tfidf_topterms(d: DataFrame) -> DataFrame:
    """Reusable core of text_tfidf_topterms over any (doc_id, text)."""
    # Repartition for compute-parallelism on few input splits (see
    # decontaminate_probe).
    terms = (
        spread(d.select("doc_id", "text"), "doc_id")
        .selectExpr(
            "doc_id",
            f"explode({spark_token_hashes(spark_tokens('text'))}) AS term",
        )
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


DECON_NGRAM = 5  # overlap shingle width (13 in Llama-style decontamination)
DECON_BENCH_MOD = 97  # doc_id % 97 == 0 plays the held-out benchmark set


@register(
    "text_decontaminate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {duck_token_hashes(duck_tokens('text'))} AS hs
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct({duck_ngram_hashes('hs', DECON_NGRAM)}) AS gs
        FROM t WHERE len(hs) >= {DECON_NGRAM}
    ),
    bench AS (
        SELECT DISTINCT unnest(gs) AS gram FROM g
        WHERE doc_id % {DECON_BENCH_MOD} = 0
    ),
    per_doc AS (
        SELECT p.doc_id,
               COUNT(*) AS n_grams,
               SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        FROM (SELECT doc_id, unnest(gs) AS gram FROM g
              WHERE doc_id % {DECON_BENCH_MOD} <> 0) p
        LEFT JOIN bench b ON p.gram = b.gram
        GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(pd.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(pd.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id
    WHERE d.doc_id % {DECON_BENCH_MOD} <> 0
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training docs that share any word
    {DECON_NGRAM}-gram with a held-out benchmark set (here: doc_id %
    97 == 0 plays the eval set).  The standard pretraining hygiene step
    — contaminated docs inflate eval scores and must be dropped or
    audited before training.

    Scale shape: benchmark gram sets are tiny relative to the corpus
    (eval suites are MBs against TBs), so the distinct benchmark grams
    BROADCAST and the corpus side never shuffles for the probe — one
    narrow scan computing hashed shingles, one broadcast left join to
    mark hits, one hash-agg keyed on doc_id.  Gram comparisons are on
    int64 portable hashes, not strings, so the broadcast table and the
    probe are fixed-width."""
    return decontaminate_probe(load_table(spark, sf_dir, "documents"))


def decontaminate_probe(d: DataFrame) -> DataFrame:
    """Reusable core of text_decontaminate over any (doc_id, text).
    Gram ids via gram_id_rows (posexplode + lead windows — the
    codegen'd shingle path; 13.8 s -> ~1 s at sf0.1)."""
    from ..catalog import persist_scoped

    # The gram table feeds both the benchmark-distinct branch and the
    # corpus probe branch; the %-mod filters push below the shingle
    # windows, so without a pin each branch re-runs the whole
    # tokenize+hash+lead pipeline (profiled as twin 4.5 s map stages
    # at sf0.1).  Same decision as bm25.tf: materialize the
    # fixed-width gram rows once.
    g = persist_scoped("decontaminate.grams", gram_id_rows(d, DECON_NGRAM))
    bench = (
        g.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        g.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"),
        )
    )
    return (
        d.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
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


# --- bigram language-model table ------------------------------------------

LM_TOP_HEADS = 50   # most frequent left words kept
LM_TOP_CONT = 3     # continuations per head


@register(
    "text_bigram_lm",
    oracle=f"""
    WITH t AS (SELECT {duck_tokens('text')} AS toks FROM documents),
    g AS (SELECT unnest({duck_bigrams('toks')}) AS bigram
          FROM t WHERE len(toks) >= 2),
    p AS (SELECT bigram, COUNT(*) AS n FROM g GROUP BY bigram),
    parts AS (
        SELECT string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2, n
        FROM p
    ),
    tot AS (SELECT w1, SUM(n) AS n_w1 FROM parts GROUP BY w1),
    top AS (SELECT w1, n_w1 FROM tot
            ORDER BY n_w1 DESC, w1 LIMIT {LM_TOP_HEADS}),
    r AS (
        SELECT parts.w1, w2, n, n_w1,
               row_number() OVER (
                   PARTITION BY parts.w1 ORDER BY n DESC, w2
               ) AS rank
        FROM parts JOIN top ON parts.w1 = top.w1
    )
    SELECT w1, w2, CAST(n AS BIGINT) AS n_pair,
           CAST(n_w1 AS BIGINT) AS n_w1, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= {LM_TOP_CONT}
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM table: top-{LM_TOP_CONT} continuations per head
    word for the {LM_TOP_HEADS} most frequent heads, with the exact
    (n_pair, n_w1) count pair — P(w2|w1) is one division away, and
    carrying counts instead of a float probability keeps the table
    cross-engine exact.  This is the classic MapReduce LM-counts job
    (perplexity-proxy quality filters and autocomplete both consume
    it).  Scale shape: bigram explode → count is one map-side-combined
    shuffle; head totals reduce FROM THE PAIR COUNTS (never re-scan
    the corpus); the {LM_TOP_HEADS}-row head table broadcasts into the
    rank join."""
    d = load_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    pairs = (
        d.selectExpr(f"{toks} AS toks")
        .filter(F.size("toks") >= 2)
        .selectExpr(f"explode({spark_bigrams('toks')}) AS bigram")
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .select(
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
            "n",
        )
    )
    totals = pairs.groupBy("w1").agg(F.sum("n").alias("n_w1"))
    top = totals.orderBy(F.desc("n_w1"), F.asc("w1")).limit(LM_TOP_HEADS)
    w = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        pairs.join(F.broadcast(top), "w1")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LM_TOP_CONT)
        .select(
            "w1",
            "w2",
            F.col("n").cast("bigint").alias("n_pair"),
            F.col("n_w1").cast("bigint").alias("n_w1"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- repetition metrics (Gopher-style quality signals) ---------------------

REP_MIN_UNIQUE_RATIO = 0.3  # distinct/total tokens below this -> repetitive
REP_MAX_TOP_BIGRAM = 0.2    # one bigram carrying > 20% of all bigrams


@register(
    "text_repetition_metrics",
    oracle=f"""
    WITH th AS (
        SELECT doc_id, {duck_token_hashes(duck_tokens('text'))} AS hs
        FROM documents
    ),
    tok AS (
        SELECT doc_id,
               CAST(len(hs) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct
        FROM th
    ),
    g AS (
        SELECT doc_id, unnest({duck_ngram_hashes('hs', 2)}) AS gram
        FROM th WHERE len(hs) >= 2
    ),
    gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    gs AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS total_bigrams,
               CAST(MAX(c) AS BIGINT) AS max_bigram
        FROM gc GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens, t.n_distinct,
           CAST(t.n_distinct AS DOUBLE) / t.n_tokens AS unique_ratio,
           COALESCE(CAST(gs.max_bigram AS DOUBLE) / gs.total_bigrams, 0.0)
               AS top_bigram_frac,
           (CAST(t.n_distinct AS DOUBLE) / t.n_tokens
                < {REP_MIN_UNIQUE_RATIO})
             OR (COALESCE(CAST(gs.max_bigram AS DOUBLE) / gs.total_bigrams,
                          0.0) > {REP_MAX_TOP_BIGRAM}) AS is_repetitive
    FROM tok t LEFT JOIN gs ON t.doc_id = gs.doc_id
    WHERE t.n_tokens > 0
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    ratio and the fraction of all bigrams claimed by the single most
    frequent bigram; `is_repetitive` flags looping/boilerplate docs
    (unique ratio < {REP_MIN_UNIQUE_RATIO} or one bigram > than
    {REP_MAX_TOP_BIGRAM} of the text).

    Scale shape: token/distinct counts are per-row array ops (no
    shuffle); the bigram multiset rides the codegen'd gram_id_rows
    path and aggregates on fixed-width (doc_id, gram) then doc_id —
    map-side partials make both shuffles linear in gram count.  The
    doc_id join is 1-row-per-doc on both sides."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d.select("doc_id", "text"), "doc_id").selectExpr(
        "doc_id",
        # transform() preserves length, so the token COUNT never needs
        # the char-fold hash — only the distinct count does (distinct
        # is defined over the portable hash ids, as in the oracle).
        # One interpreted fold pass per row instead of two.
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS n_tokens",
        f"CAST(size(array_distinct({spark_token_hashes(spark_tokens('text'))}))"
        " AS BIGINT) AS n_distinct",
    )
    gc = (
        gram_id_rows(d, 2, distinct=False)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    gs = gc.groupBy("doc_id").agg(
        F.sum("c").alias("total_bigrams"), F.max("c").alias("max_bigram")
    )
    unique_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_frac = F.coalesce(
        F.col("max_bigram").cast("double") / F.col("total_bigrams"), F.lit(0.0)
    )
    return (
        tok.join(gs, "doc_id", "left")
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            unique_ratio.alias("unique_ratio"),
            top_frac.alias("top_bigram_frac"),
            (
                (unique_ratio < REP_MIN_UNIQUE_RATIO)
                | (top_frac > REP_MAX_TOP_BIGRAM)
            ).alias("is_repetitive"),
        )
    )


# --- PII scrub (regex redaction) -------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
_PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


@register(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT)
               AS n_ips,
           regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS scrubbed,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) > 0
             OR len(regexp_extract_all(text, '{_PII_IP}')) > 0 AS has_pii
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and mask emails and IPv4 addresses
    (the two patterns that appear in web text with near-zero false
    positives; phone patterns are corpus-tuned in practice).  Pure
    per-row regex — zero shuffles, whole-stage codegen, trivially
    linear at 100 TB.  The scrubbed text column is the operator's
    point: downstream stages read `scrubbed`, never raw `text`."""
    d = load_table(spark, sf_dir, "documents")
    email, ip = _sp(_PII_EMAIL), _sp(_PII_IP)
    return d.selectExpr(
        "doc_id",
        f"CAST(regexp_count(text, '{email}') AS BIGINT) AS n_emails",
        f"CAST(regexp_count(text, '{ip}') AS BIGINT) AS n_ips",
        f"regexp_replace(regexp_replace(text, '{email}', '<EMAIL>'), "
        f"'{ip}', '<IP>') AS scrubbed",
        f"regexp_count(text, '{email}') > 0 OR regexp_count(text, '{ip}') > 0"
        " AS has_pii",
    )


# --- model-based quality scoring (linear hashed-BoW classifier) ----------

CLS_BUCKETS = 1024
# Deterministic stand-in for learned per-bucket weights (a fastText-style
# linear text classifier reduces to exactly this scoring shape).  Integer
# micro-units in [-1000, 1000] keep the dot product exact-integer so both
# engines sum in any order and still agree bit-for-bit; swap this formula
# for a real trained weight table without touching the plan.


def _cls_w(col: str) -> str:
    """Weight expression over a bucket-index column — one definition
    serving both the Spark builder and the DuckDB oracle, parameterized
    by column name (no string surgery on a shared constant)."""
    return f"CAST(({col} * 2654435761) % 2001 AS BIGINT) - 1000"


_CLS_W = _cls_w("b")


@register(
    "text_classifier_score",
    oracle=f"""
    WITH w AS (
        SELECT b, {_CLS_W} AS w_int
        FROM (SELECT unnest(range({CLS_BUCKETS})) AS b)
    ),
    tok AS (
        SELECT doc_id, unnest({duck_token_hashes(duck_tokens('text'))}) AS h
        FROM documents
    ),
    feat AS (
        SELECT doc_id, h % {CLS_BUCKETS} AS b, COUNT(*) AS cnt
        FROM tok GROUP BY doc_id, h % {CLS_BUCKETS}
    ),
    scored AS (
        SELECT f.doc_id,
               CAST(SUM(f.cnt * w.w_int) AS BIGINT) AS score_int,
               CAST(SUM(f.cnt) AS BIGINT) AS n_tok
        FROM feat f JOIN w ON f.b = w.b
        GROUP BY f.doc_id
    )
    SELECT doc_id, score_int, n_tok,
           CAST(score_int AS DOUBLE) / (1000.0 * n_tok) AS score,
           score_int > 0 AS keep
    FROM scored
    """,
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: a linear classifier over hashed
    bag-of-words features (the scoring half of a fastText-style quality
    model — the standard model-based filter in LLM curation stacks,
    complementing the heuristic `text_quality_score`).

    Plan shape is the production one: the model is a {CLS_BUCKETS}-row
    weight TABLE broadcast to every executor (swap in real trained
    weights by replacing the generated range — the join is unchanged);
    features are per-(doc, bucket) token counts; the score is a
    broadcast-join + doc-keyed aggregate.  The corpus shuffles once on
    doc_id-bucket feature rows; weights never shuffle.  Integer
    micro-unit weights keep the dot product order-independent (exact
    int64 sums), so the score is deterministic across engines, runs,
    and partitionings; the single double division happens after."""
    return classifier_score(load_table(spark, sf_dir, "documents"))


def classifier_score(d: DataFrame) -> DataFrame:
    """Reusable scoring operator over (doc_id, text)."""
    w = (
        d.sparkSession.range(CLS_BUCKETS)
        .selectExpr("id AS b", f"{_cls_w('id')} AS w_int")
    )
    tok = spread(d.select("doc_id", "text"), "doc_id").selectExpr(
        "doc_id", f"explode({spark_token_hashes(spark_tokens('text'))}) AS h"
    )
    feat = tok.selectExpr("doc_id", f"h % {CLS_BUCKETS} AS b").groupBy(
        "doc_id", "b"
    ).agg(F.count("*").alias("cnt"))
    return (
        feat.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w_int")).cast("bigint").alias("score_int"),
            F.sum("cnt").cast("bigint").alias("n_tok"),
        )
        .selectExpr(
            "doc_id",
            "score_int",
            "n_tok",
            "CAST(score_int AS DOUBLE) / (1000.0 * n_tok) AS score",
            "score_int > 0 AS keep",
        )
    )


@register(
    "text_lm_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
    g AS (SELECT unnest({duck_bigrams('toks')}) AS bigram
          FROM t WHERE len(toks) >= 2),
    p AS (SELECT bigram, COUNT(*) AS n FROM g GROUP BY bigram),
    parts AS (
        SELECT string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2, n
        FROM p
    ),
    tot AS (SELECT w1, SUM(n) AS n_w1 FROM parts GROUP BY w1),
    top AS (SELECT w1, n_w1 FROM tot
            ORDER BY n_w1 DESC, w1 LIMIT {LM_TOP_HEADS}),
    r AS (
        SELECT parts.w1, w2,
               row_number() OVER (
                   PARTITION BY parts.w1 ORDER BY n DESC, w2
               ) AS rank
        FROM parts JOIN top ON parts.w1 = top.w1
    ),
    lm AS (SELECT w1 || ' ' || w2 AS bigram FROM r
           WHERE rank <= {LM_TOP_CONT}),
    dg AS (
        SELECT doc_id, unnest({duck_bigrams('toks')}) AS bigram
        FROM t WHERE len(toks) >= 2
    )
    SELECT dg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN lm.bigram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_in_lm
    FROM dg LEFT JOIN lm ON lm.bigram = dg.bigram
    GROUP BY dg.doc_id
    """,
)
def text_lm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty against the corpus bigram LM: how many of
    the doc's bigrams fall inside the LM's high-probability mass (the
    text_bigram_lm table — top-{LM_TOP_CONT} continuations of the
    {LM_TOP_HEADS} most frequent heads).  `1 - n_in_lm/n_bigrams` is
    the perplexity-proxy novelty score: near 0 = formulaic/templated
    text the LM already predicts, near 1 = out-of-distribution
    content.  Counts are emitted instead of the ratio so the score
    stays cross-engine exact.

    Scale shape: the LM table is bounded ({LM_TOP_HEADS}·{LM_TOP_CONT}
    rows) and BROADCASTS into the scoring join — the corpus-side
    bigram stream never shuffles for the probe; the only corpus
    shuffles are the LM's own pair count and the per-doc rollup.
    Docs with < 2 tokens have no bigrams and drop out (same rows both
    engines)."""
    d = load_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    t = d.selectExpr("doc_id", f"{toks} AS toks").filter(F.size("toks") >= 2)
    pairs = (
        t.selectExpr(f"explode({spark_bigrams('toks')}) AS bigram")
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .select(
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
            "n",
        )
    )
    totals = pairs.groupBy("w1").agg(F.sum("n").alias("n_w1"))
    top = totals.orderBy(F.desc("n_w1"), F.asc("w1")).limit(LM_TOP_HEADS)
    w = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    lm = (
        pairs.join(F.broadcast(top), "w1")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LM_TOP_CONT)
        .select(F.concat_ws(" ", "w1", "w2").alias("bigram"), F.lit(1).alias("hit"))
    )
    dg = t.selectExpr("doc_id", f"explode({spark_bigrams('toks')}) AS bigram")
    return (
        dg.join(F.broadcast(lm), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_in_lm"),
        )
    )


@register(
    "text_langid_audit",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['en'])}')) AS INTEGER) AS c_en,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['es'])}')) AS INTEGER) AS c_es,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['de'])}')) AS INTEGER) AS c_de,
               CAST(len(regexp_extract_all(lower(text), '{_alt(_STOPWORDS['fr'])}')) AS INTEGER) AS c_fr
        FROM documents
    ),
    p AS (
        SELECT lang,
               CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
                    WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
                    WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
                    WHEN c_fr > 0 THEN 'fr'
                    ELSE 'unknown' END AS predicted_lang
        FROM c
    )
    SELECT lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang = predicted_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM p GROUP BY lang, predicted_lang
    """,
)
def text_langid_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language classifier against
    the corpus labels — the measure-your-classifier audit
    (dedup_minhash_est_vs_true's pattern applied to langid): per
    (true, predicted) cell counts, with n_correct making per-language
    recall one division away.  On the synthetic fixture the labels are
    random so the matrix documents the heuristic's bias (everything
    English-shaped drifts to 'en'); on a real corpus the same query is
    the threshold-tuning instrument.  One corpus scan + a
    |langs|²-bounded rollup."""
    d = load_table(spark, sf_dir, "documents")
    counts = {
        lang: f"regexp_count(lower(text), '{_sp(_alt(words))}')"
        for lang, words in _STOPWORDS.items()
    }
    p = d.selectExpr(
        "lang",
        *[f"{expr} AS c_{lang}" for lang, expr in counts.items()],
    ).selectExpr(
        "lang",
        "CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en' "
        "WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es' "
        "WHEN c_de >= c_fr AND c_de > 0 THEN 'de' "
        "WHEN c_fr > 0 THEN 'fr' ELSE 'unknown' END AS predicted_lang",
    )
    return p.groupBy("lang", "predicted_lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("lang") == F.col("predicted_lang")).cast("long"))
        .cast("bigint")
        .alias("n_correct"),
    )
