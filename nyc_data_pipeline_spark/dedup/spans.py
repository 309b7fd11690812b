"""Span-level (substring) duplication coverage — the ExactSubstr cut.

Doc-level dedup (exact.py, minhash.py) keeps one copy of a duplicated
DOCUMENT; Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better") show most duplicated TEXT lives inside otherwise-unique
documents — boilerplate headers, license blocks, quoted passages.  The
paper's ExactSubstr tool builds one suffix array over the whole corpus;
a suffix array is a global sort and does not distribute.  The
Spark-native equivalent is span fingerprinting:

    tokens → sliding W-token spans (stride 1) → group by span →
    spans seen in ≥2 DISTINCT docs are "duplicated text" →
    per-doc interval union of the duplicated spans' [start, end]
    token ranges → covered-token fraction.

Every stage is a hash shuffle on the span key or on doc_id — linear in
corpus token count, map-side combinable, no global sort, no pair
enumeration.  The per-doc interval union is a window PARTITIONed BY
doc_id (high-cardinality key; one doc's spans — bounded by its own
length — per partition), the same per-entity-window regime as
sessionize_events.

At 100 TB the span KEY would be a 64-bit rolling fingerprint
(xxhash64 of the span) rather than the span text — same plan, 8-byte
shuffle keys; the text key is kept here because the DuckDB referee
must hash identical bytes on both engines, and Spark's xxhash64 is
not available in DuckDB.  W=8 tokens is proportionate to the ~45-token
synthetic docs (the paper uses 50 tokens on full web pages).

Downstream use: `dup_frac` is the drop/trim signal — a curation
pipeline removes or trims documents whose duplicated-text coverage
exceeds a threshold, exactly the paper's training-set treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import duck_tokens, spark_tokens
from ..registry import register

SPAN_W = 8  # tokens per span (stride 1)

_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {duck_tokens('text')} AS t FROM documents
),
eligible AS (
    SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) >= {SPAN_W}
),
posting AS (
    SELECT doc_id, n_tokens,
           i AS s, i + {SPAN_W} - 1 AS e,
           array_to_string(list_slice(t, i, i + {SPAN_W} - 1), ' ') AS span
    FROM eligible, LATERAL unnest(range(1, n_tokens - {SPAN_W} + 2)) AS g(i)
),
span_docs AS (
    SELECT span FROM posting GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
),
dup_pos AS (
    SELECT p.doc_id, p.s, p.e FROM posting p JOIN span_docs USING (span)
),
unioned AS (
    SELECT doc_id, s, e,
           MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
    FROM dup_pos
),
cov AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_spans,
           CAST(SUM(GREATEST(0, e - GREATEST(COALESCE(prev_end, 0), s - 1)))
                AS BIGINT) AS covered_tokens
    FROM unioned GROUP BY doc_id
),
totals AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - {SPAN_W} + 1 AS BIGINT) AS n_spans
    FROM eligible
)
SELECT t.doc_id, t.n_tokens, t.n_spans,
       COALESCE(c.dup_spans, 0) AS dup_spans,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / t.n_tokens AS dup_frac
FROM totals t LEFT JOIN cov c ON t.doc_id = c.doc_id
"""


def _span_tokens(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, t): token arrays of the span-eligible docs."""
    return docs.selectExpr("doc_id", f"{spark_tokens('text')} AS t").where(
        F.size("t") >= w
    )


def span_posting(docs: DataFrame, w: int = SPAN_W) -> DataFrame:
    """(doc_id, n_tokens, s, e, span): every W-token sliding span.

    The span array is built ONCE per doc inside a `transform` over the
    start-index sequence, then posexploded — the token array is never
    replicated per span row.
    """
    return _posting_from_toks(_span_tokens(docs, w), w)


def _posting_from_toks(toks: DataFrame, w: int) -> DataFrame:
    return toks.selectExpr(
        "doc_id",
        "size(t) AS n_tokens",
        f"posexplode(transform(sequence(1, size(t) - {w} + 1), "
        f"i -> concat_ws(' ', slice(t, i, {w})))) AS (pos, span)",
    ).selectExpr(
        "doc_id",
        "n_tokens",
        "pos + 1 AS s",
        f"pos + {w} AS e",
        "span",
    )


def span_coverage(docs: DataFrame, w: int = SPAN_W) -> DataFrame:
    """Per-doc duplicated-text coverage: the fraction of each doc's
    token positions lying inside at least one W-token span that also
    occurs in ≥2 distinct documents (cross-doc; internal repeats do
    not count).  Interval union via the running-max-end sweep."""
    toks = _span_tokens(docs, w)
    posting = _posting_from_toks(toks, w)

    # Spans present in >= 2 distinct docs: a span qualifies iff
    # min(doc_id) != max(doc_id) over its group — one window over the
    # span-partitioned posting.  This replaced a distinct→count≥2
    # aggregate plus a join of the posting back onto the qualifying
    # spans (r15): the posting — the corpus-token-scale table — now
    # crosses the network once instead of feeding two shuffled
    # consumers, and the expensive span-string projection appears once
    # in the plan instead of twice (1 Exchange + window vs 3 Exchanges
    # + SMJ in the before/after plans, plans/r15/).
    w_span = Window.partitionBy("span")
    dup_pos = (
        posting.withColumn("_mn", F.min("doc_id").over(w_span))
        .withColumn("_mx", F.max("doc_id").over(w_span))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "s", "e")
    )

    # Interval union per doc: ordered by start, a position range adds
    # only what extends past the running max end seen so far.
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        dup_pos.withColumn("prev_end", F.max("e").over(w_prev))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("dup_spans"),
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.col("e")
                    - F.greatest(F.coalesce("prev_end", F.lit(0)), F.col("s") - 1),
                )
            )
            .cast("bigint")
            .alias("covered_tokens"),
        )
    )

    # Per-doc totals need only the token COUNT — straight off the
    # token projection, not a grouped pass over the exploded posting
    # (one doc row each; the posting explode ran solely for this).
    totals = toks.selectExpr(
        "doc_id",
        "CAST(size(t) AS BIGINT) AS n_tokens",
        f"CAST(size(t) - {w} + 1 AS BIGINT) AS n_spans",
    )
    return (
        totals.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_spans",
            F.coalesce("dup_spans", F.lit(0)).cast("bigint").alias("dup_spans"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_frac"),
        )
    )


@register("dedup_span_coverage", oracle=_ORACLE)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_coverage(load_table(spark, sf_dir, "documents"))
