"""Corpus diversity: per-language bigram conditional entropy.

H(next | prev) = −Σ_ab p(a,b) · ln p(b|a), the standard
information-theoretic diversity/repetitiveness summary of a corpus
slice (Shannon; used in data-curation reports to catch templated or
boilerplate-heavy languages long before a model trains on them —
low conditional entropy = the next token is predictable = low-value
training text).  Complements text_lm_novelty (which scores DOCUMENTS
against the corpus LM; this summarizes the LM itself).

Scale shape: two hash-shuffled counting aggregations (bigram counts,
then prev-token totals via a second groupBy), one broadcast-free join
keyed on (lang, prev) — all map-side combinable, no sort, no window.
Vocabulary-bound after the first count (Heap's law), like the BPE
merge step.

Cross-engine exactness: counts are integers; the single libm ln per
DISTINCT (lang, a, b) cell is micro-nat rounded, then weighted by the
integer count and integer-summed — order-free.  The final entropy is
one double division of two bigints (IEEE-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .text import duck_bigrams, duck_tokens, spark_bigrams, spark_tokens

# -ln(C_ab / C_a) in micro-nats; C_ab <= C_a, so the value is >= 0.
_NLL = (
    "CAST(round(-ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE))"
    " * 1000000.0, 0) AS BIGINT)"
)


@register(
    "text_bigram_entropy",
    oracle=f"""
    WITH toks AS (
        SELECT lang, {duck_tokens('text')} AS tk FROM documents
    ),
    grams AS (
        SELECT lang, unnest({duck_bigrams('tk')}) AS g
        FROM toks WHERE len(tk) >= 2
    ),
    split_g AS (
        SELECT lang, string_split(g, ' ')[1] AS a, g,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM grams GROUP BY lang, g
    ),
    prev_tot AS (
        SELECT lang, a, CAST(SUM(c_ab) AS BIGINT) AS c_a
        FROM split_g GROUP BY lang, a
    )
    SELECT s.lang,
           CAST(SUM(s.c_ab) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
           CAST(SUM(s.c_ab * {_NLL}) AS BIGINT) AS h_num_micro,
           CAST(SUM(s.c_ab * {_NLL}) AS DOUBLE) / SUM(s.c_ab)
               AS entropy_micronats
    FROM split_g s JOIN prev_tot p ON s.lang = p.lang AND s.a = p.a
    GROUP BY s.lang
    """,
)
def text_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_entropy(load_table(spark, sf_dir, "documents"))


def bigram_entropy(docs: DataFrame) -> DataFrame:
    """Per-language H(next|prev) in micro-nats, integer-exact."""
    toks = docs.selectExpr("lang", f"{spark_tokens('text')} AS tk").where(
        F.size("tk") >= 2
    )
    counts = (
        toks.select("lang", F.explode(F.expr(spark_bigrams("tk"))).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .withColumn("a", F.split("g", " ").getItem(0))
    )
    prev_tot = counts.groupBy("lang", "a").agg(
        F.sum("c_ab").cast("bigint").alias("c_a")
    )
    return (
        counts.join(prev_tot, ["lang", "a"])
        .withColumn("nll", F.expr(_NLL))
        .groupBy("lang")
        .agg(
            F.sum("c_ab").cast("bigint").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("distinct_bigrams"),
            F.sum(F.col("c_ab") * F.col("nll"))
            .cast("bigint")
            .alias("h_num_micro"),
            (
                F.sum(F.col("c_ab") * F.col("nll")).cast("double")
                / F.sum("c_ab")
            ).alias("entropy_micronats"),
        )
    )
