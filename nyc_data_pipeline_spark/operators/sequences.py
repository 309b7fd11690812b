"""Frequent behavioral sequences: top-K event-type trigrams.

Sequence mining, the 80% cut: which ordered event chains
(view > click > purchase …) dominate user behavior.  Full sequential-
pattern mining (PrefixSpan) enumerates an exponential lattice; in
practice product analytics wants the frequent CONTIGUOUS n-grams of
the per-user event stream, and that is linear: a per-user window
(high-cardinality key — the sessionize regime) emits each user's
consecutive (e₁,e₂,e₃) chains via two LEADs, then a hash-shuffled
count and a TakeOrdered top-K.  No lattice, no self-joins.

The share_ppm column (occurrences per million chains, integer
division against the 1-row broadcast total) makes the readout
corpus-size-invariant — the number a dashboard trends week over week.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SEQ_TOPK = 20


@register(
    "events_topk_sequences",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grams AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS trigram
        FROM ordered WHERE e3 IS NOT NULL
    )
    SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM grams)
                AS BIGINT) AS share_ppm
    FROM grams GROUP BY trigram
    ORDER BY n_occurrences DESC, trigram LIMIT {SEQ_TOPK}
    """,
)
def events_topk_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_sequences(load_table(spark, sf_dir, "events"))


def topk_sequences(events: DataFrame, k: int = SEQ_TOPK) -> DataFrame:
    """Top-k contiguous event-type trigrams with per-million shares."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grams = (
        events.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
    )
    counts = grams.groupBy("trigram").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    # total from the vocabulary-sized counts table, NOT a second pass
    # over the windowed corpus — one per-user sort, not two.
    total = counts.agg(F.sum("n_occurrences").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .selectExpr(
            "trigram",
            "n_occurrences",
            "CAST(n_occurrences * 1000000 div tot AS BIGINT) AS share_ppm",
        )
        .orderBy(F.col("n_occurrences").desc(), "trigram")
        .limit(k)
    )


# --- First-order transition matrix ----------------------------------------
#
# The n=2 companion of the trigram top-k: P(next event | current
# event) over the per-user streams — the Markov-chain readout feeding
# "what do users do after X" dashboards and next-event baselines
# (a 1st-order chain is the standard naive baseline a sequence model
# must beat).  Same plan skeleton: one LEAD per user window, a hash
# count over the |event types|² = 25-cell matrix (map-side combined),
# conditional probabilities as integral ppm against the broadcast
# per-source totals.


@register(
    "events_markov_transitions",
    oracle="""
    WITH pairs AS (
        SELECT event_type AS cur,
               LEAD(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    counts AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    totals AS (
        SELECT cur, CAST(SUM(n_transitions) AS BIGINT) AS tot
        FROM counts GROUP BY cur
    )
    SELECT c.cur, c.nxt, c.n_transitions,
           CAST(c.n_transitions * 1000000 // t.tot AS BIGINT)
               AS p_cond_ppm
    FROM counts c JOIN totals t USING (cur)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_transitions(load_table(spark, sf_dir, "events"))


def markov_transitions(events: DataFrame) -> DataFrame:
    """(cur, nxt, n, P(nxt|cur) in ppm) over per-user event chains."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        events.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type", 1).over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    totals = counts.groupBy("cur").agg(
        F.sum("n_transitions").cast("bigint").alias("tot")
    )
    return counts.join(F.broadcast(totals), "cur").selectExpr(
        "cur",
        "nxt",
        "n_transitions",
        "CAST(n_transitions * 1000000 div tot AS BIGINT) AS p_cond_ppm",
    )
