"""Interval-overlap join via bin-and-residual — the scalable form of
``ON a.start <= b.end AND b.start <= a.end``.

A naive overlap join is a theta join: no equi-key, so Spark falls back
to BroadcastNestedLoopJoin (or worse, a cartesian product) — O(|A|·|B|)
comparisons.  The classic distributed rewrite (used by every interval
engine — Spark range-join hints in Databricks, GeoSpark's grid
partitioning, bioinformatic interval libraries) is:

1. BIN: explode every interval into the fixed-width time buckets it
   covers (here 1-hour buckets — intervals are short, so the fan-out
   per row is small and bounded).
2. EQUI-JOIN on the bucket id — a plain shuffled/broadcast hash join;
   Catalyst picks the strategy, AQE handles bucket skew.
3. DEDUP the (a, b) pair (an overlapping pair meets in every shared
   bucket) and apply the exact overlap predicate as a RESIDUAL filter —
   binning gives candidates, the residual gives exactness.

Cost: O(|A|·w + |B|·w) exploded rows (w = avg buckets per interval)
plus one equi-join — linear, versus the nested-loop quadratic.  At
100 TB both sides shuffle by bucket only; nothing broadcasts unless a
side genuinely fits (then Catalyst's broadcast threshold fires and the
same plan degenerates to a broadcast hash join for free).

The registered query joins user sessions (sessionize_events semantics:
30-min inactivity gap) against "flash windows" — ±2 h around the 20
highest-value purchase events — answering "which user sessions were
active near a whale purchase", with the exact overlap length in µs.

Reference parity: the reference has no joins at all ([GAP] — SURVEY
§2.3); nearest neighbor is its BETWEEN-style hourly filtering
(spark_consumer.py:80-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

HOUR_US = 3_600 * 1_000_000
GAP_US = 1_800 * 1_000_000  # session inactivity gap (30 min)
PAD_US = 2 * HOUR_US  # flash-window half-width
TOP_N = 20


def overlap_join(
    a: DataFrame, b: DataFrame, a_keys: list[str], b_keys: list[str]
) -> DataFrame:
    """Generic bin-and-residual overlap join.  `a` and `b` carry
    (start_us, end_us) plus their identifying key columns; returns the
    keys of both sides and `overlap_us` for every truly overlapping
    pair.  Intervals are closed; bucket width is 1 hour."""

    def binned(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            *df.columns,
            F.explode(
                F.sequence(
                    F.expr("start_us div " + str(HOUR_US)),
                    F.expr("end_us div " + str(HOUR_US)),
                )
            ).alias("bucket"),
        ).select(
            "bucket", *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        )

    ab = binned(a, "a_").join(binned(b, "b_"), "bucket").where(
        (F.col("a_start_us") <= F.col("b_end_us"))
        & (F.col("b_start_us") <= F.col("a_end_us"))
    )
    pair_cols = [f"a_{c}" for c in a_keys] + [f"b_{c}" for c in b_keys]
    return (
        ab.groupBy(
            *pair_cols, "a_start_us", "a_end_us", "b_start_us", "b_end_us"
        )
        .agg(F.count("*").alias("_shared_buckets"))
        .select(
            *[F.col(f"a_{c}").alias(c) for c in a_keys],
            *[F.col(f"b_{c}").alias(c) for c in b_keys],
            (
                F.least("a_end_us", "b_end_us")
                - F.greatest("a_start_us", "b_start_us")
            ).alias("overlap_us"),
        )
    )


_ORACLE = f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > {GAP_US} OR
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INTEGER) AS session_id,
               epoch_us(ts) AS us
        FROM gaps
    ),
    sessions AS (
        SELECT user_id, session_id,
               MIN(us) AS start_us, MAX(us) AS end_us
        FROM sess GROUP BY user_id, session_id
    ),
    flash AS (
        SELECT event_id AS flash_id,
               epoch_us(ts) - {PAD_US} AS start_us,
               epoch_us(ts) + {PAD_US} AS end_us
        FROM events WHERE event_type = 'purchase'
        ORDER BY value DESC, event_id LIMIT {TOP_N}
    )
    SELECT s.user_id, s.session_id, f.flash_id,
           least(s.end_us, f.end_us) - greatest(s.start_us, f.start_us)
             AS overlap_us
    FROM sessions s
    JOIN flash f
      ON s.start_us <= f.end_us AND f.start_us <= s.end_us
"""


@register("join_interval_overlap", oracle=_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User sessions overlapping ±2 h flash windows around the top-20
    purchases, via the bin-and-residual equi-join (the oracle states
    the same semantics as the naive theta join)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > GAP_US), 1).otherwise(0)
    sessions = (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun).cast("int"))
        .withColumn("us", us)
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    flash = (
        ev.where(F.col("event_type") == "purchase")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(TOP_N)
        .select(
            F.col("event_id").alias("flash_id"),
            (us - PAD_US).alias("start_us"),
            (us + PAD_US).alias("end_us"),
        )
    )
    return overlap_join(
        sessions, flash, ["user_id", "session_id"], ["flash_id"]
    )
