"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
built-ins).

The 100 TB pattern these exist for: per-partition / per-day / per-type
sketch PARTIAL STATES are tiny (KBs), mergeable, and reaggregatable —
"distinct users per day" rolls up to "distinct users per month" by
UNIONING sketches, never rescanning the corpus.  Plain
COUNT(DISTINCT) cannot do that (distinct counts don't add).

`approx_hll_user_reach` emits per-event-type sketches AND the merged
total from `hll_union_agg` over those same sketches — the roll-up is
computed from partial states, demonstrating the mergeability contract.
Estimates are deterministic for fixed input (the sketch is
hash-based, no RNG) but implementation-specific, so the raw estimate
has no cross-engine twin.  Instead the query emits, per group, the
in-plan EXACT distinct count plus a boolean `within_5pct` comparing
the sketch estimate to it — DuckDB reproduces the exact count and
expects `true` (HLL lgk=12 → relative standard error ≈ 1.6%), turning
the error-bound property into a driver-hashed fact rather than a
pytest-only assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

LGK = 12  # sketch precision: 2^12 buckets, ~1.6% relative standard error


@register(
    "approx_hll_user_reach",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events
    """,
)
def approx_hll_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach per event type via HLL sketches, plus the
    all-types total merged FROM THE SKETCHES (hll_union_agg over the
    per-type partial states — the merged ESTIMATE never rescans
    events; the exact ALL count exists only as the referee).  Output:
    (event_type, exact_distinct, within_5pct); event_type='ALL' is the
    merged row.  The oracle reproduces the exact counts and pins
    within_5pct=true, machine-checking the sketch's error bound."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr(f"hll_sketch_agg(user_id, {LGK})").alias("sketch"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    typed = per_type.select(
        "event_type",
        "exact_distinct",
        F.expr("hll_sketch_estimate(sketch)").alias("est"),
    )
    merged = (
        per_type.agg(F.expr("hll_union_agg(sketch)").alias("sketch"))
        .crossJoin(
            F.broadcast(ev.agg(F.countDistinct("user_id").alias("exact_distinct")))
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_distinct",
            F.expr("hll_sketch_estimate(sketch)").alias("est"),
        )
    )
    return typed.unionByName(merged).select(
        "event_type",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_5pct"),
    )
