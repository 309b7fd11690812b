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
hash-based, no RNG), but implementation-specific — so this family is
registered rows-only (no cross-engine oracle); tests/test_llm_ops.py
bounds the estimate error against exact distinct counts instead
(HLL lgk=12 → relative error ≈ 1.6%, asserted < 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

LGK = 12  # sketch precision: 2^12 buckets, ~1.6% relative standard error


@register("approx_hll_user_reach", oracle=None)
def approx_hll_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach per event type via HLL sketches, plus the
    all-types total merged FROM THE SKETCHES (hll_union_agg over the
    per-type partial states — no second scan of events).  Output:
    (event_type, reach_estimate, sketch_bytes); event_type='ALL' is
    the merged row."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr(f"hll_sketch_agg(user_id, {LGK})").alias("sketch")
    )
    typed = per_type.select(
        "event_type",
        F.expr("hll_sketch_estimate(sketch)").alias("reach_estimate"),
        F.length("sketch").cast("bigint").alias("sketch_bytes"),
    )
    merged = per_type.agg(
        F.expr("hll_union_agg(sketch)").alias("sketch")
    ).select(
        F.lit("ALL").alias("event_type"),
        F.expr("hll_sketch_estimate(sketch)").alias("reach_estimate"),
        F.length("sketch").cast("bigint").alias("sketch_bytes"),
    )
    return typed.unionByName(merged).orderBy("event_type")
