"""Incremental aggregate maintenance via mergeable partial states.

At 100 TB the KPI/rollup queries the reference recomputes per dashboard
refresh (aggregated_stats, reference database_handler.py:110-130) must
NOT rescan history: the scalable pattern is to keep per-partition
partial aggregate STATES (count / integer sum / min / max) and fold
each new batch's state into them — an algebraic-aggregate merge, the
same contract Spark's own partial+final aggregation and streaming state
stores rely on.

``agg_incremental_merge`` demonstrates the contract end-to-end: the
events table is split into a "history" and a "delta" slice, each slice
is collapsed to its partial state independently, and the two state
tables are merged WITHOUT touching the underlying rows again.  Because
the sum is carried in integer micro-units (see similarity/centroids.py
for the fixed-point policy), partial+merge is bit-identical to a direct
one-pass aggregate — which is exactly what the DuckDB oracle computes,
so the equality is machine-checked, not asserted in prose.

Scale shape: each slice aggregates map-side to |event_type| rows before
its shuffle; the merge then aggregates a table whose size is
O(#slices x #groups), independent of corpus size.  A daily pipeline
stores the state table and pays only the delta scan per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MICRO = 1_000_000


def partial_state(df: DataFrame) -> DataFrame:
    """Collapse events to per-type mergeable state (n, integer
    micro-unit sum, min, max).  avg is derived at merge time — it is
    not itself mergeable, its (sum, n) carrier is."""
    micro = F.floor(F.col("value") * MICRO).cast("bigint")
    return df.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(micro).alias("sum_micro"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_states(states: DataFrame) -> DataFrame:
    """Fold any number of per-slice states into the final aggregate.
    Every carrier is associative+commutative, so merge order (and
    slice boundaries) cannot change the result."""
    return (
        states.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_micro").cast("bigint").alias("sum_micro"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "avg_value",
            F.col("sum_micro").cast("double") / F.col("n") / MICRO,
        )
    )


@register(
    "agg_incremental_merge",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * {MICRO}) AS BIGINT)) AS BIGINT)
               AS sum_micro,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(floor(value * {MICRO}) AS BIGINT)) AS DOUBLE)
               / COUNT(value) / {MICRO} AS avg_value
    FROM events GROUP BY event_type
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-slice state + delta-slice state, merged — must equal the
    oracle's direct one-pass aggregate bit-for-bit (integer carriers).

    The even/odd event_id split stands in for yesterday's stored state
    vs today's new partition; neither slice is rescanned to produce
    the other's state."""
    ev = load_table(spark, sf_dir, "events")
    history = ev.filter(F.col("event_id") % 2 == 0)
    delta = ev.filter(F.col("event_id") % 2 != 0)
    states = partial_state(history).unionByName(partial_state(delta))
    return merge_states(states)
