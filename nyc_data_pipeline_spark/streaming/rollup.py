"""Incremental rollup tables: the reference's summary-table maintenance
(`taxi_analytics_summary` / `hourly_statistics`, reference
database_handler.py:112-164, recomputed by batch jobs over the full
fact table) re-done as a streaming-native incremental aggregate.

Design (the standard lambda-free recipe):

  stream ──foreachBatch──▶ per-epoch PARTIAL aggregates
                           (count + exact-decimal sum per group key),
                           epoch-keyed parquet (idempotent on replay)
  read time:  finalize = groupBy(key) over the partials — at most
              (#epochs × #keys) tiny rows, re-aggregated exactly.

Why this scales where the reference's approach doesn't: each epoch
touches only its micro-batch (no full-table recompute); partials are
decimal-exact so finalize is bit-identical to a batch aggregate over
the same rows (asserted in tests/test_streaming.py); epoch overwrite
keeps at-least-once replays from double counting.  Periodic compaction
(re-partialing closed epochs into one file) keeps the partial count
bounded; AVG finalizes as sum/count, never avg-of-avgs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import dec


class HourlyRollupSink:
    """foreachBatch target maintaining per-hour partial aggregates."""

    def __init__(self, base_path: str, ts_col: str = "ts", value_col: str = "value"):
        self.base_path = base_path
        self.ts_col = ts_col
        self.value_col = value_col

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            batch_df.groupBy(
                F.date_trunc("hour", F.col(self.ts_col).cast("timestamp")).alias("hour")
            )
            .agg(
                F.count("*").alias("n"),
                F.count(self.value_col).alias("nv"),
                F.sum(dec(self.value_col)).alias("sum_dec"),
            )
        )
        if not partial.take(1):
            return
        partial.write.mode("overwrite").parquet(
            os.path.join(self.base_path, f"epoch={epoch_id}")
        )


def finalize_hourly_rollup(spark: SparkSession, base_path: str) -> DataFrame:
    """Merge all epoch partials into the live rollup table: exact
    re-aggregation (decimal sums add associatively; counts add)."""
    partials = spark.read.parquet(base_path)
    return partials.groupBy("hour").agg(
        F.sum("n").alias("trip_count"),
        F.sum("sum_dec").cast("double").alias("total_value"),
        (F.sum("sum_dec").cast("double") / F.sum("nv")).alias("avg_value"),
    )
