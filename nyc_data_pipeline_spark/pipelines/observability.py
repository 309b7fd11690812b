"""In-flight pipeline metrics via `observe` — counters that ride the
job instead of re-scanning it.

The reference computes its batch metrics with a SEPARATE pass
(`batch_df.count()` before the write, spark_consumer.py:86-91 — the
double-execution bug sinks.py documents).  The Spark-native fix is
`DataFrame.observe`: named aggregate expressions evaluated AS the data
flows through the main action — row counts, violation counts, null
rates arrive with the write, for free, at any scale (they are
accumulator-backed partial aggregates, merged on the driver; no extra
scan, no extra shuffle).

Batch: `pyspark.sql.Observation` + `observed_quality_gate`.
Streaming: the same `observe` call surfaces per-micro-batch metrics in
`StreamingQueryProgress.observedMetrics` — asserted in
tests/test_streaming.py via a StreamingQueryListener.

This is the operational half of pipelines/quality.py: the expectation
SUITE is a scheduled audit query; these gauges ship with every
production write so the alert fires on the batch that broke, not the
next audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

GATE_METRICS = ("n_rows", "n_null_ts", "n_nonpos_value", "n_late")


def with_quality_gate(
    df: DataFrame, observation: Observation | str = "quality_gate"
) -> DataFrame:
    """Attach the standard event-stream gauges to `df`: total rows,
    NULL timestamps, non-positive values, and pre-2024 stragglers.
    Works on batch AND streaming frames (observe is supported on both;
    on streams the metrics appear per micro-batch in the progress
    events).  Returns the same rows — the gauges are side-band."""
    return df.observe(
        observation,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("ts").isNull().cast("long")).alias("n_null_ts"),
        F.sum((F.col("value") <= 0).cast("long")).alias("n_nonpos_value"),
        F.sum(
            (F.col("ts") < F.lit("2024-01-01").cast("timestamp")).cast("long")
        ).alias("n_late"),
    )


def observed_quality_gate(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Batch form: returns (gated frame, Observation).  After ANY
    action on the frame, `observation.get` holds the gauges — computed
    in the same job."""
    obs = Observation("quality_gate")
    return with_quality_gate(df, obs), obs
