"""Per-group model fitting via applyInPandas (U2): closed-form OLS.

The LLM-pipeline shape this demonstrates: "fit a small model per
group" — per-domain drift slopes, per-source quality trends, per-tenant
forecasts.  Spark's contract for it is ``groupBy().applyInPandas``:
each group arrives as ONE Arrow-batched pandas frame, the fit runs in
vectorized Python, and the result is a tiny per-group row.  One shuffle
on the group key, fits embarrassingly parallel across groups.

Determinism across engines is the hard part — a float dot product sums
in engine-specific order.  The fit therefore runs entirely in exact
integer arithmetic: y in floor-micro-units, x as the 1..n rank within
the group's (ts, event_id) order, and the OLS normal equations
  slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
carried as ARBITRARY-PRECISION integers (Python ints on the Spark side,
HUGEINT on the DuckDB side) and emitted as decimal strings — the
numerator/denominator pair is the bit-exact cross-engine contract; the
float slope is one division away for any consumer.

Reference parity note: the reference computes no regressions; this is
north-star analytics surface (nearest neighbor: its pickup_hour KPI
trends, spark_consumer.py:80-104, which it recomputes per refresh).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MICRO = 1_000_000

_OLS_SCHEMA = "event_type string, n bigint, slope_num string, slope_den string"


def _fit_group(pdf):
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"])
    ys = [math.floor(v * MICRO) for v in pdf["value"]]
    n = len(ys)
    # Σx and Σx² over x = 1..n in closed form; Σy, Σxy exactly in
    # Python ints (no int64 overflow at any group size).
    sx = n * (n + 1) // 2
    sxx = n * (n + 1) * (2 * n + 1) // 6
    sy = sum(ys)
    sxy = sum(i * y for i, y in enumerate(ys, start=1))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [n],
            "slope_num": [str(num)],
            "slope_den": [str(den)],
        }
    )


def grouped_ols(events: DataFrame) -> DataFrame:
    """(event_type, ts, event_id, value) → one OLS fit per type."""
    return (
        events.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(_fit_group, schema=_OLS_SCHEMA)
    )


@register(
    "grouped_ols_trend",
    oracle=f"""
    WITH o AS (
        SELECT event_type,
               CAST(floor(value * {MICRO}) AS BIGINT) AS y,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(rn AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(rn AS HUGEINT) * y) AS sxy,
               SUM(CAST(rn AS HUGEINT) * rn) AS sxx
        FROM o GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
           CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den
    FROM s
    """,
)
def grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS slope of value vs within-group time rank,
    fit group-at-a-time in applyInPandas with exact integer carriers —
    hash-identical to the oracle's windowed normal-equation SQL.
    The rank (not raw epoch) is the regressor so Σx² stays closed-form
    and the scale-invariant trend direction is what's measured."""
    return grouped_ols(load_table(spark, sf_dir, "events"))
