"""Robust statistics for data cleaning: winsorization and median/MAD
outlier flags.

Mean/stddev-based cleaning (events_hourly_anomaly's z-scores) breaks
exactly when it matters — the outliers being hunted drag the mean and
inflate the stddev.  Training-data pipelines therefore clip and flag
with ORDER statistics: winsorize at exact percentiles, and score
deviation against the median/MAD, which tolerate up to 50%
contamination.

Cross-engine exactness: order statistics are SELECTED values, not
computed ones — rank a total order (value, event_id), pick the row at
the percentile rank (percentile_disc semantics), and no arithmetic
ever happens on doubles; the MAD path runs in floor-micro integers
and the 3-sigma-equivalent flag multiplies instead of divides.

Scale shape: each statistic is one partitioned window sort (spillable,
per-key) + a per-key 1-row boundary table joined back broadcast.  At
extreme per-key cardinality the exact selection swaps for
approx_percentile boundaries — the exact form stays as the referee
(the equidepth-histogram argument, operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MICRO = 1_000_000
W_LO, W_HI = 5, 95  # winsorization percentiles
MAD_K = 3  # flag when |x - med| > MAD_K * MAD


@register(
    "fn_winsorize",
    oracle=f"""
    WITH r AS (
        SELECT event_id, event_type, value,
               row_number() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    ),
    b AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(ceil(n * {W_LO} / 100.0) AS BIGINT)
                        THEN value END) AS lo,
               MIN(CASE WHEN rn = CAST(ceil(n * {W_HI} / 100.0) AS BIGINT)
                        THEN value END) AS hi
        FROM r GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value,
           CASE WHEN r.value < b.lo THEN b.lo
                WHEN r.value > b.hi THEN b.hi
                ELSE r.value END AS winsorized,
           CAST(r.value < b.lo OR r.value > b.hi AS BOOLEAN) AS clipped
    FROM r JOIN b ON b.event_type = r.event_type
    """,
)
def fn_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize event values at the exact per-type p{W_LO}/p{W_HI}
    (percentile_disc: the value at rank ceil(p·n), a SELECTED value —
    no interpolation, so doubles cross engines untouched).  Values
    outside the band snap to the boundary; `clipped` flags them."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.col("n") * p / 100.0).cast("bigint"),
            F.col("value"),
        )
    )
    b = r.groupBy("event_type").agg(
        pick(W_LO).alias("lo"), pick(W_HI).alias("hi")
    )
    j = r.join(F.broadcast(b), "event_type")
    return j.select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("winsorized"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )


@register(
    "events_mad_outliers",
    oracle=f"""
    WITH v AS (
        SELECT event_id, event_type,
               CAST(floor(value * {MICRO}) AS BIGINT) AS vm,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(floor(value * {MICRO}) AS BIGINT), event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type,
               MIN(CASE WHEN rn = (n + 1) // 2 THEN vm END) AS med
        FROM v GROUP BY event_type
    ),
    d AS (
        SELECT v.event_id, v.event_type, v.vm, med.med,
               ABS(v.vm - med.med) AS dev,
               row_number() OVER (
                   PARTITION BY v.event_type
                   ORDER BY ABS(v.vm - med.med), v.event_id
               ) AS drn,
               COUNT(*) OVER (PARTITION BY v.event_type) AS n
        FROM v JOIN med ON med.event_type = v.event_type
    ),
    mad AS (
        SELECT event_type,
               MIN(CASE WHEN drn = (n + 1) // 2 THEN dev END) AS mad
        FROM d GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.dev AS dev_micro,
           mad.mad AS mad_micro,
           CAST(d.dev > {MAD_K} * mad.mad AS BOOLEAN) AS is_outlier
    FROM d JOIN mad ON mad.event_type = d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier flags per event type: deviation from the
    per-type lower median, scored against {MAD_K}x the median absolute
    deviation — the 50%-breakdown-point robust z-score.  Every number
    is a floor-micro integer or a selected order statistic; the flag
    multiplies (dev > K·MAD) instead of dividing, so both engines
    agree bit-for-bit.  Two per-key window sorts + two broadcast-back
    1-row-per-key boundary tables; nothing global."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * MICRO).cast("bigint")
    wv = Window.partitionBy("event_type").orderBy("vm", "event_id")
    v = ev.select("event_id", "event_type", vm.alias("vm")).select(
        "event_id",
        "event_type",
        "vm",
        F.row_number().over(wv).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    lower_median = F.min(
        F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("vm"))
    )
    med = v.groupBy("event_type").agg(lower_median.alias("med"))
    d0 = v.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "vm",
        "med",
        F.abs(F.col("vm") - F.col("med")).alias("dev"),
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "event_id")
    d = d0.select(
        "event_id",
        "event_type",
        "dev",
        F.row_number().over(wd).alias("drn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    mad = d.groupBy("event_type").agg(
        F.min(
            F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev"))
        ).alias("mad")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("dev").alias("dev_micro"),
            F.col("mad").alias("mad_micro"),
            (F.col("dev") > MAD_K * F.col("mad")).alias("is_outlier"),
        )
    )
