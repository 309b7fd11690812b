"""Time-bucket gap-fill: dense per-key time spines with LOCF and
linear interpolation (the hypertable / `time_bucket_gapfill` surface).

Time-series engines (TimescaleDB's ``time_bucket_gapfill`` +
``locf()`` / ``interpolate()``, InfluxDB's ``fill(previous|linear)``)
densify a bucketed aggregate so every (key, bucket) cell exists, then
fill the holes from neighboring observations.  The reference's hourly
rollup (reference database_handler.py:152-164, spark_consumer.py's
hourly stats) leaves silent holes for hours with no trips — downstream
dashboards then misread "no data" as "zero".  This module is the
engine's dense form of that rollup.

Spark-first shape (scale notes):

- The spine is GENERATED, not joined from a calendar table: one tiny
  global (min, max) hour aggregate, broadcast-crossed with the distinct
  key set, then ``explode(sequence(lo, hi))``.  Spine cardinality is
  |keys| x |buckets| — rows are born distributed, nothing collects.
- The observed aggregate is one map-side-combined groupBy on
  (key, bucket) — micro-unit BIGINT carriers so the hourly sums are
  order-independent and bit-exact across engines (exprs.py contract).
- Filling is a window over the spine: LOCF = ``last(ignorenulls)``
  over the preceding frame; interpolation needs the bracketing
  observations, i.e. the same ``last``/``first`` pair over the
  preceding/following frames.  One shuffle on the key, spillable sort —
  no group materialization.
- Division is engine-specific (rounding), so the interpolated value is
  emitted as an exact rational ``(interp_num, interp_den)`` pair —
  interp = v_prev·(h_next−h) + v_next·(h−h_prev) over (h_next−h_prev)
  — the same numerator/denominator contract as trends.py's OLS slope.

At 100 TB: the spine is |keys|·|hours| rows — for a year of hourly
buckets that is 8 760 rows per key, generated in parallel; the only
shuffle is the (key, bucket) aggregate plus the per-key window sort,
both linear.  No step depends on the corpus fitting anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MICRO = 1_000_000
HOUR_US = 3_600 * MICRO


def hourly_observed(events: DataFrame, key: str = "event_type") -> DataFrame:
    """(key, epoch_hour, observed) — hourly micro-unit sums; sparse."""
    return (
        events.select(
            key,
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {HOUR_US}").alias(
                "epoch_hour"
            ),
            F.floor(F.col("value") * MICRO).cast("bigint").alias("v"),
        )
        .groupBy(key, "epoch_hour")
        .agg(F.sum("v").alias("observed"))
    )


def dense_spine(events: DataFrame, observed: DataFrame, key: str) -> DataFrame:
    """Dense (key, epoch_hour) spine left-joined with the sparse
    observations.  The global hour range is a 1-row aggregate broadcast
    against the distinct key set; `sequence` + `explode` generates the
    buckets distributed."""
    bounds = events.agg(
        F.expr(f"unix_micros(CAST(min(ts) AS TIMESTAMP)) div {HOUR_US}").alias("lo"),
        F.expr(f"unix_micros(CAST(max(ts) AS TIMESTAMP)) div {HOUR_US}").alias("hi"),
    )
    keys = events.select(key).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        key, F.explode(F.sequence("lo", "hi")).alias("epoch_hour")
    )
    return spine.join(observed, [key, "epoch_hour"], "left")


def _spine_sql(key: str = "event_type") -> str:
    """Shared DuckDB CTE prefix: identical sparse aggregate + dense
    spine + bracketing prev/next window columns."""
    return f"""
    WITH obs AS (
        SELECT {key},
               CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) AS epoch_hour,
               CAST(SUM(CAST(floor(value * {MICRO}) AS BIGINT)) AS BIGINT)
                 AS observed
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT CAST(min(epoch_us(ts)) // {HOUR_US} AS BIGINT) AS lo,
               CAST(max(epoch_us(ts)) // {HOUR_US} AS BIGINT) AS hi
        FROM events
    ),
    spine AS (
        SELECT k.{key}, h.epoch_hour
        FROM (SELECT DISTINCT {key} FROM events) k
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi)) AS epoch_hour FROM bounds
        ) h
    ),
    joined AS (
        SELECT s.{key}, s.epoch_hour, o.observed
        FROM spine s
        LEFT JOIN obs o ON s.{key} = o.{key} AND s.epoch_hour = o.epoch_hour
    ),
    br AS (
        SELECT {key}, epoch_hour, observed,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY {key} ORDER BY epoch_hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_v,
               last_value(CASE WHEN observed IS NOT NULL
                               THEN epoch_hour END IGNORE NULLS) OVER (
                   PARTITION BY {key} ORDER BY epoch_hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_h,
               first_value(observed IGNORE NULLS) OVER (
                   PARTITION BY {key} ORDER BY epoch_hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_v,
               first_value(CASE WHEN observed IS NOT NULL
                                THEN epoch_hour END IGNORE NULLS) OVER (
                   PARTITION BY {key} ORDER BY epoch_hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_h
        FROM joined
    )
    """


def _bracketed(events: DataFrame, key: str) -> DataFrame:
    """Spark twin of the `br` CTE: dense spine + bracketing columns."""
    sparse = hourly_observed(events, key)
    dense = dense_spine(events, sparse, key)
    w = Window.partitionBy(key).orderBy("epoch_hour")
    prev = w.rowsBetween(Window.unboundedPreceding, 0)
    nxt = w.rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("observed").isNotNull(), F.col("epoch_hour"))
    return dense.select(
        key,
        "epoch_hour",
        "observed",
        F.last("observed", ignorenulls=True).over(prev).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(prev).alias("prev_h"),
        F.first("observed", ignorenulls=True).over(nxt).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(nxt).alias("next_h"),
    )


@register(
    "window_gapfill_locf",
    oracle=_spine_sql()
    + """
    SELECT event_type, epoch_hour, observed,
           prev_v AS locf,
           CAST(observed IS NULL AND prev_v IS NOT NULL AS BOOLEAN) AS is_filled
    FROM br
    """,
)
def window_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per event_type with last-observation-carried-
    forward fill.  `locf` is NULL only before the key's first
    observation (TimescaleDB locf() semantics); `is_filled` flags the
    carried cells."""
    ev = load_table(spark, sf_dir, "events")
    br = _bracketed(ev, "event_type")
    return br.select(
        "event_type",
        "epoch_hour",
        "observed",
        F.col("prev_v").alias("locf"),
        (F.col("observed").isNull() & F.col("prev_v").isNotNull()).alias(
            "is_filled"
        ),
    )


@register(
    "window_interpolate_linear",
    oracle=_spine_sql()
    + """
    SELECT event_type, epoch_hour, observed,
           CASE WHEN observed IS NOT NULL THEN CAST(observed AS VARCHAR)
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               CAST(CAST(prev_v AS HUGEINT) * (next_h - epoch_hour)
                    + CAST(next_v AS HUGEINT) * (epoch_hour - prev_h)
                    AS VARCHAR)
           END AS interp_num,
           CASE WHEN observed IS NOT NULL THEN CAST(1 AS BIGINT)
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               next_h - prev_h
           END AS interp_den
    FROM br
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per event_type with linear interpolation
    between the bracketing observations.  The interpolated value is the
    exact rational (interp_num / interp_den) — division is left to the
    consumer because float rounding is engine-specific (trends.py's
    num/den contract).  Observed cells are special-cased to the
    canonical rational (num = observed, den = 1) — the generic bracket
    formula degenerates to 0/0 there (prev_h == next_h == epoch_hour),
    which a consumer dividing num/den must never see; den is therefore
    > 0 on every row with a non-null interp_num.  Leading/trailing gap
    runs have no bracket and emit NULL (TimescaleDB interpolate()
    semantics)."""
    ev = load_table(spark, sf_dir, "events")
    br = _bracketed(ev, "event_type")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    have = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    num = d38("prev_v") * (d38("next_h") - d38("epoch_hour")) + d38("next_v") * (
        d38("epoch_hour") - d38("prev_h")
    )
    observed = F.col("observed").isNotNull()
    return br.select(
        "event_type",
        "epoch_hour",
        "observed",
        F.when(observed, F.col("observed").cast("string"))
        .when(have, num.cast("string"))
        .alias("interp_num"),
        F.when(observed, F.lit(1).cast("bigint"))
        .when(have, F.col("next_h") - F.col("prev_h"))
        .alias("interp_den"),
    )
