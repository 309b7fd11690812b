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
from ..exprs import dec, sql_dsum
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


# --- mergeable histograms -------------------------------------------------

HIST_BIN_WIDTH = 25.0
HIST_MAX_BIN = 23  # values ≥ 24*25 land in the top bin


def _hist_bin() -> F.Column:
    raw = F.floor(F.col("value") / HIST_BIN_WIDTH).cast("int")
    return F.greatest(F.least(raw, F.lit(HIST_MAX_BIN)), F.lit(0))


def partial_histogram(df: DataFrame) -> DataFrame:
    """Collapse a slice to per-(type, bin) histogram state.  The value
    sum is carried as exact decimal so merged states are bit-identical
    to a one-pass histogram regardless of slicing."""
    return df.groupBy("event_type", _hist_bin().alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).alias("sum_dec"),
    )


def merge_histograms(states: DataFrame) -> DataFrame:
    """Fold per-slice histogram states; cast the exact carrier to
    double only at the very end."""
    return (
        states.groupBy("event_type", "bin")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
        )
        .select(
            "event_type",
            "bin",
            "n",
            F.col("sum_dec").cast("double").alias("sum_value"),
        )
    )


@register(
    "agg_histogram_merge",
    oracle=f"""
    SELECT event_type,
           CAST(GREATEST(LEAST(CAST(floor(value / {HIST_BIN_WIDTH}) AS INTEGER),
                               {HIST_MAX_BIN}), 0) AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def agg_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histograms: three event slices each collapse
    to per-(type, bin) state, and the states merge WITHOUT rescanning
    rows — the distribution-monitoring analogue of
    ``agg_incremental_merge`` (dashboards keep per-day histogram state
    and fold in the daily delta; a month's distribution is a 31-state
    merge, not a rescan).  Bin counts and exact-decimal value sums are
    both algebraic, so the merged histogram is bit-identical to the
    oracle's one-pass histogram."""
    ev = load_table(spark, sf_dir, "events")
    slices = [ev.filter(F.col("event_id") % 3 == k) for k in range(3)]
    states = partial_histogram(slices[0])
    for s in slices[1:]:
        states = states.unionByName(partial_histogram(s))
    return merge_histograms(states)


# --- incremental join maintenance ----------------------------------------


@register(
    "join_incremental_delta",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN view maintenance (delta-join algebra): with
    A ∪ ΔA joined to B ∪ ΔB, the new view is the old view plus the
    three delta terms  A⋈ΔB ∪ ΔA⋈B ∪ ΔA⋈ΔB  — never a full re-join.
    Here orders/customer are each split even/odd (stored vs delta),
    the four terms are computed and unioned, and the aggregate must
    hash-match the oracle's direct one-shot join.

    At 100 TB the A⋈B term is the STORED materialized view (not
    recomputed as here — the fixture has no persisted state); the
    per-refresh cost is the delta terms only, each with the small Δ
    side broadcast, so a daily refresh scans the deltas and never the
    history.  Same contract as ``agg_incremental_merge``, lifted from
    aggregates to joins."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    a_old = od.filter(F.col("o_custkey") % 2 == 0)
    a_new = od.filter(F.col("o_custkey") % 2 != 0)
    b_old = cu.filter(F.col("c_custkey") % 2 == 0)
    b_new = cu.filter(F.col("c_custkey") % 2 != 0)
    on = lambda a, b: a["o_custkey"] == b["c_custkey"]  # noqa: E731
    view = (
        a_old.join(F.broadcast(b_old), on(a_old, b_old))
        .unionByName(a_old.join(F.broadcast(b_new), on(a_old, b_new)))
        .unionByName(a_new.join(F.broadcast(b_old), on(a_new, b_old)))
        .unionByName(a_new.join(F.broadcast(b_new), on(a_new, b_new)))
    )
    return view.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "rollup_hierarchy_reuse",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) AS hour_us,
               epoch_us(date_trunc('day', ts)) AS day_us,
               epoch_us(date_trunc('week', ts)) AS week_us,
               CAST(floor(value * {MICRO}) AS BIGINT) AS v
        FROM events
    ),
    hourly AS (
        SELECT event_type, hour_us AS bucket_us, day_us, week_us,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS sum_micro
        FROM base GROUP BY 1, 2, 3, 4
    ),
    daily AS (
        SELECT event_type, day_us AS bucket_us, week_us,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(sum_micro) AS BIGINT) AS sum_micro
        FROM hourly GROUP BY 1, 2, 3
    ),
    weekly AS (
        SELECT event_type, week_us AS bucket_us,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(sum_micro) AS BIGINT) AS sum_micro
        FROM daily GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, event_type, bucket_us, n, sum_micro
    FROM hourly
    UNION ALL
    SELECT 'day' AS grain, event_type, bucket_us, n, sum_micro FROM daily
    UNION ALL
    SELECT 'week' AS grain, event_type, bucket_us, n, sum_micro FROM weekly
    """,
)
def rollup_hierarchy_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate hierarchy (the hypertable rollup tree):
    daily totals are computed FROM the hourly partials and weekly FROM
    the daily — events are scanned exactly once, at the finest grain.
    Because the carriers (count, integer micro-sum) are algebraic,
    every level is bit-identical to aggregating the raw rows directly,
    and the oracle replays the same reuse chain.  This is the
    materialized-rollup maintenance pattern: at 100 TB the hourly
    table is ~10⁻⁴ of the corpus, the day/week levels are derived from
    KBs of state, and a late-arriving hour dirties one day + one week
    row, never a rescan.  Output: all three grains unioned, tagged by
    `grain` (bucket boundaries in epoch µs; weeks are ISO Mondays in
    both engines)."""
    ev = load_table(spark, sf_dir, "events")
    micro = F.floor(F.col("value") * MICRO).cast("bigint")
    us = lambda c: F.unix_micros(F.date_trunc(c, F.col("ts").cast("timestamp")))  # noqa: E731
    hourly = (
        ev.select(
            "event_type",
            us("hour").alias("hour_us"),
            us("day").alias("day_us"),
            us("week").alias("week_us"),
            micro.alias("v"),
        )
        .groupBy("event_type", "hour_us", "day_us", "week_us")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_micro"))
    )
    daily = hourly.groupBy("event_type", "day_us", "week_us").agg(
        F.sum("n").alias("n"), F.sum("sum_micro").alias("sum_micro")
    )
    weekly = daily.groupBy("event_type", "week_us").agg(
        F.sum("n").alias("n"), F.sum("sum_micro").alias("sum_micro")
    )
    pick = lambda df, grain, b: df.select(  # noqa: E731
        F.lit(grain).alias("grain"),
        "event_type",
        F.col(b).alias("bucket_us"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_micro").cast("bigint").alias("sum_micro"),
    )
    return (
        pick(hourly, "hour", "hour_us")
        .unionByName(pick(daily, "day", "day_us"))
        .unionByName(pick(weekly, "week", "week_us"))
    )
