"""Window functions (SURVEY §2.5 — entirely absent in the reference).

Ranking, analytic (lag/lead, first/last), and aggregates-over-frames.
Every window here partitions by a real key (priority, user, customer),
so at 100 TB the plan is one hash shuffle on the partition key plus a
per-partition sort — no global sort, no driver involvement.  Determinism
rule: any ORDER BY that feeds row_number/ntile/lag carries a unique
tiebreak column, otherwise results are legal-but-unstable in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import dec, ts_us
from ..registry import register


@register(
    "window_ranking",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           rn, rnk, drnk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
               CAST(rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
        FROM orders
    )
    WHERE rn <= 5
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank; top-5 rows per priority."""
    o = load_table(spark, sf_dir, "orders")
    w_tb = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w_tb).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_topn_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/§2.5: the canonical top-N-per-group (top-3 orders by value per
    status) — the pattern the reference would need for 'top trips per
    hour'."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           lead(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead: inter-event gap per user (the reference-shaped
    'time since previous trip') and the following event id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = ts_us("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS running_revenue
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (the reference's 'running revenue
    per vendor' shape).  Exact-decimal accumulation keeps the running
    values bit-identical cross-engine at every prefix."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average over an ordered frame (rowsBetween), the
    'moving average fare' analytic. Decimal sum / count keeps it exact."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count("*").over(w)).alias(
            "moving_avg_price"
        ),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS n_last_hour,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame: per-user trailing 1-hour event count and exact
    sum, ordered by event time.  RANGE (value-based) frames are the
    event-time analytic ROWS frames cannot express — peers at the same
    timestamp are always in-frame together, so no tiebreak is needed and
    the result is deterministic under ties.  Same scale shape as every
    window here: one shuffle on user_id + a per-partition sort."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        ts_us("ts").alias("ts_us"),
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_last_hour"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT event_id, event_type,
           CAST(value AS DOUBLE) AS value,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: percent_rank ((rank-1)/(n-1)) and cume_dist
    (peers-at-or-below / n) per event type ordered by value.  Both are
    single integer-ratio divisions, so the doubles are bit-identical
    across engines; ties share a rank, so no tiebreak column is needed
    for determinism.  One shuffle on event_type + per-partition sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_ntile_first_last",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
           first_value(o_orderkey) OVER w AS first_in_priority,
           last_value(o_orderkey) OVER w AS last_in_priority
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles (global order with tiebreak) + first/last over an
    unbounded frame per priority.

    The naive ``ntile(4) OVER (ORDER BY ...)`` (kept as the oracle
    referee) funnels the whole table through ONE partition.  Here the
    quartile derives from a scale-safe global row number — the
    order-aligned-bucket + 64-row prefix-sum technique of
    ``order_global_rownum`` (plans/relational.py) — plus the EXACT ntile
    arithmetic: with n rows, the first ``n mod 4`` tiles hold
    ``floor(n/4)+1`` rows, the rest ``floor(n/4)``.  (The tempting
    ``ceil(rn*4/n)`` shortcut is NOT ntile semantics when 4 ∤ n: ntile
    front-loads the larger tiles.)  The corpus shuffles once on the
    bucket key; the only single-partition work is a 64-row prefix sum.
    """
    from nyc_data_pipeline_spark.plans.relational import ROWNUM_BUCKETS

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate"
    )
    # Phase 1: order-aligned buckets on the leading sort key
    # (o_totalprice); ties stay inside one bucket because the bucket is a
    # function of the price alone, and o_orderkey breaks ties locally.
    rng = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    b = o.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * ROWNUM_BUCKETS
                / (F.col("hi") - F.col("lo") + F.lit(1e-9))
            ).cast("bigint"),
            F.lit(ROWNUM_BUCKETS - 1),
        ),
    )
    local = b.withColumn(
        "local_rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    # Phase 2: 64-row prefix sum → per-bucket offset + global total.
    wall = Window.orderBy("bucket")
    offsets = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    wall.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "total",
            F.sum("n").over(
                wall.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select("bucket", "offset", "total")
    )
    rn = F.col("offset") + F.col("local_rn")
    q = F.floor(F.col("total") / 4)
    r = F.col("total") % 4
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    quartile = (
        F.when(rn <= big, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - big) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "o_orderkey",
        quartile.alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_in_priority"),
        F.last("o_orderkey").over(w).alias("last_in_priority"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000 OR
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag + cumulative
    sum of session-break flags — the classic composition, one shuffle on
    user_id.  The streaming twin (session_window) lives in
    streaming/windows.py (T9)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    us = ts_us("ts")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("session_end_us"),
        )
    )


@register(
    "window_cume_share",
    oracle="""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               strftime(o_orderdate, '%Y-%m-%d') AS ds,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
        FROM orders GROUP BY 1, 2
    )
    SELECT month, ds,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(SUM(rev_dec) OVER (
                    PARTITION BY month ORDER BY ds ROWS UNBOUNDED PRECEDING
                ) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY month)
                AS VARCHAR) AS DOUBLE) AS cum_share
    FROM daily
    """,
)
def window_cume_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share within each month (pacing/run-rate
    curves: 'by day 12 we had 40% of the month').  The window input is
    the DAILY ROLLUP — |days| rows, not the fact table — so the
    per-month window is over a few dozen rows regardless of corpus
    size; the heavy lifting is the map-side-combined daily aggregate.
    Running and total sums stay exact decimal until one final
    double division (the q14 ratio policy), so the shares are
    bit-identical across engines."""
    od = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    daily = od.groupBy(
        F.date_format(ts, "yyyy-MM").alias("month"),
        F.date_format(ts, "yyyy-MM-dd").alias("ds"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    w_run = (
        Window.partitionBy("month")
        .orderBy("ds")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("month")
    return daily.select(
        "month",
        "ds",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.sum("rev_dec").over(w_run).cast("double")
            / F.sum("rev_dec").over(w_all).cast("double")
        ).alias("cum_share"),
    )


@register(
    "window_gap_islands",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    ),
    islands AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM seq GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT user_id, event_type,
           CAST(MAX(run_len) AS BIGINT) AS max_run,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM islands GROUP BY user_id, event_type
    """,
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (the classic rn_all − rn_type constant-difference trick —
    streak detection, uptime/downtime segmentation, session quality).
    Both row_numbers ride ONE user-keyed shuffle (same partition key,
    different orders are sort-only); islands then reduce by the
    derived constant.  Deterministic under ties via the (ts, event_id)
    order.  Output: longest streak + number of streaks per
    (user, type)."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_all).alias("rn_all"),
        F.row_number().over(w_type).alias("rn_type"),
    )
    islands = seq.groupBy(
        "user_id", "event_type", (F.col("rn_all") - F.col("rn_type")).alias("isl")
    ).agg(F.count("*").alias("run_len"))
    return islands.groupBy("user_id", "event_type").agg(
        F.max("run_len").cast("bigint").alias("max_run"),
        F.count("*").cast("bigint").alias("n_runs"),
    )


@register(
    "window_week_over_week",
    oracle="""
    WITH weekly AS (
        SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT wk, n_orders,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(lag(rev_dec) OVER (ORDER BY wk) AS VARCHAR) AS DOUBLE)
               AS prev_revenue,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
           / CAST(CAST(lag(rev_dec) OVER (ORDER BY wk) AS VARCHAR) AS DOUBLE)
               AS wow_ratio
    FROM weekly
    """,
)
def window_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue ratio — the growth-dashboard staple.
    Like `window_cume_share`, the (global) lag window runs over the
    WEEKLY ROLLUP — |weeks| rows, a few hundred for years of data —
    never the fact table, so the single-partition window is safe at
    any corpus scale.  Both engines truncate weeks to Monday;
    exact-decimal sums, one double division for the ratio (NULL for
    the first week, matching SQL lag semantics)."""
    od = load_table(spark, sf_dir, "orders")
    wk = F.date_format(
        F.date_trunc("week", F.col("o_orderdate").cast("timestamp")), "yyyy-MM-dd"
    )
    weekly = od.groupBy(wk.alias("wk")).agg(
        F.sum(dec("o_totalprice")).alias("rev_dec"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("wk")
    return weekly.select(
        "wk",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.lag("rev_dec").over(w).cast("double").alias("prev_revenue"),
        (
            F.col("rev_dec").cast("double")
            / F.lag("rev_dec").over(w).cast("double")
        ).alias("wow_ratio"),
    )


# --- OHLC bars -------------------------------------------------------------
#
# The financial rollup every tick store exposes: per bucket, the
# Open/High/Low/Close of a value series in event-time order, plus
# volume.  Open/close are order statistics of the (date, key) order —
# both engines take them from rank-1 rows of the asc/desc per-cell
# windows (deterministic under the key tiebreak), high/low/volume are
# plain aggregates.  Cells are (month, priority): ~400 bounded
# partitions (the accepted equidepth_segment regime); real tick data
# keys by (symbol, bar) — far finer.  Integer cents end to end.


@register(
    "orders_ohlc_monthly",
    oracle="""
    WITH px AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               o_orderpriority AS prio,
               o_orderkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY strftime(o_orderdate, '%Y-%m'),
                                o_orderpriority
                   ORDER BY o_orderdate, o_orderkey) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY strftime(o_orderdate, '%Y-%m'),
                                o_orderpriority
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
        FROM orders
    )
    SELECT month, prio,
           CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM px GROUP BY month, prio
    """,
)
def orders_ohlc_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    px = o.selectExpr(
        "date_format(o_orderdate, 'yyyy-MM') AS month",
        "o_orderpriority AS prio",
        "o_orderkey",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents",
        "o_orderdate",
    )
    cell_a = Window.partitionBy("month", "prio").orderBy(
        "o_orderdate", "o_orderkey"
    )
    cell_d = Window.partitionBy("month", "prio").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        px.withColumn("rn_a", F.row_number().over(cell_a))
        .withColumn("rn_d", F.row_number().over(cell_d))
        .groupBy("month", "prio")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
            .cast("bigint")
            .alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
            .cast("bigint")
            .alias("close_cents"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )


@register(
    "window_running_distinct",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events
    ),
    firsts AS (
        SELECT *,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY us, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM o
    )
    SELECT user_id, event_id,
           CAST(SUM(is_first) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_distinct_types_so_far
    FROM firsts
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user in event-time order
    — a frame no engine supports natively (DISTINCT inside a running
    frame), rewritten as the standard two-window identity: flag each
    (user, type)'s FIRST occurrence, then running-sum the flags.  Two
    window passes over the same bounded-group partition key, one
    shuffle total (the second window reuses the first's partitioning —
    same key, Spark plans a single Exchange).  The 'how many features
    has this user touched so far' curve behind activation metrics.

    Reference parity: no window surface in the reference; SURVEY §2
    W-family extension alongside window_running_sum."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "us", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.withColumn(
            "is_first",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .withColumn(
            "n_distinct_types_so_far",
            F.sum("is_first").over(w_run).cast("bigint"),
        )
        .select("user_id", "event_id", "n_distinct_types_so_far")
    )
