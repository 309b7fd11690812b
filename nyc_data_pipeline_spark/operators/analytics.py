"""Product-analytics operators over the events stream: funnel and
retention cohorts.

The reference is an analytics dashboard (KPIs, hourly rollups); these
are the two classic dashboard queries one step up from rollups —
conversion funnels and cohort retention.  Both are pure
aggregate/join shapes (no per-row state), so they scale as ordinary
shuffles keyed on user_id / cohort date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

FUNNEL = ["view", "click", "purchase"]


@register(
    "events_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS f_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS f_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS f_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(f_view) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN f_click > f_view THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click_after_view,
           CAST(SUM(CASE WHEN f_purchase > f_click AND f_click > f_view
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full_funnel,
           CAST(SUM(CASE WHEN f_click > f_view THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(f_view) AS view_to_click,
           CAST(SUM(CASE WHEN f_purchase > f_click AND f_click > f_view
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(f_view) AS view_to_purchase
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view → click → purchase on FIRST-occurrence
    ordering: a user advances a step if their first click follows
    their first view, and their first purchase follows that click.
    (First-occurrence funnels are the standard dashboard definition;
    strict-sequence within-session funnels are the sessionize operator
    composed with this one.)

    Scale shape: one user-keyed aggregate building the three first
    timestamps in a single pass (conditional MIN — no joins between
    event-type subsets), then a single-row rollup.  NULL comparisons
    do the step gating: f_click > f_view is NULL-false when either is
    absent, identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"f_{t}")
            for t in FUNNEL
        ]
    )
    clicked = F.when(F.col("f_click") > F.col("f_view"), 1).otherwise(0)
    purchased = F.when(
        (F.col("f_purchase") > F.col("f_click"))
        & (F.col("f_click") > F.col("f_view")),
        1,
    ).otherwise(0)
    return firsts.agg(
        F.count("f_view").alias("n_view"),
        F.sum(clicked).cast("bigint").alias("n_click_after_view"),
        F.sum(purchased).cast("bigint").alias("n_full_funnel"),
        (F.sum(clicked).cast("double") / F.count("f_view")).alias(
            "view_to_click"
        ),
        (F.sum(purchased).cast("double") / F.count("f_view")).alias(
            "view_to_purchase"
        ),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH cohort AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
    )
    SELECT epoch_us(CAST(cohort_date AS TIMESTAMP)) AS cohort_date_us,
           CAST(datediff('day', cohort_date, active_date) AS INTEGER)
               AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active JOIN cohort USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen date; for each
    (cohort, day-offset) the count of cohort members active that day
    — the dashboard retention triangle.

    Scale shape: per-user first-date aggregate, per-(user, day)
    distinct, one join on user_id (both sides already clustered on it
    — AQE plans the join off the aggregates' shuffles), then a tiny
    (cohort, offset) rollup."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("active_date")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.unix_micros(F.col("cohort_date").cast("timestamp")).alias(
                "cohort_date_us"
            ),
            F.datediff("active_date", "cohort_date").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_date_us", "day_offset")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive event types per
    user — the journey-flow matrix behind sankey/path dashboards (the
    step past the funnel's fixed view→click→purchase ordering).

    Ordering within a user is (ts, event_id) so ties are deterministic
    in both engines.  Scale shape: one user-keyed window (same shuffle
    key as every other per-user operator, so AQE can reuse the
    exchange), then a tiny (type, type) rollup — no self-join of the
    event stream against itself."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )


PATHS_TOP_K = 10


@register(
    "events_topk_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT {PATHS_TOP_K}
    """,
)
def events_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} most common 3-step event-type journeys (the sankey /
    'common paths' dashboard one step past the pairwise transition
    matrix).  Sliding trigrams come from two lead() calls on the same
    user-keyed window — the identical shuffle key as sessionize /
    transition-matrix, so AQE reuses the exchange when composed; the
    path rollup is a tiny (|types|^3-bounded) aggregate and the top-k
    is TakeOrderedAndProject (per-partition heaps, no global sort).
    Tiebreak (n DESC, path ASC) makes the cut deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.where(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(PATHS_TOP_K)
    )


# --- anomaly detection (exact-integer z-score) -----------------------------

ANOM_K = 2  # flag hours beyond K standard deviations


@register(
    "events_hourly_anomaly",
    oracle=f"""
    WITH c AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM c GROUP BY event_type
    )
    SELECT c.event_type, epoch_us(h) AS hour_us, c AS n_events,
           (n * c - s) * (n * c - s) > {ANOM_K * ANOM_K} * (n * q - s * s)
               AS is_anomaly
    FROM c JOIN s ON c.event_type = s.event_type
    """,
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly flags per (event_type, hour) WITHOUT a single
    float: an hourly count c is anomalous iff |c - mean| > K·stddev,
    which multiplied through by n² becomes the pure-integer predicate

        (n·c − S)² > K²·(n·Q − S²),   S = Σc, Q = Σc²

    so the flag is bit-exact across engines, partitionings, and runs —
    no float stddev, no epsilon.  Scale shape: hourly rollup is one
    map-side-combined shuffle; the per-type (n, S, Q) stats table is
    |event_type| rows and broadcasts back onto the rollup.  (K=2;
    magnitudes stay far inside int64 even at 10^6-event hours.)"""
    from ..exprs import ts_us

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
    ).agg(F.count("*").alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    dev = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return j.select(
        "event_type",
        ts_us("h").alias("hour_us"),
        F.col("c").cast("bigint").alias("n_events"),
        (dev * dev > ANOM_K * ANOM_K * var_n2).alias("is_anomaly"),
    )


# --- RFM segmentation ------------------------------------------------------

RFM_ASOF = "2001-09-01"       # scoring date (fixture orders end 2001-08)
RFM_R_DAYS = 365              # "recent" = ordered within a year of as-of
RFM_F_MIN = 10                # "frequent" = at least 10 lifetime orders
RFM_M_MIN = 1_500_000.0       # "big spender" = lifetime revenue over this


@register(
    "orders_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         TIMESTAMP '{RFM_ASOF}') AS r_days,
               COUNT(*) AS f,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS m_dec
        FROM orders GROUP BY o_custkey
    ),
    seg AS (
        SELECT (r_days <= {RFM_R_DAYS}) AS recent,
               (f >= {RFM_F_MIN}) AS frequent,
               (m_dec >= {RFM_M_MIN}) AS big_spender,
               r_days, f, m_dec
        FROM per_cust
    )
    SELECT recent, frequent, big_spender,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r_days) AS BIGINT) AS sum_recency_days,
           CAST(SUM(f) AS BIGINT) AS sum_orders,
           CAST(CAST(SUM(m_dec) AS VARCHAR) AS DOUBLE) AS sum_revenue
    FROM seg GROUP BY 1, 2, 3
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) —
    the classic warehouse scoring query — with FIXED business
    thresholds rather than quantile cuts: threshold flags need no
    global sort or single-partition ntile, so the whole query is one
    customer-keyed aggregate plus an 8-group rollup at any scale
    (quantile-based tiers would use broadcast approx-percentile cuts;
    the fixed-cut form is the plan to certify).  Recency in integer
    days from a pinned as-of date, monetary as exact decimal — the
    usual cross-engine-exact carriers."""
    od = load_table(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("r_days"),
        F.count("*").alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("m_dec"),
    )
    seg = per_cust.select(
        (F.col("r_days") <= RFM_R_DAYS).alias("recent"),
        (F.col("f") >= RFM_F_MIN).alias("frequent"),
        (F.col("m_dec") >= RFM_M_MIN).alias("big_spender"),
        "r_days",
        "f",
        "m_dec",
    )
    return seg.groupBy("recent", "frequent", "big_spender").agg(
        F.count("*").alias("n_customers"),
        F.sum("r_days").cast("bigint").alias("sum_recency_days"),
        F.sum("f").cast("bigint").alias("sum_orders"),
        F.sum("m_dec").cast("double").alias("sum_revenue"),
    )


# --- decayed engagement value (exact power-of-two halflife) ----------------

DECAY_ASOF = "2024-02-01"
DECAY_HALFLIFE_DAYS = 7
DECAY_MAX_SHIFT = 40  # beyond 40 half-lives the contribution is 0 anyway


@register(
    "events_value_halflife",
    oracle=f"""
    WITH v AS (
        SELECT user_id,
               CAST(floor(value * 1000000) AS BIGINT) AS vm,
               greatest(least(date_diff('day', CAST(ts AS DATE),
                                        DATE '{DECAY_ASOF}')
                     // {DECAY_HALFLIFE_DAYS}, {DECAY_MAX_SHIFT}), 0) AS shift
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(vm // CAST(pow(2, shift) AS BIGINT)) AS BIGINT)
               AS decayed_micro
    FROM v GROUP BY user_id
    """,
)
def events_value_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed engagement value per user (recency-
    weighted LTV / engagement scoring) with an EXACT decay: one
    halving per {DECAY_HALFLIFE_DAYS}-day half-life, applied as
    integer division of micro-units by 2^shift — powers of two are
    exact in IEEE doubles up to 2^62 and the division operands are
    non-negative, so floor == truncate and both engines agree
    bit-for-bit (the float pow(0.5, age) formulation would not).
    One map-side-combined shuffle on user_id."""
    from ..exprs import ts_us  # noqa: F401  (module convention)

    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1_000_000).cast("bigint")
    age_days = F.datediff(
        F.lit(DECAY_ASOF).cast("date"), F.col("ts").cast("date")
    )
    # Clamp below at 0 (mirroring the MAX_SHIFT cap above): an event
    # dated after DECAY_ASOF would otherwise yield a negative shift,
    # where pow(2, shift) truncates to 0 in the bigint cast and the
    # division diverges across engines.  Post-as-of events decay not at
    # all rather than exploding.
    shift = F.greatest(
        F.least(
            F.floor(age_days / DECAY_HALFLIFE_DAYS).cast("int"),
            F.lit(DECAY_MAX_SHIFT),
        ),
        F.lit(0),
    )
    pow2 = F.pow(F.lit(2.0), shift).cast("bigint")
    v = ev.select(
        "user_id", vm.alias("vm"), pow2.alias("p2")
    )
    return v.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("vm div p2")).cast("bigint").alias("decayed_micro"),
    )


# --- revenue concentration (Pareto top-k share) ----------------------------

PARETO_TOP_K = 100


@register(
    "orders_pareto_topk_share",
    oracle=f"""
    WITH pc AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    top AS (
        SELECT rev FROM pc ORDER BY rev DESC, o_custkey LIMIT {PARETO_TOP_K}
    )
    SELECT CAST((SELECT COUNT(*) FROM top) AS BIGINT) AS n_top,
           CAST(CAST((SELECT SUM(rev) FROM top) AS VARCHAR) AS DOUBLE)
               AS top_revenue,
           CAST(CAST((SELECT SUM(rev) FROM pc) AS VARCHAR) AS DOUBLE)
               AS total_revenue,
           CAST(CAST((SELECT SUM(rev) FROM top) AS VARCHAR) AS DOUBLE)
           / CAST(CAST((SELECT SUM(rev) FROM pc) AS VARCHAR) AS DOUBLE)
               AS top_share
    """,
)
def orders_pareto_topk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: what share of total revenue the top
    {PARETO_TOP_K} customers carry (the 80/20 dashboard number).
    The top-k cut is TakeOrderedAndProject over the per-customer
    ROLLUP (never a global sort of the fact table), with ties broken
    by customer key on exact decimals so the cut is deterministic;
    both sums stay decimal until the final share division."""
    od = load_table(spark, sf_dir, "orders")
    pc = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev")
    )
    top = (
        pc.orderBy(F.desc("rev"), F.asc("o_custkey"))
        .limit(PARETO_TOP_K)
        .agg(F.count("*").alias("n_top"), F.sum("rev").alias("top_dec"))
    )
    total = pc.agg(F.sum("rev").alias("total_dec"))
    return top.crossJoin(F.broadcast(total)).select(
        F.col("n_top").cast("bigint").alias("n_top"),
        F.col("top_dec").cast("double").alias("top_revenue"),
        F.col("total_dec").cast("double").alias("total_revenue"),
        (F.col("top_dec").cast("double") / F.col("total_dec").cast("double")).alias(
            "top_share"
        ),
    )


# --- multi-touch attribution (even credit, exact integers) -----------------

ATTR_WINDOW_HOURS = 24


@register(
    "events_attribution_even",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(floor(value * 1000000) AS BIGINT) AS vm
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS c_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.p_id, p.user_id, p.vm, c.c_ts,
               COUNT(*) OVER (PARTITION BY p.p_id) AS n_clicks
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.c_ts <= p.p_ts
                     AND c.c_ts > p.p_ts - INTERVAL {ATTR_WINDOW_HOURS} HOUR
    )
    SELECT user_id, strftime(c_ts, '%Y-%m-%d') AS click_day,
           CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
           CAST(SUM(vm // n_clicks) AS BIGINT) AS credit_micro
    FROM j GROUP BY 1, 2
    """,
)
def events_attribution_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-credit multi-touch attribution: each purchase's value is
    split equally across that user's clicks in the preceding
    {ATTR_WINDOW_HOURS} h, then credited to the clicks' calendar days —
    the marketing-spend view (`join_click_unattributed` is the
    complementary anti-join).  Credit is vm div n_clicks in floor-micro
    units — pure integer division, bit-exact across engines (the float
    value/n form would drift in summation order).

    Scale shape: a user-keyed equi-join with a time-range residual
    (clicks and purchases of one user meet only each other — never a
    cross-user pair), one per-purchase count window that reuses the
    join's user-partitioning, and a map-side-combined rollup on
    (user, day).  Per-user event counts are bounded, so the join output
    is linear in purchases."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1_000_000).cast("bigint")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        vm.alias("vm"),
    )
    c = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (c["c_ts"] <= p["p_ts"])
        & (
            c["c_ts"]
            > p["p_ts"] - F.expr(f"INTERVAL {ATTR_WINDOW_HOURS} HOURS")
        ),
    ).select(p["p_id"], p["user_id"], p["vm"], c["c_ts"])
    from pyspark.sql import Window

    n_clicks = F.count("*").over(Window.partitionBy("p_id"))
    return (
        j.withColumn("n_clicks", n_clicks)
        .groupBy(
            "user_id",
            F.col("c_ts").cast("date").cast("string").alias("click_day"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_credited_clicks"),
            F.sum(F.expr("vm div n_clicks")).cast("bigint").alias("credit_micro"),
        )
    )


# --- growth accounting: weekly user lifecycle ------------------------------

WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "events_user_lifecycle",
    oracle=f"""
    WITH uw AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        FROM events
    ),
    lagged AS (
        SELECT user_id, wk,
               lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
        FROM uw
    )
    SELECT epoch_us(wk) AS week_us,
           CASE WHEN prev_wk IS NULL THEN 'new'
                WHEN epoch_us(wk) - epoch_us(prev_wk) = {WEEK_US}
                    THEN 'retained'
                ELSE 'resurrected' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lagged GROUP BY 1, 2
    """,
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: classify each active (user, week) as `new`
    (first week ever), `retained` (also active the immediately
    preceding week), or `resurrected` (returning after a gap) — the
    standard weekly-active decomposition every growth dashboard runs.
    Week identity travels as epoch-microseconds so the lag comparison
    is exact integer arithmetic in both engines (both truncate weeks
    to Monday).

    Scale shape: distinct (user, week) first (one map-side-combined
    shuffle that also bounds state to weeks-per-user), a user-keyed
    lag window reusing that partitioning, then a tiny (week, status)
    rollup."""
    from pyspark.sql import Window

    from ..exprs import ts_us

    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    lagged = uw.withColumn("prev_wk", F.lag("wk").over(w))
    status = (
        F.when(F.col("prev_wk").isNull(), "new")
        .when(ts_us("wk") - ts_us("prev_wk") == WEEK_US, "retained")
        .otherwise("resurrected")
    )
    return lagged.groupBy(
        ts_us("wk").alias("week_us"), status.alias("status")
    ).agg(F.count("*").cast("bigint").alias("n_users"))


# --- market-basket co-occurrence (bounded pair expansion) ------------------

BASKET_MIN_SUPPORT = 3


@register(
    "orders_basket_pairs",
    oracle=f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    """,
)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: support counts for part pairs bought
    together in one order, kept at support ≥ {BASKET_MIN_SUPPORT} (the
    association-rule candidate generation step).

    Scale shape: the pair expansion is a SELF-join on the order key, so
    pairs form only WITHIN an order — per-order line counts are bounded
    (≤7 in TPC-H-shaped data, ≤ basket size in retail), making the
    blow-up a constant factor C(items,2) per order, linear in orders
    overall.  This is the disciplined version of the quadratic trap the
    dedup family documents: the join key bounds the pair space by
    construction.  One shuffle on orderkey (both sides co-partitioned;
    bucketed layouts make it Exchange-free), then a map-side-combined
    count on the pair."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )


# --- strict in-session sequence funnel (MATCH_RECOGNIZE shape) -------------

SESSION_GAP_MIN = 30


@register(
    "sessions_strict_funnel",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                    > {SESSION_GAP_MIN} * 60 * 1000000
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    s AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS sess_no
        FROM g
    )
    SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
           string_agg(event_type, '>' ORDER BY ts, event_id)
               LIKE '%view%click%purchase%' AS converted
    FROM s GROUP BY user_id, sess_no
    """,
)
def sessions_strict_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ORDERED funnel within a session — the MATCH_RECOGNIZE /
    sequence-pattern shape: sessionize by {SESSION_GAP_MIN}-minute
    inactivity gaps, materialize each session's exact event sequence,
    and test view→click→purchase as an ordered SUBSEQUENCE (LIKE with
    %-gaps; event-type names are substring-free of each other so the
    pattern is exact).  `events_funnel` answers "did the user ever
    convert"; this answers "did they convert within one sitting, in
    order" — the stricter product metric.

    Scale shape: one user-keyed window (gap flags + running session
    number ride the same sort), then one (user, session) aggregate;
    session sequences are bounded by session length, never by corpus
    size.  The sequence string is built by sorting each session's
    struct array — deterministic total order (ts, event_id), identical
    to the oracle's ordered string_agg."""
    from pyspark.sql import Window

    from ..exprs import ts_us

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = ts_us("ts") - ts_us(F.lag("ts").over(w))
    is_new = (
        F.lag("ts").over(w).isNull()
        | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000)
    ).cast("int")
    s = ev.withColumn("is_new", is_new).withColumn(
        "sess_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        s.groupBy("user_id", F.col("sess_no").cast("bigint").alias("sess_no"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min(ts_us("ts")).alias("session_start_us"),
            seq.alias("seq"),
        )
        .withColumn("converted", F.col("seq").like("%view%click%purchase%"))
    )


# --- CUSUM drift detection -------------------------------------------------

CUSUM_MICRO = 1_000_000
# Alarm when the one-sided CUSUM statistic exceeds H micro-units: the
# classic (k, h) tuning — k absorbs in-control noise, h sets the
# detection delay / false-alarm trade-off.
CUSUM_H = 400 * CUSUM_MICRO


@register(
    "events_cusum_drift",
    oracle=f"""
    WITH t AS (
        SELECT event_type,
               CAST(SUM(CAST(floor(value * {CUSUM_MICRO}) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS target
        FROM events GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, e.event_id, e.ts,
               CAST(floor(e.value * {CUSUM_MICRO}) AS BIGINT) - t.target AS dev,
               t.target
        FROM events e JOIN t USING (event_type)
    ),
    s1 AS (
        SELECT event_type, event_id, ts,
               CAST(SUM(dev) OVER w AS BIGINT) AS run
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, event_id, run,
               CAST(MIN(run) OVER w AS BIGINT) AS run_min,
               CAST(MAX(run) OVER w AS BIGINT) AS run_max
        FROM s1
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id,
           run - LEAST(run_min, 0) AS cusum_pos,
           GREATEST(run_max, 0) - run AS cusum_neg,
           (run - LEAST(run_min, 0)) > {CUSUM_H} AS alarm_up,
           (GREATEST(run_max, 0) - run) > {CUSUM_H} AS alarm_down
    FROM s
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point statistics per event type: the classic
    recursive form s_t = max(0, s_(t-1) + x_t - target) is not a
    window function, but its closed form IS — s_t = S_t - min(0,
    min_(j<=t) S_j) over the deviation prefix sums S (and the downward
    side symmetrically from the running max).  Two stacked windows on
    one (event_type)-keyed sort, all integer micro-units, so both
    engines agree bit-for-bit; `alarm_*` fire when sustained drift
    accumulates past H.  This is the drift detector a training-data
    pipeline runs over quality/score streams to catch distribution
    shift; the streaming twin is the same algebra per micro-batch with
    (run, run_min, run_max) carried as mergeable state.

    Scale: one shuffle on the monitored key; the window sort spills;
    nothing global.  REFEREE FORM: event_type is a 5-value key, so
    each partition sorts ~20% of the corpus — the production
    registration is `events_cusum_sharded` (below), the same algebra
    on a realistic-cardinality composite key.  The per-type target
    here is the series' own mean (self-referential for the demo);
    production pins target/k from a reference period."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    y = F.floor(F.col("value") * CUSUM_MICRO).cast("bigint")
    # Integer mean (sum div n): float AVG loses exactness past 2^53
    # total micro-units — real at 100 TB, so never introduced.
    t = (
        ev.select("event_type", y.alias("y"))
        .groupBy("event_type")
        .agg(F.expr("sum(y) div count(1)").alias("target"))
    )
    d = ev.join(t, "event_type").select(
        "event_type", "event_id", "ts", (y - F.col("target")).alias("dev")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s1 = d.select(
        "event_type", "event_id", "ts", F.sum("dev").over(w).alias("run")
    )
    s = s1.select(
        "event_type",
        "event_id",
        "run",
        F.min("run").over(w).alias("run_min"),
        F.max("run").over(w).alias("run_max"),
    )
    pos = F.col("run") - F.least(F.col("run_min"), F.lit(0))
    neg = F.greatest(F.col("run_max"), F.lit(0)) - F.col("run")
    return s.select(
        "event_type",
        "event_id",
        pos.cast("bigint").alias("cusum_pos"),
        neg.cast("bigint").alias("cusum_neg"),
        (pos > CUSUM_H).alias("alarm_up"),
        (neg > CUSUM_H).alias("alarm_down"),
    )


CUSUM_SHARDS = 64  # monitored-series fan-out per event type


@register(
    "events_cusum_sharded",
    oracle=f"""
    WITH e0 AS (
        SELECT event_type, user_id % {CUSUM_SHARDS} AS shard, event_id, ts,
               CAST(floor(value * {CUSUM_MICRO}) AS BIGINT) AS y
        FROM events
    ),
    t AS (
        SELECT event_type, shard,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS target
        FROM e0 GROUP BY event_type, shard
    ),
    d AS (
        SELECT e.event_type, e.shard, e.event_id, e.ts,
               e.y - t.target AS dev
        FROM e0 e JOIN t USING (event_type, shard)
    ),
    s1 AS (
        SELECT event_type, shard, event_id, ts,
               CAST(SUM(dev) OVER w AS BIGINT) AS run
        FROM d
        WINDOW w AS (PARTITION BY event_type, shard ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, shard, event_id, run,
               CAST(MIN(run) OVER w AS BIGINT) AS run_min,
               CAST(MAX(run) OVER w AS BIGINT) AS run_max
        FROM s1
        WINDOW w AS (PARTITION BY event_type, shard ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(shard AS BIGINT) AS shard, event_id,
           run - LEAST(run_min, 0) AS cusum_pos,
           GREATEST(run_max, 0) - run AS cusum_neg,
           (run - LEAST(run_min, 0)) > {CUSUM_H} AS alarm_up,
           (GREATEST(run_max, 0) - run) > {CUSUM_H} AS alarm_down
    FROM s
    """,
)
def events_cusum_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION CUSUM drift monitor: the identical closed-form
    prefix-sum algebra as `events_cusum_drift`, keyed on the composite
    (event_type, user-shard) — the per-series granularity a real
    monitor runs at (per metric per segment / per source).  With
    {CUSUM_SHARDS} shards per type the largest window partition holds
    ~1/(5·{CUSUM_SHARDS}) of the corpus instead of ~20%, so the
    per-key sort is bounded at any scale; the 5-key exact form stays
    registered as the referee.  All integer micro-units; per-series
    self-referential target as in the referee."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e0 = ev.select(
        "event_type",
        (F.col("user_id") % CUSUM_SHARDS).alias("shard"),
        "event_id",
        "ts",
        F.floor(F.col("value") * CUSUM_MICRO).cast("bigint").alias("y"),
    )
    t = e0.groupBy("event_type", "shard").agg(
        F.expr("sum(y) div count(1)").alias("target")
    )
    d = e0.join(t, ["event_type", "shard"]).select(
        "event_type",
        "shard",
        "event_id",
        "ts",
        (F.col("y") - F.col("target")).alias("dev"),
    )
    w = (
        Window.partitionBy("event_type", "shard")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s1 = d.select(
        "event_type", "shard", "event_id", "ts",
        F.sum("dev").over(w).alias("run"),
    )
    s = s1.select(
        "event_type",
        "shard",
        "event_id",
        "run",
        F.min("run").over(w).alias("run_min"),
        F.max("run").over(w).alias("run_max"),
    )
    pos = F.col("run") - F.least(F.col("run_min"), F.lit(0))
    neg = F.greatest(F.col("run_max"), F.lit(0)) - F.col("run")
    return s.select(
        "event_type",
        F.col("shard").cast("bigint").alias("shard"),
        "event_id",
        pos.cast("bigint").alias("cusum_pos"),
        neg.cast("bigint").alias("cusum_neg"),
        (pos > CUSUM_H).alias("alarm_up"),
        (neg > CUSUM_H).alias("alarm_down"),
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
                   + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1)
                 AS cohort_m
        FROM orders GROUP BY o_custkey
    ),
    facts AS (
        SELECT f.cohort_m,
               CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
                   + CAST(strftime(o.o_orderdate, '%m') AS BIGINT) - 1
                   - f.cohort_m AS age_m,
               o.o_custkey,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    cells AS (
        SELECT cohort_m, age_m,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM facts GROUP BY 1, 2
    )
    SELECT cohort_m, age_m, n_active, rev_cents,
           CAST(SUM(rev_cents) OVER (
               PARTITION BY cohort_m ORDER BY age_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_rev_cents
    FROM cells
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by
    first-purchase month (cohort), revenue accumulated by months-since
    -first-purchase (age) — the (cohort x age) triangle finance reads
    LTV trajectories from, complementing `retention_cohorts`' activity
    counts with exact money.  Months are (year*12 + month) integers
    (no date arithmetic ambiguity across engines); revenue is integer
    cents, cumulative via one per-cohort window over the
    already-aggregated triangle (|cohorts| x |ages| rows, not facts).
    Scale: the first-order table is one groupBy on customer, the join
    is key-co-partitioned, the triangle rollup is map-side combined —
    three linear shuffles, cumulative window on KB-scale state."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    month = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("bigint")
    firsts = (
        od.select("o_custkey", month.alias("m"))
        .groupBy("o_custkey")
        .agg(F.min("m").alias("cohort_m"))
    )
    facts = od.join(firsts, "o_custkey").select(
        "cohort_m",
        (month - F.col("cohort_m")).alias("age_m"),
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cells = facts.groupBy("cohort_m", "age_m").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(w).cast("bigint")
    )


MAU_WINDOW = 28  # trailing days for the MAU denominator


@register(
    "events_dau_mau",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    support AS (
        SELECT DISTINCT user_id, day + off AS wday
        FROM ud CROSS JOIN (
            SELECT unnest(generate_series(0, {MAU_WINDOW - 1})) AS off
        )
    ),
    mau AS (
        SELECT wday AS day, CAST(COUNT(*) AS BIGINT) AS mau
        FROM support GROUP BY wday
    )
    SELECT d.day, d.dau, m.mau
    FROM dau d JOIN mau m ON m.day = d.day
    """,
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-{MAU_WINDOW}-day MAU per active day — the
    stickiness ratio (DAU/MAU) every engagement dashboard tracks.
    Trailing-window DISTINCT does not decompose (day-level distinct
    counts don't sum), so the scalable form explodes each (user, day)
    activity fact into the {MAU_WINDOW} window-days it supports, then
    counts distinct support rows per window-day: fan-out is a bounded
    ×{MAU_WINDOW} of the (user, day) DISTINCT table (itself ≪ events),
    all equi-keyed shuffles — never a per-day rescan of history, never
    a quadratic self-join.  Exact counts; the ratio is one division
    away.  (The HLL alternative — per-day sketches unioned over the
    window, approx_hll_user_reach's machinery — trades this fan-out
    for KB merges when {MAU_WINDOW}× is too much.)  Output: only days
    with activity (inner join: DAU>0)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias(
            "day"
        ),
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    support = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (MAU_WINDOW - 1))
            ).alias("wday"),
        )
        .distinct()
    )
    mau = support.groupBy(F.col("wday").alias("day")).agg(
        F.count("*").cast("bigint").alias("mau")
    )
    return dau.join(mau, "day").select("day", "dau", "mau")


@register(
    "orders_open_backlog",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
                 AS open_day,
               CAST(MAX(epoch_us(l.l_shipdate)) // 86400000000 AS BIGINT)
                 AS close_day
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT open_day AS day, 1 AS d FROM spans
        UNION ALL
        SELECT GREATEST(close_day, open_day) + 1 AS day, -1 FROM spans
    ),
    daily AS (
        SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM deltas GROUP BY day
    )
    SELECT day, delta,
           CAST(SUM(delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_orders
    FROM daily
    """,
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time open-order backlog by day — the sweep-line
    (event-sourcing balance) pattern: each order contributes +1 at its
    open day and −1 the day after its last item ships; the running sum
    over the collapsed per-day deltas IS the backlog curve.  This is
    how inventory/obligation balances are computed without a per-day
    rescan: O(2·orders) delta events → one per-day rollup (map-side
    combined) → one cumulative window over the TINY day table (orders
    spanning years still collapse to a few thousand day rows, so the
    unpartitioned window is KB-scale state, not a corpus sort —
    same argument as window_cume_share's month spine).  Orders whose
    items never ship (no lineitem rows) are excluded by the inner
    join — deliberately: their close is unknown, and the reference KPI
    would count them separately.  A close BEFORE the open (the
    synthetic fixture ships some items before the order date — a real
    data-quality condition the dq suite would flag) clamps to
    same-day-close so every +1 is matched by a −1 and the balance
    conserves to zero."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    day = lambda c: F.expr(  # noqa: E731
        f"unix_micros(CAST({c} AS TIMESTAMP)) div 86400000000"
    )
    spans = (
        od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .groupBy(od["o_orderkey"], "o_orderdate")
        .agg(F.max(day("l_shipdate")).alias("close_day"))
        .select(
            day("o_orderdate").alias("open_day"), F.col("close_day")
        )
    )
    deltas = spans.select(
        F.col("open_day").alias("day"), F.lit(1).alias("d")
    ).unionByName(
        spans.select(
            (F.greatest("close_day", "open_day") + 1).alias("day"),
            F.lit(-1).alias("d"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("d").cast("bigint").alias("delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "delta", F.sum("delta").over(w).cast("bigint").alias("open_orders")
    )


@register(
    "events_survival_curve",
    oracle="""
    WITH spans AS (
        SELECT user_id,
               CAST(MAX(epoch_us(ts)) // 86400000000
                    - MIN(epoch_us(ts)) // 86400000000 AS BIGINT) AS span_d
        FROM events GROUP BY user_id
    ),
    dist AS (
        SELECT span_d, CAST(COUNT(*) AS BIGINT) AS n_at
        FROM spans GROUP BY span_d
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM spans)
    SELECT d.span_d AS day_k, d.n_at,
           CAST(SUM(d2.n_at) AS BIGINT) AS n_surviving,
           t.n_users
    FROM dist d
    JOIN dist d2 ON d2.span_d >= d.span_d
    CROSS JOIN tot t
    GROUP BY d.span_d, d.n_at, t.n_users
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime survival curve: for each observed activity span k
    (days between a user's first and last event), how many users
    "survive" at least k days — the Kaplan-Meier-shaped retention
    curve (no censoring model: the fixture window is closed; with live
    data the last-seen-recently cohort would be censored).
    `n_surviving / n_users` at each k is the curve; counts stay exact.

    Scale shape: the per-user span is one user-keyed aggregate; the
    span DISTRIBUTION is |distinct spans| rows (≤ observation window
    in days — tiny), so the suffix sum runs as a window/self-join over
    KB-scale state, never over users.  The oracle spells the suffix
    sum as a theta self-join of the tiny distribution; the Spark side
    uses the descending cumulative window — same algebra."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    spans = ev.groupBy("user_id").agg(
        (F.max(day) - F.min(day)).cast("bigint").alias("span_d")
    )
    dist = spans.groupBy("span_d").agg(
        F.count("*").cast("bigint").alias("n_at")
    )
    w = Window.orderBy(F.desc("span_d")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = spans.agg(F.count("*").cast("bigint").alias("n_users"))
    return (
        dist.withColumn("n_surviving", F.sum("n_at").over(w).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("span_d").alias("day_k"),
            "n_at",
            "n_surviving",
            "n_users",
        )
    )


# --- Sliding-window distinct users (exact, bounded-day regime) -------------
#
# "Distinct users in the trailing 7 days, per day" — the rolling-reach
# metric every product dashboard carries.  COUNT(DISTINCT) cannot ride
# a sliding window frame (distinct state is not subtractable), so the
# warehouse-exact form is: reduce the corpus ONCE to the distinct
# (day, user) grid (linear, map-side combined), then range-join that
# grid against the bounded day spine — each grid row lands in at most
# 7 windows, so the join output is 7x the grid, never user x day.  The
# day spine is rollup-bounded and broadcasts; the corpus never joins
# itself.  (The sketch path for unbounded windows is
# approx_hll_user_reach's mergeable-HLL union; this is the exact
# referee shape.)

_US_PER_DAY_A = 86_400_000_000
SLIDE_DAYS = 7


@register(
    "events_sliding_distinct_users",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // {_US_PER_DAY_A} AS day, user_id
        FROM events
    ),
    spine AS (SELECT DISTINCT day FROM du)
    SELECT spine.day AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_users_7d
    FROM spine
    JOIN du ON du.day BETWEEN spine.day - {SLIDE_DAYS - 1} AND spine.day
    GROUP BY spine.day
    """,
)
def events_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact trailing-{SLIDE_DAYS}-day distinct users per day: one
    distinct (day, user) reduction of the corpus, then a broadcast
    range join against the bounded day spine (each grid row matches at
    most {SLIDE_DAYS} spine days — linear output, no self-join)."""
    return sliding_distinct_users(load_table(spark, sf_dir, "events"))


def sliding_distinct_users(ev: DataFrame) -> DataFrame:
    """The composable core (also driven by scripts/scale_probe.py)."""
    du = ev.select(
        F.expr(f"unix_micros(ts) div {_US_PER_DAY_A}").alias("day"),
        "user_id",
    ).distinct()
    spine = du.select("day").distinct().withColumnRenamed("day", "sday")
    return (
        du.join(
            F.broadcast(spine),
            F.col("day").between(
                F.col("sday") - (SLIDE_DAYS - 1), F.col("sday")
            ),
        )
        .groupBy(F.col("sday").alias("day"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users_7d"))
    )


# --- Activity bitmaps: bit_or masks + popcount rollup ----------------------
#
# The retention-bitmap pattern (ClickHouse/Druid territory): each
# user-month compresses to ONE integer whose bit d-1 marks activity on
# day-of-month d — set-of-days state becomes a 4-byte bitwise OR that
# partial-aggregates map-side and merges associatively at any fan-in.
# Downstream counts active days with a popcount instead of re-touching
# events.  Output here is the (month, active_days) histogram — built
# from the masks alone, certifying bit_or AND bit_count cross-engine.

@register(
    "events_activity_bitmask",
    oracle="""
    WITH masks AS (
        SELECT strftime(ts, '%Y-%m') AS month, user_id,
               bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS mask
        FROM events
        GROUP BY 1, 2
    )
    SELECT month,
           CAST(bit_count(mask) AS INTEGER) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM masks
    GROUP BY month, bit_count(mask)
    """,
)
def events_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, month) day-of-month activity bitmask via bit_or of
    1 << (day-1), rolled up to the (month, popcount) user histogram —
    distinct-day state as one associative integer OR, the form that
    partial-aggregates at 100 TB without collect_set memory."""
    return activity_bitmask_hist(load_table(spark, sf_dir, "events"))


def activity_bitmask_hist(ev: DataFrame) -> DataFrame:
    """The composable core (also driven by scripts/scale_probe.py)."""
    masks = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"), "user_id"
    ).agg(
        F.expr("bit_or(CAST(1 AS BIGINT) << (day(ts) - 1))").alias("mask")
    )
    return (
        masks.select("month", F.expr("bit_count(mask)").alias("active_days"))
        .groupBy("month", F.col("active_days").cast("int").alias("active_days"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .select("month", "active_days", "n_users")
    )
