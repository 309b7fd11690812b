"""Join operators J1-J7.

The reference implements no joins at all — vendor/category breakdowns
are denormalized into pivoted count columns (reference
database_handler.py:124-128), which caps its query surface at one
table.  The engine supplies the full join algebra, each shape chosen
for its 100 TB plan:

- equi-joins: Catalyst picks sort-merge vs shuffled-hash; both sides
  shuffle on the key only when neither fits the broadcast threshold;
- dimension joins: explicit `F.broadcast` — zero shuffle on the fact
  side, the single most important join decision at scale;
- semi/anti: EXISTS/NOT EXISTS without materializing the right side's
  payload columns;
- range join: broadcast-nested-loop against a tiny literal dim (never
  NLJ two big sides — bucketize first if both are large);
- as-of join: Spark has no native primitive (J7).  Implemented as
  union + partitioned window scan — one shuffle on the key, linear in
  rows, no per-group pandas and no range explosion.  DuckDB's native
  ASOF JOIN referees the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import dsum, sql_dsum, ts_us
from ..registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: list[str],
    strict: bool = False,
) -> DataFrame:
    """Generic as-of join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` (< if ``strict``) and equal key.

    Union + window implementation: tag both sides, sort within key by
    timestamp, and carry the last-seen right payload forward with
    ``last(..., ignorenulls)``.  Cost: one hash shuffle on ``key`` and a
    per-partition sort — the same complexity as a sort-merge join, with
    no risk of the quadratic blow-up a naive range-join rewrite has.
    Right rows sort before left rows at equal timestamps (non-strict).
    """
    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in carry])
    side_order = 1 if not strict else -1
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        F.lit(None).cast("long").alias("__rowid"),
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(side_order).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.monotonically_increasing_id().alias("__rowid"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__rowid").isNotNull())
    )
    return matched.select(
        F.col("__k").alias(key),
        F.col("__ts").alias(left_ts),
        F.col("__match.__rts").alias(f"asof_{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in carry],
    )


@register(
    "join_inner_shuffle",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-join with no hints: Catalyst is free to pick
    broadcast/SMJ/SHJ by size (at 100 TB with a big customer table this
    becomes a co-partitioned shuffle join on custkey)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast join: the canonical dim⋈dim — at scale the small
    side ships to every executor, no shuffle of the large side."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left outer: customers with zero orders survive with count 0
    (COUNT over the nullable right key)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 full outer join (nation ⟗ supplier)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left semi == EXISTS: right side never contributes columns, so
    Spark only shuffles its join key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left anti == NOT EXISTS (customers who never ordered)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus, COUNT(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r_name, s.o_orderstatus
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 cross join — only ever sane when one side is tiny; here it is
    the 5x3 dimension product."""
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "join_range_tiers",
    oracle=f"""
    SELECT tier, COUNT(*) AS n, {sql_dsum('value')} AS total_value
    FROM events
    JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
                 (150.0, 1e18, 'high')) AS t(lo, hi, tier)
      ON value >= lo AND value < hi
    GROUP BY tier
    """,
)
def join_range_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 non-equi (range) join: fact rows against value tiers.  The
    tier table broadcasts, so the physical plan is
    BroadcastNestedLoopJoin with the fact side streamed once — the only
    safe NLJ shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e18, "high")],
        "lo double, hi double, tier string",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (ev.value >= tiers.lo) & (ev.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@register(
    "join_click_unattributed",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS click_ts_us
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase'
            AND p.user_id = c.user_id
            AND p.ts >= c.ts
            AND p.ts <= c.ts + INTERVAL 1 HOUR
      )
    """,
)
def join_click_unattributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+J5 combined: LEFT ANTI with a range predicate — clicks with
    NO purchase by the same user within the following hour (the
    complement of ``join_stream_stream``'s attribution join; funnels
    report exactly this leak).  The anti join keys on user_id with the
    time-band as a residual condition, so it shuffles like an equi
    join — never a cartesian — and at scale both sides partition by
    user_id once."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["p_ts"] >= clicks["ts"])
        & (purchases["p_ts"] <= clicks["ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(purchases, cond, "left_anti").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts_us("ts").alias("click_ts_us"),
    )


def _purchase_signup_asof(ev: DataFrame) -> DataFrame:
    """Union+window as-of: each purchase matched to the same user's most
    recent signup at-or-before it (one per-key sort, no n×m range
    join)."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")

    p = purchases.select(
        F.col("user_id").alias("__k"),
        F.col("ts").alias("__ts"),
        F.lit(1).alias("__side"),
        F.col("event_id"),
    )
    s = signups.select(
        F.col("user_id").alias("__k"),
        F.col("ts").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("event_id"),
    )
    # Signup rows sort before purchase rows at equal ts (side 0 < 1), so
    # the window's last-seen signup implements ts_signup <= ts_purchase.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signup_ts = F.when(F.col("__side") == 0, F.col("__ts"))
    return (
        p.unionByName(s)
        .withColumn("signup_ts", F.last(signup_ts, ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .filter(F.col("signup_ts").isNotNull())
        .select(
            F.col("event_id"),
            F.col("__k").alias("user_id"),
            F.unix_micros(F.col("__ts").cast("timestamp")).alias("purchase_us"),
            F.unix_micros(F.col("signup_ts").cast("timestamp")).alias("signup_us"),
        )
    )


@register(
    "join_asof_events",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(s.ts) AS signup_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join: each purchase matched to the same user's most
    recent signup at-or-before it.  Union+window implementation (see
    _purchase_signup_asof); DuckDB's native ASOF JOIN is the oracle.
    ASOF is inner-flavored: purchases with no prior signup drop out.
    """
    return _purchase_signup_asof(load_table(spark, sf_dir, "events"))


ASOF_TOLERANCE_US = 24 * 3600 * 1_000_000  # 24 hours


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT * FROM (
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS purchase_us,
               epoch_us(s.ts) AS signup_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    )
    WHERE purchase_us - signup_us <= {ASOF_TOLERANCE_US}
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join with tolerance (pandas merge_asof semantics): the
    match must be the most recent signup AND within 24 h — a stale match
    outside the window is dropped, not replaced by an older one.  Same
    single-sort plan as join_asof_events plus one codegen'd filter."""
    return _purchase_signup_asof(load_table(spark, sf_dir, "events")).filter(
        F.col("purchase_us") - F.col("signup_us") <= ASOF_TOLERANCE_US
    )


@register(
    "join_date_dim",
    oracle=f"""
    SELECT CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           strftime(o_orderdate, '%w') IN ('0', '6') AS is_weekend,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def join_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension + broadcast join — the
    fiscal-rollup pattern without a physical date table: the dim is
    built IN-PLAN (min/max order date → explode(sequence)), enriched
    with quarter/weekend attributes, and broadcast onto the fact scan.
    The oracle computes the same rollup straight off the date column,
    so the hash match certifies the generated dim covers every fact
    date (nothing dropped or duplicated by the join).  At 100 TB the
    dim is ~10^4 rows for 30 years — always a broadcast, never a
    shuffle; calendar attributes (fiscal weeks, holidays) extend the
    dim, not the fact scan."""
    od = load_table(spark, sf_dir, "orders")
    d = F.to_date(F.col("o_orderdate"))
    dim = (
        od.agg(F.min(d).alias("lo"), F.max(d).alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("cal_d"))
        .select(
            "cal_d",
            F.quarter("cal_d").cast("int").alias("qtr"),
            F.dayofweek("cal_d").isin(1, 7).alias("is_weekend"),
        )
    )
    return (
        od.join(F.broadcast(dim), d == F.col("cal_d"))
        .groupBy("qtr", "is_weekend")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


DIV_BRAND = "Brand#19"
DIV_SIZE = 1


@register(
    "join_relational_division",
    oracle=f"""
    WITH target AS (
        SELECT p_partkey FROM part
        WHERE p_brand = '{DIV_BRAND}' AND p_size = {DIV_SIZE}
    ),
    cover AS (
        SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_covered
        FROM lineitem JOIN target ON l_partkey = p_partkey
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(n_covered AS BIGINT) AS n_covered
    FROM cover JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_covered = (SELECT COUNT(*) FROM target)
    """,
)
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION ("FOR ALL"): suppliers that have shipped
    EVERY {DIV_BRAND} size-{DIV_SIZE} part.  Division has no direct
    operator in any SQL engine; the scalable rewrite is
    count-matching — semi-join the fact to the divisor set, count
    distinct covered keys per candidate, keep candidates whose count
    equals the divisor cardinality (a 1-row broadcast).  One shuffle
    keyed on suppkey; the divisor and its count both broadcast.  The
    double-NOT-EXISTS textbook form is the oracle-side semantics this
    must (and does) match."""
    pt = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sp = load_table(spark, sf_dir, "supplier")
    target = pt.where(
        (F.col("p_brand") == DIV_BRAND) & (F.col("p_size") == DIV_SIZE)
    ).select("p_partkey")
    n_target = target.agg(F.count("*").alias("n_target"))
    cover = (
        li.join(F.broadcast(target), li["l_partkey"] == target["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_covered"))
    )
    return (
        cover.crossJoin(F.broadcast(n_target))
        .where(F.col("n_covered") == F.col("n_target"))
        .join(sp, F.col("l_suppkey") == sp["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("n_covered").cast("bigint").alias("n_covered"))
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH u AS (
        SELECT user_id AS k, ts, 1 AS side, event_id
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, 0, NULL
        FROM events WHERE event_type = 'signup'
    ),
    w AS (
        SELECT k, ts, side, event_id,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY k ORDER BY ts, side
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS b_ts,
               first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY k ORDER BY ts, side
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS f_ts
        FROM u
    )
    SELECT event_id, k AS user_id, epoch_us(ts) AS purchase_us,
           epoch_us(CASE WHEN f_ts IS NULL THEN b_ts
                         WHEN b_ts IS NULL THEN f_ts
                         WHEN ts - b_ts <= f_ts - ts THEN b_ts
                         ELSE f_ts END) AS signup_us,
           CASE WHEN f_ts IS NULL THEN 'backward'
                WHEN b_ts IS NULL THEN 'forward'
                WHEN ts - b_ts <= f_ts - ts THEN 'backward'
                ELSE 'forward' END AS direction
    FROM w
    WHERE side = 1 AND (b_ts IS NOT NULL OR f_ts IS NOT NULL)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join, NEAREST flavor (pandas merge_asof
    direction='nearest'): each purchase matched to the same user's
    closest signup in EITHER time direction, ties to the earlier one —
    the sensor-alignment / nearest-reading semantics the backward-only
    as-of can't express.  Same union+single-sort shape as
    `join_asof_events`: both the last-preceding and first-following
    signup come from ONE window sort (two frames over the identical
    (user, ts, side) ordering — no second Exchange, no n×m range
    join); the nearest pick is then a codegen'd CASE on the two
    microsecond gaps.  `direction` is emitted so consumers can audit
    which side won."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__k"),
        F.col("ts").alias("__ts"),
        F.lit(1).alias("__side"),
        "event_id",
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("__k"),
        F.col("ts").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("event_id"),
    )
    base = Window.partitionBy("__k").orderBy("__ts", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    sig = F.when(F.col("__side") == 0, F.col("__ts"))
    u = (
        p.unionByName(s)
        .withColumn("b_ts", F.last(sig, ignorenulls=True).over(wb))
        .withColumn("f_ts", F.first(sig, ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
        .filter(F.col("b_ts").isNotNull() | F.col("f_ts").isNotNull())
    )
    ts_u = F.unix_micros(F.col("__ts").cast("timestamp"))
    b_u = F.unix_micros(F.col("b_ts").cast("timestamp"))
    f_u = F.unix_micros(F.col("f_ts").cast("timestamp"))
    back_wins = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (ts_u - b_u <= f_u - ts_u)
    )
    return u.select(
        "event_id",
        F.col("__k").alias("user_id"),
        ts_u.alias("purchase_us"),
        F.when(back_wins, b_u).otherwise(f_u).alias("signup_us"),
        F.when(back_wins, "backward").otherwise("forward").alias("direction"),
    )


# --- SCD2 point-in-time join ----------------------------------------------

SCD2_T1 = 100_000_000  # cents: tier 1 at 1M cumulative spend
SCD2_T2 = 300_000_000  # cents: tier 2 at 3M


@register(
    "join_scd2_pit",
    oracle=f"""
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    tiered AS (
        SELECT *,
               CASE WHEN cum_before < {SCD2_T1} THEN 0
                    WHEN cum_before < {SCD2_T2} THEN 1
                    ELSE 2 END AS tier
        FROM (
            SELECT *,
                   COALESCE(SUM(cents) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM seq
        )
    ),
    dim AS (
        SELECT o_custkey, tier,
               o_orderdate AS vf_date, o_orderkey AS vf_seq
        FROM (
            SELECT *, LAG(tier) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ) AS pt
            FROM tiered
        )
        WHERE pt IS NULL OR pt <> tier
    ),
    u AS (
        SELECT o_custkey AS ck, vf_date AS d, vf_seq AS s,
               0 AS kind, tier, CAST(NULL AS BIGINT) AS ok
        FROM dim
        UNION ALL
        SELECT o_custkey, o_orderdate, o_orderkey, 1,
               CAST(NULL AS INTEGER), o_orderkey
        FROM seq
    ),
    f AS (
        SELECT *, last_value(tier IGNORE NULLS) OVER (
                   PARTITION BY ck ORDER BY d, s, kind
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pit_tier
        FROM u
    )
    SELECT ok AS o_orderkey, ck AS o_custkey,
           CAST(pit_tier AS INTEGER) AS tier
    FROM f WHERE kind = 1
    """,
)
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 point-in-time join: a versioned dimension (customer
    spend tier, version rows created when cumulative spend crosses the
    1M/3M thresholds — valid_from = the crossing order, open-ended
    valid_to) joined to the fact stream AS OF each fact's position, so
    every order sees the tier that was current when it was placed —
    never a later version (the lookback-bias bug PIT joins exist to
    prevent in feature stores and financial reporting).

    Spark-first: the naive PIT join is a range join on
    (key, valid_from <= t < valid_to) — quadratic per hot key.  Here
    dim-version rows and facts UNION into one stream, sorted per
    customer by (date, seq, kind) with version rows first at ties, and
    the current version forward-fills via last(ignorenulls) — one
    partitioned window sort, the same algebra as join_asof_events.
    The cumulative-spend tiers are exact integer cents, so both
    engines derive the identical dimension table AND the identical
    PIT assignment.  The direct windowed formulation (tier from
    cum_before, no join at all) is the pytest cross-check
    (tests/test_r5b_ops.py) — two formulations, one truth."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cum_before = F.coalesce(
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    tiered = seq.withColumn(
        "tier",
        F.when(cum_before < SCD2_T1, 0)
        .when(cum_before < SCD2_T2, 1)
        .otherwise(2),
    )
    dim = (
        tiered.withColumn("pt", F.lag("tier").over(w))
        .where(F.col("pt").isNull() | (F.col("pt") != F.col("tier")))
        .select(
            "o_custkey",
            "tier",
            F.col("o_orderdate").alias("vf_date"),
            F.col("o_orderkey").alias("vf_seq"),
        )
    )
    u = dim.select(
        F.col("o_custkey").alias("ck"),
        F.col("vf_date").alias("d"),
        F.col("vf_seq").alias("s"),
        F.lit(0).alias("kind"),
        "tier",
        F.lit(None).cast("bigint").alias("ok"),
    ).unionByName(
        seq.select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("s"),
            F.lit(1).alias("kind"),
            F.lit(None).cast("int").alias("tier"),
            F.col("o_orderkey").alias("ok"),
        )
    )
    wu = (
        Window.partitionBy("ck")
        .orderBy("d", "s", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("pit_tier", F.last("tier", ignorenulls=True).over(wu))
        .where(F.col("kind") == 1)
        .select(
            F.col("ok").alias("o_orderkey"),
            F.col("ck").alias("o_custkey"),
            F.col("pit_tier").cast("int").alias("tier"),
        )
    )
