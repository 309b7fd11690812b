"""Headline relational plans (TPC-H-shaped) over the fixture star schema.

The reference's own relational surface is single-table aggregates pushed
to Postgres (reference streamlit.py:38-49, database_handler.py:409-480);
these plans are the engine's demonstration that the same aggregate
patterns compose with multi-way joins at warehouse scale.

Scale notes (verified via .explain at sf0.1):
- Dimension sides (region/nation/customer/supplier/part) are broadcast —
  the fact-table scan never shuffles for them.
- Filters sit directly on the scans (parquet PushedFilters), so at
  100 TB the date predicates prune row groups before any compute.
- All aggregates are decimal-exact (see exprs.py) and partial-aggregated
  map-side before the single hash shuffle on the group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import davg, dec, dsum, sql_davg, sql_dsum, ts_us
from ..registry import register

# Exact-decimal revenue term used across plans: extprice * (1 - discount).
def _revenue() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


_SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM({_SQL_REVENUE} * (1 + CAST(l_tax AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary.

    Same shape as the reference's KPI aggregate (reference
    streamlit.py:38-49: COUNT/AVG/SUM over a date-filtered table) widened
    to the full Q1 aggregate set.  One scan, one shuffle (on the 6-value
    group key), map-side partial aggregation — the plan that survives
    100 TB unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(_revenue() * (F.lit(1) + dec("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS revenue,
           epoch_us(o_orderdate) AS o_orderdate_us,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-revenue top-10.

    customer is a dimension here → broadcast (no shuffle on the
    orders/lineitem side for that join); lineitem⋈orders shuffles once
    on orderkey. Top-10 runs as TakeOrderedAndProject (no global sort).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1999-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1999-01-01"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            ts_us("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation for same-nation customer/supplier pairs.

    Five dimension joins, all broadcast; the only shuffle is
    lineitem⋈orders on orderkey plus the final tiny groupBy(n_name).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate pushes to
    the parquet scan (PushedFilters), zero shuffles (single global agg).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           epoch_us(o_orderdate) AS o_orderdate_us,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold
    (HAVING over an exact-decimal sum), top-100 by order value."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            ts_us("o_orderdate").alias("o_orderdate_us"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one
    late-shipping line (correlated EXISTS — the fixture has no
    commit/receipt dates, so "late" is shipped >60 days after order).

    The correlated EXISTS rewrites to a LEFT SEMI join with a compound
    (equi + theta) condition: the equi key still drives a hash semi
    join, the date predicate evaluates per matched pair, and each order
    is emitted at most once without a distinct.  Same single
    orders⋈lineitem shuffle as Q3."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q12_shipping_delay",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                ELSE 'late' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY delay_bucket
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by shipping-delay bucket, split into
    high/low order priority via conditional sums (the fixture has no
    shipmode, so the bucket is the order→ship day delta).  One
    orders⋈lineitem shuffle, then a 3-group map-side-partial aggregate;
    the CASE chains are codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .withColumn(
            "delay_bucket",
            F.when(delay <= 30, "fast").when(delay <= 90, "normal").otherwise(
                "late"
            ),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                    THEN {_SQL_REVENUE} END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS promo_pct,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN {_SQL_REVENUE} END) AS VARCHAR) AS DOUBLE)
             AS promo_revenue,
           CAST(CAST(SUM({_SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-part share of one month's revenue.

    part is a dimension → broadcast, so the plan is scan-filter +
    broadcast join + a single global aggregate (no shuffle at all
    beyond the 1-row final).  The ratio divides two exact-decimal sums
    AFTER each converts to double, and 100*x/y associates identically
    in both engines, so the percentage is bit-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue()))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(_revenue()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        (F.lit(100) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


@register(
    "q22_idle_customers",
    oracle=f"""
    WITH pos AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
               SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * pos.n_pos > pos.s_pos
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count/balance of customers with
    above-average balance and no RECENT order (every fixture customer
    has some order, so "idle" means none since 1998 — the churned
    high-value segment a sales team actually scans for).

    Two classic rewrites in one plan: the scalar AVG subquery becomes a
    1-row broadcast, with the comparison multiplied through
    (``bal * n > sum`` instead of ``bal > sum/n``) so it stays exact
    integer/decimal math — no division, no float threshold; the NOT
    EXISTS becomes a LEFT ANTI join shuffled on custkey.  customer and
    orders each shuffle once; everything else is broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count("*").alias("n_pos"),
        F.sum(dec("c_acctbal")).alias("s_pos"),
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal") * F.col("n_pos") > F.col("s_pos"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


ROWNUM_BUCKETS = 64


@register(
    "order_global_rownum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
    FROM lineitem
    """,
)
def order_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering without a global sort bottleneck.

    A naive ``row_number() OVER (ORDER BY ...)`` moves the entire table
    through ONE partition (Spark even warns).  The scale-correct plan is
    two-phase: (1) order-aligned bucketing — every key in bucket i sorts
    before every key in bucket i+1 — with a per-bucket local
    ``row_number``; (2) a prefix-sum of the 64 bucket counts (a window
    over 64 rows — metadata-scale, not corpus-scale) broadcast back as
    per-bucket offsets.  ``rn = offset + local_rn``.  The corpus
    shuffles once, on the bucket key; the only single-partition work is
    the 64-row prefix sum.  Same technique enumerates 100 TB.
    """
    from .two_phase import two_phase_rownum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    return two_phase_rownum(
        li, ["l_orderkey", "l_linenumber"], out="rn",
        n_buckets=ROWNUM_BUCKETS,
    ).select("l_orderkey", "l_linenumber", "rn")


@register(
    "order_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
           l_returnflag
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: true top-k (ORDER BY ... LIMIT).  Catalyst plans this as
    TakeOrderedAndProject — each partition keeps a size-k heap and the
    driver merges P heaps, so cost is O(n) scan + O(P*k) merge with no
    global sort shuffle; the plan that still works when n is 100 TB.
    Tie-broken on (l_orderkey, l_linenumber) so the selected rows are a
    deterministic set for the oracle hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            "l_returnflag",
        )
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(50)
    )
