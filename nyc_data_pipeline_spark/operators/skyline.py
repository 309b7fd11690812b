"""Pareto skyline: the undominated frontier of a two-objective table.

"Cheapest AND fastest-delivered orders" — the skyline operator of the
OLAP literature (Börzsönyi et al. ICDE'01): keep a row iff no other
row is at least as good on both objectives and strictly better on
one.  Both objectives minimize here: price (exact cents) and delivery
latency — days from order date to the order's last line shipment,
the fixture's latency column.

The 2D sweep makes this a PREFIX-MIN problem, not a pairwise one:
processing rows by price ascending, a row is dominated iff

    min(y over x' <  x)  ≤ y      (strictly cheaper, no slower)
 or min(y over x' <= x)  <  y     (no pricier, strictly faster)

A naive `MIN(y) OVER (ORDER BY x RANGE ...)` is a single-partition
global sort; the scale form reuses the two-phase rank idea
(operators/rfm.py / plans/relational.py:484) with MIN instead of
COUNT: order-aligned range buckets, per-bucket RANGE-frame prefix
mins, then a 64-row prefix-min over bucket minima broadcast back —
one corpus shuffle, bounded single-partition work.  The oracle runs
the plain windows, which DuckDB executes exactly.

RANGE frames (not ROWS) make tied prices see each other correctly:
`RANGE < current` excludes ALL rows with equal x; `RANGE <= current`
includes them — exactly the two dominance conditions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.two_phase import bucket_prefix, range_buckets
from ..registry import register

SKY_BUCKETS = 64
_BIG = 1 << 60  # +infinity stand-in for empty prefix frames


@register(
    "orders_pareto_skyline",
    oracle="""
    WITH pts AS (
        SELECT o.o_orderkey,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)))
                    AS BIGINT) AS delivery_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    ),
    swept AS (
        SELECT *,
               MIN(delivery_days) OVER (
                   ORDER BY price_cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS min_lt,
               MIN(delivery_days) OVER (
                   ORDER BY price_cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS min_le
        FROM pts
    )
    SELECT o_orderkey, price_cents, delivery_days
    FROM swept
    WHERE NOT (COALESCE(min_lt, 1152921504606846976) <= delivery_days
               OR min_le < delivery_days)
    """,
)
def orders_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.max(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("bigint")
            .alias("delivery_days")
        )
        .selectExpr(
            "o_orderkey",
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents",
            "delivery_days",
        )
    )
    return pareto_skyline(pts, "price_cents", "delivery_days").select(
        "o_orderkey", "price_cents", "delivery_days"
    )


def pareto_skyline(pts: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``pts`` not dominated on (minimize x, minimize y),
    via the shared two-phase engine (plans/two_phase.py) with MIN as
    the prefix aggregate; the RANGE-frame lt/le local sweep is the
    skyline-specific phase 2."""
    b = range_buckets(pts, x, SKY_BUCKETS)
    in_bucket = Window.partitionBy("bucket").orderBy(x)
    local = b.withColumn(
        "loc_lt",
        F.min(y).over(in_bucket.rangeBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "loc_le",
        F.min(y).over(in_bucket.rangeBetween(Window.unboundedPreceding, 0)),
    )
    prev_mins = bucket_prefix(
        b, F.min(y), F.min, "prev_min", F.lit(_BIG)
    )
    return (
        local.join(F.broadcast(prev_mins), "bucket")
        .withColumn(
            "g_lt",
            F.least(F.coalesce("loc_lt", F.lit(_BIG)), F.col("prev_min")),
        )
        .withColumn("g_le", F.least(F.col("loc_le"), F.col("prev_min")))
        .filter(
            ~((F.col("g_lt") <= F.col(y)) | (F.col("g_le") < F.col(y)))
        )
        .drop("bucket", "lo", "hi", "loc_lt", "loc_le", "prev_min", "g_lt", "g_le")
    )
