"""ABC inventory classification: cumulative-revenue-share classes.

The classic Pareto/ABC analysis every supply-chain warehouse runs:
rank SKUs by revenue descending, walk the cumulative share, and class
them A (first 80% of revenue), B (next 15%), C (tail 5%).  The
statistical core is a GLOBAL PREFIX SUM in revenue order — the third
member of the two-phase family (COUNT → rank in operators/rfm.py,
MIN → skyline in operators/skyline.py, SUM → here): order-aligned
range buckets, per-bucket ROWS-frame prefix sums over the total order
(revenue, partkey), then a 64-row prefix over bucket totals broadcast
back.  One corpus shuffle, no single-partition sort.

Descending order reuses the ascending machinery algebraically:

    cum_desc(p) = total − prefix_asc_strictly_below(p)

where `strictly below` is taken in the ASC (revenue, partkey DESC)
order, whose complement is exactly the strict suffix of the DESC
(revenue desc, partkey asc) walk — no negated sort keys, no second
pass.  Class boundaries compare integers
cross-multiplied (cum·5 ≤ total·4 for 80%), so the whole query is
exact cents arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.two_phase import bucket_prefix, range_buckets
from ..registry import register

ABC_BUCKETS = 64

_CLASS = """CASE
    WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
    WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
    ELSE 'C'
END"""


@register(
    "orders_abc_classes",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem GROUP BY l_partkey
    ),
    walked AS (
        SELECT *,
               SUM(revenue_cents) OVER (
                   ORDER BY revenue_cents DESC, partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents,
               SUM(revenue_cents) OVER () AS total_cents
        FROM rev
    )
    SELECT partkey, revenue_cents, CAST(cum_cents AS BIGINT) AS cum_cents,
           CAST(CAST(cum_cents AS HUGEINT) * 1000000 // total_cents
                AS BIGINT) AS cum_share_ppm,
           {_CLASS} AS abc_class
    FROM walked
    """,
)
def orders_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("revenue_cents")
    )
    return abc_classes(rev, "revenue_cents", "partkey")


def abc_classes(rev: DataFrame, value: str, ident: str) -> DataFrame:
    """Cumulative-share ABC classes over (value desc, ident) via the
    shared two-phase engine (plans/two_phase.py) with SUM as the
    prefix aggregate; the grand total rides the bucketing broadcast."""
    b = range_buckets(
        rev, value, ABC_BUCKETS,
        extra_aggs=[F.sum(value).alias("total_cents")],
    )
    # ident DESC inside ties: "strictly after p in the DESC
    # (value desc, ident asc) walk" is exactly "strictly before p in
    # the ASC (value asc, ident DESC) order" — with ident ASC here the
    # tie rows would land on the wrong side of the complement.
    in_bucket = Window.partitionBy("bucket").orderBy(
        F.col(value), F.col(ident).desc()
    )
    local = b.withColumn(
        "below_local",
        F.coalesce(
            F.sum(value).over(
                in_bucket.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    offsets = bucket_prefix(
        b, F.sum(value), F.sum, "below_buckets", F.lit(0)
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        # cum in DESC order = total − everything strictly below in the
        # ASC (value, ident) order
        .withColumn(
            "cum_cents",
            F.col("total_cents")
            - (F.col("below_buckets") + F.col("below_local")),
        )
        .selectExpr(
            ident,
            f"{value} AS revenue_cents",
            "cum_cents",
            # decimal(38,0) carrier: cum·10⁶ exceeds int64 once total
            # revenue passes ~9·10¹² cents — the 32× probe caught the
            # bigint draft overflowing (oracle widens to HUGEINT).
            "CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000"
            " div total_cents AS BIGINT) AS cum_share_ppm",
            f"{_CLASS} AS abc_class",
        )
    )
