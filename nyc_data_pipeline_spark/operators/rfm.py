"""RFM customer segmentation on scale-safe exact quintiles.

The quantile-cut complement to analytics.py's fixed-threshold
`orders_rfm_segments` (whose docstring defers exactly this form):
score every customer 1-5 on Recency, Frequency, and Monetary by EXACT
quintile of rank, then bucket the 3-digit RFM code into named
segments.
The statistical core is three EXACT rank-to-quintile assignments —
and a naive ``row_number() OVER (ORDER BY dim)`` funnels the whole
customer table through one partition.  This module generalizes the
two-phase global-rownum technique (plans/relational.py:484 — the
order_global_rownum lesson) into a reusable ``two_phase_rank``:

  1. bucket by value RANGE (order-aligned: every value in bucket i
     sorts before bucket i+1; equal values share a bucket), local
     row_number per bucket;
  2. prefix-sum the 64 bucket counts (a bounded 64-row window),
     broadcast offsets back; global rank = offset + local rank.

One corpus shuffle per dimension, no single-partition sort.  Range
buckets are uneven under skew — production swaps in sampled quantile
boundaries (the sink_zorder_stats_prod pattern); the referee oracle
uses a plain window ROW_NUMBER, which DuckDB runs exactly.

Quintile label: q = 1 + (5·(rank−1)) div n — defined by this exact
integer formula in BOTH engines (deliberately not NTILE, whose
uneven-group convention differs subtly and adds nothing here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import ts_us
from ..registry import register

RFM_BUCKETS = 64

_SEGMENT = """CASE
    WHEN r_q >= 4 AND f_q >= 4 AND m_q >= 4 THEN 'champion'
    WHEN r_q <= 2 AND m_q >= 4 THEN 'at_risk_big_spender'
    WHEN r_q >= 4 AND f_q <= 2 THEN 'promising_new'
    WHEN r_q <= 2 AND f_q <= 2 THEN 'hibernating'
    ELSE 'core'
END"""


def two_phase_rank(
    df: DataFrame, value: str, ident: str, out: str
) -> DataFrame:
    """Exact dense global rank of (value, ident) without a global sort:
    order-aligned range buckets + per-bucket row_number + broadcast
    prefix-sum offsets.  ``df`` must have columns ``value``/``ident``;
    returns ``ident``, ``out`` (rank, 1-based)."""
    rng = df.agg(
        F.min(value).alias("lo"), F.max(value).alias("hi")
    )
    b = df.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        F.least(
            (
                (F.col(value) - F.col("lo")).cast("bigint")
                * RFM_BUCKETS
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("bigint"),
            F.lit(RFM_BUCKETS - 1),
        ),
    )
    local = b.withColumn(
        "local_rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(value, ident)
        ),
    )
    offsets = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "offset",
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("bucket", F.coalesce("offset", F.lit(0)).alias("offset"))
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        ident, (F.col("offset") + F.col("local_rn")).alias(out)
    )


def _quintile(rank: str, n: str) -> str:
    return f"CAST(1 + (5 * ({rank} - 1)) div {n} AS BIGINT)"


@register(
    "orders_rfm_quintiles",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey AS custkey,
               epoch_us(MAX(o_orderdate)) AS recency_us,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY recency_us, custkey) AS r_rn,
               ROW_NUMBER() OVER (ORDER BY frequency, custkey) AS f_rn,
               ROW_NUMBER() OVER (ORDER BY monetary_cents, custkey) AS m_rn,
               COUNT(*) OVER () AS n
        FROM per_cust
    ),
    scored AS (
        SELECT custkey, frequency, monetary_cents,
               CAST(1 + (5 * (r_rn - 1)) // n AS BIGINT) AS r_q,
               CAST(1 + (5 * (f_rn - 1)) // n AS BIGINT) AS f_q,
               CAST(1 + (5 * (m_rn - 1)) // n AS BIGINT) AS m_q
        FROM ranked
    )
    SELECT custkey, frequency, monetary_cents, r_q, f_q, m_q,
           CAST(100 * r_q + 10 * f_q + m_q AS BIGINT) AS rfm_code,
           {_SEGMENT} AS segment
    FROM scored
    """,
)
def orders_rfm_quintiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, sf_dir, "orders"))


def rfm_segments(orders: DataFrame) -> DataFrame:
    """Per-customer exact RFM quintiles + named segment, all three
    ranks via the two-phase (bucketed) global rank."""
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        ts_us(F.max("o_orderdate")).alias("recency_us"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    n1 = per_cust.agg(F.count("*").alias("n"))
    ranks = (
        two_phase_rank(per_cust, "recency_us", "custkey", "r_rn")
        .join(two_phase_rank(per_cust, "frequency", "custkey", "f_rn"), "custkey")
        .join(
            two_phase_rank(per_cust, "monetary_cents", "custkey", "m_rn"),
            "custkey",
        )
    )
    return (
        per_cust.join(ranks, "custkey")
        .crossJoin(F.broadcast(n1))
        .selectExpr(
            "custkey",
            "frequency",
            "monetary_cents",
            f"{_quintile('r_rn', 'n')} AS r_q",
            f"{_quintile('f_rn', 'n')} AS f_q",
            f"{_quintile('m_rn', 'n')} AS m_q",
        )
        .selectExpr(
            "custkey",
            "frequency",
            "monetary_cents",
            "r_q",
            "f_q",
            "m_q",
            "CAST(100 * r_q + 10 * f_q + m_q AS BIGINT) AS rfm_code",
            f"{_SEGMENT} AS segment",
        )
    )
