"""RFM customer segmentation on scale-safe exact quintiles.

The quantile-cut complement to analytics.py's fixed-threshold
`orders_rfm_segments` (whose docstring defers exactly this form):
score every customer 1-5 on Recency, Frequency, and Monetary by EXACT
quintile of rank, then bucket the 3-digit RFM code into named
segments.
The statistical core is three EXACT rank-to-quintile assignments —
and a naive ``row_number() OVER (ORDER BY dim)`` funnels the whole
customer table through one partition.  Each rank runs on the shared
two-phase bucketed-prefix engine (plans/two_phase.py): order-aligned
range buckets + per-bucket row_number + a bounded prefix-sum of
bucket counts broadcast back — one corpus shuffle per dimension, no
single-partition sort.  The referee oracle uses a plain window
ROW_NUMBER, which DuckDB runs exactly.

Quintile label: q = 1 + (5·(rank−1)) div n — defined by this exact
integer formula in BOTH engines (deliberately not NTILE, whose
uneven-group convention differs subtly and adds nothing here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import ts_us
from ..plans.two_phase import two_phase_rownum
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
    """Exact global rank of (value, ident) without a global sort —
    the shared engine in plans/two_phase.py does the bucketing, the
    per-bucket row_number, and the bounded prefix-sum offsets.
    Returns ``ident``, ``out`` (rank, 1-based)."""
    return two_phase_rownum(
        df.select(value, ident), [value, ident], out=out,
        n_buckets=RFM_BUCKETS,
    ).select(ident, out)


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
