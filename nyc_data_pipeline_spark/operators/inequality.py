"""Per-segment Gini concentration index — exact, rank-based, and
computed WITHOUT a per-group global sort.

The inequality staple ("how concentrated is customer spend inside each
market segment?") needs every row's rank among its segment peers
ordered by value — on a corpus-fraction key like the 5 market
segments, a plain `row_number() OVER (PARTITION BY segment ...)`
funnels n/5 rows through single windows.  Instead the engine ranks
ONCE, globally, through the shared two-phase bucketed-prefix engine
(plans/two_phase.py) over a composite integer lead

    lead = seg_code * 2^43 + spend_cents

— segment-major, value-minor, so the global row number restricted to a
segment IS the within-segment rank after subtracting the segment's
exclusive row offset (a 5-row broadcast).  One extra aggregate, zero
per-group sorts; the 2^43 stride leaves ~8.8e12 cents of headroom per
customer, and BOTH contract edges are guarded with per-row
raise_error: cents outside [0, 2^43) (rank interleaving starts there,
far below int64 overflow) and unknown segments (code -1 would
interleave two unknowns into one silently wrong Gini).

All arithmetic is integer/decimal-exact: with within-segment ascending
ranks i over spend x (ties rank-deterministic by custkey, and the Gini
sum Σ i·x is provably tie-order-invariant since equal x share any
permutation of their rank block),

    gini_ppm = (2·Σ i·x − (n+1)·Σ x) · 1e6  div  (n · Σ x)

with Σ i·x carried in decimal(38,0)/HUGEINT (i·x alone nears int64 at
sf1 row counts).

Reference parity: no analytics beyond GROUP BY in the reference
(spark_consumer.py:61-78); extends the concentration family
(orders_abc_classes, orders_pareto_skyline — share CLASSES) with the
scalar inequality INDEX.  SURVEY §2 A-family extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.two_phase import two_phase_rownum
from ..registry import register

_STRIDE = 1 << 43
_M = 1_000_000

# the five TPC-H segments, alphabetical — one CASE text, both engines
_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_SEG_CODE = (
    "CASE "
    + " ".join(
        f"WHEN seg = '{s}' THEN {i}" for i, s in enumerate(_SEGS)
    )
    + " ELSE -1 END"
)


@register(
    "orders_gini_concentration",
    oracle=f"""
    WITH spend AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey AS k,
               CAST(SUM(floor(o.o_totalprice * 100)) AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT seg, cents,
               row_number() OVER (
                   PARTITION BY seg ORDER BY cents, k
               ) AS i
        FROM spend
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST((2 * SUM(CAST(i AS HUGEINT) * cents)
                 - (COUNT(*) + 1) * CAST(SUM(cents) AS HUGEINT))
                * {_M}
                // (CAST(COUNT(*) AS HUGEINT) * SUM(cents))
                AS BIGINT) AS gini_ppm
    FROM ranked
    GROUP BY seg
    """,
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini ppm of per-customer lifetime spend within each market
    segment, ranks from ONE composite-lead two-phase global rownum (no
    per-segment sort) — see module doc for the algebra."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    )
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
        .join(cust, "k")
    )
    return gini_by_segment(spend, _SEGS)


def gini_by_segment(spend: DataFrame, segs: list[str]) -> DataFrame:
    """Reusable core: `spend` = (k, seg, cents) with seg drawn from
    `segs` → per-seg (n_customers, sum_cents, gini_ppm); ranks via the
    composite-lead two-phase rownum (module doc)."""
    seg_code = (
        "CASE "
        + " ".join(f"WHEN seg = '{s}' THEN {i}" for i, s in enumerate(segs))
        + " ELSE -1 END"
    )
    # Loud composite-lead guards (ADVICE r8): an unknown segment maps
    # to code -1 (two unknowns would interleave into one silently
    # wrong Gini), and cents at/above the 2^43 stride (or negative)
    # interleave ranks across segments LONG before int64 overflow
    # would trip ANSI mode.  Both are contract violations of this
    # helper, so they raise per-row instead of mis-ranking — plain
    # codegen CASE, no extra pass.
    spend = spend.withColumn("seg_code", F.expr(seg_code)).withColumn(
        "lead",
        F.expr(
            "CASE WHEN seg_code < 0 THEN"
            " raise_error(concat('gini_by_segment: unknown segment ', seg))"
            f" WHEN cents >= {_STRIDE} OR cents < 0 THEN"
            " raise_error(concat('gini_by_segment: cents outside"
            f" [0, 2^43) composite-lead stride: ', CAST(cents AS STRING)))"
            f" ELSE seg_code * CAST({_STRIDE} AS BIGINT) + cents END"
        ),
    )
    ranked = two_phase_rownum(spend, ["lead", "k"], out="rn")
    offsets = (
        ranked.groupBy("seg")
        .agg(F.min("rn").alias("_first"))
        .select("seg", (F.col("_first") - 1).alias("off"))
    )
    per_seg = (
        ranked.join(F.broadcast(offsets), "seg")
        .withColumn("i", F.col("rn") - F.col("off"))
        .groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.sum(
                (F.col("i") * F.col("cents")).cast("decimal(38,0)")
            ).alias("_s1"),
        )
    )
    return per_seg.select(
        "seg",
        "n_customers",
        "sum_cents",
        F.expr(
            f"CAST((2 * _s1 - (n_customers + 1)"
            f" * CAST(sum_cents AS DECIMAL(38,0))) * {_M}"
            f" div (CAST(n_customers AS DECIMAL(38,0)) * sum_cents)"
            f" AS BIGINT)"
        ).alias("gini_ppm"),
    )
