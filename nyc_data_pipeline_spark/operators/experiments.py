"""A/B experiment readout: two-proportion z-test in exact arithmetic.

The decision layer on top of product analytics (operators/analytics.py
measures funnels and retention; this module decides whether a treatment
MOVED one of those metrics).  The readout is the standard pooled
two-proportion z-test, but evaluated without a single floating-point
division so both engines agree bit-for-bit:

    z² = D²·N / (n₁·n₂·C·(N−C)),  D = c₁·n₂ − c₂·n₁,
    C = c₁+c₂, N = n₁+n₂

and `z² > z²_crit` (α = 0.05 two-sided, z²_crit = 3.8416) becomes the
cross-multiplied integer comparison

    D²·N·10⁴  >  38416·n₁·n₂·C·(N−C)

carried in decimal(38,0) / HUGEINT (D² alone reaches ~10¹⁶ at sf0.1
and the products exceed int64 — the grouped_ols carrier lesson).

Assignment must be a PURE FUNCTION of user identity (the splits.py
rule: reprocessing lands every user in the same arm forever), salted
with this module's own multiplier so it is independent of both the
sampling hash (mixing.MIX_MULT) and the split hash (splits.SPLIT_MULT)
— reusing either would correlate arm membership with corpus-sampling
or train/test decisions.

The fixture's hash assignment is independent of behavior by
construction, so both arms convert identically in expectation; to give
the detector a true positive to find, the query simulates a treatment
UPLIFT (every third treated user converts — the dq_duplicate_payments
gateway-replay convention of synthesizing the shape the operator
exists to catch) and reads out BOTH experiments: the A/A null next to
the uplifted A/B, so the significance flag is exercised in each
direction.

Scale shape: one scan of events → per-user conditional max (map-side
combined, state = |users|) → per-arm counts (2 rows) → a 2-row pivot
and pure projections.  Nothing after the first aggregate depends on
corpus size; at 100 TB this is scan throughput plus a KB of state.

Reference parity: no experimentation surface in the reference (its
dashboard reads KPIs, streamlit.py:38-55); north-star analytics
extension alongside operators/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

HASH_MOD = 1_000_000_007
AB_MULT = 3_266_489_917  # xxhash prime — distinct from MIX_MULT/SPLIT_MULT
CONV_VALUE = 150  # a purchase this large counts as conversion
Z2_CRIT_E4 = 38_416  # 1.96² · 10⁴ — α = 0.05 two-sided
UPLIFT_EVERY = 3  # simulated treatment effect: every 3rd treated user

_ARM = f"(((user_id % {HASH_MOD}) * {AB_MULT}) % {HASH_MOD}) % 2"


@register(
    "ab_test_proportions",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST((((user_id % {HASH_MOD}) * {AB_MULT})
                     % {HASH_MOD}) % 2 AS INT) AS arm,
               MAX(CASE WHEN event_type = 'purchase'
                         AND value > {CONV_VALUE} THEN 1 ELSE 0 END)
                   AS base_conv
        FROM events GROUP BY user_id
    ),
    labeled AS (
        SELECT 'aa_null' AS experiment, arm, base_conv AS conv FROM u
        UNION ALL
        SELECT 'ab_uplift' AS experiment, arm,
               CASE WHEN arm = 1 AND user_id % {UPLIFT_EVERY} = 0
                    THEN 1 ELSE base_conv END AS conv
        FROM u
    ),
    arms AS (
        SELECT experiment, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS c
        FROM labeled GROUP BY experiment, arm
    ),
    wide AS (
        SELECT experiment,
               MAX(CASE WHEN arm = 0 THEN n END) AS n_control,
               MAX(CASE WHEN arm = 0 THEN c END) AS conv_control,
               MAX(CASE WHEN arm = 1 THEN n END) AS n_treatment,
               MAX(CASE WHEN arm = 1 THEN c END) AS conv_treatment
        FROM arms GROUP BY experiment
    ),
    stat AS (
        SELECT *,
               CAST(conv_control AS HUGEINT) * n_treatment
                 - CAST(conv_treatment AS HUGEINT) * n_control AS d,
               CAST(conv_control + conv_treatment AS HUGEINT) AS big_c,
               CAST(n_control + n_treatment AS HUGEINT) AS big_n
        FROM wide
    )
    SELECT experiment, n_control, conv_control, n_treatment,
           conv_treatment,
           CAST(d AS BIGINT) AS d,
           CAST(d * d * big_n * 10000 AS VARCHAR) AS z2_lhs,
           CAST(38416 * CAST(n_control AS HUGEINT) * n_treatment
                * big_c * (big_n - big_c) AS VARCHAR) AS z2_rhs,
           d * d * big_n * 10000
             > 38416 * CAST(n_control AS HUGEINT) * n_treatment
               * big_c * (big_n - big_c) AS significant
    FROM stat
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-experiment readout rows (`aa_null`, `ab_uplift`): arm
    sizes, conversions, the difference carrier D = c₁n₂ − c₂n₁, and
    the z² comparison sides as exact decimal strings with the
    significance boolean — the A/A run referees the false-positive
    side while the simulated uplift exercises the detection side."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.selectExpr(
            "user_id",
            f"CAST({_ARM} AS INT) AS arm",
            f"CASE WHEN event_type = 'purchase' AND value > {CONV_VALUE} "
            "THEN 1 ELSE 0 END AS is_conv",
        )
        .groupBy("user_id", "arm")
        .agg(F.max("is_conv").alias("base_conv"))
    )
    labeled = u.selectExpr(
        "'aa_null' AS experiment", "arm", "base_conv AS conv"
    ).unionByName(
        u.selectExpr(
            "'ab_uplift' AS experiment",
            "arm",
            f"CASE WHEN arm = 1 AND user_id % {UPLIFT_EVERY} = 0 "
            "THEN 1 ELSE base_conv END AS conv",
        )
    )
    arms = labeled.groupBy("experiment", "arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    wide = arms.groupBy("experiment").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_control"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("conv_control"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_treatment"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("conv_treatment"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stat = wide.select(
        "*",
        (d38("conv_control") * d38("n_treatment")
         - d38("conv_treatment") * d38("n_control")).alias("d_dec"),
        (d38("conv_control") + d38("conv_treatment")).alias("big_c"),
        (d38("n_control") + d38("n_treatment")).alias("big_n"),
    )
    lhs = (
        F.col("d_dec") * F.col("d_dec") * F.col("big_n") * F.lit(10_000)
    ).cast("decimal(38,0)")
    rhs = (
        F.lit(Z2_CRIT_E4)
        * d38("n_control")
        * d38("n_treatment")
        * F.col("big_c")
        * (F.col("big_n") - F.col("big_c"))
    ).cast("decimal(38,0)")
    return stat.select(
        "experiment",
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.col("d_dec").cast("bigint").alias("d"),
        lhs.cast("string").alias("z2_lhs"),
        rhs.cast("string").alias("z2_rhs"),
        (lhs > rhs).alias("significant"),
    )
