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


# --- Poisson bootstrap confidence intervals --------------------------------
#
# The z-test above answers "did the metric move"; this answers "what
# is the uncertainty band around the metric itself" — the Poisson
# bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
# massive data streams"), THE industrial bootstrap shape: classical
# resampling needs the whole dataset per replicate, but for large n a
# multinomial(n, 1/n) resample is indistinguishable from giving each
# row an independent Poisson(1) weight per replicate — and that is
# one streaming pass computing B weighted partial sums, map-side
# combined into |groups|·B tiny states.  No resample materializes.
#
# Determinism: the per-(row, replicate) weight comes from a hash
# u ∈ [0, P) cut by the FIXED integer thresholds of the Poisson(1)
# CDF (precomputed literals below, identical in both engines); the
# metric is o_totalprice in exact cents (decimal ×100), replicate
# means in milli-cents via integer division; the CI is order
# statistics over the B=64 replicate means (a bounded 64-row window
# per group).
#
# BIGINT bound: sum_wx·1000 ≈ rows·w·price_cents·10³ — safe beyond
# 10⁹ rows/group; past that, lift to decimal(38,0).

BOOT_B = 64
BOOT_P = 2_147_483_647
BOOT_A, BOOT_C = 1_804_289_383, 846_930_886  # row hash, replicate stride
# floor(P · Poisson(1) CDF at k = 0..4): P(w=0) = e^-1, etc.
BOOT_T = [790015083, 1580030167, 1975037709, 2106706890, 2139624185]
BOOT_LO, BOOT_HI = 4, 61  # ~5th / ~95th percentile of 64 replicates

_BOOT_H = (
    f"(((o_orderkey % {BOOT_P}) * {BOOT_A}"
    f" + CAST(b AS BIGINT) * {BOOT_C}) % {BOOT_P})"
)
_BOOT_W = (
    f"CASE WHEN h < {BOOT_T[0]} THEN 0 WHEN h < {BOOT_T[1]} THEN 1 "
    f"WHEN h < {BOOT_T[2]} THEN 2 WHEN h < {BOOT_T[3]} THEN 3 "
    f"WHEN h < {BOOT_T[4]} THEN 4 ELSE 5 END"
)


@register(
    "ab_bootstrap_ci",
    oracle=f"""
    WITH rows_x AS (
        SELECT o_orderpriority AS grp, o_orderkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    weighted AS (
        SELECT grp, b, {_BOOT_W} AS w, cents
        FROM (
            SELECT grp, o_orderkey, cents, b, {_BOOT_H} AS h
            FROM rows_x, LATERAL unnest(range(0, {BOOT_B})) AS r(b)
        )
    ),
    reps AS (
        SELECT grp, b,
               CAST(SUM(w * cents) * 1000 // SUM(w) AS BIGINT)
                   AS mean_milli
        FROM weighted GROUP BY grp, b HAVING SUM(w) > 0
    ),
    ranked AS (
        SELECT grp, mean_milli,
               ROW_NUMBER() OVER (PARTITION BY grp
                                  ORDER BY mean_milli, b) AS rk,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM reps
    ),
    ci AS (
        SELECT grp,
               MAX(CASE WHEN rk = LEAST({BOOT_LO}, n)
                        THEN mean_milli END) AS lo_milli,
               MAX(CASE WHEN rk = GREATEST(n - {BOOT_B - BOOT_HI}, 1)
                        THEN mean_milli END) AS hi_milli,
               COUNT(*) AS n_reps
        FROM ranked GROUP BY grp
    ),
    pt AS (
        SELECT grp, CAST(SUM(cents) * 1000 // COUNT(*) AS BIGINT)
                   AS point_milli,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM rows_x GROUP BY grp
    )
    SELECT p.grp, p.n_rows, p.point_milli, c.lo_milli, c.hi_milli,
           CAST(c.n_reps AS BIGINT) AS n_reps,
           c.lo_milli <= p.point_milli AND p.point_milli <= c.hi_milli
               AS covers_point
    FROM pt p JOIN ci c ON p.grp = c.grp
    """,
)
def ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bootstrap_ci(load_table(spark, sf_dir, "orders"))


def bootstrap_ci(orders: DataFrame) -> DataFrame:
    """Per-priority 90% CI of mean order value via B=64 deterministic
    Poisson-bootstrap replicates; the point estimate and its coverage
    flag ride along."""
    from pyspark.sql import Window

    rows_x = orders.selectExpr(
        "o_orderpriority AS grp",
        "o_orderkey",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents",
    )
    reps = (
        rows_x.select(
            "grp", "o_orderkey", "cents",
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        )
        .selectExpr("grp", "b", "cents", f"{_BOOT_H} AS h")
        .selectExpr("grp", "b", "cents", f"{_BOOT_W} AS w")
        .groupBy("grp", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .selectExpr("grp", "b", "swx * 1000 div sw AS mean_milli")
    )
    # b as tiebreak: two replicates CAN produce identical means, and an
    # un-tiebroken row_number would pick engine-dependent rows at the
    # rank-4/61 CI boundaries.  The CI ranks derive from the surviving
    # replicate count n (HAVING SUM(w) > 0 can drop a replicate for a
    # tiny group) — hard-coding 4/61 would silently NULL the hi bound
    # the moment a group degrades below 64 replicates.
    ranked = reps.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy("mean_milli", "b")
        ),
    ).withColumn("n", F.count("*").over(Window.partitionBy("grp")))
    ci = ranked.groupBy("grp").agg(
        F.max(
            F.when(
                F.col("rk") == F.least(F.lit(BOOT_LO), F.col("n")),
                F.col("mean_milli"),
            )
        ).alias("lo_milli"),
        F.max(
            F.when(
                F.col("rk")
                == F.greatest(F.col("n") - (BOOT_B - BOOT_HI), F.lit(1)),
                F.col("mean_milli"),
            )
        ).alias("hi_milli"),
        F.count("*").alias("n_reps"),
    )
    pt = rows_x.groupBy("grp").agg(
        F.expr("CAST(SUM(cents) * 1000 div COUNT(*) AS BIGINT)").alias(
            "point_milli"
        ),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    return pt.join(ci, "grp").select(
        "grp",
        "n_rows",
        "point_milli",
        "lo_milli",
        "hi_milli",
        F.col("n_reps").cast("bigint").alias("n_reps"),
        (
            (F.col("lo_milli") <= F.col("point_milli"))
            & (F.col("point_milli") <= F.col("hi_milli"))
        ).alias("covers_point"),
    )
