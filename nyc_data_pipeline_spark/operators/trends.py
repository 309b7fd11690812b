"""Per-group OLS trend fitting, in two scale regimes.

The LLM-pipeline shape this demonstrates: "fit a small model per
group" — per-domain drift slopes, per-source quality trends, per-tenant
forecasts.  Two implementations, chosen by group cardinality:

- ``grouped_ols_trend`` (headline): LOW-cardinality keys (event_type,
  ~5 values) where one group is a corpus-scale fraction.  The fit is
  pure Catalyst: rank within the group via a window (Spark's external
  sort spills rather than OOMs), then ONE groupBy computing the
  sufficient statistics (n, Σx, Σy, Σxy, Σx²) in exact integer
  carriers — no group is ever materialized in memory.  This is the
  oracle's own windowed normal-equation SQL, expressed in the DSL.
- ``grouped_ols_per_user`` (U2 surface): HIGH-cardinality keys
  (user_id) where groups are small and bounded, the legitimate
  ``groupBy().applyInPandas`` regime — each group arrives as one
  Arrow-batched pandas frame, fits run vectorized-Python in parallel
  across thousands of groups.

Determinism across engines is the hard part — a float dot product sums
in engine-specific order.  Both forms therefore run entirely in exact
integer arithmetic: y in floor-micro-units, x as the 1..n rank within
the group's (ts, event_id) order, and the OLS normal equations
  slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
carried exactly (decimal(38,0) on the Spark side / Python ints in the
pandas path / HUGEINT in DuckDB) and emitted as decimal strings — the
numerator/denominator pair is the bit-exact cross-engine contract; the
float slope is one division away for any consumer.

Reference parity note: the reference computes no regressions; this is
north-star analytics surface (nearest neighbor: its pickup_hour KPI
trends, spark_consumer.py:80-104, which it recomputes per refresh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MICRO = 1_000_000


def _ols_oracle(key: str) -> str:
    """The sufficient-statistics OLS SQL, parameterized by group key."""
    return f"""
    WITH o AS (
        SELECT {key},
               CAST(floor(value * {MICRO}) AS BIGINT) AS y,
               row_number() OVER (
                   PARTITION BY {key} ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    s AS (
        SELECT {key},
               COUNT(*) AS n,
               SUM(CAST(rn AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(rn AS HUGEINT) * y) AS sxy,
               SUM(CAST(rn AS HUGEINT) * rn) AS sxx
        FROM o GROUP BY {key}
    )
    SELECT {key},
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
           CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den
    FROM s
    """


def grouped_ols_stats(events: DataFrame, key: str) -> DataFrame:
    """(key, ts, event_id, value) → one OLS fit per group, pure
    Catalyst: window rank → micro-unit ints → one map-side-combined
    groupBy over decimal(38,0) sufficient-statistic carriers.  No group
    materialization anywhere; the window's per-key sort is Spark's
    spillable external sort (for truly pathological single-key skew,
    the two-phase global-rank trick of plans/relational.order_global_
    rownum applies per key).  The per-row products widen BEFORE they
    multiply (decimal(19,0) operands — the oracle's CAST(rn AS HUGEINT)
    * y, exactly): row_number is a 32-bit int and rank grows with group
    size, so rn·rn in native arithmetic overflows int32 beyond 46 341
    rows per group — caught empirically by scripts/scale_probe.py at
    8× sf0.1."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    v = events.select(
        key,
        F.floor(F.col("value") * MICRO).cast("bigint").alias("y"),
        F.row_number().over(w).cast("decimal(19,0)").alias("rn"),
    )
    s = v.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum("rn").cast("decimal(38,0)").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("rn") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).cast("decimal(38,0)").alias("sxx"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return s.select(
        key,
        F.col("n").cast("bigint").alias("n"),
        (d("n") * d("sxy") - d("sx") * d("sy")).cast("string").alias("slope_num"),
        (d("n") * d("sxx") - d("sx") * d("sx")).cast("string").alias("slope_den"),
    )


def _fit_group_fn(key: str):
    """Build the applyInPandas fit function for a given group key."""

    def _fit_group(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        # np.floor on float64 is the same double op as math.floor per
        # element, so the micro-unit ys are bit-identical to the old
        # per-row loop.
        ys = np.floor(pdf["value"].to_numpy() * MICRO).astype("int64")
        n = len(ys)
        # Σx and Σx² over x = 1..n in closed form; Σy, Σxy exactly —
        # vectorized int64 when the worst-case bound n²·max|y| is
        # provably inside int64 (every fixture/production regime this
        # operator documents: bounded per-user groups), with the exact
        # Python-int fold kept as the any-size fallback.
        sx = n * (n + 1) // 2
        sxx = n * (n + 1) * (2 * n + 1) // 6
        ymax = int(np.abs(ys).max()) if n else 0
        if n * n * max(ymax, 1) < 2**62:
            sy = int(ys.sum())
            sxy = int(np.arange(1, n + 1, dtype="int64") @ ys)
        else:
            sy = sum(int(y) for y in ys)
            sxy = sum(i * int(y) for i, y in enumerate(ys, start=1))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n": [n],
                "slope_num": [str(num)],
                "slope_den": [str(den)],
            }
        )

    return _fit_group


def grouped_ols_pandas(events: DataFrame, key: str, key_type: str) -> DataFrame:
    """(key, ts, event_id, value) → one OLS fit per group via
    ``applyInPandas`` (U2).  Legitimate ONLY for bounded groups: each
    group is materialized as one Arrow batch in executor memory, so the
    key must be high-cardinality (user_id, doc_id, tenant) — for
    corpus-fraction keys use ``grouped_ols_stats``."""
    schema = f"{key} {key_type}, n bigint, slope_num string, slope_den string"
    return (
        events.select(key, "ts", "event_id", "value")
        .groupBy(key)
        .applyInPandas(_fit_group_fn(key), schema=schema)
    )


@register("grouped_ols_trend", oracle=_ols_oracle("event_type"))
def grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS slope of value vs within-group time rank.
    event_type is a ~5-value key — a corpus-scale fraction per group —
    so this runs the pure-Catalyst sufficient-statistics form (window
    rank + one groupBy in decimal(38,0) carriers), never materializing
    a group.  Hash-identical to the oracle's windowed normal-equation
    SQL.  The rank (not raw epoch) is the regressor so Σx² stays
    closed-form-checkable and the scale-invariant trend direction is
    what's measured."""
    return grouped_ols_stats(load_table(spark, sf_dir, "events"), "event_type")


@register("grouped_ols_per_user", oracle=_ols_oracle("user_id"))
def grouped_ols_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-USER OLS trend via ``applyInPandas`` — the U2 grouped-map
    surface on its legitimate regime: user_id is high-cardinality with
    small bounded groups (tens-to-thousands of events per user at any
    corpus size), so whole-group Arrow materialization is safe and the
    per-group Python fit parallelizes across users.  Same exact-integer
    contract and oracle shape as ``grouped_ols_trend``; only the
    execution strategy differs — that choice-by-cardinality IS the
    operator's documented contract."""
    return grouped_ols_pandas(
        load_table(spark, sf_dir, "events"), "user_id", "bigint"
    )


@register(
    "grouped_ses_forecast",
    oracle=f"""
    WITH o AS (
        SELECT user_id,
               CAST(floor(value * {MICRO}) AS BIGINT) AS y,
               epoch_us(ts) AS us, event_id
        FROM events
    ),
    g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               list(y ORDER BY us, event_id) AS ys
        FROM o GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(list_reduce(ys, (a, b) -> (a + b) // 2) AS BIGINT)
             AS level_micro
    FROM g
    """,
)
def grouped_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user simple exponential smoothing, α = 1/2: the recurrence
    s₁ = y₁, sₜ = (sₜ₋₁ + yₜ) div 2 — a stateful fold no window frame
    expresses (each step truncates, so there is no prefix-sum closed
    form like CUSUM's).  Both engines replay the IDENTICAL fold:
    Spark's `aggregate` higher-order function over the time-sorted
    value array vs DuckDB's `list_reduce` over `list(... ORDER BY)` —
    integer micro-units, so every intermediate truncation matches and
    the final smoothed level hash-checks.

    Group-materialization note (the grouped_ols_trend lesson): the
    per-key array is legitimate ONLY on high-cardinality keys with
    bounded groups (user_id here, like grouped_ols_per_user); on a
    corpus-fraction key the recurrence belongs in a stateful stream
    fold (streaming/stateful.cusum_stateful's shape) instead.  α=1/2
    keeps the arithmetic exact; production αs come from the same
    integer family (multiply-shift: s = (3·s + y) div 4 for α=1/4)."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        F.floor(F.col("value") * MICRO).cast("bigint").alias("y"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    g = o.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            "transform(array_sort(collect_list(struct(us, event_id, y))),"
            " s -> s.y)"
        ).alias("ys"),
    )
    return g.selectExpr(
        "user_id",
        "n",
        "CAST(aggregate(slice(ys, 2, CAST(size(ys) - 1 AS INT)), ys[0],"
        " (a, x) -> (a + x) div 2) AS BIGINT) AS level_micro",
    )


# --- seasonal-naive forecast accuracy (MASE-style) --------------------------


@register(
    "ts_seasonal_mase",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS eh,
               CAST(SUM(CAST(floor(value * {MICRO}) AS BIGINT)) AS BIGINT)
                   AS v
        FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    seasonal AS (
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_seasonal,
               CAST(SUM(abs(a.v - b.v)) AS BIGINT) AS sae_seasonal
        FROM h a JOIN h b
          ON b.event_type = a.event_type AND b.eh = a.eh - 24
        GROUP BY a.event_type
    ),
    naive AS (
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_naive,
               CAST(SUM(abs(a.v - b.v)) AS BIGINT) AS sae_naive
        FROM h a JOIN h b
          ON b.event_type = a.event_type AND b.eh = a.eh - 1
        GROUP BY a.event_type
    )
    SELECT s.event_type, n_seasonal, sae_seasonal, n_naive, sae_naive,
           CAST(sae_seasonal AS HUGEINT) * n_naive
             < CAST(sae_naive AS HUGEINT) * n_seasonal AS seasonal_better
    FROM seasonal s JOIN naive n ON n.event_type = s.event_type
    """,
)
def ts_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline audit per event_type: is the seasonal-naive
    forecast (same hour yesterday, m = 24) better than the plain naive
    one (previous hour)?  MASE's core ratio — mean absolute error of
    the candidate over mean absolute error of naive — decided without
    division: `sae_seasonal·n_naive < sae_naive·n_seasonal`
    cross-multiplied in HUGEINT/decimal(38,0) (the dq_psi_bins_drift
    comparison trick), with the counts and sums emitted so the real
    ratio is one division away.  This is the check a pipeline runs
    BEFORE trusting any seasonal model: if the m=24 baseline does not
    beat naive, the series has no daily cycle worth modeling.

    Alignment is by exact hour ARITHMETIC (self-join on eh−24 / eh−1),
    not row-lag: lag(24) over a sparse hourly rollup silently compares
    across gaps.  Only cells whose comparison hour exists count, and
    the two baselines are normalized by their own counts.

    Scale shape: the corpus reduces to the (type, hour) rollup
    map-side (|types|·|hours| cells); both self-joins and everything
    after run on that tiny table.  At 100 TB with per-(metric, segment)
    keys the rollup is still orders below corpus size and the joins
    key-partition cleanly."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").alias(
                "eh"
            ),
            F.floor(F.col("value") * MICRO).cast("bigint").alias("vi"),
        )
        .groupBy("event_type", "eh")
        .agg(F.sum("vi").cast("bigint").alias("v"))
    )

    def _baseline(shift: int, n_name: str, sae_name: str) -> DataFrame:
        b = h.select(
            F.col("event_type").alias("b_type"),
            (F.col("eh") + shift).alias("b_eh"),
            F.col("v").alias("b_v"),
        )
        return (
            h.join(
                b,
                (h["event_type"] == b["b_type"]) & (h["eh"] == b["b_eh"]),
            )
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias(n_name),
                F.sum(F.abs(F.col("v") - F.col("b_v")))
                .cast("bigint")
                .alias(sae_name),
            )
        )

    seasonal = _baseline(24, "n_seasonal", "sae_seasonal")
    naive = _baseline(1, "n_naive", "sae_naive")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return seasonal.join(naive, "event_type").select(
        "event_type",
        "n_seasonal",
        "sae_seasonal",
        "n_naive",
        "sae_naive",
        (d38("sae_seasonal") * d38("n_naive")
         < d38("sae_naive") * d38("n_seasonal")).alias("seasonal_better"),
    )


# --- Classical seasonal decomposition (ratio-to-moving-average) ------------
#
# ts_seasonal_mase (above) JUDGES a seasonal forecast; this produces
# the decomposition itself — the classical multiplicative
# ratio-to-moving-average method (the hand-computable ancestor of
# STL): trend = 2×12-term centered moving average of monthly revenue,
# seasonal index = per-calendar-month mean of revenue/trend ratios,
# deseasonalized = revenue / index.  The curve an ops dashboard
# overlays on raw monthly revenue.
#
# Exactness: the 2×12 MA is carried UNDIVIDED as trend24 = the sum of
# the two staggered 12-month window sums (pure integers); ratios and
# indices live in ppm via integral division.  rev·24·10⁶ brushes int64
# at sf0.1 already, so the ppm multiplies ride decimal(38,0)/HUGEINT
# carriers from the start (the ABC probe lesson, applied proactively).
#
# Scale shape: everything after the one monthly rollup aggregation
# operates on the BOUNDED month table (~80 rows at any corpus size) —
# the accepted rollup-level-global-window regime.  At 100 TB the only
# corpus-touching stage is the first groupBy.

SD_PPM = 1_000_000


@register(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(strftime(o_orderdate, '%m') AS BIGINT) AS cal_month,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1, 2
    ),
    ma AS (
        SELECT *,
               CASE WHEN ROW_NUMBER() OVER w > 6
                         AND ROW_NUMBER() OVER (w2) > 6
               THEN SUM(rev_cents) OVER
                        (w ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
                    + SUM(rev_cents) OVER
                        (w ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
               END AS trend24
        FROM monthly
        WINDOW w AS (ORDER BY month),
               w2 AS (ORDER BY month DESC)
    ),
    ratios AS (
        SELECT *,
               CASE WHEN trend24 IS NOT NULL THEN
                   CAST(CAST(rev_cents AS HUGEINT) * 24 * {SD_PPM}
                        // trend24 AS BIGINT)
               END AS ratio_ppm
        FROM ma
    ),
    idx AS (
        SELECT cal_month,
               CAST(SUM(ratio_ppm) // COUNT(ratio_ppm) AS BIGINT)
                   AS si_ppm
        FROM ratios WHERE ratio_ppm IS NOT NULL GROUP BY cal_month
    )
    SELECT r.month, r.rev_cents,
           CAST(r.trend24 AS BIGINT) AS trend24,
           r.ratio_ppm, i.si_ppm,
           CAST(CAST(r.rev_cents AS HUGEINT) * {SD_PPM} // i.si_ppm
                AS BIGINT) AS deseason_cents
    FROM ratios r JOIN idx i USING (cal_month)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue = trend × seasonal × residual, the
    ratio-to-moving-average way; all ratios in exact ppm."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.month("o_orderdate").cast("bigint").alias("cal_month"),
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("month")
    w_desc = Window.orderBy(F.col("month").desc())
    ma = monthly.withColumn(
        "trend24",
        F.when(
            (F.row_number().over(w) > 6) & (F.row_number().over(w_desc) > 6),
            F.sum("rev_cents").over(w.rowsBetween(-6, 5))
            + F.sum("rev_cents").over(w.rowsBetween(-5, 6)),
        ),
    )
    ratios = ma.withColumn(
        "ratio_ppm",
        F.expr(
            f"CASE WHEN trend24 IS NOT NULL THEN"
            f" CAST(CAST(rev_cents AS DECIMAL(38,0)) * 24 * {SD_PPM}"
            f" div trend24 AS BIGINT) END"
        ),
    )
    idx = (
        ratios.filter(F.col("ratio_ppm").isNotNull())
        .groupBy("cal_month")
        .agg(
            F.expr("CAST(SUM(ratio_ppm) div COUNT(ratio_ppm) AS BIGINT)").alias(
                "si_ppm"
            )
        )
    )
    return (
        ratios.join(F.broadcast(idx), "cal_month")
        .selectExpr(
            "month",
            "rev_cents",
            "CAST(trend24 AS BIGINT) AS trend24",
            "ratio_ppm",
            "si_ppm",
            f"CAST(CAST(rev_cents AS DECIMAL(38,0)) * {SD_PPM}"
            " div si_ppm AS BIGINT) AS deseason_cents",
        )
    )


# --- Autocorrelation function (ACF) ----------------------------------------
#
# The first diagnostic anyone runs on a time series before choosing a
# model: acf(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², lags 1..ACF_MAX_LAG,
# here over each priority's monthly-revenue series (~80 points — the
# corpus touches only the first rollup; everything after is bounded).
#
# Exactness discipline: clearing x̄ = S/n by multiplying through by n²
# makes both sides integer —
#   n²·num_k = n²·C_k − n·S·(A_k+B_k) + (n−k)·S²
#   n²·den   = n²·Q − n·S²
# with C_k = Σ x_t·x_{t+k} over the lag pairs, A_k/B_k the pairs'
# lead/lag sums, Q = Σx².  Monthly cents ~1e10 square to ~1e20 and
# n²·C_k reaches ~1e26 — int64 is gone, so every carrier is
# decimal(38,0)/HUGEINT (the ABC/seasonal lesson).  num_k can be
# NEGATIVE: the final ppm uses sign-split division so Spark's
# truncating `div` and DuckDB's flooring `//` agree (the
# emb_quantize_int8 rule).

ACF_MAX_LAG = 6


def _acf_signed_div(num: str, den: str, engine_div: str, carrier: str) -> str:
    # carrier must be the engine's true-integer wide type (DuckDB
    # HUGEINT, Spark DECIMAL(38,0)) — DuckDB's `//` over DECIMAL is not
    # the integral truncating division this identity needs (observed
    # off-by-one on negative numerators).
    scaled = f"CAST({num} AS {carrier}) * 1000000"
    return (
        f"CASE WHEN {num} >= 0 THEN CAST(({scaled}) {engine_div} {den}"
        f" AS BIGINT) ELSE -CAST((-({scaled})) {engine_div} {den}"
        f" AS BIGINT) END"
    )


@register(
    "ts_autocorrelation",
    oracle=f"""
    WITH series AS (
        SELECT o_orderpriority AS pr,
               CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT) AS midx,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1, 2
    ),
    stats AS (
        SELECT pr, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(x * x) AS HUGEINT) AS q
        FROM series GROUP BY pr
    ),
    pairs AS (
        SELECT a.pr, l.lag,
               CAST(SUM(a.x * b.x) AS HUGEINT) AS c,
               CAST(SUM(a.x) AS HUGEINT) AS sa,
               CAST(SUM(b.x) AS HUGEINT) AS sb,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM series a
        JOIN LATERAL (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag)
             l ON TRUE
        JOIN series b ON b.pr = a.pr AND b.midx = a.midx + l.lag
        GROUP BY a.pr, l.lag
    ),
    nd AS (
        SELECT p.pr, p.lag, p.n_pairs,
               s.n * s.n * p.c - s.n * s.s * (p.sa + p.sb)
                   + (s.n - p.lag) * s.s * s.s AS num,
               s.n * s.n * s.q - s.n * s.s * s.s AS den
        FROM pairs p JOIN stats s ON s.pr = p.pr
    )
    SELECT pr, CAST(lag AS BIGINT) AS lag, n_pairs,
           {_acf_signed_div('num', 'den', '//', 'HUGEINT')} AS acf_ppm
    FROM nd
    WHERE den > 0
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority ACF of monthly revenue at lags 1..{ACF_MAX_LAG},
    reported in exact ppm (decimal(38,0) carriers end-to-end)."""
    o = load_table(spark, sf_dir, "orders")
    series = (
        o.groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate)"
                " AS BIGINT)"
            ).alias("midx"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " AS DECIMAL(38,0))"
            ).alias("x")
        )
    )
    stats = series.groupBy("pr").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(x) AS DECIMAL(38,0))").alias("s"),
        F.expr("CAST(SUM(x * x) AS DECIMAL(38,0))").alias("q"),
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))
    ).alias("lag")
    a = series.select("pr", "midx", F.col("x").alias("xa")).select(
        "*", lags
    )
    b = series.select(
        F.col("pr").alias("pr_b"),
        F.col("midx").alias("midx_b"),
        F.col("x").alias("xb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("pr_b") == F.col("pr"))
            & (F.col("midx_b") == F.col("midx") + F.col("lag")),
        )
        .groupBy("pr", "lag")
        .agg(
            F.expr("CAST(SUM(xa * xb) AS DECIMAL(38,0))").alias("c"),
            F.expr("CAST(SUM(xa) AS DECIMAL(38,0))").alias("sa"),
            F.expr("CAST(SUM(xb) AS DECIMAL(38,0))").alias("sb"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    nd = pairs.join(F.broadcast(stats), "pr").selectExpr(
        "pr",
        "lag",
        "n_pairs",
        "CAST(n * n * c - n * s * (sa + sb) + (n - lag) * s * s"
        " AS DECIMAL(38,0)) AS num",
        "CAST(n * n * q - n * s * s AS DECIMAL(38,0)) AS den",
    )
    # den = n²·Σ(x−x̄)² is zero for a CONSTANT series, where acf is
    # undefined — filter rather than divide (ANSI Spark and DuckDB both
    # raise on integer division by zero; a silent NULL would be the
    # dq_benford_digits lesson repeated).
    return nd.filter(F.col("den") > 0).selectExpr(
        "pr",
        "CAST(lag AS BIGINT) AS lag",
        "n_pairs",
        f"{_acf_signed_div('num', 'den', 'div', 'DECIMAL(38,0)')} AS acf_ppm",
    )


# --- Theil-Sen robust trend ------------------------------------------------
#
# The robust complement to `grouped_ols_trend`: OLS slope is arbitrary
# under one corrupted month; the Theil-Sen estimator (median of all
# pairwise slopes) has a 29% breakdown point and is the standard
# robust trend for monitoring series.  Pairs are O(n²) PER GROUP but
# the groups are bounded month series (~80 points → 3,160 pairs), the
# accepted rollup-level regime — the corpus contributes one linear
# rollup, everything after is bounded.
#
# Exactness: the statistic is DEFINED on milli-cent/month integer
# slopes — (y2−y1)·1000 over (x2−x1) with SIGN-SPLIT division (slopes
# go negative; Spark `div` truncates, DuckDB `//` floors) — so both
# engines rank identical integers; the median is the lower order
# statistic at rank (n+1)//2 with a full (slope, t1, t2) tiebreak.
# The intercept is the median residual y·1000 − slope·x at the group
# slope, same discipline.

def _ts_sdiv(num: str, den: str, idiv: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN ({num}) * 1000 {idiv} ({den}) "
        f"ELSE -((-({num})) * 1000 {idiv} ({den})) END"
    )


@register(
    "ts_theil_sen",
    oracle=f"""
    WITH series AS (
        SELECT o_orderpriority AS pr,
               CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT) AS x,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.pr, a.x AS x1, b.x AS x2,
               {_ts_sdiv('b.y - a.y', 'b.x - a.x', '//')} AS s
        FROM series a JOIN series b ON b.pr = a.pr AND b.x > a.x
    ),
    ranked AS (
        SELECT pr, s,
               ROW_NUMBER() OVER (PARTITION BY pr
                                  ORDER BY s, x1, x2) AS rk,
               COUNT(*) OVER (PARTITION BY pr) AS np
        FROM slopes
    ),
    med AS (
        SELECT pr, CAST(MAX(np) AS BIGINT) AS n_pairs,
               CAST(MAX(CASE WHEN rk = (np + 1) // 2 THEN s END)
                    AS BIGINT) AS slope_milli
        FROM ranked GROUP BY pr
    ),
    resid AS (
        SELECT s.pr, s.x,
               s.y * 1000 - m.slope_milli * s.x AS r
        FROM series s JOIN med m ON m.pr = s.pr
    ),
    rr AS (
        SELECT pr, r,
               ROW_NUMBER() OVER (PARTITION BY pr ORDER BY r, x) AS rk,
               COUNT(*) OVER (PARTITION BY pr) AS n
        FROM resid
    )
    SELECT m.pr, CAST(MAX(rr.n) AS BIGINT) AS n_points, m.n_pairs,
           m.slope_milli,
           CAST(MAX(CASE WHEN rr.rk = (rr.n + 1) // 2 THEN rr.r END)
                AS BIGINT) AS intercept_milli
    FROM med m JOIN rr ON rr.pr = m.pr
    GROUP BY m.pr, m.n_pairs, m.slope_milli
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Theil-Sen robust trend of monthly revenue: median
    pairwise slope (milli-cents/month) + median-residual intercept,
    exact integers end-to-end over bounded month series."""
    o = load_table(spark, sf_dir, "orders")
    series = o.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
        ).alias("x"),
    ).agg(
        F.expr(
            "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        ).alias("y")
    )
    return theil_sen(series)


def theil_sen(series: DataFrame) -> DataFrame:
    """Composable core: (pr, x, y bigint) bounded series -> one robust
    fit per pr (n_points, n_pairs, slope_milli, intercept_milli)."""
    from pyspark.sql import Window

    from ..catalog import persist_scoped

    series = persist_scoped("theilsen.series", series)
    a = series.selectExpr("pr", "x AS x1", "y AS y1")
    b = series.selectExpr("pr AS pr_b", "x AS x2", "y AS y2")
    slopes = (
        a.join(b, (F.col("pr_b") == F.col("pr")) & (F.col("x2") > F.col("x1")))
        .selectExpr(
            "pr", "x1", "x2",
            f"{_ts_sdiv('y2 - y1', 'x2 - x1', 'div')} AS s",
        )
    )
    w = Window.partitionBy("pr")
    ranked = slopes.withColumn(
        "rk", F.row_number().over(w.orderBy("s", "x1", "x2"))
    ).withColumn("np", F.count("*").over(w))
    med = ranked.groupBy("pr").agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.max(
            F.when(F.col("rk") == F.expr("(np + 1) div 2"), F.col("s"))
        ).cast("bigint").alias("slope_milli"),
    )
    resid = series.join(F.broadcast(med), "pr").selectExpr(
        "pr", "x", "n_pairs", "slope_milli",
        "y * 1000 - slope_milli * x AS r",
    )
    rr = resid.withColumn(
        "rk", F.row_number().over(w.orderBy("r", "x"))
    ).withColumn("n", F.count("*").over(w))
    return rr.groupBy("pr", "n_pairs", "slope_milli").agg(
        F.max("n").cast("bigint").alias("n_points"),
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("r"))
        ).cast("bigint").alias("intercept_milli"),
    ).select(
        "pr", "n_points", "n_pairs", "slope_milli", "intercept_milli"
    )


ROLL_W = 8  # trailing window length (rows) for the rolling regression


@register(
    "window_rolling_ols",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS HUGEINT) AS x,
               CAST(floor(value * {MICRO}) AS HUGEINT) AS y
        FROM events
    ),
    w AS (
        SELECT user_id, event_id,
               COUNT(*) OVER tw AS n,
               SUM(x) OVER tw AS sx,
               SUM(y) OVER tw AS sy,
               SUM(x * y) OVER tw AS sxy,
               SUM(x * x) OVER tw AS sxx
        FROM o
        WINDOW tw AS (
            PARTITION BY user_id ORDER BY x, event_id
            ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW
        )
    )
    SELECT user_id, event_id, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
           CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den
    FROM w
    """,
)
def window_rolling_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{ROLL_W}-event OLS slope per user, exact: the four
    rolling sums (Σx, Σy, Σxy, Σx²) come from ONE row-frame window
    pass, and the slope ships as an integer rational (num, den) —
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) — in decimal(38,0)/HUGEINT
    carriers, since x is epoch-microseconds and Σx² alone is ~1e31.
    Unlike `grouped_ols_per_user` (whole-history fit via
    applyInPandas) this is the STREAMING-SHAPED form: windowed sums
    are what an incremental maintainer keeps, there is no per-group
    materialization, and the frame never exceeds {ROLL_W} rows — the
    regime split documented on grouped_ols_per_user resolved in the
    window engine's favor wherever trailing semantics suffice.
    user_id is the high-cardinality bounded-group key (the house
    window regime); rationals avoid cross-engine float division.

    Reference parity: no regression surface in the reference; extends
    the trend family (grouped_ols_trend, ts_theil_sen) with the
    rolling member.  SURVEY §2 W3 frames extension."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp"))
        .cast("decimal(38,0)")
        .alias("x"),
        F.floor(F.col("value") * MICRO).cast("decimal(38,0)").alias("y"),
    )
    return rolling_ols(o)


def rolling_ols(o: DataFrame, w: int = ROLL_W) -> DataFrame:
    """Core: (user_id, event_id, x, y) with decimal(38,0) carriers →
    per-row trailing-w rational slope (see the query docstring)."""
    tw = (
        Window.partitionBy("user_id")
        .orderBy("x", "event_id")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    sums = o.select(
        "user_id",
        "event_id",
        F.count("*").over(tw).cast("decimal(38,0)").alias("n"),
        F.sum("x").over(tw).alias("sx"),
        F.sum("y").over(tw).alias("sy"),
        F.sum(F.expr("x * y")).over(tw).alias("sxy"),
        F.sum(F.expr("x * x")).over(tw).alias("sxx"),
    )
    return sums.select(
        "user_id",
        "event_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(n * sxy - sx * sy AS STRING)").alias("slope_num"),
        F.expr("CAST(n * sxx - sx * sx AS STRING)").alias("slope_den"),
    )


@register(
    "grouped_holt_forecast",
    oracle="""
    WITH o AS (
        SELECT user_id,
               CAST(floor(value * 1000000) AS BIGINT) AS y,
               epoch_us(ts) AS us, event_id
        FROM events
    ),
    g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               list(y ORDER BY us, event_id) AS ys
        FROM o GROUP BY user_id
    ),
    folded AS (
        -- two smoothing registers packed into ONE bigint
        -- s = (l + OFF) * K + (b + OFF), OFF = 2^30, K = 2^31:
        -- duckdb 1.0's list_reduce mis-evaluates STRUCT accumulators
        -- after the first step (verified: step-2 trend register reads
        -- a stale/blended acc), while scalar accumulators fold
        -- correctly — so the oracle transports the pair through one
        -- integer.  Exact while |l|, |b| < 2^30 micro-units (fixture
        -- values are < 2^8 units); the engine side keeps the readable
        -- struct accumulator, the integer sequences are identical.
        SELECT user_id, n,
               list_reduce(
                   list_prepend(
                       CAST((ys[1] + 1073741824) * CAST(2147483648 AS BIGINT) + 1073741824
                            AS BIGINT),
                       ys[2:]
                   ),
                   (s, y) -> (
                       ((s // 2147483648 - 1073741824) + (s % 2147483648 - 1073741824) + y) // 2
                       + 1073741824
                   ) * CAST(2147483648 AS BIGINT)
                     + ((s % 2147483648 - 1073741824)
                        + (((s // 2147483648 - 1073741824) + (s % 2147483648 - 1073741824) + y) // 2
                           - (s // 2147483648 - 1073741824))) // 2 + 1073741824
               ) AS s
        FROM g
    )
    SELECT user_id, n,
           CAST(s // 2147483648 - 1073741824 AS BIGINT) AS level_micro,
           CAST(s % 2147483648 - 1073741824 AS BIGINT) AS trend_micro,
           CAST((s // 2147483648 - 1073741824) + (s % 2147483648 - 1073741824) AS BIGINT)
               AS forecast_micro
    FROM folded
    """,
)
def grouped_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt LINEAR-TREND smoothing, α = β = 1/2: the two-state
    recurrence l_t = (l_{{t-1}} + b_{{t-1}} + y_t) div 2,
    b_t = (b_{{t-1}} + (l_t − l_{{t-1}})) div 2 with l_1 = y_1, b_1 = 0
    — SES (`grouped_ses_forecast`) tracks a level only and lags any
    drifting series; the trend state closes that lag, and the one-step
    forecast is l + b.  A stateful two-register fold no window frame
    expresses; both engines replay the IDENTICAL integer sequence —
    Spark `aggregate` with a struct accumulator; DuckDB `list_reduce`
    with the pair PACKED into one bigint, because duckdb 1.0
    mis-evaluates struct accumulators after the first reduce step
    (bug isolated in the oracle's comment; single-step folds are
    fine).  The trend
    register goes NEGATIVE on declining series, so the engines'
    integer divisions must agree on negatives: Spark `div` and DuckDB
    `//` both truncate toward zero (verified -5 div 2 = -2 on both),
    which is exactly why the recurrence is written with div, never
    shift (>> floors, giving -3).  Same bounded-group regime note as
    SES."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        F.floor(F.col("value") * MICRO).cast("bigint").alias("y"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    g = o.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            "transform(array_sort(collect_list(struct(us, event_id, y))),"
            " s -> s.y)"
        ).alias("ys"),
    )
    return g.selectExpr(
        "user_id",
        "n",
        "aggregate(slice(ys, 2, CAST(size(ys) - 1 AS INT)),"
        " named_struct('l', ys[0], 'b', CAST(0 AS BIGINT)),"
        " (a, y) -> named_struct("
        "   'l', (a.l + a.b + y) div 2,"
        "   'b', (a.b + ((a.l + a.b + y) div 2 - a.l)) div 2)"
        ") AS st",
    ).selectExpr(
        "user_id",
        "n",
        "CAST(st.l AS BIGINT) AS level_micro",
        "CAST(st.b AS BIGINT) AS trend_micro",
        "CAST(st.l + st.b AS BIGINT) AS forecast_micro",
    )
