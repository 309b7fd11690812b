"""The two-phase bucketed-prefix engine (one implementation, four ops).

Global order statistics — row numbers, prefix sums, prefix minima —
naively need `OVER (ORDER BY ...)` with no partition, which funnels the
whole corpus through ONE task (Spark warns, and at 100 TB it simply
does not finish).  The scale-correct plan is the same for every
prefix-decomposable aggregate:

  1. **Order-aligned range buckets**: bucket i holds a contiguous value
     range, so every row in bucket i precedes every row in bucket i+1
     in the target order (ties share a bucket).  One broadcast of the
     (lo, hi) frame; the corpus shuffles once, on the bucket key.
  2. **Local phase**: the per-bucket window (row_number / running SUM /
     running MIN) — each partition sorts only its slice.
  3. **Bucket prefix**: the same aggregate over the N_BUCKETS per-bucket
     totals, as an EXCLUSIVE prefix — a window over ≤ 64 rows
     (metadata-scale, not corpus-scale) — broadcast back and combined
     with the local phase.

This module is that engine, extracted from the four operators that
each hand-rolled it (VERDICT r6 ask #5): global rownum
(plans/relational.py), exact rank for RFM quintiles (operators/rfm.py,
COUNT), ABC cumulative shares (operators/abc.py, SUM), and the Pareto
skyline sweep (operators/skyline.py, MIN).  Their oracles are plain
single-partition windows, so the refactor is certified for free by the
existing parity gates.  The equi-depth histograms are deliberately NOT
call sites: they ntile within bounded (month, segment) cells and never
need a global prefix.

Range buckets are uneven under value skew — production layouts swap in
sampled-CDF boundaries (the sources/scans.py `sink_zorder_stats_prod`
pattern) for the bucket-assignment step; the algebra below is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 64


def bucket_expr(
    value: Column, lo: Column, hi: Column, n_buckets: int
) -> Column:
    """The ONE order-aligned range-bucket rule, shared by every call
    site (range_buckets below, the zone-map frozen-bounds insert
    routing in sources/zonemap.py) and recomputed verbatim by the
    DuckDB oracles with `//`:

        least(((v - lo) * n) div (hi - lo + 1), n - 1)

    All arithmetic is bigint and the division is Spark's integral
    `div` — exact wherever (v - lo) * n fits int64 (span up to
    ~2**57 for 64 buckets; microsecond-epoch spans are ~2**51),
    unlike float `/` whose 53-bit mantissa silently mis-buckets once
    the product exceeds 2**53 — which those epoch values already do.
    Beyond the int64 domain ANSI mode fails LOUDLY with an overflow
    instead of mis-routing (golden-tested in test_plans.py); a wider
    domain would need a decimal carrier.  Monotone in `value`, so
    bucket order extends to value order; ties share a bucket."""
    span = hi.cast("bigint") - lo.cast("bigint") + F.lit(1)
    scaled = (value.cast("bigint") - lo.cast("bigint")) * F.lit(n_buckets)
    return F.least(
        F.call_function("div", scaled, span), F.lit(n_buckets - 1)
    )


def range_buckets(
    df: DataFrame,
    value: str,
    n_buckets: int = N_BUCKETS,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Phase 1: attach an order-aligned `bucket` column (0..n-1) by
    proportional position in the [lo, hi] value range.  `extra_aggs`
    ride along on the 1-row broadcast frame (e.g. a grand total) so
    callers don't re-scan for globals they need later."""
    rng = df.agg(
        F.min(value).alias("lo"), F.max(value).alias("hi"), *extra_aggs
    )
    return df.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        bucket_expr(F.col(value), F.col("lo"), F.col("hi"), n_buckets),
    )


def bucket_prefix(
    b: DataFrame,
    agg: Column,
    combine: Callable[[Column], Column],
    out: str,
    empty: Column,
) -> DataFrame:
    """Phase 3: per-bucket aggregate `agg`, then the EXCLUSIVE prefix
    under `combine` (F.sum for counts/sums, F.min for minima) over the
    bounded bucket index — `empty` fills bucket 0's empty frame.
    Returns (bucket, out), small enough to broadcast back."""
    per = b.groupBy("bucket").agg(agg.alias("_v"))
    return per.withColumn(
        out,
        F.coalesce(
            combine(F.col("_v")).over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            empty,
        ),
    ).select("bucket", out)


def two_phase_rownum(
    df: DataFrame,
    order_cols: Sequence[str],
    out: str = "rn",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Exact global ROW_NUMBER() over `order_cols` without a global
    sort.  The leading order column drives the range bucketing (ties
    stay inside one bucket, so bucket order extends to row order); the
    full column list breaks ties locally.  All input columns are
    preserved; `out` is the 1-based global row number."""
    lead = order_cols[0]
    b = range_buckets(df, lead, n_buckets)
    local = b.withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(*order_cols)
        ),
    )
    offsets = bucket_prefix(
        b, F.count(F.lit(1)), F.sum, "_off", F.lit(0)
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .withColumn(out, F.col("_off") + F.col("_lrn"))
        .drop("bucket", "lo", "hi", "_lrn", "_off")
    )
