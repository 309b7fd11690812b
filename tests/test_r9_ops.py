"""Round-9 contract tests: ANSI try_* escape hatches on the full
bigint domain, and the composite-lead Gini guards."""

import pytest

import pyspark.sql.functions as F

from nyc_data_pipeline_spark.operators.inequality import gini_by_segment


def test_try_divide_negative_divisor_contract(spark):
    """Spark's try_divide returns NULL only at exactly 0; for negative
    divisors both engines must agree on the (truncated) quotient — the
    oracle guard is `<> 0`, not `> 0` (ADVICE r8).  Pin the truncation
    semantics on constructed negatives: Spark `div` and DuckDB `//`
    both truncate toward zero."""
    import duckdb

    ids = [-7, -3, -1, 0, 1, 3, 7]
    df = spark.createDataFrame([(i,) for i in ids], "event_id bigint")
    got = {
        r.event_id: (r.try_div, r.div_zero_guard)
        for r in df.selectExpr(
            "event_id",
            "try_divide(9223372036854775807, event_id) AS raw",
            "try_divide(100, event_id) AS raw2",
        )
        .selectExpr(
            "event_id",
            "CASE WHEN raw IS NOT NULL"
            " THEN 9223372036854775807 div event_id END AS try_div",
            "CASE WHEN raw2 IS NOT NULL"
            " THEN 100 div event_id END AS div_zero_guard",
        )
        .collect()
    }
    want = {
        i: (
            duckdb.sql(
                f"SELECT CASE WHEN {i} <> 0"
                f" THEN 9223372036854775807 // {i} END"
            ).fetchone()[0],
            duckdb.sql(
                f"SELECT CASE WHEN {i} <> 0 THEN 100 // {i} END"
            ).fetchone()[0],
        )
        for i in ids
    }
    assert got == want
    assert got[0] == (None, None)  # NULL exactly (and only) at zero
    assert got[-3] == (-3074457345618258602, -33)  # truncated, not floored


def _spend(spark, rows):
    return spark.createDataFrame(rows, "k bigint, seg string, cents bigint")


def test_gini_unknown_segment_fails_loudly(spark):
    """A segment outside the declared domain must raise, not map to the
    shared code -1 where two unknowns would interleave into one
    silently wrong Gini (ADVICE r8)."""
    spend = _spend(
        spark, [(1, "A", 100), (2, "B", 50), (3, "MYSTERY", 10)]
    )
    with pytest.raises(Exception, match="unknown segment"):
        gini_by_segment(spend, ["A", "B"]).collect()


def test_gini_cents_beyond_stride_fails_loudly(spark):
    """cents >= 2^43 interleaves composite-lead ranks across segments
    far below int64 overflow — the helper must raise per-row instead
    of mis-ranking (ADVICE r8)."""
    spend = _spend(spark, [(1, "A", 100), (2, "A", 1 << 43)])
    with pytest.raises(Exception, match="composite-lead stride"):
        gini_by_segment(spend, ["A"]).collect()


def test_gini_valid_domain_still_exact(spark):
    """Guards must not change in-domain results: 4 customers in one
    segment with spends 1,2,3,4 → Gini = 0.25 exactly (ppm 250000)."""
    spend = _spend(
        spark, [(1, "A", 1), (2, "A", 2), (3, "A", 3), (4, "A", 4)]
    )
    row = gini_by_segment(spend, ["A"]).collect()[0]
    assert (row.n_customers, row.sum_cents, row.gini_ppm) == (4, 10, 250000)
