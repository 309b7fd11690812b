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


def test_mor_dv_files_counts_vector_buckets_not_candidates(spark, tmp_path):
    """ADVICE r8 scenario pinned on constructed data: a bucket whose
    [min,max] day stats OVERLAP the delete slice but which contains
    ZERO in-slice k%3 matches gets no delete vector — dv_buckets (and
    hence dv_files) must count buckets CARRYING vectors, not the
    stats-overlap candidate set, and the MOR read must still be
    exact."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.plans.two_phase import range_buckets
    from nyc_data_pipeline_spark.sources.zonemap import (
        DEL_HI_DAY,
        DEL_LO_DAY,
        DEL_MOD,
        _mor_delete_commit,
        _mor_read,
        _zm_versioned_write,
        ZM_FILES,
    )

    # 8 buckets over days [9000, 12199] (400 days each).  Buckets 6-7
    # ([11400, 12199]) overlap the delete slice [11323, 11600]; bucket
    # 5 ([11000, 11399]) overlaps via days 11323-11399.  Give buckets
    # 6-7 ONLY non-multiples of 3 as keys (candidates, no matches) and
    # bucket 5 some k%3==0 in-slice rows (real vectors).
    rows = []
    k = 1
    for d in range(9000, 11000, 13):          # buckets 0-4, any keys
        rows.append((k, d)); k += 3
    for d in range(11323, 11400, 7):          # bucket 5, matching keys
        rows.append((3 * d, d))               # k % 3 == 0
    for d in range(11400, 12200, 11):         # buckets 6-7, no matches
        rows.append((3 * d + 1, d))           # k % 3 == 1
    rows += [(2, 9000), (4, 12199)]           # pin global bounds
    base = spark.createDataFrame(rows, "k bigint, day bigint").select(
        "k", (F.col("k") % 997).alias("cents"), "day"
    )
    table_dir = str(tmp_path / "mor_candidates")
    lo, hi = 9000, 12199
    b1 = range_buckets(base, "day", ZM_FILES).withColumnRenamed(
        "bucket", "zb"
    ).drop("lo", "hi")
    m1 = _zm_versioned_write(
        b1, table_dir, 1, [str(z) for z in range(ZM_FILES)], None, (lo, hi)
    )
    m2 = _mor_delete_commit(spark, table_dir, m1)
    # candidates (stats overlap) = buckets 5,6,7; vectors only in 5
    stats = {
        int(z): r
        for z, r in (
            (z, spark.read.parquet(p).agg(
                F.min("day"), F.max("day")).collect()[0])
            for z, p in m1["files"].items()
        )
    }
    candidates = {
        z for z, r in stats.items()
        if r[0] <= DEL_HI_DAY and r[1] >= DEL_LO_DAY
    }
    assert len(candidates) >= 2  # the trap exists in this fixture
    assert m2["dv_buckets"] == ["5"]  # only the bucket WITH matches
    # read correctness: exactly the in-slice k%3 rows are gone
    got = _mor_read(spark, table_dir, 2).agg(
        F.count("*"), F.sum("cents")
    ).collect()[0]
    pdf = base.toPandas()
    dead = pdf["day"].between(DEL_LO_DAY, DEL_HI_DAY) & (pdf["k"] % DEL_MOD == 0)
    assert (got[0], got[1]) == (
        int((~dead).sum()), int(pdf.loc[~dead, "cents"].sum())
    )
