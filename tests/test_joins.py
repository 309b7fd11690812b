"""Unit tests for the reusable as-of join operator (J7)."""

from datetime import datetime

from nyc_data_pipeline_spark.operators.joins import asof_join


def _ts(m):
    return datetime(2024, 1, 1, 12, m, 0)


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(5))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(20), "b"), (1, _ts(40), "c"), (2, _ts(50), "z")],
        "k int, rts timestamp, tag string",
    )
    out = {
        (r.k, r.lts): (r.asof_rts, r.asof_tag)
        for r in asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()
    }
    assert out[(1, _ts(10))] == (_ts(0), "a")   # latest right <= 12:10
    assert out[(1, _ts(30))] == (_ts(20), "b")  # skips future 12:40
    assert out[(2, _ts(5))] == (None, None)     # no prior right row


def test_asof_join_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, _ts(20))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(20), "same"), (1, _ts(10), "earlier")], "k int, rts timestamp, tag string"
    )
    incl = asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()[0]
    assert incl.asof_tag == "same"  # ts equal counts by default
    strict = asof_join(left, right, "k", "lts", "rts", ["tag"], strict=True).collect()[0]
    assert strict.asof_tag == "earlier"  # strictly-prior mode
