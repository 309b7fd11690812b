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


def test_choose_join_strategy_three_regimes(spark, sf_dir):
    """The audit -> treatment decision rule, golden-tested on real
    measured profiles: a dim-sized small side broadcasts regardless of
    skew; a flagged hot key on a big-big join salts; a uniform key
    stays a plain shuffle join."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.skew import (
        audited_join,
        choose_join_strategy,
        estimated_bytes,
    )
    from nyc_data_pipeline_spark.pipelines.quality import join_key_skew

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    hot = join_key_skew(ev, "event_type", "event_type").collect()[0]
    uniform = join_key_skew(orders, "o_orderkey", "o_orderkey").collect()[0]
    assert hot["skewed"] and not uniform["skewed"]

    # regime 1: small side under the threshold -> broadcast, even for
    # the hot profile (the big side never shuffles).
    assert choose_join_strategy(hot, estimated_bytes(customer)) == "broadcast"
    # regime 2: big-big with the flagged key -> salted; deferring to a
    # verified-tuned AQE skew-join flips it to plain (SCALE.md §21).
    assert choose_join_strategy(hot, None) == "salted"
    assert choose_join_strategy(hot, 2**40) == "salted"
    assert choose_join_strategy(hot, 2**40, aqe_skew_join=True) == "plain"
    # regime 3: big-big with the uniform key -> plain.
    assert choose_join_strategy(uniform, None) == "plain"

    # applied end-to-end: the dim join broadcasts (plan-asserted) and
    # the salted arm is forced by an over-threshold replica of
    # customer, returning exactly the plain join's aggregate.
    joined, strat = audited_join(ev, "user_id", customer, "c_custkey", "event_id")
    assert strat == "broadcast"
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()

    seg = ev.select(
        F.col("event_type").alias("seg")
    ).distinct().withColumn("w", F.lit(1))
    joined2, strat2 = audited_join(
        ev, "event_type", seg, "seg", "event_id", small_side_bytes=2**40
    )
    assert strat2 == "salted"
    got = joined2.groupBy("event_type").count().orderBy("event_type").collect()
    want = (
        ev.join(seg, ev["event_type"] == seg["seg"])
        .groupBy("event_type").count().orderBy("event_type").collect()
    )
    assert got == want
