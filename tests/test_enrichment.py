"""Golden tests pinning the reference's exact semantic quirks
(spark_consumer.py:61-78): zero-vs-null guards, inclusive bucket
boundaries at 2/10 miles, the open (0,300)-minute duration filter.
"""

from datetime import datetime

import pytest

from nyc_data_pipeline_spark.operators.enrichment import enrich_trips


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "pickup_dt timestamp, dropoff_dt timestamp, trip_distance double, "
        "fare_amount double, tip_amount double",
    )


T0 = datetime(2024, 1, 1, 10, 0, 0)


def _t(minutes):
    return datetime(2024, 1, 1, 10, 0, 0).replace(
        hour=10 + int(minutes) // 60, minute=int(minutes) % 60
    )


def test_category_boundaries_inclusive(spark):
    # Reference: <=2 short, <=10 medium, else long (inclusive upper).
    df = _mk(
        spark,
        [
            (T0, _t(30), 2.0, 10.0, 1.0),
            (T0, _t(30), 2.01, 10.0, 1.0),
            (T0, _t(30), 10.0, 10.0, 1.0),
            (T0, _t(30), 10.01, 10.0, 1.0),
        ],
    )
    cats = [r.trip_category for r in enrich_trips(df).orderBy("trip_distance").collect()]
    assert cats == ["short", "medium", "medium", "long"]


def test_duration_filter_open_interval(spark):
    # duration must be strictly > 0 and strictly < 300 minutes.
    df = _mk(
        spark,
        [
            (T0, T0, 1.0, 10.0, 1.0),  # 0 min -> dropped
            (T0, _t(299), 1.0, 10.0, 1.0),  # kept
            (T0, datetime(2024, 1, 1, 15, 0, 0), 1.0, 10.0, 1.0),  # 300 -> dropped
        ],
    )
    out = enrich_trips(df).collect()
    assert len(out) == 1 and out[0].duration_min == 299.0


def test_zero_guards_yield_zero_not_null(spark):
    # speed_mph and tip_pct use otherwise(0), never null.
    df = _mk(
        spark,
        [
            (T0, _t(30), 0.0, 0.0, 5.0),  # dist=0 -> speed 0; fare=0 -> tip_pct 0
        ],
    )
    row = enrich_trips(df).collect()[0]
    assert row.speed_mph == 0.0 and row.tip_pct == 0.0


def test_negative_rows_dropped(spark):
    df = _mk(
        spark,
        [
            (T0, _t(30), -1.0, 10.0, 1.0),
            (T0, _t(30), 1.0, -10.0, 1.0),
            (T0, _t(30), 1.0, 10.0, 1.0),
        ],
    )
    assert enrich_trips(df).count() == 1


def test_speed_and_tip_formulas(spark):
    df = _mk(spark, [(T0, _t(30), 6.0, 20.0, 5.0)])
    row = enrich_trips(df).collect()[0]
    assert row.speed_mph == pytest.approx(12.0)  # 6 mi / 0.5 h
    assert row.tip_pct == pytest.approx(25.0)
    assert row.pickup_hour == 10


def test_approx_aggregates_bounded(spark, sf_dir):
    """Both approx-sketch queries now emit (exact value, in-bound bool)
    — the error bound IS the query output.  Every bool must be true and
    the exact side must agree with an independently computed exact."""
    from nyc_data_pipeline_spark.registry import QUERIES, load_all
    from nyc_data_pipeline_spark.catalog import load_table
    import pyspark.sql.functions as F

    load_all()
    approx = QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"), F.countDistinct("l_partkey").alias("p")
    ).collect()[0]
    assert approx.exact_orders == exact.o
    assert approx.exact_parts == exact.p
    assert approx.orders_within_5pct and approx.parts_within_5pct

    p50 = {
        r.o_orderpriority: r
        for r in QUERIES["agg_percentile_approx"](spark, sf_dir).collect()
    }
    exact_p50 = {
        r.o_orderpriority: r.p50
        for r in QUERIES["agg_percentiles"](spark, sf_dir).collect()
    }
    for k, v in exact_p50.items():
        assert p50[k].p50_exact == pytest.approx(v)
        assert p50[k].within_rank_band
