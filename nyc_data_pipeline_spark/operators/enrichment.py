"""Reference-parity trip enrichment (the consumer's transform chain).

The reference's only Spark logic is a 6-step enrichment over parsed
taxi records (reference spark_consumer.py:61-78):

  P7  duration_min = (unix_timestamp(dropoff) - unix_timestamp(pickup))/60
  P8  speed_mph    = when(duration>0 AND dist>0, dist/(duration/60)).otherwise(0)
  F4  pickup_hour  = hour(pickup)
  P9  trip_category: dist<=2 -> 'short', <=10 -> 'medium', else 'long'
                     (inclusive upper bounds, spark_consumer.py:71-73)
  P10 tip_pct      = when(fare>0, tip/fare*100).otherwise(0)
  P4  filter: dist>=0 AND fare>=0 AND duration>0 AND duration<300

These exact semantics — `otherwise(0)` instead of null, inclusive 2/10
mile boundaries, the open (0, 300) duration window — are pinned by
golden tests (tests/test_enrichment.py).

`enrich_trips` is the reusable transform for genuinely taxi-shaped
frames (batch or streaming — same function works under readStream).
The registered queries below replay the identical arithmetic over the
`events` fixture (FIXTURES.md maps ts≈pickup, value≈fare, props.k≈the
JSON payload) so the DuckDB oracle can referee every formula.

Everything is built-in Catalyst expressions — no UDFs — matching the
reference's own (correct) choice; at 100 TB this chain is one
whole-stage-codegen'd projection over the scan, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import davg, dsum, sql_davg, sql_dsum
from ..registry import register

# Reference constants (spark_consumer.py:71-78).
SHORT_MAX_MILES = 2.0
MEDIUM_MAX_MILES = 10.0
MIN_DURATION_MIN = 0.0
MAX_DURATION_MIN = 300.0


def trip_category(distance: Column) -> Column:
    """CASE chain with the reference's inclusive-left boundaries."""
    return (
        F.when(distance <= SHORT_MAX_MILES, "short")
        .when(distance <= MEDIUM_MAX_MILES, "medium")
        .otherwise("long")
    )


def enrich_trips(
    df: DataFrame,
    pickup: str = "pickup_dt",
    dropoff: str = "dropoff_dt",
    distance: str = "trip_distance",
    fare: str = "fare_amount",
    tip: str = "tip_amount",
) -> DataFrame:
    """The reference's full enrichment + data-quality filter.

    Works identically on batch and Structured Streaming frames (pure
    stateless projection+filter).
    """
    dur = (
        F.unix_timestamp(F.col(dropoff).cast("timestamp"))
        - F.unix_timestamp(F.col(pickup).cast("timestamp"))
    ) / 60.0
    dist, fr, tp = F.col(distance), F.col(fare), F.col(tip)
    out = (
        df.withColumn("duration_min", dur)
        .withColumn(
            "speed_mph",
            F.when(
                (F.col("duration_min") > 0) & (dist > 0),
                dist / (F.col("duration_min") / 60.0),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("pickup_hour", F.hour(F.col(pickup)))
        .withColumn("trip_category", trip_category(dist))
        .withColumn(
            "tip_pct",
            F.when(fr > 0, tp / fr * 100.0).otherwise(F.lit(0.0)),
        )
    )
    return out.filter(
        (dist >= 0)
        & (fr >= 0)
        & (F.col("duration_min") > MIN_DURATION_MIN)
        & (F.col("duration_min") < MAX_DURATION_MIN)
    )


# ---------------------------------------------------------------------------
# Oracle-checked replays over the events fixture.
#
# Synthesized trip shape (deterministic, arithmetic-only so both engines
# agree bit-for-bit): pickup=ts, dropoff=ts + k minutes (k from the JSON
# props), distance=value/10, fare=value, tip=event_id%20.
# ---------------------------------------------------------------------------

_SQL_K = "CAST(json_extract_string(props, '$.k') AS INTEGER)"


@register(
    "ref_trip_enrichment",
    oracle=f"""
    WITH trips AS (
        SELECT event_id,
               epoch_us(ts) AS pickup_us,
               epoch_us(ts) + CAST({_SQL_K} AS BIGINT) * 60000000 AS dropoff_us,
               value / 10.0 AS trip_distance,
               value AS fare_amount,
               CAST(event_id % 20 AS DOUBLE) AS tip_amount,
               CAST({_SQL_K} AS DOUBLE) AS duration_min,
               CAST(hour(ts) AS INTEGER) AS pickup_hour
        FROM events
    )
    SELECT event_id, pickup_us, dropoff_us, trip_distance, fare_amount,
           tip_amount, duration_min,
           CASE WHEN duration_min > 0 AND trip_distance > 0
                THEN trip_distance / (duration_min / 60.0) ELSE 0.0 END AS speed_mph,
           pickup_hour,
           CASE WHEN trip_distance <= 2.0 THEN 'short'
                WHEN trip_distance <= 10.0 THEN 'medium'
                ELSE 'long' END AS trip_category,
           CASE WHEN fare_amount > 0 THEN tip_amount / fare_amount * 100.0
                ELSE 0.0 END AS tip_pct,
           'events_fixture' AS source
    FROM trips
    WHERE trip_distance >= 0 AND fare_amount >= 0
      AND duration_min > 0 AND duration_min < 300
    """,
)
def ref_trip_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P7-P12 replay: JSON field extraction, duration/speed/hour/
    category/tip derivations, quality filter, metadata injection —
    the reference consumer chain (spark_consumer.py:61-78) with the
    oracle refereeing every formula."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    pickup_us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = ev.select(
        "event_id",
        pickup_us.alias("pickup_us"),
        (pickup_us + k.cast("bigint") * F.lit(60000000).cast("bigint")).alias(
            "dropoff_us"
        ),
        (F.col("value") / 10.0).alias("trip_distance"),
        F.col("value").alias("fare_amount"),
        (F.col("event_id") % 20).cast("double").alias("tip_amount"),
        k.cast("double").alias("duration_min"),
        F.hour("ts").alias("pickup_hour"),
    )
    return (
        t.withColumn(
            "speed_mph",
            F.when(
                (F.col("duration_min") > 0) & (F.col("trip_distance") > 0),
                F.col("trip_distance") / (F.col("duration_min") / 60.0),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("trip_category", trip_category(F.col("trip_distance")))
        .withColumn(
            "tip_pct",
            F.when(
                F.col("fare_amount") > 0,
                F.col("tip_amount") / F.col("fare_amount") * 100.0,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("source", F.lit("events_fixture"))
        .filter(
            (F.col("trip_distance") >= 0)
            & (F.col("fare_amount") >= 0)
            & (F.col("duration_min") > 0)
            & (F.col("duration_min") < 300)
        )
        .select(
            "event_id",
            "pickup_us",
            "dropoff_us",
            "trip_distance",
            "fare_amount",
            "tip_amount",
            "duration_min",
            "speed_mph",
            "pickup_hour",
            "trip_category",
            "tip_pct",
            "source",
        )
    )


@register(
    "agg_ungrouped_kpis",
    oracle=f"""
    WITH trips AS (
        SELECT value / 10.0 AS trip_distance,
               value AS fare_amount,
               CAST(event_id % 20 AS DOUBLE) AS tip_amount,
               CAST({_SQL_K} AS DOUBLE) AS duration_min
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total_trips,
           {sql_davg('fare_amount')} AS avg_fare,
           {sql_dsum('fare_amount')} AS total_revenue,
           {sql_davg('duration_min')} AS avg_duration_min,
           {sql_davg('trip_distance')} AS avg_distance,
           {sql_dsum('tip_amount')} AS total_tips
    FROM trips
    WHERE trip_distance >= 0 AND fare_amount >= 0
      AND duration_min > 0 AND duration_min < 300
    """,
)
def agg_ungrouped_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 batch twin: the ungrouped single-row KPI aggregate the
    reference computes per micro-batch in foreachBatch
    (spark_consumer.py:109-115 — batch count + averaged metrics) over
    the enriched-and-filtered trips.  Partial (map-side) aggregation
    makes this one round of 32-byte partials per partition — the
    cheapest possible global statement at any scale; the streaming form
    runs the same agg inside foreachBatch (streaming/sinks.py)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    t = ev.select(
        (F.col("value") / 10.0).alias("trip_distance"),
        F.col("value").alias("fare_amount"),
        (F.col("event_id") % 20).cast("double").alias("tip_amount"),
        k.cast("double").alias("duration_min"),
    ).filter(
        (F.col("trip_distance") >= 0)
        & (F.col("fare_amount") >= 0)
        & (F.col("duration_min") > MIN_DURATION_MIN)
        & (F.col("duration_min") < MAX_DURATION_MIN)
    )
    return t.agg(
        F.count("*").alias("total_trips"),
        davg("fare_amount").alias("avg_fare"),
        dsum("fare_amount").alias("total_revenue"),
        davg("duration_min").alias("avg_duration_min"),
        davg("trip_distance").alias("avg_distance"),
        dsum("tip_amount").alias("total_tips"),
    )


@register(
    "ref_partition_key",
    oracle=f"""
    SELECT part_key, COUNT(*) AS n
    FROM (
        SELECT CASE WHEN {_SQL_K} <> 0
                    THEN CAST({_SQL_K} % 1000 AS BIGINT)
                    ELSE user_id % 100 END AS part_key
        FROM events
    )
    GROUP BY part_key
    """,
)
def ref_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 partition-key precedence: primary key column when usable,
    else a modulo fallback (reference kafka_producer.py:85-95 branches
    PULocationID → hash(lon_lat)%1000 → hash(VendorID)%100).  The
    distribution per key is what a Kafka sink / repartition would see.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    key = (
        F.when(k != 0, F.pmod(k, F.lit(1000)).cast("bigint"))
        .otherwise(F.pmod(F.col("user_id"), F.lit(100)))
        .alias("part_key")
    )
    return ev.select(key).groupBy("part_key").agg(F.count("*").alias("n"))


@register(
    "ref_pipeline_e2e",
    oracle=f"""
    WITH trips AS (
        SELECT value / 10.0 AS trip_distance,
               value AS fare_amount,
               CAST(event_id % 20 AS DOUBLE) AS tip_amount,
               CAST({_SQL_K} AS DOUBLE) AS duration_min,
               EXTRACT(hour FROM ts) AS h
        FROM events
    ),
    gated AS (
        SELECT * FROM trips
        WHERE trip_distance >= 0 AND fare_amount >= 0
          AND duration_min > 0 AND duration_min < 300
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total_trips,
           {sql_davg('fare_amount')} AS avg_fare,
           {sql_dsum('fare_amount')} AS total_revenue,
           {sql_davg('duration_min')} AS avg_duration_min,
           {sql_davg('trip_distance')} AS avg_distance,
           {sql_dsum('tip_amount')} AS total_tips,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_pickup_hours
    FROM gated
    """,
)
def ref_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's COMPLETE topology as one registered query:
    producer wire serialization (per-row dict→JSON,
    kafka_producer.py:51-65, here `to_json(struct(...))` in-plan) →
    consumer parse + flatten (spark_consumer.py:61-62, the engine's
    `parse_wire_records`) → trip shaping and quality gating
    (spark_consumer.py:63-78) → the dashboard's ungrouped KPI
    aggregate (spark_consumer.py:109-115 / streamlit.py:38-55).  The
    ORACLE reads the raw events table directly — it grants the wire
    hop nothing — so the engine's serialize→parse leg must be
    perfectly transparent (nested-JSON escaping of the carried props,
    microsecond timestamp strings, double formatting) or the hash
    breaks; n_pickup_hours comes off the wire-carried timestamp
    specifically to keep the ts leg load-bearing.  The pytest
    end-to-end replay (test_streaming) drives the same topology
    through an actual bounded stream + Derby sink; this is its
    always-on, driver-verified batch twin."""
    from pyspark.sql import types as T

    from ..streaming.batch_equiv import _WIRE_TS_FORMAT
    from ..streaming.ingest import parse_wire_records

    wire_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts_str", T.StringType()),
            T.StructField("props", T.StringType()),
        ]
    )
    ev = load_table(spark, sf_dir, "events")
    wire = ev.select(
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.date_format(
                    F.col("ts").cast("timestamp"), _WIRE_TS_FORMAT
                ).alias("ts_str"),
                "props",
            )
        ).alias("value")
    )
    parsed = parse_wire_records(wire, wire_schema)
    k = F.get_json_object("props", "$.k").cast("int")
    gated = parsed.select(
        (F.col("value") / 10.0).alias("trip_distance"),
        F.col("value").alias("fare_amount"),
        (F.col("event_id") % 20).cast("double").alias("tip_amount"),
        k.cast("double").alias("duration_min"),
        F.hour(
            F.to_timestamp(F.col("ts_str"), _WIRE_TS_FORMAT)
        ).alias("h"),
    ).filter(
        (F.col("trip_distance") >= 0)
        & (F.col("fare_amount") >= 0)
        & (F.col("duration_min") > MIN_DURATION_MIN)
        & (F.col("duration_min") < MAX_DURATION_MIN)
    )
    return gated.agg(
        F.count("*").alias("total_trips"),
        davg("fare_amount").alias("avg_fare"),
        dsum("fare_amount").alias("total_revenue"),
        davg("duration_min").alias("avg_duration_min"),
        davg("trip_distance").alias("avg_distance"),
        dsum("tip_amount").alias("total_tips"),
        F.countDistinct("h").cast("bigint").alias("n_pickup_hours"),
    )
