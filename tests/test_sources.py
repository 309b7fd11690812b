"""Source contracts: CSV/JSON scans with schema + corrupt-record
quarantine; Kafka wire projection; parquet round-trip sink."""

import json

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from nyc_data_pipeline_spark.sources.readers import (
    TAXI_TRIP_SCHEMA,
    read_csv,
    read_json,
    read_text,
    split_corrupt,
)
from nyc_data_pipeline_spark.sources.kafka import kafka_available, to_kafka_records
from nyc_data_pipeline_spark.sources.jdbc import jdbc_available, write_table

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ]
)


def test_csv_contract_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,v,s\n1,1.5,a\n2,2.5,b\nnot_an_int,xxx_bad_yyy,c\n")
    df = read_csv(spark, str(p), SCHEMA)
    clean, bad = split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert "xxx_bad_yyy" in bad.collect()[0]._corrupt_record


def test_json_contract_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    rows = [json.dumps({"id": 1, "v": 1.5, "s": "a"}), "{broken json", ""]
    p.write_text("\n".join(r for r in rows if r) + "\n")
    clean, bad = split_corrupt(read_json(spark, str(p), SCHEMA))
    assert clean.count() == 1
    assert bad.count() == 1


def test_text_scan(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha\nbeta\n")
    assert read_text(spark, str(p)).count() == 2


def test_taxi_schema_matches_reference_consumer():
    # The 8-field contract from spark_consumer.py:42-51.
    names = TAXI_TRIP_SCHEMA.fieldNames()
    assert names == [
        "VendorID",
        "tpep_pickup_datetime",
        "tpep_dropoff_datetime",
        "passenger_count",
        "trip_distance",
        "fare_amount",
        "tip_amount",
        "total_amount",
    ]


def test_kafka_wire_projection(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "k int, name string, val double")
    rec = to_kafka_records(df, "k").collect()[0]
    assert rec.key == "1"
    parsed = json.loads(rec.value)
    assert parsed == {"k": 1, "name": "x", "val": 2.5}


def test_kafka_connector_gate(spark):
    # No broker/jar in this container; the gate must say so (not raise).
    assert kafka_available(spark) in (False, True)


def test_jdbc_gate_and_parquet_sink(spark, tmp_path):
    assert jdbc_available(spark) in (False, True)
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id int, dt string"
    )
    out = str(tmp_path / "t")
    write_table(df, out, partition_by=["dt"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    # partition column became a directory key (pruning-capable layout)
    assert (tmp_path / "t" / "dt=2024-01-01").exists()


def test_partitioned_write_prunes(spark, sf_dir):
    """The date predicate must become PartitionFilters (directory
    pruning), not a post-scan filter."""
    import io
    import contextlib

    from nyc_data_pipeline_spark.sources.scans import sink_partitioned_pruning

    df = sink_partitioned_pruning(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "ds" in plan.split("PartitionFilters", 1)[1][:200]


def test_kafka_wire_roundtrip_lossless(spark, sf_dir):
    """S4→P1: to_kafka_records output must parse back through the
    consumer path (from_json) to the original rows exactly."""
    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.streaming.ingest import parse_wire_records

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    wire = to_kafka_records(ev, key_col="user_id")
    back = parse_wire_records(wire, schema)
    orig = {tuple(r) for r in ev.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert rt == orig
