"""Streaming ingest: the reference consumer pipeline, re-expressed.

Reference chain (spark_consumer.py:40-80): Kafka source → cast value to
string → from_json with a fixed 8-field schema (P1) → flatten (P2) →
6 enrichment columns → quality filter → foreachBatch JDBC append.

Engine version: the SAME logical transform works over any streaming
source (Kafka when the connector is present — sources/kafka.py — or a
file/rate source for broker-less environments, S10).  Structured
Streaming guarantees the batch/stream plans are the same Catalyst
plans, which is what the tests exploit: the streamed result of
`parse_wire_records` + `enrich_trips` must equal the batch result over
the same files.

Scale: parse + enrich is stateless — no watermark, no state store —
so it scales embarrassingly with input partitions (Kafka partitions /
file splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import TAXI_TRIP_SCHEMA


def parse_wire_records(records: DataFrame, schema: T.StructType | None = None) -> DataFrame:
    """P1+P2: Kafka wire shape (key/value binary-or-string) → typed
    columns.  Unknown JSON fields are dropped, missing become null —
    from_json semantics, identical to spark_consumer.py:61-62."""
    schema = schema or TAXI_TRIP_SCHEMA
    return records.select(
        F.from_json(F.col("value").cast("string"), schema).alias("data")
    ).select("data.*")


MICROS_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def file_json_stream(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S10: file-based streaming source — each new file is a micro-batch.
    The broker-less stand-in for the Kafka source with identical
    downstream semantics.  Timestamps use a microsecond format: Spark's
    default JSON format is millisecond-only, which silently truncates
    event times on a write→stream-read roundtrip."""
    return (
        spark.readStream.schema(schema)
        .option("timestampFormat", MICROS_TS_FORMAT)
        .json(path)
    )


def file_json_stream_bounded(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """T6: admission-bounded file stream — `maxFilesPerTrigger` is the
    file-source equivalent of Kafka's `maxOffsetsPerTrigger`: each
    micro-batch admits at most N backlog files, so per-batch memory and
    latency stay bounded no matter how deep the backlog grows (a
    restart after downtime otherwise swallows the whole backlog in one
    giant batch).  The reference throttles on the PRODUCER side with a
    sleep loop (kafka_producer.py:142-145); a consumer-side engine
    bounds admission instead — same backpressure contract, enforced
    where the engine can guarantee it."""
    return (
        spark.readStream.schema(schema)
        .option("timestampFormat", MICROS_TS_FORMAT)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """S10/T6: synthetic rate source (timestamp, value) — replaces the
    reference producer's sleep-loop throttling (kafka_producer.py:142-187)
    for load/replay testing."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test harness: drain every available micro-batch synchronously
    into an in-memory table and return the started query (caller stops).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q
