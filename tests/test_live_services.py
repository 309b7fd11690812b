"""Live-broker / live-database end-to-end smokes (S3/S4/S5/S6 glue).

The sandbox ships neither a Kafka broker, a spark-sql-kafka jar, nor a
Postgres JDBC driver, so every wire-semantic test in test_sources.py
runs broker-less.  (Checked again round 5: `postgres`/`pg_ctl` server
binaries ARE now present, but Spark still cannot speak to a local
instance — no org.postgresql JDBC jar is bundled and Maven Central is
unreachable from the sandbox, so the classpath gate below stays the
binding constraint; the TCP gate alone is not enough.)  These tests
close the remaining glue gap whenever real services ARE reachable:
each probes (a) the classpath for the connector and (b) a TCP connect
to the service, and skips with a precise reason otherwise.  Point
KAFKA_BOOTSTRAP / POSTGRES_JDBC_URL at live services to activate them:

    KAFKA_BOOTSTRAP=localhost:9092 \
    POSTGRES_JDBC_URL=jdbc:postgresql://localhost:5432/nyc \
    POSTGRES_USER=postgres POSTGRES_PASSWORD=postgres \
    python -m pytest tests/test_live_services.py -v
"""

from __future__ import annotations

import os
import socket

import pytest

from nyc_data_pipeline_spark.sources.jdbc import jdbc_available, read_jdbc, write_jdbc
from nyc_data_pipeline_spark.sources.kafka import (
    kafka_available,
    read_kafka_stream,
    to_kafka_records,
    write_kafka,
)

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
POSTGRES_URL = os.environ.get(
    "POSTGRES_JDBC_URL", "jdbc:postgresql://localhost:5432/nyc"
)


def _tcp_reachable(hostport: str, default_port: int) -> bool:
    host, _, port = hostport.partition(":")
    try:
        with socket.create_connection((host, int(port or default_port)), timeout=2):
            return True
    except OSError:
        return False


def _kafka_host(url: str) -> str:
    return url.split(",")[0]


def _jdbc_host(url: str) -> str:
    # jdbc:postgresql://host:port/db -> host:port
    return url.split("//", 1)[-1].split("/", 1)[0]


def test_kafka_roundtrip_live(spark):
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")
    if not _tcp_reachable(_kafka_host(KAFKA_BOOTSTRAP), 9092):
        pytest.skip(f"no Kafka broker at {KAFKA_BOOTSTRAP}")

    import uuid

    topic = f"engine_smoke_{uuid.uuid4().hex[:8]}"
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "trip_id int, vendor string, fare double",
    )
    write_kafka(src, KAFKA_BOOTSTRAP, topic=topic, key_col="trip_id")

    # Batch read-back over the full offset range proves the produced
    # wire records parse back to the source rows (same chain the
    # streaming reader uses; triggerless so the test is hermetic).
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
        .selectExpr(
            "CAST(k AS INT) trip_id",
            "get_json_object(v, '$.vendor') vendor",
            "CAST(get_json_object(v, '$.fare') AS DOUBLE) fare",
        )
    )
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in src.collect()}
    assert got == want

    # The streaming source must at least construct its plan against the
    # live broker (load() contacts it for metadata).
    stream_df = read_kafka_stream(spark, KAFKA_BOOTSTRAP, topic=topic)
    assert stream_df.isStreaming


def test_jdbc_roundtrip_live(spark):
    if not jdbc_available(spark):
        pytest.skip("postgresql JDBC driver not on classpath")
    if not _tcp_reachable(_jdbc_host(POSTGRES_URL), 5432):
        pytest.skip(f"no Postgres at {POSTGRES_URL}")

    from decimal import Decimal

    props = {
        "user": os.environ.get("POSTGRES_USER", "postgres"),
        "password": os.environ.get("POSTGRES_PASSWORD", "postgres"),
        "driver": "org.postgresql.Driver",
    }
    src = spark.createDataFrame(
        [(1, 12.5), (2, 20.0), (2, 20.0)],  # duplicate row exercises dedup_keys
        "trip_id int, fare_amount double",
    )
    write_jdbc(
        src,
        POSTGRES_URL,
        "engine_smoke_trips",
        props,
        mode="overwrite",
        dedup_keys=["trip_id"],
        num_partitions=2,
    )
    back = read_jdbc(
        spark,
        POSTGRES_URL,
        "SELECT trip_id, CAST(fare_amount AS DECIMAL(10,2)) fare_amount "
        "FROM engine_smoke_trips ORDER BY trip_id",
        props,
    )
    rows = [(r.trip_id, r.fare_amount) for r in back.collect()]
    assert rows == [(1, Decimal("12.50")), (2, Decimal("20.00"))]
