"""Registered scan-path queries (S9): JSON-file source with an explicit
schema contract, proven by a write→read roundtrip.

The reference reads only CSV/Parquet (reference kafka_producer.py:34-49);
the engine adds JSON-line files because that's the wire format of its
own Kafka hop and the dominant raw-crawl interchange format.  The query
writes the `documents` table as JSON-lines, reads it back through
``readers.read_json`` (PERMISSIVE + _corrupt_record contract), and
aggregates — the DuckDB oracle computes the same aggregate straight off
the parquet, so the hash match certifies the roundtrip is lossless.

Scale shape: the write and read are both distributed (one task per
partition, no driver materialization); at 100 TB the same plan holds
with the temp dir on a shared object store instead of local /tmp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register
from .readers import read_json, split_corrupt

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "sink_partitioned_pruning",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS ds,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    GROUP BY 1, 2
    """,
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/§5 layout: the engine's replacement for the reference's
    Postgres DDL + B-tree indexes (reference database_handler.py:65-195)
    is a date-partitioned parquet layout.  Writes events partitioned by
    `ds`, reads back with a date predicate — Catalyst turns it into
    PartitionFilters (directory pruning: at 100 TB a one-week query
    touches 7 directories, not the table; asserted in
    tests/test_sources.py)."""
    out = os.path.join(
        "/tmp", "nyc_engine_partitioned", os.path.basename(sf_dir.rstrip("/"))
    )
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("ds", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "ds"
    ).parquet(out)
    return (
        spark.read.parquet(out)
        .filter((F.col("ds") >= "2024-01-08") & (F.col("ds") < "2024-01-15"))
        .groupBy(F.col("ds").cast("string").alias("ds"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchase"),
        )
    )


@register(
    "src_json_scan",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS BIGINT) AS total_text_len
    FROM documents
    GROUP BY lang, source
    """,
)
def src_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: JSON-lines scan with explicit StructType.  Roundtrips the
    documents table through JSON files; text content (arbitrary
    unicode) must survive exactly for the oracle hash to match."""
    out = os.path.join("/tmp", "nyc_engine_json_scan", os.path.basename(sf_dir.rstrip("/")))
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(out)
    clean, _bad = split_corrupt(read_json(spark, out, DOCUMENTS_SCHEMA))
    return clean.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
    )
