"""Batch file sources with explicit schema contracts.

The reference loads CSV/Parquet eagerly into pandas with inferred
dtypes (reference kafka_producer.py:34-49) — single-node, row-oriented,
schema regime "whatever the file had" (SURVEY §1.4 regime 1).  The
engine inverts all three decisions:

- distributed columnar scans (`spark.read`), never a driver-side load;
- explicit StructType contracts per source (regime 2 — the consumer's
  own choice at spark_consumer.py:42-51), never inference in prod;
- a declared schema-drift policy: PERMISSIVE parse with a
  `_corrupt_record` column, so bad rows are quarantined not dropped.

At 100 TB, explicit schemas also matter for speed: inference is a full
extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# The taxi-trip ingest contract — the 8 fields the reference consumer
# parses (spark_consumer.py:42-51) plus producer metadata it ignores.
TAXI_TRIP_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.IntegerType()),
        T.StructField("tpep_pickup_datetime", T.StringType()),
        T.StructField("tpep_dropoff_datetime", T.StringType()),
        T.StructField("passenger_count", T.IntegerType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S1: schema-contracted CSV scan; malformed rows land in
    _corrupt_record instead of silently coercing to nulls.  Extra
    reader options (e.g. timestampFormat) pass through."""
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .schema(_with_corrupt(schema))
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S9: JSON-lines scan with the same contract+quarantine policy."""
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt(schema))
        .json(path)
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S9: raw text scan (one row per line, column `value`)."""
    return spark.read.text(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — the drift policy made operational.

    Spark refuses plans that read *only* the corrupt-record column
    (referencing it alone would skip the parse that populates it), so
    the parsed frame is cached once and both splits read from it.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


# --- VARIANT semi-structured ingestion (Spark 4) ----------------------------
#
# The schema-on-read answer that scales: `parse_json` encodes arbitrary
# JSON into Spark 4's binary VARIANT type once at ingest (no
# row-at-a-time string re-parsing downstream), `variant_get` extracts
# typed paths, and `schema_of_variant` audits what shapes actually
# arrived — the modern replacement for storing JSON as strings and
# regex-mining them per query.  All three run JVM-side inside codegen.
# At 100 TB the win is structural: one parse per row at ingest, typed
# binary bytes thereafter, instead of N string parses for N queries.

from ..registry import register as _register
from ..catalog import load_table as _load_table


@_register(
    "src_variant_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT)
               AS n_missing_path
    FROM events
    GROUP BY event_type
    """,
)
def src_variant_props(spark, sf_dir):
    """Ingest the events `props` JSON column as VARIANT (`parse_json`
    once), extract the typed `$.k` path with `variant_get`, and
    aggregate per event type; `try_variant_get` on an absent path must
    yield NULL (counted — the evidence that missing paths degrade to
    null, never to an error or a sentinel).  The oracle re-reads the
    raw JSON text with DuckDB's json_extract, so the binary encoding
    round-trips the values exactly."""
    from pyspark.sql import functions as F

    ev = _load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "parse_json(props) AS v",
    ).selectExpr(
        "event_type",
        "variant_get(v, '$.k', 'bigint') AS k",
        "try_variant_get(v, '$.missing', 'bigint') AS missing",
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.count("missing").cast("bigint").alias("n_missing_path"),
    )
