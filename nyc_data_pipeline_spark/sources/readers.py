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
