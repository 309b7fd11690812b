"""JDBC source/sink (S5/S6/S7 parity), driver-gated.

The reference writes micro-batches to Postgres with `write.jdbc`
(spark_consumer.py:106) and separately bulk-inserts rows with psycopg2
`execute_values` at page_size=100 (database_handler.py:197-268) — two
row-oriented paths with duplicate schemas.  The engine keeps exactly
one: the Spark JDBC writer, with the knobs that matter at scale made
explicit:

- `batchsize` (rows per INSERT round-trip; reference page_size=100 is
  10x too small — default here 10_000),
- `numPartitions` (bounds concurrent connections — 1000 executors all
  opening connections would fall over a single Postgres),
- dedup key support for the reference's at-least-once duplication
  (T5): callers pass `dedup_keys` to drop replayed rows before write.

No JDBC driver jar ships in this container; `jdbc_available` gates the
tests.  The engine-native sink is parquet (`write_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_available(spark: SparkSession, driver: str = "org.postgresql.Driver") -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int = 8,
    dedup_keys: list[str] | None = None,
) -> None:
    """S5: distributed JDBC append with bounded connection fan-out."""
    out = df.dropDuplicates(dedup_keys) if dedup_keys else df
    (
        out.repartition(num_partitions)
        .write.mode(mode)
        .option("batchsize", str(batchsize))
        .jdbc(url, table, properties=properties)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str],
) -> DataFrame:
    """S6: pushdown read — the dashboard's `pd.read_sql` equivalent
    (streamlit.py:52), executed by the database, fetched distributed."""
    return spark.read.jdbc(url, f"({query}) AS q", properties=properties)


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Engine-native sink: partitioned parquet (S8's CREATE TABLE +
    index DDL maps to directory partitioning + min/max row-group stats,
    which served the same pruning role the B-tree indexes did)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
