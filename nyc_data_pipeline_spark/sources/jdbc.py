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

No POSTGRES driver jar ships in this container (`jdbc_available` gates
those tests), but Spark bundles Apache Derby — so the full JDBC code
path runs for real against embedded Derby (`sink_jdbc_roundtrip`,
driver-hash-checked).  The engine-native sink is parquet
(`write_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


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
    column_types: str | None = None,
) -> None:
    """S5: distributed JDBC append with bounded connection fan-out.
    `column_types` maps to createTableColumnTypes — needed where the
    dialect default is wrong for the workload (Derby maps StringType
    to CLOB, which cannot be grouped/compared; the reference's DDL
    pins VARCHAR(20) for the same reason, database_handler.py:76-108)."""
    out = df.dropDuplicates(dedup_keys) if dedup_keys else df
    w = (
        out.repartition(num_partitions)
        .write.mode(mode)
        .option("batchsize", str(batchsize))
    )
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url, table, properties=properties)


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


# ---------------------------------------------------------------------------
# Live JDBC roundtrip against the embedded Derby engine.
# ---------------------------------------------------------------------------

# No Postgres driver jar ships in this container (the gate above), but
# Spark BUNDLES Apache Derby — a real, standards-compliant SQL database
# with a real JDBC driver.  Running the S5 write and S6 pushdown read
# against embedded Derby exercises the genuine JDBC code path end to
# end: driver loading, Spark->JDBC type mapping via the Derby dialect,
# partitioned batched INSERTs, overwrite-mode DDL, and a GROUP BY
# executed BY THE DATABASE (the reference dashboard's read path,
# streamlit.py:52).  Swapping the URL/driver strings retargets the
# identical code at Postgres.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir};create=true"


@register(
    "sink_jdbc_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_micro
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type
    """,
)
def sink_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6 against a live database: write the purchase/click slice
    to an embedded-Derby table via the partitioned JDBC batch writer
    (mirroring the reference's micro-batch `write.jdbc`,
    spark_consumer.py:106), then read it back with the aggregation
    pushed INTO the database — Derby, not Spark, executes the GROUP BY
    (the reference dashboard's `pd.read_sql` role, streamlit.py:52).
    The DuckDB oracle recomputes the same KPIs from the parquet, so
    the hash match certifies the full JDBC hop: dialect type mapping,
    batched inserts, overwrite DDL, and quoted-identifier pushdown.
    Scale: `num_partitions` bounds connection fan-out (here 4;
    a 1000-executor cluster must NOT open 1000 connections);
    `batchsize` amortizes insert round-trips."""
    from .scans import scratch_dir

    # Keep Derby's boot log inside the scratch tree (its default is a
    # derby.log in the process CWD — repo pollution).
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file",
        scratch_dir("derby_log", sf_dir) + ".log",
    )
    ev = load_table(spark, sf_dir, "events")
    slice_df = ev.where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    url = derby_url(scratch_dir("derby", sf_dir))
    props = {"driver": DERBY_DRIVER}
    write_jdbc(
        slice_df,
        url,
        "nyc_kpis",
        props,
        mode="overwrite",
        batchsize=10_000,
        num_partitions=4,
        column_types="event_type VARCHAR(20)",
    )
    pushdown = (
        'SELECT "event_type" AS "event_type", '
        'CAST(COUNT(*) AS BIGINT) AS "n", '
        'CAST(SUM("v_micro") AS BIGINT) AS "sum_micro" '
        'FROM nyc_kpis GROUP BY "event_type"'
    )
    return read_jdbc(spark, url, pushdown, props)
