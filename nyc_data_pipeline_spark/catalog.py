"""Catalog: load the warehouse tables and register them as views.

The reference keeps its relational state in four Postgres tables created
by hand-written DDL (reference database_handler.py:65-195).  The engine
equivalent is a parquet-backed catalog: every table is a columnar,
partition-prunable parquet dataset registered as a temp view so both the
DataFrame DSL and `spark.sql` see the same names the DuckDB oracle uses.

At 100 TB the same function works unchanged: `spark.read.parquet` over a
partitioned directory tree gives partition pruning + row-group predicate
pushdown for free; nothing here materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The ten driver fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Filters/projections applied by the
    caller push down into this scan (verify with .explain: PushedFilters,
    ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # events.ts has shipped as BOTH a nanosecond parquet timestamp
        # (which Spark's vectorized reader rejects — read as raw nanos,
        # truncate to micros, matching DuckDB's epoch_us truncation) and
        # a plain microsecond timestamp (usable as-is).  Branch on the
        # actual file schema so either fixture generation works.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F  # local: avoid cycle at import
        from pyspark.sql import types as T

        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(dt, T.TimestampNTZType):
            # Session TZ is pinned UTC, so NTZ→LTZ keeps the instant while
            # restoring the TimestampType every downstream operator (and
            # the JSON fixture roundtrip, which formats LTZ with an offset)
            # was written against.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's full parallelism, keyed on ``cols``.

    Compute-parallelism barrier for CPU-bound projections (heavy
    higher-order expressions like shingle hashing): input-split count
    tracks BYTES, so a small-but-expensive table arrives as one split
    and computes on one core.  A plain ``repartition(cols)`` does not
    fix this — AQE coalesces the exchange back to one partition when
    the data is small; an explicit partition count is exempt from AQE
    coalescing.  Doubles as the CollapseProject optimization barrier
    (see dedup/minhash.py).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


_SCOPED_CACHE: dict[str, DataFrame] = {}


def persist_scoped(site: str, df: DataFrame) -> DataFrame:
    """``persist()`` bounded to ONE live cache entry per call site.

    Plan-level caches inside registered queries exist to feed multiple
    consumers of one materialization (diamond DAGs — the containment/
    pagerank/mixing lesson), but the registry sweep, bench loop, and
    scale probe invoke the same query many times in one long-lived
    session, and an unpaired ``persist()`` per invocation accumulates
    cache entries until the executor LRU store churns.  Unpersisting
    the site's previous plan before persisting the new one bounds the
    cache at one entry per site while keeping the within-invocation
    reuse that motivated the persist.
    """
    prev = _SCOPED_CACHE.get(site)
    if prev is not None:
        # ALWAYS release the previous entry — including a same-plan
        # one.  Keeping an identical plan's entry warm (the r15
        # behavior) made every re-invocation of a pinned query start
        # with a materialized cache, so any back-to-back timing
        # (bench best-of-2) partially measured a warm cache instead
        # of the query (VERDICT r15 "what's wrong" #1).  Each
        # invocation now repopulates its own cache inside its own
        # timed region; the within-invocation diamond reuse that
        # motivated the pin is unchanged.
        try:
            prev.unpersist()
        except Exception:
            pass  # owning session already stopped
    _SCOPED_CACHE[site] = df.persist()
    return df
