"""Query/oracle registry.

Every operator the engine claims is registered here twice:

- ``QUERIES[name]`` — a callable ``(spark, sf_dir) -> DataFrame`` built
  from the engine's own operators (the thing being graded), and
- ``ORACLE[name]`` — equivalent ANSI SQL that DuckDB runs over the same
  parquet tables (the independent referee).

``__spark_entry__.py`` re-exports both dicts to the driver, which
compares row-count + schema + order-insensitive value hash per query.
Operators whose semantics are not SQL-expressible (streaming state,
HLL sketches) register a query with no oracle — the driver then records
a weaker rows-only check; keep those few.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Queries deliberately registered without an oracle (non-SQL-expressible
# semantics — streaming state, sketches, binary feature extraction).
NO_ORACLE_OK: set[str] = set()


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Modules that register queries; extended as operators land.
_QUERY_MODULES = [
    "nyc_data_pipeline_spark.plans.relational",
    "nyc_data_pipeline_spark.operators.enrichment",
    "nyc_data_pipeline_spark.operators.aggregates",
    "nyc_data_pipeline_spark.operators.joins",
    "nyc_data_pipeline_spark.operators.windows",
    "nyc_data_pipeline_spark.operators.setops",
    "nyc_data_pipeline_spark.operators.scalars",
    "nyc_data_pipeline_spark.operators.skew",
    "nyc_data_pipeline_spark.streaming.batch_equiv",
    "nyc_data_pipeline_spark.streaming.stateful",
    "nyc_data_pipeline_spark.functions.textops",
    "nyc_data_pipeline_spark.dedup.exact",
    "nyc_data_pipeline_spark.dedup.ngram",
    "nyc_data_pipeline_spark.dedup.minhash",
    "nyc_data_pipeline_spark.dedup.simhash",
    "nyc_data_pipeline_spark.dedup.embedding",
    "nyc_data_pipeline_spark.similarity.brute_force",
    "nyc_data_pipeline_spark.similarity.lsh",
    "nyc_data_pipeline_spark.similarity.pandas_path",
    "nyc_data_pipeline_spark.similarity.ivf",
    "nyc_data_pipeline_spark.multimodal.binary_ops",
    "nyc_data_pipeline_spark.sources.scans",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
