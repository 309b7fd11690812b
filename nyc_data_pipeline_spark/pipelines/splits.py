"""Deterministic train/val/test splitting for a training corpus.

The one operation every training-data pipeline runs last: partition the
corpus into train/validation/test such that (a) the assignment is a
PURE FUNCTION of the example's identity — reprocessing, backfills, and
incremental batches land every doc in the same split forever, with no
split-leakage between runs — and (b) the split is auditable per source
(stratification report).  ``rand()``-based splits violate (a); file- or
partition-based splits violate (b) under skew.

The assignment hash is DIFFERENT from the sampling hash
(`pipelines.mixing._BUCKET`): reusing one hash for two decisions
correlates them (every sampled-in doc would land in the same split
region — a classic silent-leakage bug), so this module salts with its
own multiplier.

Scale shape: the split decision is a zero-shuffle codegen'd projection
over the scan; the stratification report is one map-side-combined
rollup on (source, split).  At 100 TB the assignment costs scan
throughput and nothing else, and writing the three splits is one
partitionBy("split") pass.

Reference parity note: the reference has no splits (it is an ETL
dashboard); this is north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

HASH_MOD = 1_000_000_007
SPLIT_MULT = 2_246_822_519  # xxhash prime — distinct from mixing.MIX_MULT
TRAIN_PERMILLE = 900
VAL_PERMILLE = 50  # test gets the remaining 50

# h(doc_id) in [0, 1000); doc_id reduced mod HASH_MOD first so the
# multiply stays inside int64 (1e9 * 2.25e9 < 2^63).
_SPLIT_BUCKET = f"(((doc_id % {HASH_MOD}) * {SPLIT_MULT}) % {HASH_MOD}) % 1000"

_SPLIT_CASE = f"""CASE
    WHEN {_SPLIT_BUCKET} < {TRAIN_PERMILLE} THEN 'train'
    WHEN {_SPLIT_BUCKET} < {TRAIN_PERMILLE + VAL_PERMILLE} THEN 'val'
    ELSE 'test' END"""


def assign_split(d: DataFrame) -> DataFrame:
    """Add the deterministic `split` column to a frame with doc_id."""
    return d.withColumn("split", F.expr(_SPLIT_CASE))


@register(
    "sample_train_split",
    oracle=f"""
    SELECT source, {_SPLIT_CASE} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    GROUP BY 1, 2
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic {TRAIN_PERMILLE}/{VAL_PERMILLE}/rest
    train/val/test assignment with its stratification report: per
    (source, split) doc counts, char mass, and min doc_id (a spot-check
    handle).  The report is what a release audit reads — it proves the
    split ratios hold within every source, not just globally."""
    d = assign_split(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source", "split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )
