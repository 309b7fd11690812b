"""The complete curate-to-trainer path as ONE committed artifact:
corpus_clean's five-stage funnel feeding the deterministic shard
export.

`pipeline_corpus_clean` reports the funnel; `sample_shard_export`
ships an uncurated corpus.  A real training run does BOTH in one job:
raw documents → language gate → quality gate → exact dedup → MinHash
near-dedup → hash-sharded, hash-ordered shard files the trainer
mounts.  This composition registers that whole path behind one oracle:
DuckDB independently replays the funnel (the corpus_clean CTE chain,
imported — one source of truth for the survivor semantics) AND the
shard routing, so a document that leaks past a gate, a lost survivor,
or a mis-sharded doc all break the per-shard hash.

Scale shape: the funnel is the documented corpus_clean plan (one
corpus pass + linear LSH), the export adds exactly one shard-keyed
shuffle + partitioned write on the SURVIVORS (the smallest frame in
the job).  Stats read back from committed files — the oracle certifies
what was written, not what was planned.

Reference parity: composes SURVEY §2's P-family gates with the
north-star export; the end-to-end twin of pipeline_corpus_clean
(pipelines/corpus_clean.py) with sample_shard_export's commit
discipline (pipelines/splits.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.scans import scratch_dir
from .corpus_clean import _flags, _oracle_ctes
from .splits import _ORDER, _SHARD, N_SHARDS

from ..dedup.minhash import minhash_lsh_keep_one
from ..functions.text import spark_token_hashes, spark_tokens


@register(
    "pipeline_export_ready",
    oracle=_oracle_ctes()
    + f""",
    survivors AS (
        SELECT doc_id, n_tokens FROM joined
        WHERE COALESCE(near_keep, false)
    ),
    sharded AS (
        SELECT doc_id, {_SHARD} AS shard, {_ORDER} AS order_key,
               n_tokens
        FROM survivors
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(order_key) AS BIGINT) AS head_key,
           CAST(arg_min(doc_id, order_key) AS BIGINT) AS head_doc
    FROM sharded
    GROUP BY shard
    """,
)
def pipeline_export_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate (lang → quality → exact → near dedup) and EXPORT the
    survivors into {N_SHARDS} deterministic hash-shards in one job;
    per-shard stats come off the committed files (module doc)."""
    flagged = _flags(spark, sf_dir)
    exact = flagged.filter("exact_keep").selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))})"
        " AS elems",
    )
    labels = minhash_lsh_keep_one(exact)
    survivors = (
        flagged.join(
            labels.withColumnRenamed("rep_id", "rep_id_"),
            on="doc_id",
            how="left",
        )
        .filter(F.coalesce(F.col("rep_id_") == F.col("doc_id"), F.lit(False)))
        .select("doc_id", "n_tokens")
    )
    d = survivors.selectExpr(
        "doc_id",
        f"{_SHARD} AS shard",
        f"{_ORDER} AS order_key",
        "n_tokens",
    )
    out = scratch_dir("export_ready_shards", sf_dir)
    (
        d.repartition(N_SHARDS, F.col("shard"))
        .sortWithinPartitions("shard", "order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("order_key").cast("bigint").alias("head_key"),
            F.min_by("doc_id", "order_key").cast("bigint").alias("head_doc"),
        )
    )
