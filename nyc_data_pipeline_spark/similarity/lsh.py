"""Random-hyperplane LSH similarity search (north-star M4) — the scale
path for ANN, with a full DuckDB oracle.

Sign-random-projection LSH: 4 fixed hyperplanes (seeded, embedded as
literals in both engines) map each vector to a 4-bit bucket; neighbor
candidates are vectors sharing the query's bucket; candidates are
reranked by exact cosine, top-3 kept.

Scale shape: bucketing is a projection (no shuffle); the candidate
join is an equi-join on the bucket id — at 100 TB with b bits the
candidate set shrinks ~2^-b, and multi-probe (flipping low-margin
bits) trades recall for fan-out without changing the plan shape.
Recall vs the exact scan is measured in tests against
sim_topk_bruteforce.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register

DIM = 64
N_PLANES = 4
N_QUERIES = 50
TOP_K = 3

_rng = random.Random(7)
# 4-decimal literals so the Spark and SQL parses yield identical doubles.
PLANES = [
    [round(_rng.gauss(0.0, 1.0), 4) for _ in range(DIM)] for _ in range(N_PLANES)
]


def _spark_plane(p: list[float]) -> str:
    return f"array({', '.join(repr(x) for x in p)})"


def _duck_plane(p: list[float]) -> str:
    return f"[{', '.join(repr(x) for x in p)}]"


def _spark_bucket(vec: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {spark_dot(vec, _spark_plane(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(PLANES)
    )
    return f"({terms})"


def _duck_bucket(vec: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {duck_dot(vec, _duck_plane(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(PLANES)
    )
    return f"({terms})"


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq,
               {_duck_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, sq AS q_sq, bucket
          FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               {duck_dot('q.q_emb', 'v.embedding')} / (sqrt(q.q_sq) * sqrt(v.sq))
                 AS cosine
        FROM q JOIN v ON q.bucket = v.bucket AND q.query_id <> v.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3 neighbors for vec_id < 50:
    bucket equi-join then exact-cosine rerank."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.selectExpr(
        "vec_id",
        "embedding",
        f"{spark_sq_norm('embedding')} AS sq",
        f"{_spark_bucket('embedding')} AS bucket",
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq", "bucket AS q_bucket"
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{spark_dot('q_emb', 'embedding')} / (sqrt(q_sq) * sqrt(sq)) AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
