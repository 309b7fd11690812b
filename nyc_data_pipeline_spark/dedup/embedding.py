"""Embedding-cosine near-duplicate detection (north-star M4).

Exact pairwise cosine over (a bounded slice of) the corpus — the
referee for the LSH-bucketed scale path in similarity/lsh.py.  The
fixture embeddings are isotropic random vectors (max pairwise cosine
≈ 0.46), so the near-dup threshold is 0.4; real deduplication corpora
cluster much tighter and use ~0.95.

Scale: exact all-pairs is O(n²·d) — correct only as a verifier on
candidates or on bounded slices.  The registered query bounds ids, and
at 100 TB the candidate set comes from LSH buckets (same verification
expression, unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register

THRESHOLD = 0.4
MAX_ID = 300  # bound the exact all-pairs slice


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq
        FROM embeddings WHERE vec_id < {MAX_ID}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {duck_dot('a.embedding', 'b.embedding')} / (sqrt(a.sq) * sqrt(b.sq))
             AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {duck_dot('a.embedding', 'b.embedding')} / (sqrt(a.sq) * sqrt(b.sq))
          >= {THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs (θ=0.4) on vec_id < 300."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < MAX_ID)
    v = e.selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
    a = v.selectExpr("vec_id AS vec_a", "embedding AS ea", "sq AS sqa")
    b = v.selectExpr("vec_id AS vec_b", "embedding AS eb", "sq AS sqb")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .selectExpr(
            "vec_a",
            "vec_b",
            f"{spark_dot('ea', 'eb')} / (sqrt(sqa) * sqrt(sqb)) AS cosine",
        )
        .filter(F.col("cosine") >= THRESHOLD)
    )
