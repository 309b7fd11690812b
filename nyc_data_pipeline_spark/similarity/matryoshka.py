"""Truncated-dimension retrieval audit (Matryoshka-style).

Matryoshka representation learning trains embeddings whose PREFIX is
itself a usable embedding; retrieval stacks exploit it by searching at
a low dimension (cheap: less I/O, smaller indexes, faster dot
products) and reranking at full dimension.  Before committing a
truncation width, a pipeline must MEASURE what the cheap pass loses —
this operator is that audit: exact top-k at full dimension vs exact
top-k on the first {TRUNC_DIMS} dims, reporting per-query overlap
(recall@k of the truncated search against the full-dim truth).

Plan shape (both rankings reuse brute_force.cosine_topk): the tiny
query set broadcasts twice, candidates stream once per ranking, the
two top-k lists join on (query, neighbor) — everything after the scans
is ranked-output-sized.  At 100 TB the same audit runs over an IVF
sample rather than the full corpus; the overlap-join algebra is
unchanged.

Reference parity: no vector surface in the reference; north-star
similarity family (SURVEY §2 extension), sibling of
scripts/ivf_recall.py's measured-recall methodology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register
from .brute_force import N_QUERIES, TOP_K, cosine_topk

TRUNC_DIMS = 16


def _ranked_sql(emb_expr: str, alias: str) -> str:
    """DuckDB CTE chain computing top-k per query over `emb_expr`."""
    return f"""
    v_{alias} AS (
        SELECT vec_id, {emb_expr} AS emb,
               {duck_sq_norm(emb_expr)} AS sq
        FROM embeddings
    ),
    q_{alias} AS (
        SELECT vec_id AS query_id, emb AS q_emb, sq AS q_sq
        FROM v_{alias} WHERE vec_id < {N_QUERIES}
    ),
    s_{alias} AS (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               {duck_dot('q.q_emb', 'v.emb')} / (sqrt(q.q_sq) * sqrt(v.sq))
                 AS cosine
        FROM q_{alias} q JOIN v_{alias} v ON q.query_id <> v.vec_id
    ),
    r_{alias} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
            FROM s_{alias}
        ) WHERE rank <= {TOP_K}
    )"""


@register(
    "sim_matryoshka_recall",
    oracle=f"""
    WITH {_ranked_sql('embedding', 'full')},
    {_ranked_sql(f'list_slice(embedding, 1, {TRUNC_DIMS})', 'tr')}
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST({TOP_K} AS BIGINT) AS k
    FROM r_full f
    LEFT JOIN r_tr t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query overlap between full-dim exact top-{TOP_K} and the
    top-{TOP_K} computed on the first {TRUNC_DIMS} dims —
    `n_overlap / k` is recall@{TOP_K} of the truncated search."""
    e = load_table(spark, sf_dir, "embeddings")

    def ranked(emb: str) -> DataFrame:
        v = e.selectExpr(
            "vec_id", f"{emb} AS embedding"
        ).selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
        q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
            "vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq"
        )
        return cosine_topk(q, v).select("query_id", "neighbor_id")

    full = ranked("embedding")
    tr = ranked(f"slice(embedding, 1, {TRUNC_DIMS})").select(
        F.col("query_id").alias("t_query"), F.col("neighbor_id").alias("t_neighbor")
    )
    return (
        full.join(
            tr,
            (full["query_id"] == tr["t_query"])
            & (full["neighbor_id"] == tr["t_neighbor"]),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("t_neighbor").cast("bigint").alias("n_overlap"))
        .withColumn("k", F.lit(TOP_K).cast("bigint"))
    )
