"""Contrastive-training neighbor ops: hard-negative mining and kNN
label voting.

Two standard embedding-corpus passes a training-data pipeline runs on
top of similarity search:

- **Hard-negative mining** (`sim_hard_negatives`): for each query
  vector, the top-k most-similar vectors with a DIFFERENT label.
  These near-miss negatives are what contrastive losses (InfoNCE,
  triplet) need — random negatives are too easy to carry gradient.
- **kNN label vote** (`emb_knn_label_vote`): predict each query's
  label as the majority label among its k nearest neighbors and
  compare to the stored label — the standard mislabel / outlier
  detector for labeled embedding corpora.

Both reuse the brute-force plan shape (similarity/brute_force.py):
broadcast(queries) against the candidate corpus, so the corpus streams
once with no shuffle; the only shuffled data is the tiny ranked
output.  At 100 TB the same operators run after an LSH/IVF candidate
cut (similarity/lsh.py, similarity/ivf.py) — the top-k window and the
vote aggregate are unchanged, only the candidate set shrinks.

Scoring is the exact fold-based cosine (functions/vectors.py), bit
identical across engines; ranking and vote tiebreaks are total orders
(cosine desc, neighbor_id asc; vote count desc, label asc) so results
are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register

N_QUERIES = 10
TOP_K = 5
VOTE_K = 7
N_VOTERS = 40


def _scored(e: DataFrame, n_queries: int) -> DataFrame:
    """(query_id, q_label, neighbor_id, n_label, cosine) for every
    query×candidate pair, queries broadcast."""
    v = e.selectExpr(
        "vec_id", "embedding", "label", f"{spark_sq_norm('embedding')} AS sq"
    )
    q = v.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS query_id",
        "embedding AS q_emb",
        "label AS q_label",
        "sq AS q_sq",
    )
    return v.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    ).selectExpr(
        "query_id",
        "q_label",
        "vec_id AS neighbor_id",
        "label AS n_label",
        f"{spark_dot('q_emb', 'embedding')} / (sqrt(q_sq) * sqrt(sq)) AS cosine",
    )


def _duck_scored(n_queries: int) -> str:
    return f"""
    v AS (
        SELECT vec_id, embedding, label,
               {duck_sq_norm('embedding')} AS sq
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label,
               sq AS q_sq
        FROM v WHERE vec_id < {n_queries}
    ),
    scored AS (
        SELECT q.query_id, q.q_label, v.vec_id AS neighbor_id,
               v.label AS n_label,
               {duck_dot('q.q_emb', 'v.embedding')} /
                   (sqrt(q.q_sq) * sqrt(v.sq)) AS cosine
        FROM q JOIN v ON q.query_id <> v.vec_id
    )"""


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH {_duck_scored(N_QUERIES)}
    SELECT query_id, q_label, neighbor_id, n_label, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored WHERE n_label <> q_label
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} most-cosine-similar OTHER-label vectors per query
    (vec_id < {N_QUERIES}) — the hard negatives a contrastive trainer
    mines.  Label filter applies BEFORE the rank window, so each query
    gets k true negatives, not k-minus-however-many positives."""
    scored = _scored(load_table(spark, sf_dir, "embeddings"), N_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.filter(F.col("n_label") != F.col("q_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "q_label", "neighbor_id", "n_label", "cosine", "rank")
    )


@register(
    "emb_knn_label_vote",
    oracle=f"""
    WITH {_duck_scored(N_VOTERS)},
    topk AS (
        SELECT query_id, q_label, n_label FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= {VOTE_K}
    ),
    votes AS (
        SELECT query_id, q_label, n_label,
               CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM topk GROUP BY query_id, q_label, n_label
    )
    SELECT query_id, q_label, predicted_label, n_votes,
           predicted_label = q_label AS label_agrees
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY n_votes DESC, n_label) AS vr,
               n_label AS predicted_label
        FROM votes
    ) WHERE vr = 1
    """,
)
def emb_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label vote: majority label among the {VOTE_K} nearest
    neighbors of each query (vec_id < {N_VOTERS}), with a
    deterministic tiebreak (vote count desc, label asc);
    `label_agrees` = does the vote match the stored label (false →
    mislabel/outlier candidate)."""
    scored = _scored(load_table(spark, sf_dir, "embeddings"), N_VOTERS)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= VOTE_K)
        .select("query_id", "q_label", "n_label")
    )
    votes = topk.groupBy("query_id", "q_label", "n_label").agg(
        F.count("*").alias("n_votes")
    )
    vw = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("n_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "q_label",
            F.col("n_label").alias("predicted_label"),
            "n_votes",
            (F.col("n_label") == F.col("q_label")).alias("label_agrees"),
        )
    )
