"""Reciprocal-rank fusion of two retriever rankings (hybrid search).

Production retrieval is hybrid: several retrievers rank candidates
under different notions of relevance and the lists are FUSED.  The
standard parameter-free fusion is RRF (Cormack et al., SIGIR 2009):

    credit(doc) = Σ_lists 1 / (K + rank_list(doc)),   K = 60

Here the two lists come from the same IVF candidate pull (one corpus
scan) ranked two ways that genuinely disagree: FULL-dimension cosine
(the expensive semantic ranking) and the Matryoshka-prefix cosine on
the first {TRUNC_DIMS} dims (the cheap ranking a multi-resolution
stack serves from its small index — similarity/matryoshka.py measures
exactly how much the prefix misranks; this operator is the production
answer to that audit: fuse the lists so documents the truncation
demotes are rescued by the full-dim list and vice versa).  The
fixture's embeddings are unit-norm, so a raw-dot second list would be
a disguised copy of cosine — the prefix ranking disagrees for real.

The reciprocal credit is carried as the exact integer
`RRF_SCALE div (K + rank)` (Spark `div` == DuckDB `//` on
non-negatives), so fused credits — and therefore the fused ranking —
are bit-identical across engines; no float sum of reciprocals.

Scale shape: identical to sim_topk_ivf up to the candidate set
(broadcast centroids, corpus streams once, candidates ≈
NPROBE·(n/K_CELLS) per query); both rankings are windows over the
per-query candidate slice, the rank cut keeps RETR_K per list, and
fusion is a tiny (query, neighbor)-keyed merge of two ≤RETR_K lists.
Nothing after the candidate pull depends on corpus size.

Reference parity: no retrieval surface in the reference; north-star
similarity family (SURVEY §2 extension) alongside similarity/ivf.py
and similarity/matryoshka.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register
from .brute_force import N_QUERIES
from .ivf import K_CELLS, NPROBE, rank_cells, _init_centroids
from .matryoshka import TRUNC_DIMS

RRF_K = 60
RRF_SCALE = 1_000_000_000  # integer reciprocal credit: SCALE div (K + rank)
RETR_K = 20  # per-retriever list cut before fusion
FUSED_K = 5

_SPARK_T_Q = f"slice(q_emb, 1, {TRUNC_DIMS})"
_SPARK_T_V = f"slice(embedding, 1, {TRUNC_DIMS})"
_DUCK_T_Q = f"list_slice(probes.q_emb, 1, {TRUNC_DIMS})"
_DUCK_T_V = f"list_slice(assign.embedding, 1, {TRUNC_DIMS})"


@register(
    "sim_rrf_fusion",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS c_emb, sq AS c_sq
        FROM v WHERE vec_id < {K_CELLS}
    ),
    scored_cells AS (
        SELECT v.vec_id, v.embedding, v.sq, c.cid,
               {duck_dot('v.embedding', 'c.c_emb')} / (sqrt(v.sq) * sqrt(c.c_sq))
                 AS c_cos
        FROM v, cent c
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, cid) AS crank
        FROM scored_cells
    ),
    assign AS (
        SELECT vec_id, embedding, sq, cid FROM ranked WHERE crank = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, embedding AS q_emb, sq AS q_sq, cid
        FROM ranked WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
    ),
    cand AS (
        SELECT DISTINCT probes.query_id, assign.vec_id AS neighbor_id,
               {duck_dot('probes.q_emb', 'assign.embedding')}
                 / (sqrt(probes.q_sq) * sqrt(assign.sq)) AS cosine,
               {duck_dot(_DUCK_T_Q, _DUCK_T_V)}
                 / (sqrt({duck_sq_norm(_DUCK_T_Q)})
                    * sqrt({duck_sq_norm(_DUCK_T_V)})) AS t_cos
        FROM probes JOIN assign ON probes.cid = assign.cid
        WHERE probes.query_id <> assign.vec_id
    ),
    both_ranks AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id)
                 AS r_full,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY t_cos DESC, neighbor_id) AS r_tr
        FROM cand
    ),
    credits AS (
        SELECT query_id, neighbor_id,
               CASE WHEN r_full <= {RETR_K}
                    THEN {RRF_SCALE} // ({RRF_K} + r_full) ELSE 0 END
                 AS credit_full,
               CASE WHEN r_tr <= {RETR_K}
                    THEN {RRF_SCALE} // ({RRF_K} + r_tr) ELSE 0 END
                 AS credit_tr
        FROM both_ranks
        WHERE r_full <= {RETR_K} OR r_tr <= {RETR_K}
    )
    SELECT query_id, neighbor_id,
           CAST(credit_full AS BIGINT) AS credit_full,
           CAST(credit_tr AS BIGINT) AS credit_tr,
           CAST(credit_full + credit_tr AS BIGINT) AS rrf_credit,
           rank
    FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY credit_full + credit_tr DESC, neighbor_id)
                  AS INTEGER) AS rank
        FROM credits
    ) WHERE rank <= {FUSED_K}
    """,
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-{FUSED_K} per query: IVF candidates ranked by
    full-dimension cosine and by the {TRUNC_DIMS}-dim Matryoshka-prefix
    cosine, RRF-merged with exact integer reciprocal credits (both
    per-list credits emitted for auditability)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
    ranked = rank_cells(v, _init_centroids(v))
    assign = ranked.filter(F.col("crank") == 1).select(
        "vec_id", "embedding", "sq", "cid"
    )
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE)
    ).selectExpr("vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq", "cid")
    cand = (
        probes.join(assign, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{spark_dot('q_emb', 'embedding')} / (sqrt(q_sq) * sqrt(sq))"
            " AS cosine",
            f"{spark_dot(_SPARK_T_Q, _SPARK_T_V)}"
            f" / (sqrt({spark_sq_norm(_SPARK_T_Q)})"
            f" * sqrt({spark_sq_norm(_SPARK_T_V)})) AS t_cos",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    w_tr = Window.partitionBy("query_id").orderBy(
        F.desc("t_cos"), F.asc("neighbor_id")
    )
    both = cand.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_tr).alias("r_tr"),
    )
    credits = both.filter(
        (F.col("r_full") <= RETR_K) | (F.col("r_tr") <= RETR_K)
    ).select(
        "query_id",
        "neighbor_id",
        F.when(
            F.col("r_full") <= RETR_K,
            F.expr(f"{RRF_SCALE} div ({RRF_K} + r_full)"),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("credit_full"),
        F.when(
            F.col("r_tr") <= RETR_K,
            F.expr(f"{RRF_SCALE} div ({RRF_K} + r_tr)"),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("credit_tr"),
    )
    w_fused = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("credit_full") + F.col("credit_tr")),
        F.asc("neighbor_id"),
    )
    return (
        credits.withColumn(
            "rrf_credit",
            (F.col("credit_full") + F.col("credit_tr")).cast("bigint"),
        )
        .withColumn("rank", F.row_number().over(w_fused).cast("int"))
        .filter(F.col("rank") <= FUSED_K)
        .select(
            "query_id",
            "neighbor_id",
            "credit_full",
            "credit_tr",
            "rrf_credit",
            "rank",
        )
    )
