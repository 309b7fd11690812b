"""IVF-style ANN: coarse-quantizer cells + nprobe search.

The third leg of the similarity stack (brute force = exact referee,
LSH = hash-bucket cut, IVF = data-adaptive cells):

  1. coarse centroids — two deterministic choices, both registered:
     * ``sim_topk_ivf``: the first K_CELLS vectors, fixed (the
       plumbing referee — partition/probe/rerank identical);
     * ``sim_topk_ivf_kmeans``: one seeded Lloyd refinement — assign
       every vector to its max-cosine initial centroid, then take each
       cell's elementwise mean.  The mean is computed as an exact
       decimal sum per component divided by the cell count, so it is
       order-independent and bit-identical across engines (a naive
       double sum would differ between Spark's partial-agg order and
       DuckDB's).  Fixed seed centroids + fixed one iteration keeps
       the whole pipeline deterministic, so the oracle stays exact;
  2. every vector is assigned to its max-cosine centroid (ties → lower
     centroid id) — one broadcast join against K_CELLS rows, no shuffle
     of the corpus;
  3. each query probes its NPROBE nearest cells and reranks only those
     cells' members with the exact JVM-fold cosine.

Scale shape: candidate count per query ≈ NPROBE·(n/K_CELLS) instead of
n; the corpus-side cost is one scan + small broadcast joins (the mean
step is a (cid, pos)-keyed hash-agg over n·d rows — linear, partial-agg
friendly).  Recall@5 vs sim_topk_bruteforce is a measured property
(SCALE.md §7): first-K centroids 0.92 at sf0.01 / 0.98 at sf0.1; the
k-means refinement's recall is recorded alongside by
scripts/ivf_recall.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_dot, spark_sq_norm
from ..registry import register
from .brute_force import N_QUERIES, TOP_K

K_CELLS = 16
NPROBE = 2


def rank_cells(vectors: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, sq) × centroids (cid, c_emb, c_sq) →
    n·K scored rows with the per-vector cosine rank (`crank`; 1 = the
    assignment cell, ties → lower cid).  One broadcast join + the
    vec_id-keyed argmax window — the shared coarse-quantizer step for
    IVF search here and SemDeDup (dedup/embedding.py), kept in ONE
    place so tie-break and cosine text cannot drift between them."""
    scored_cells = vectors.join(F.broadcast(cent)).selectExpr(
        "vec_id",
        "embedding",
        "sq",
        "cid",
        f"{spark_dot('embedding', 'c_emb')} / (sqrt(sq) * sqrt(c_sq)) AS c_cos",
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cid"))
    return scored_cells.withColumn("crank", F.row_number().over(w_cell))


def _search_cells(vectors: DataFrame, cent: DataFrame, k: int) -> DataFrame:
    """Assign + probe + rerank against a given centroid table
    (cid, c_emb, c_sq).  One corpus scan, one broadcast join."""
    ranked = rank_cells(vectors, cent)
    assign = ranked.filter(F.col("crank") == 1).select(
        "vec_id", "embedding", "sq", "cid"
    )
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE))
        .selectExpr("vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq", "cid")
    )
    cand = probes.join(assign, "cid").filter(F.col("query_id") != F.col("vec_id"))
    scored = cand.selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        f"{spark_dot('q_emb', 'embedding')} / (sqrt(q_sq) * sqrt(sq)) AS cosine",
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _init_centroids(vectors: DataFrame) -> DataFrame:
    return vectors.filter(F.col("vec_id") < K_CELLS).selectExpr(
        "vec_id AS cid", "embedding AS c_emb", "sq AS c_sq"
    )


def ivf_topk(vectors: DataFrame, k: int = TOP_K) -> DataFrame:
    """(vec_id, embedding, sq) → top-k per query (vec_id < N_QUERIES)
    searching only NPROBE probed cells."""
    return _search_cells(vectors, _init_centroids(vectors), k)


def kmeans_refined_centroids(vectors: DataFrame) -> DataFrame:
    """One Lloyd iteration from the first-K seed: exact decimal
    elementwise means of each cell's members.

    sum(CAST(component AS DECIMAL(27,12))) is exact — a float times
    10^12 has ≤ 2^52 mantissa bits, so the quantization itself is
    lossless-roundable and the sum is order-independent; the final
    sum/count division is one IEEE double op.  Both engines therefore
    produce bit-identical refined centroids.
    """
    cent0 = _init_centroids(vectors)
    scored = vectors.join(F.broadcast(cent0)).selectExpr(
        "vec_id",
        "embedding",
        "cid",
        f"{spark_dot('embedding', 'c_emb')} / (sqrt(sq) * sqrt(c_sq)) AS c_cos",
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cid"))
    assign0 = (
        scored.withColumn("crank", F.row_number().over(w_cell))
        .filter(F.col("crank") == 1)
        .select("vec_id", "embedding", "cid")
    )
    comp = assign0.selectExpr("cid", "posexplode(embedding) AS (pos, val)")
    means = comp.groupBy("cid", "pos").agg(
        (
            F.sum(F.expr("CAST(CAST(val AS DOUBLE) AS DECIMAL(27,12))")).cast("double")
            / F.count("val")
        ).alias("mval")
    )
    return (
        means.groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, mval))), s -> s.mval)"
            ).alias("c_emb")
        )
        .selectExpr("cid", "c_emb", f"{spark_sq_norm('c_emb')} AS c_sq")
    )


def _search_sql(cent_cte: str) -> str:
    """DuckDB mirror of _search_cells against centroid CTE `cent_cte`."""
    return f"""
    scored_cells AS (
        SELECT v.vec_id, v.embedding, v.sq, c.cid,
               {duck_dot('v.embedding', 'c.c_emb')} / (sqrt(v.sq) * sqrt(c.c_sq))
                 AS c_cos
        FROM v, {cent_cte} c
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
                 / (sqrt(probes.q_sq) * sqrt(assign.sq)) AS cosine
        FROM probes JOIN assign ON probes.cid = assign.cid
        WHERE probes.query_id <> assign.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        FROM cand
    ) WHERE rank <= {TOP_K}
    """


def _oracle() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS c_emb, sq AS c_sq
        FROM v WHERE vec_id < {K_CELLS}
    ),
    {_search_sql('cent')}
    """


def _oracle_kmeans() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq FROM embeddings
    ),
    cent0 AS (
        SELECT vec_id AS cid, embedding AS c_emb, sq AS c_sq
        FROM v WHERE vec_id < {K_CELLS}
    ),
    scored0 AS (
        SELECT v.vec_id, v.embedding, c.cid,
               {duck_dot('v.embedding', 'c.c_emb')} / (sqrt(v.sq) * sqrt(c.c_sq))
                 AS c_cos
        FROM v, cent0 c
    ),
    assign0 AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, cid) AS crank
            FROM scored0
        ) WHERE crank = 1
    ),
    comp AS (
        SELECT cid,
               unnest(generate_series(1, len(embedding))) - 1 AS pos,
               unnest(list_transform(generate_series(1, len(embedding)),
                                     i -> CAST(embedding[i] AS DOUBLE))) AS val
        FROM assign0
    ),
    means AS (
        SELECT cid, pos,
               CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS mval
        FROM comp GROUP BY cid, pos
    ),
    cent_arr AS (
        SELECT cid, list(mval ORDER BY pos) AS c_emb FROM means GROUP BY cid
    ),
    cent AS (
        SELECT cid, c_emb, {duck_sq_norm('c_emb')} AS c_sq FROM cent_arr
    ),
    {_search_sql('cent')}
    """


@register("sim_topk_ivf", oracle=_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(16 cells, nprobe=2) approximate top-5 cosine neighbors for
    query vectors vec_id < 10."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
    return ivf_topk(v)


@register("sim_topk_ivf_kmeans", oracle=_oracle_kmeans())
def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with one exact-decimal Lloyd refinement of the first-K seed
    centroids (deterministic, oracle-exact), then the same
    nprobe-2 probe + exact rerank."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
    return _search_cells(v, kmeans_refined_centroids(v), TOP_K)
