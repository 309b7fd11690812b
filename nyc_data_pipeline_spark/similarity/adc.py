"""PQ-ADC search: asymmetric-distance shortlist over product-quantized
codes + exact rerank, audited against the exact scan (north-star M4
extension).

`emb_pq_codes` (centroids.py) builds the memory side of large-scale
ANN: each vector compresses to one code per subspace.  This module is
the SEARCH side — Jégou et al.'s Asymmetric Distance Computation in
its production two-stage form:

1. ADC shortlist: the query stays un-quantized; for each
   (subspace, code) the squared distance from the query's subvector to
   that codebook entry is precomputed into a lookup table, and a
   candidate's approximate distance is the sum of {N_SUB} table
   lookups — no per-dimension work against the corpus.  The top
   {SHORTLIST} by ADC distance survive.
2. Exact rerank: true integer-L2 is computed for shortlist members
   only ({SHORTLIST} rows per query, not the corpus), and the top
   {TOP_K} are returned.

`sim_pq_adc_recall` measures what the compressed first stage loses:
exact top-{TOP_K} vs the reranked ADC top-{TOP_K}, reported as
per-query overlap (the audit contract of `sim_matryoshka_recall`) — a
miss can only happen when a true neighbor fails to make the ADC
shortlist.  The codebook here is {N_CODES} deterministic seed groups
per subspace (label x vec_id mod {SEED_SPLIT} subvector means — the
`sim_topk_ivf` seed policy, refined k-means-style by real systems).

Plan shape (the part that scales):
- codebook ({N_CODES}x64 rows) and LUT (|queries|x{N_SUB}x{N_CODES}
  rows) BROADCAST; the corpus meets only its own codes (one narrow
  (sub, code)-keyed broadcast join), never other vectors.
- the per-candidate ADC sum groups {N_SUB} rows per (query, vec) —
  linear in corpus x queries with fixed-width integer rows; the
  rerank touches shortlist-sized data only.
- the exact referee reuses the brute-force discipline (tiny query set
  broadcast, corpus streamed once through a codegen'd integer fold);
  at 100 TB the referee runs over a sample while the ADC+rerank path
  is the production scan — the overlap-join algebra is unchanged.

All arithmetic is integer micro-units (floor(v*1e6), the centroids.py
policy), so Spark and DuckDB agree bit-exactly even though each engine
evaluates distance sums in its own order (integer addition is
associative; the oracle uses relational join-groups where Spark uses
array folds).

Reference parity: no vector surface in the reference (core is a
single-table ETL, spark_consumer.py:61-78); this is north-star
similarity-family coverage (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .brute_force import N_QUERIES, TOP_K
from .centroids import MICRO, PQ_SUB_DIMS

N_SUB = 64 // PQ_SUB_DIMS  # subspaces per vector
SEED_SPLIT = 4  # sub-groups per label -> N_CODES seed codebook entries
N_CODES = 8 * SEED_SPLIT
SHORTLIST = 10 * TOP_K  # ADC survivors per query entering exact rerank


def _micro_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, code_seed, dim, sub, vi) integer micro-unit rows."""
    return emb.select(
        "vec_id",
        (F.col("label") * SEED_SPLIT + F.col("vec_id") % SEED_SPLIT).alias("seed"),
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        "seed",
        "dim",
        F.expr(f"dim div {PQ_SUB_DIMS}").alias("sub"),
        F.floor(F.col("val").cast("double") * MICRO).cast("bigint").alias("vi"),
    )


def _codebook(v: DataFrame) -> DataFrame:
    """(code, sub, dim, ci): per-seed-group subvector means in micro
    units — the deterministic seed-codebook policy, at {N_CODES}
    entries per subspace."""
    cb = v.groupBy(F.col("seed").alias("code"), "sub", "dim").agg(
        F.sum("vi").alias("s"), F.count("*").alias("n")
    )
    return cb.select(
        "code",
        "sub",
        "dim",
        F.when(F.col("s") >= 0, F.expr("s div n"))
        .otherwise(-F.expr("(-s) div n"))
        .alias("ci"),
    )


def pq_assign(v: DataFrame, cmicro: DataFrame) -> DataFrame:
    """(vec_id, sub, code): nearest sub-codebook entry per subspace by
    exact-integer L2, ties broken by code."""
    diff = F.col("vi") - F.col("ci")
    dists = (
        v.join(F.broadcast(cmicro.drop("sub")), "dim")
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(diff * diff).alias("dist_sq"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("dist_sq"), F.asc("code"))
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("vec_id", "sub", "code")
    )


_MICRO_ARR = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {MICRO}) AS BIGINT))"
)
_INT_L2 = (
    "aggregate(zip_with(qm, m, (a, b) -> (a - b) * (a - b)), "
    "CAST(0 AS BIGINT), (acc, d) -> acc + d)"
)


@register(
    "sim_pq_adc_recall",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, label * {SEED_SPLIT} + vec_id % {SEED_SPLIT} AS seed,
               i - 1 AS dim, (i - 1) // {PQ_SUB_DIMS} AS sub,
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT) AS vi
        FROM ex
    ),
    cb AS (
        SELECT seed AS code, sub, dim,
               CAST(SUM(vi) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM v GROUP BY seed, sub, dim
    ),
    cmicro AS (
        SELECT code, sub, dim,
               CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS ci
        FROM cb
    ),
    dists AS (
        SELECT v.vec_id, v.sub, c.code,
               SUM((v.vi - c.ci) * (v.vi - c.ci)) AS dist_sq
        FROM v JOIN cmicro c ON v.dim = c.dim
        GROUP BY v.vec_id, v.sub, c.code
    ),
    codes AS (
        SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY dist_sq ASC, code ASC) AS rk
            FROM dists
        ) WHERE rk = 1
    ),
    q AS (SELECT vec_id AS query_id, dim, vi AS qi
          FROM v WHERE vec_id < {N_QUERIES}),
    lut AS (
        SELECT q.query_id, c.sub, c.code,
               SUM((q.qi - c.ci) * (q.qi - c.ci)) AS ld
        FROM q JOIN cmicro c ON q.dim = c.dim
        GROUP BY q.query_id, c.sub, c.code
    ),
    adc AS (
        SELECT l.query_id, k.vec_id AS neighbor_id,
               SUM(l.ld) AS adc_dist
        FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
        WHERE l.query_id <> k.vec_id
        GROUP BY l.query_id, k.vec_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist ASC, neighbor_id) AS rank
            FROM adc
        ) WHERE rank <= {SHORTLIST}
    ),
    rr AS (
        SELECT s.query_id, s.neighbor_id,
               SUM((q.qi - v.vi) * (q.qi - v.vi)) AS dist
        FROM short s
        JOIN v ON v.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id AND q.dim = v.dim
        GROUP BY s.query_id, s.neighbor_id
    ),
    r_adc AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY dist ASC, neighbor_id) AS rank
            FROM rr
        ) WHERE rank <= {TOP_K}
    ),
    exact AS (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               SUM((q.qi - v.vi) * (q.qi - v.vi)) AS dist
        FROM q JOIN v ON q.dim = v.dim
        WHERE q.query_id <> v.vec_id
        GROUP BY q.query_id, v.vec_id
    ),
    r_ex AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY dist ASC, neighbor_id) AS rank
            FROM exact
        ) WHERE rank <= {TOP_K}
    )
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST({TOP_K} AS BIGINT) AS k
    FROM r_ex f
    LEFT JOIN r_adc t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def sim_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query overlap between exact integer-L2 top-{TOP_K} and the
    ADC-shortlist({SHORTLIST})+exact-rerank top-{TOP_K} — `n_overlap/k`
    is recall@{TOP_K} of searching compressed codes instead of raw
    vectors; a miss means a true neighbor fell off the ADC shortlist."""
    return pq_adc_recall(load_table(spark, sf_dir, "embeddings"))


def pq_adc_recall(emb: DataFrame) -> DataFrame:
    """The composable operator behind `sim_pq_adc_recall` (also driven
    by scripts/scale_probe.py over key-shifted corpora)."""
    v = _micro_rows(emb)
    cmicro = _codebook(v)
    codes = pq_assign(v, cmicro)

    # Query-side LUT: |queries| x N_SUB x N_CODES integer rows.
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("vi").alias("qi")
    )
    qd = F.col("qi") - F.col("ci")
    lut = (
        q.join(F.broadcast(cmicro), "dim")
        .groupBy("query_id", "sub", "code")
        .agg(F.sum(qd * qd).alias("ld"))
    )

    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("ld").alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    short = (
        adc.withColumn("rank", F.row_number().over(w_adc))
        .where(F.col("rank") <= SHORTLIST)
        .select("query_id", "neighbor_id")
    )

    # Exact rerank over shortlist members only (integer-L2 fold against
    # the broadcast query arrays).
    m = emb.selectExpr("vec_id", f"{_MICRO_ARR} AS m")
    qm = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id AS q_id", f"{_MICRO_ARR} AS qm")
    )
    rr = (
        short.join(m, short["neighbor_id"] == m["vec_id"])
        .join(F.broadcast(qm), short["query_id"] == qm["q_id"])
        .selectExpr("query_id", "neighbor_id", f"{_INT_L2} AS dist")
    )
    w_rr = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    r_adc = (
        rr.withColumn("rank", F.row_number().over(w_rr))
        .where(F.col("rank") <= TOP_K)
        .select(
            F.col("query_id").alias("t_query"),
            F.col("neighbor_id").alias("t_neighbor"),
        )
    )

    # Exact referee: corpus streamed once through the same integer fold.
    exact = (
        m.join(
            F.broadcast(qm.selectExpr("q_id AS query_id", "qm")),
            F.col("query_id") != F.col("vec_id"),
        )
        .selectExpr("query_id", "vec_id AS neighbor_id", f"{_INT_L2} AS dist")
    )
    w_ex = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    r_ex = (
        exact.withColumn("rank", F.row_number().over(w_ex))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    return (
        r_ex.join(
            r_adc,
            (r_ex["query_id"] == r_adc["t_query"])
            & (r_ex["neighbor_id"] == r_adc["t_neighbor"]),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("t_neighbor").cast("bigint").alias("n_overlap"))
        .withColumn("k", F.lit(TOP_K).cast("bigint"))
    )
