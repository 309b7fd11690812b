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

from ..catalog import load_table, persist_scoped
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


# --- LSH keep-one scale path ----------------------------------------------
#
# Banded sign-random-projection buckets (3 bands x 8 fixed hyperplanes)
# with min-doc-id representative assignment — the linear form of
# embedding dedup (same keep-one semantics as dedup/minhash.py and
# dedup/simhash.py): O(n·bands) rows shuffled on short bucket keys, no
# pair materialization.  Vectors agreeing with a smaller-id vector on
# all 8 signs of any band merge into its group; band count trades merge
# recall against bucket collision, recall is deterministic and the
# DuckDB oracle reproduces it exactly.

import random as _random

_N_BANDS = 3
_PLANES_PER_BAND = 8
_DIM = 64

_drng = _random.Random(11)
_DEDUP_BANDS = [
    [
        [round(_drng.gauss(0.0, 1.0), 4) for _ in range(_DIM)]
        for _ in range(_PLANES_PER_BAND)
    ]
    for _ in range(_N_BANDS)
]


def _sp_plane(p):
    return f"array({', '.join(repr(x) for x in p)})"


def _dk_plane(p):
    return f"[{', '.join(repr(x) for x in p)}]"


def _sp_band_bucket(band):
    terms = " + ".join(
        f"(CASE WHEN {spark_dot('embedding', _sp_plane(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(band)
    )
    return f"({terms})"


def _dk_band_bucket(band):
    terms = " + ".join(
        f"(CASE WHEN {duck_dot('embedding', _dk_plane(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(band)
    )
    return f"({terms})"


def _keep_one_oracle() -> str:
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {b} AS band, {_dk_band_bucket(band)} AS bucket FROM embeddings"
        for b, band in enumerate(_DEDUP_BANDS)
    )
    return f"""
    WITH bands AS (
        {band_selects}
    ),
    bucket_reps AS (
        SELECT band, bucket, min(vec_id) AS bucket_rep
        FROM bands GROUP BY band, bucket
    )
    SELECT b.vec_id, min(r.bucket_rep) AS rep_id
    FROM bands b
    JOIN bucket_reps r ON b.band = r.band AND b.bucket = r.bucket
    GROUP BY b.vec_id
    """


@register("dedup_embedding_lsh_keep_one", oracle=_keep_one_oracle())
def dedup_embedding_lsh_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear embedding dedup: (vec_id, rep_id) canonical-representative
    assignment via banded hyperplane-sign buckets."""
    e = load_table(spark, sf_dir, "embeddings")
    band_structs = ", ".join(
        f"struct({b} AS band, {_sp_band_bucket(band)} AS bucket)"
        for b, band in enumerate(_DEDUP_BANDS)
    )
    bands = e.selectExpr(
        "vec_id", f"explode(array({band_structs})) AS bk"
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    reps = bands.groupBy("band", "bucket").agg(F.min("vec_id").alias("bucket_rep"))
    return (
        bands.join(reps, ["band", "bucket"])
        .groupBy("vec_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )


# --- SemDeDup-style semantic dedup (cluster -> prune-vs-representative)

# Coarse cells: the deterministic first-K seed (the similarity/ivf.py
# convention; a k-means-refined centroid table drops in unchanged).
# SemDeDup (Abbas et al. 2023, public) clusters the embedding space and
# drops, within each cluster, every member whose cosine to the
# cluster's keeper exceeds a threshold — catching SEMANTIC duplicates
# (paraphrases, boilerplate re-writes) that token-level MinHash misses.
K_SEM = 16
# Fixture embeddings are isotropic (max pairwise cosine ~0.46), so the
# demo threshold sits below that; real corpora cluster much tighter and
# run ~0.95 (same knob).
SEM_TAU = 0.30


@register(
    "dedup_semantic_cluster",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding, {duck_sq_norm('embedding')} AS sq
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS c_emb, sq AS c_sq
        FROM v WHERE vec_id < {K_SEM}
    ),
    scored AS (
        SELECT v.vec_id, v.embedding, v.sq, cent.cid,
               {duck_dot('v.embedding', 'cent.c_emb')}
                 / (sqrt(v.sq) * sqrt(cent.c_sq)) AS c_cos
        FROM v, cent
    ),
    assign AS (
        SELECT vec_id, embedding, sq, cid FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cid) AS rn
            FROM scored) WHERE rn = 1
    ),
    reps AS (SELECT cid, MIN(vec_id) AS rep_id FROM assign GROUP BY cid),
    repv AS (
        SELECT r.cid, r.rep_id, a.embedding AS r_emb, a.sq AS r_sq
        FROM reps r JOIN assign a ON a.vec_id = r.rep_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid, rv.rep_id,
           {duck_dot('a.embedding', 'rv.r_emb')}
             / (sqrt(a.sq) * sqrt(rv.r_sq)) AS rep_cosine,
           (a.vec_id = rv.rep_id
            OR {duck_dot('a.embedding', 'rv.r_emb')}
               / (sqrt(a.sq) * sqrt(rv.r_sq)) < {SEM_TAU}) AS keep
    FROM assign a JOIN repv rv ON a.cid = rv.cid
    """,
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every embedding to its max-cosine coarse cell
    (broadcast against {K_SEM} centroids — no corpus shuffle for the
    scoring), elect each cell's min-id member as the keeper, and flag
    members whose exact cosine to the keeper reaches SEM_TAU as
    semantic duplicates (`keep = false`).

    Scale shape: one corpus scan; the only corpus-sized shuffle is the
    per-vector argmax window over n·{K_SEM} scored rows (the exact
    shape similarity/ivf.py ships); keeper election is a {K_SEM}-row
    aggregate and the keeper table broadcasts back.  The assignment
    table feeds THREE consumers (keeper election, keeper-embedding
    lookup, final join), so it is persist_scoped — without it each
    branch re-runs the argmax window (the containment.py diamond
    lesson).  Every cosine is the bit-exact JVM fold / DuckDB
    list_reduce pair from functions/vectors.py, so the driver hash
    certifies the keep/drop decision boundary itself."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq"
    )
    cent = v.filter(F.col("vec_id") < K_SEM).selectExpr(
        "vec_id AS cid", "embedding AS c_emb", "sq AS c_sq"
    )
    from ..similarity.ivf import rank_cells

    assign = persist_scoped(
        "embedding.sem_assign",
        rank_cells(v, cent)
        .filter("crank = 1")
        .select("vec_id", "embedding", "sq", "cid"),
    )
    reps = assign.groupBy("cid").agg(F.min("vec_id").alias("rep_id"))
    repv = reps.join(
        assign.selectExpr(
            "vec_id AS rep_id", "embedding AS r_emb", "sq AS r_sq"
        ),
        "rep_id",
    )
    cos = f"{spark_dot('embedding', 'r_emb')} / (sqrt(sq) * sqrt(r_sq))"
    return assign.join(F.broadcast(repv), "cid").selectExpr(
        "vec_id",
        "CAST(cid AS BIGINT) AS cid",
        "rep_id",
        f"{cos} AS rep_cosine",
        f"(vec_id = rep_id) OR ({cos} < {SEM_TAU}) AS keep",
    )


# --- Semantic decontamination (benchmark-vs-corpus, embedding space) -------
#
# The embedding-space twin of functions/textops.py's n-gram
# `text_decontaminate`: a paraphrased benchmark item shares few 5-grams
# with its source but sits at high cosine — modern pipelines
# (GPT-3/Llama eval hygiene) therefore ALSO flag training docs whose
# embedding is close to any eval-benchmark embedding.  Shape is the
# decontamination shape, not the dedup shape: the benchmark side is
# tiny and BROADCASTS (assignments + vectors), the corpus streams once
# through its coarse-cell probe, and candidates are confined to shared
# cells (the index_store coarse quantizer, reused verbatim so the cell
# rule cannot drift from the IVFPQ index).
#
# The flag is exact integer algebra end-to-end: micro-unit dot and
# squared norms, cosine >= {tau} tested as
#     idot > 0  AND  {d}·idot² >= {n}·|v|²·|b|²
# (cross-multiplied squares — no sqrt, no float), carried in
# decimal(38,0)/HUGEINT, so both engines agree bit-for-bit.  τ = 0.4
# because the fixture's isotropic vectors top out near cosine 0.46
# (dedup_embedding_cosine's calibration); a real corpus uses ~0.95 —
# the knob, not the algebra, is corpus-specific.

DECON_BENCH_MOD = 97     # benchmark = vec_id % 97 == 0 (~1%)
DECON_NPROBE = 2         # corpus-side probed cells
DECON_T2_NUM, DECON_T2_DEN = 4, 25   # tau^2 = 0.16


def _decon_oracle() -> str:
    from ..similarity.adc import SEED_SPLIT
    from ..similarity.centroids import MICRO, PQ_SUB_DIMS
    from ..similarity.ivf import K_CELLS

    return f"""
    WITH ex AS (
        SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, i - 1 AS dim,
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT) AS vi
        FROM ex
    ),
    cent AS (
        SELECT vec_id AS cid, dim, vi AS cc FROM v WHERE vec_id < {K_CELLS}
    ),
    celld AS (
        SELECT v.vec_id, c.cid, SUM((v.vi - c.cc) * (v.vi - c.cc)) AS d2
        FROM v JOIN cent c ON v.dim = c.dim
        GROUP BY v.vec_id, c.cid
    ),
    ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cid ASC) AS rk
        FROM celld
    ),
    probe AS (SELECT vec_id, cid FROM ranked WHERE rk <= {DECON_NPROBE}),
    bassign AS (
        SELECT vec_id AS bid, cid FROM ranked
        WHERE rk = 1 AND vec_id % {DECON_BENCH_MOD} = 0
    ),
    cand AS (
        SELECT DISTINCT p.vec_id, b.bid
        FROM probe p JOIN bassign b ON b.cid = p.cid
    ),
    norms AS (
        SELECT vec_id, SUM(CAST(vi AS HUGEINT) * vi) AS sq FROM v GROUP BY vec_id
    ),
    dots AS (
        SELECT c.vec_id, c.bid,
               SUM(CAST(a.vi AS HUGEINT) * b.vi) AS idot
        FROM cand c
        JOIN v a ON a.vec_id = c.vec_id
        JOIN v b ON b.vec_id = c.bid AND b.dim = a.dim
        GROUP BY c.vec_id, c.bid
    ),
    hits AS (
        SELECT d.vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits
        FROM dots d
        JOIN norms na ON na.vec_id = d.vec_id
        JOIN norms nb ON nb.vec_id = d.bid
        WHERE d.idot > 0
          AND {DECON_T2_DEN} * d.idot * d.idot
              >= {DECON_T2_NUM} * na.sq * nb.sq
        GROUP BY d.vec_id
    )
    SELECT e.vec_id,
           CAST(COALESCE(h.n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
           COALESCE(h.n_bench_hits, 0) > 0 AS contaminated
    FROM (SELECT DISTINCT vec_id FROM v) e
    LEFT JOIN hits h ON h.vec_id = e.vec_id
    """


@register("emb_semantic_decontaminate", oracle=_decon_oracle())
def emb_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus vectors within cosine τ of ANY benchmark vector
    (benchmark = vec_id % {DECON_BENCH_MOD} == 0): coarse-cell
    candidate generation (corpus probes {DECON_NPROBE} cells, bench
    assignments broadcast), exact integer cross-multiplied cosine
    test on candidates only.  Output: every corpus vector with its
    benchmark-hit count and flag — benchmark members flag themselves
    (cos = 1), the decontamination base case."""
    from ..similarity.adc import _MICRO_ARR, _micro_rows
    from ..similarity.index_store import _cell_centroids, _nearest_cells

    emb = load_table(spark, sf_dir, "embeddings")
    v = _micro_rows(emb)
    cent = _cell_centroids(v)
    probe = _nearest_cells(v, cent, "vec_id", DECON_NPROBE)
    bench = emb.filter(F.col("vec_id") % DECON_BENCH_MOD == 0)
    bassign = _nearest_cells(
        _micro_rows(bench), cent, "vec_id", 1
    ).withColumnRenamed("vec_id", "bid")
    m = emb.selectExpr("vec_id", f"{_MICRO_ARR} AS mv")
    bm = bench.selectExpr("vec_id AS bid", f"{_MICRO_ARR} AS bv")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    hits = (
        probe.join(F.broadcast(bassign), "cid")
        .select("vec_id", "bid")
        .distinct()
        .join(m, "vec_id")
        .join(F.broadcast(bm), "bid")
        .selectExpr(
            "vec_id",
            "bid",
            "aggregate(zip_with(mv, bv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS idot",
            "aggregate(zip_with(mv, mv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sqv",
            "aggregate(zip_with(bv, bv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sqb",
        )
        .where(
            (F.col("idot") > 0)
            & (
                F.lit(DECON_T2_DEN) * d("idot") * d("idot")
                >= F.lit(DECON_T2_NUM) * d("sqv") * d("sqb")
            )
        )
        .groupBy("vec_id")
        .agg(F.count("*").cast("bigint").alias("n_bench_hits"))
    )
    return (
        emb.select("vec_id")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_bench_hits", F.lit(0)).cast("bigint").alias(
                "n_bench_hits"
            ),
            (F.coalesce("n_bench_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
