"""Per-label embedding centroids (feature aggregation over vectors).

The aggregation every embedding pipeline needs somewhere: class/cluster
centroids, per-source mean vectors, drift monitors.  Implemented as
posexplode → (label, dim)-keyed aggregate — the shape that scales: the
explode is narrow (64 rows out per vector, no shuffle), and the single
shuffle carries fixed-width (label, dim, micro-sum) triples, partially
aggregated map-side, independent of corpus size.

Float sums are order-dependent, so a naive SUM(double) breaks
cross-engine (and cross-run) reproducibility.  Values are quantized to
integer micro-units (floor(v * 1e6) — exact IEEE double ops in both
engines) and summed as int64: associative, overflow-safe (1e8 vectors
x 1e6 units fits int64), and bit-identical everywhere.  The reported
centroid divides the exact integer sum — same policy as exprs.py's
decimal-sum convention, in fixed-point form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_sq_norm
from ..registry import register

MICRO = 1_000_000


@register(
    "emb_label_centroids",
    oracle=f"""
    WITH ex AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    )
    SELECT label,
           CAST(i - 1 AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT))
                AS BIGINT) AS sum_micro,
           CAST(CAST(SUM(CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT))
                AS BIGINT) AS DOUBLE) / COUNT(*) / {MICRO} AS centroid
    FROM ex
    GROUP BY label, i
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) centroid of the embedding corpus in exact
    fixed-point micro-units; see module docstring for the scale and
    reproducibility contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    micro = F.floor(F.col("v").cast("double") * MICRO).cast("bigint")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(micro).alias("sum_micro"),
        )
        .select(
            "label",
            "dim",
            "n",
            "sum_micro",
            (F.col("sum_micro").cast("double") / F.col("n") / MICRO).alias(
                "centroid"
            ),
        )
    )


OUTLIER_PERMILLE = 10  # top 1% by norm within each label


@register(
    "emb_norm_outliers",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, label,
               {duck_sq_norm('embedding')} AS sq_norm
        FROM embeddings
    ),
    r AS (
        SELECT vec_id, label, sq_norm,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY sq_norm DESC, vec_id) AS BIGINT) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS n_label
        FROM n
    )
    SELECT vec_id, label, sq_norm, rk
    FROM r
    WHERE rk * 1000 <= n_label * {OUTLIER_PERMILLE}
    ORDER BY label, rk
    """,
)
def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: the top {OUTLIER_PERMILLE}‰ of vectors by
    squared norm within each label — norm outliers are the classic
    symptom of encoding bugs and degenerate inputs, and they poison
    cosine-based retrieval (norm leaks into dot products before
    normalization).

    The percentile cut is pure integer arithmetic on the rank and the
    label count (rk·1000 ≤ n·permille) — no float quantile, so the
    flagged set is identical on every engine and partitioning.  One
    window per label (rank + count share the same partitioning; a
    single shuffle on label)."""
    from ..functions.vectors import spark_sq_norm

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.selectExpr(
        "vec_id", "label", f"{spark_sq_norm('embedding')} AS sq_norm"
    )
    w = Window.partitionBy("label").orderBy(F.desc("sq_norm"), F.asc("vec_id"))
    wc = Window.partitionBy("label")
    return (
        n.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .withColumn("n_label", F.count("*").over(wc))
        .filter(F.col("rk") * 1000 <= F.col("n_label") * OUTLIER_PERMILLE)
        .select("vec_id", "label", "sq_norm", "rk")
        .orderBy("label", "rk")
    )


# --- int8 quantization ----------------------------------------------------

Q_MAX = 127


@register(
    "emb_quantize_int8",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, label, i,
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT) AS vi
        FROM ex
    ),
    m AS (SELECT i, MAX(abs(vi)) AS m FROM v GROUP BY i),
    codes AS (
        SELECT vec_id, label,
               CASE WHEN m.m = 0 THEN 0
                    WHEN vi >= 0 THEN (vi * {Q_MAX}) // m.m
                    ELSE -((-vi * {Q_MAX}) // m.m) END AS code
        FROM v JOIN m ON v.i = m.i
    )
    SELECT vec_id, label,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(code) AS BIGINT) AS sum_code,
           CAST(MIN(code) AS BIGINT) AS min_code,
           CAST(MAX(code) AS BIGINT) AS max_code
    FROM codes GROUP BY vec_id, label
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus — the storage/serving compression step every vector index
    applies before ANN.  Codes are computed in PURE INTEGER math:
    micro-unit values scale by 127 and divide by the per-dim max-abs
    (division applied to non-negative operands only, so floor ==
    truncate and Spark's `div` agrees with the oracle's `//` — signs
    reapplied after).  The per-dim scale table is 64 rows and
    broadcasts; codes reduce per vector to (sum, min, max) so the
    certified result stays one row per vector.  Zero floats anywhere
    → bit-exact across engines and partitionings."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "v"))
    vi = F.floor(F.col("v").cast("double") * MICRO).cast("bigint")
    v = ex.select("vec_id", "label", "dim", vi.alias("vi"))
    scales = v.groupBy("dim").agg(F.max(F.abs("vi")).alias("m"))
    code = (
        F.when(F.col("m") == 0, F.lit(0))
        .when(
            F.col("vi") >= 0,
            F.expr(f"(vi * {Q_MAX}) div m"),
        )
        .otherwise(-F.expr(f"((-vi) * {Q_MAX}) div m"))
    )
    return (
        v.join(F.broadcast(scales), "dim")
        .select("vec_id", "label", code.alias("code"))
        .groupBy("vec_id", "label")
        .agg(
            F.count("*").alias("n_dims"),
            F.sum("code").cast("bigint").alias("sum_code"),
            F.min("code").cast("bigint").alias("min_code"),
            F.max("code").cast("bigint").alias("max_code"),
        )
    )


@register(
    "emb_gram_power_step",
    oracle=f"""
    WITH ex AS (
        SELECT unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    )
    SELECT CAST(i - 1 AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS HUGEINT)
               * CAST(floor(CAST(e[1] AS DOUBLE) * {MICRO}) AS BIGINT)
           ) AS VARCHAR) AS gram_col0
    FROM ex
    GROUP BY i
    """,
)
def emb_gram_power_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the corpus's dominant principal
    direction: u = Σ_x x·(x·w₀) with w₀ = e₀, i.e. column 0 of the
    Gram matrix Σ x xᵀ — the building block of distributed PCA
    (PCA whitening / spectral dedup of embedding spaces).  Products of
    micro-unit ints accumulate in exact decimal(38,0) (DuckDB:
    HUGEINT) and are emitted as decimal strings, so the iterate is
    bit-exact at any corpus size — the overflow-proof form of the
    integer-carrier policy (int64 sums would overflow at ~10^8
    vectors × (5·10^5)²-scale products).  Scale shape: one narrow
    explode (64 rows/vector), one map-side-combined shuffle keyed on
    dim; iterating just repeats the same plan with the new w."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "v"),
        F.col("embedding").getItem(0).alias("v0"),
    )
    vi = F.floor(F.col("v").cast("double") * MICRO).cast("bigint")
    v0i = F.floor(F.col("v0").cast("double") * MICRO).cast("bigint")
    return (
        ex.select("dim", (vi * v0i).cast("decimal(38,0)").alias("prod"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("prod").cast("decimal(38,0)").cast("string").alias("gram_col0"),
        )
    )


@register(
    "emb_nearest_centroid_assign",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, label, i - 1 AS dim,
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT) AS vi
        FROM ex
    ),
    cent AS (
        SELECT label AS c_label, dim,
               CAST(SUM(vi) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM v GROUP BY label, dim
    ),
    cmicro AS (
        SELECT c_label, dim,
               CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS ci
        FROM cent
    ),
    dots AS (
        SELECT v.vec_id, v.label, c.c_label,
               SUM(v.vi * c.ci) AS dot
        FROM v JOIN cmicro c ON v.dim = c.dim
        GROUP BY v.vec_id, v.label, c.c_label
    ),
    best AS (
        SELECT vec_id, label, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, c_label ASC) AS rk
        FROM dots
    )
    SELECT label AS true_label, c_label AS assigned_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM best WHERE rk = 1
    GROUP BY label, c_label
    """,
)
def emb_nearest_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment — the k-means assignment step /
    centroid-classifier confusion matrix, in EXACT integer math:
    per-label centroids in truncated micro-units (sign-split division
    so Spark `div` == DuckDB `//`), dot products as int64 sums of
    micro×micro terms, argmax by (dot DESC, label ASC).  Output:
    (true_label, assigned_label, n) — the confusion matrix whose
    diagonal is centroid-classifier accuracy and whose off-diagonal
    cells surface mislabeled clusters.  Scale shape: the centroid
    table is |labels|×|dims| rows and BROADCASTS; each vector meets
    only centroids (never other vectors), so assignment is linear in
    corpus size — one dim-keyed broadcast join + vec-keyed aggregate
    + per-vec argmax on an 8-row group.  Iterating = k-means."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("v").cast("double") * MICRO).cast("bigint").alias("vi"),
    )
    cent = v.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.sum("vi").alias("s"), F.count("*").alias("n")
    )
    cmicro = cent.select(
        "c_label",
        "dim",
        F.when(F.col("s") >= 0, F.expr("s div n"))
        .otherwise(-F.expr("(-s) div n"))
        .alias("ci"),
    )
    dots = (
        v.join(F.broadcast(cmicro), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum(F.col("vi") * F.col("ci")).alias("dot"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("c_label"))
    best = dots.withColumn("rk", F.row_number().over(w)).where("rk = 1")
    return best.groupBy(
        F.col("label").alias("true_label"),
        F.col("c_label").alias("assigned_label"),
    ).agg(F.count("*").cast("bigint").alias("n"))


# --- product quantization codes --------------------------------------------

PQ_SUB_DIMS = 16  # 64-dim embeddings → 4 subspaces of 16 dims


@register(
    "emb_pq_codes",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS i,
               embedding AS e
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, label, i - 1 AS dim,
               (i - 1) // {PQ_SUB_DIMS} AS sub,
               CAST(floor(CAST(e[i] AS DOUBLE) * {MICRO}) AS BIGINT) AS vi
        FROM ex
    ),
    cb AS (
        SELECT label AS code, sub, dim,
               CAST(SUM(vi) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM v GROUP BY label, sub, dim
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
    best AS (
        SELECT vec_id, sub, code, dist_sq,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist_sq ASC, code ASC) AS rk
        FROM dists
    )
    SELECT vec_id, CAST(sub AS INT) AS subspace,
           CAST(code AS INT) AS code,
           CAST(dist_sq AS BIGINT) AS dist_sq
    FROM best WHERE rk = 1
    """,
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each embedding is split into
    64/{PQ_SUB_DIMS} subspaces and each subvector snapped to its
    nearest sub-codebook entry by exact-integer L2 — the memory side
    of large-scale ANN (a 64-dim float vector compresses to 4 code
    bytes; IVF prunes the search space, PQ shrinks what's scanned
    inside it).  The sub-codebooks here are the per-label subvector
    means (the same deterministic seed-codebook policy as
    `sim_topk_ivf`); argmin ties break by code for a unique answer.
    Output: (vec_id, subspace, code, dist_sq) — dist_sq in micro²
    units is the per-subspace quantization error, whose corpus sum is
    the PQ audit number.

    Scale shape: the codebook is |codes|×|dims| rows and BROADCASTS;
    vectors meet only codebook entries (never other vectors), one
    dim-keyed broadcast join + (vec, sub, code)-keyed aggregate +
    argmin over |codes| rows per (vec, sub) — linear in corpus size,
    the same discipline as `emb_nearest_centroid_assign`."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "val"))
        .select(
            "vec_id",
            "label",
            "dim",
            F.expr(f"dim div {PQ_SUB_DIMS}").alias("sub"),
            F.floor(F.col("val").cast("double") * MICRO).cast("bigint").alias("vi"),
        )
    )
    cb = v.groupBy(F.col("label").alias("code"), "sub", "dim").agg(
        F.sum("vi").alias("s"), F.count("*").alias("n")
    )
    cmicro = cb.select(
        "code",
        "sub",
        "dim",
        F.when(F.col("s") >= 0, F.expr("s div n"))
        .otherwise(-F.expr("(-s) div n"))
        .alias("ci"),
    )
    diff = F.col("vi") - F.col("ci")
    dists = (
        v.join(F.broadcast(cmicro.drop("sub")), "dim")
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(diff * diff).alias("dist_sq"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist_sq"), F.asc("code")
    )
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select(
            "vec_id",
            F.col("sub").cast("int").alias("subspace"),
            F.col("code").cast("int").alias("code"),
            F.col("dist_sq").cast("bigint").alias("dist_sq"),
        )
    )
