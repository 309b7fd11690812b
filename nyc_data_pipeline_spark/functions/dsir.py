"""Target-conditioned data selection by hashed-feature importance
weights (DSIR-style).

Xie et al.'s Data Selection with Importance Resampling picks
pretraining documents whose hashed n-gram profile looks like a small
high-quality TARGET corpus rather than the raw crawl: estimate two
bag-of-hashed-features distributions — target and raw — and weight
each document by its log importance ratio
sum_b n_b * (log p_target(b) - log p_raw(b)).  This operator computes
those weights over the documents table, with sources {TARGET_SRC}
standing in as the curated target slice.

Cross-engine exactness: the per-bucket log-ratio is the ONLY float
computation — one identical ln() expression per bucket ({N_BUCKETS}
rows), immediately quantized to integer micro-nats
(round(ln(...)*1e6, 0) — both engines round the same
integer-valued double, then cast).  Per-document weights are then
pure int64 dot products: bit-exact regardless of evaluation order,
the same quantize-then-sum policy as similarity/centroids.py.
Laplace (+1) smoothing keeps every bucket's ratio finite.

Plan shape at 100 TB:
- ONE corpus pass builds the (doc, source, bucket, n) feature table
  (tokens hashed with the portable polynomial hash, bucketed mod
  {N_BUCKETS}); it is persist_scoped because three consumers read it
  (raw counts, target counts, scoring join) — the mixing.py diamond
  lesson.
- both distributions aggregate FROM the feature table (bounded
  {N_BUCKETS}-row outputs, map-side combined), never re-scanning the
  corpus; the log-ratio table BROADCASTS into the scoring join.
- the per-doc rollup is the only corpus-sized shuffle (doc_id-keyed,
  fixed-width rows).

Reference parity: no selection surface in the reference; north-star
text-curation coverage (SURVEY §2 extension), sibling of
`text_classifier_score` and `sample_weighted_mix`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..registry import register
from .text import duck_token_hashes, duck_tokens, spark_token_hashes, spark_tokens

N_BUCKETS = 64
TARGET_SRC = ("src0", "src1", "src2", "src3")

_T_IN = ", ".join(f"'{s}'" for s in TARGET_SRC)

# The one float expression, kept textually identical across engines so
# the IEEE operation sequence matches (ln ulp differences are absorbed
# by the round to micro-nats).
_LR = (
    "CAST(round(ln("
    "(CAST(cnt_t + 1 AS DOUBLE) / CAST(tot_t + {b} AS DOUBLE)) / "
    "(CAST(cnt_r + 1 AS DOUBLE) / CAST(tot_r + {b} AS DOUBLE))"
    ") * 1000000.0, 0) AS BIGINT)"
).format(b=N_BUCKETS)


@register(
    "text_dsir_importance",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source,
               unnest({duck_token_hashes(duck_tokens('text'))}) AS th
        FROM documents
    ),
    f AS (
        SELECT doc_id, source, th % {N_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM h GROUP BY doc_id, source, th % {N_BUCKETS}
    ),
    raw AS (SELECT bucket, SUM(n) AS cnt_r FROM f GROUP BY bucket),
    tgt AS (SELECT bucket, SUM(n) AS cnt_t FROM f
            WHERE source IN ({_T_IN}) GROUP BY bucket),
    lr AS (
        SELECT bucket, {_LR} AS lr_micro FROM (
            SELECT r.bucket, COALESCE(t.cnt_t, 0) AS cnt_t, r.cnt_r,
                   SUM(COALESCE(t.cnt_t, 0)) OVER () AS tot_t,
                   SUM(r.cnt_r) OVER () AS tot_r
            FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket
        )
    )
    SELECT f.doc_id,
           CAST(SUM(f.n) AS BIGINT) AS n_tokens,
           CAST(SUM(f.n * lr.lr_micro) AS BIGINT) AS score_micro,
           SUM(f.n * lr.lr_micro) > 0 AS selected
    FROM f JOIN lr ON f.bucket = lr.bucket
    GROUP BY f.doc_id
    """,
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight in integer micro-nats
    against the {TARGET_SRC} target slice; `selected` marks documents
    more target-like than raw-like (weight > 0)."""
    return dsir_scores(load_table(spark, sf_dir, "documents"))


def dsir_scores(d: DataFrame) -> DataFrame:
    """The composable operator behind `text_dsir_importance` (also
    driven by scripts/scale_probe.py over key-shifted corpora)."""
    f = persist_scoped(
        "dsir_features",
        d.selectExpr(
            "doc_id",
            "source",
            f"explode({spark_token_hashes(spark_tokens('text'))}) AS th",
        )
        .groupBy("doc_id", "source", (F.col("th") % N_BUCKETS).alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n")),
    )
    raw = f.groupBy("bucket").agg(F.sum("n").alias("cnt_r"))
    tgt = (
        f.filter(F.col("source").isin(*TARGET_SRC))
        .groupBy("bucket")
        .agg(F.sum("n").alias("cnt_t"))
    )
    lr = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
            "cnt_r",
        )
        .select(
            "bucket",
            "cnt_t",
            "cnt_r",
            F.sum("cnt_t").over(Window.partitionBy()).alias("tot_t"),
            F.sum("cnt_r").over(Window.partitionBy()).alias("tot_r"),
        )
        .selectExpr("bucket", f"{_LR} AS lr_micro")
    )
    return (
        f.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n") * F.col("lr_micro")).cast("bigint").alias("score_micro"),
        )
        .withColumn("selected", F.col("score_micro") > 0)
    )
