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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
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
