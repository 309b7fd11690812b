"""Exact deduplication (north-star M4).

Shape: fingerprint → hash-groupBy → keep the canonical (minimum) id.
This is the 100 TB workhorse: one shuffle on the fingerprint (a short
digest, not the document body — shuffle bytes stay tiny), map-side
combine, no driver involvement.

The fixture corpus has no literal duplicates, so the query simulates an
at-least-once re-crawl (every 7th document ingested twice under a new
id) — the realistic input shape — and reports per-fingerprint groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import duck_norm_text, spark_norm_text
from ..registry import register


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Reusable operator: one row per distinct normalized text, keeping
    the smallest id; `n_copies` records the collapsed multiplicity."""
    fp = df.selectExpr(
        f"{id_col}", f"md5({spark_norm_text(text_col)}) AS fingerprint"
    )
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


@register(
    "dedup_exact_hash",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5({duck_norm_text('text')}) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with simulated re-crawl duplicates:
    every fingerprint keeps its lowest doc_id; re-crawled docs show
    n_copies = 2."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return dedup_exact(d.unionByName(recrawl))
