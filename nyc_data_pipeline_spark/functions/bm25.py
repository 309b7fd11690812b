"""BM25 ranked retrieval over the document corpus.

The missing member of the search family: ANN (similarity/) answers
"nearest by embedding"; this answers "best by lexical relevance" —
the Robertson/Sparck-Jones probabilistic model with the Lucene
positive-IDF variant, k1 = 1.2, b = 0.75:

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

Scale shape: ONE corpus pass builds the (doc, term, tf, dl) table for
the union of all query terms (the explode is filtered to those terms
before any shuffle — posting lists, not the full index); the 7-row df
table and the 1-row (N, Σdl) stats broadcast into the scoring join;
per-query top-k runs as a sort+limit global heap merge (TakeOrdered),
never a full sort.  The scored subtree is persist_scoped so the three
query branches share one materialization.

Cross-engine exactness: the one libm call (ln in idf) is micro-nat
rounded; everything else is integer.  The tf normalization is cleared
of fractions by multiplying numerator and denominator by 20·Σdl:

    contrib = idf_µ·tf·(k1+1)/(tf + k1(1−b) + k1·b·dl·N/Σdl)
            = idf_µ·44·tf·Σdl  div  (20·tf·Σdl + 6·Σdl + 18·dl·N)

BIGINT bound: idf_µ·44·tf·Σdl ≲ 2e7·44·10²·Σdl — safe to Σdl ≈ 1e7
(test scales); a 100 TB corpus divides through by Σdl in DOUBLE or
lifts to decimal(38,0) (the trends.py carrier pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..registry import register
from .text import duck_tokens, spark_tokens

BM25_TOPK = 10
BM25_QUERIES: list[tuple[str, tuple[str, ...]]] = [
    ("spark_joins", ("hash", "join")),
    ("streaming_aggs", ("window", "agg", "stream")),
    ("vector_scans", ("vector", "scan")),
]
_ALL_TERMS = sorted({t for _, ts in BM25_QUERIES for t in ts})

# idf numerator/denominator ×2 keeps the 0.5 corrections integral.
_IDF = (
    "CAST(round(ln(1.0 + CAST(2 * n_docs - 2 * df + 1 AS DOUBLE)"
    " / CAST(2 * df + 1 AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"
)
_CONTRIB = (
    "(idf_micro * 44 * tf * sum_dl) {idiv} "
    "(20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n_docs)"
)


def _oracle_bm25() -> str:
    terms_in = ", ".join(f"'{t}'" for t in _ALL_TERMS)
    branches = "\n    UNION ALL\n    ".join(
        f"""SELECT '{qid}' AS query_id, doc_id, score_micro, n_terms_hit
    FROM (
        SELECT doc_id,
               CAST(SUM(contrib) AS BIGINT) AS score_micro,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM scored WHERE t IN ({", ".join(f"'{t}'" for t in ts)})
        GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOPK}
    )"""
        for qid, ts in BM25_QUERIES
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {duck_tokens('text')} AS tk FROM documents
    ),
    dls AS (SELECT doc_id, len(tk) AS dl FROM toks),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls
    ),
    tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(tk) AS t FROM toks)
        WHERE t IN ({terms_in})
        GROUP BY doc_id, t
    ),
    dfs AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id, tf.t,
               {_CONTRIB.format(idiv='//')} AS contrib
        FROM tf
        JOIN dfs USING (t)
        JOIN dls USING (doc_id)
        CROSS JOIN stats
        CROSS JOIN LATERAL (SELECT {_IDF} AS idf_micro) i
    ),
    ranked AS (
    {branches}
    )
    SELECT query_id, doc_id, score_micro, n_terms_hit,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk
    FROM ranked
    """


def bm25_topk(docs: DataFrame) -> DataFrame:
    """Top-K docs per fixed query by BM25, integer-exact micro-scores."""
    toks = docs.selectExpr("doc_id", f"{spark_tokens('text')} AS tk")
    dls = toks.select("doc_id", F.size("tk").alias("dl"))
    stats = dls.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # tf feeds both the df aggregation and the scoring join — a
    # diamond that would re-run the corpus explode twice; pin the
    # small (doc, term, tf) result instead.  dl rides the explode
    # (functionally dependent on doc_id) so scoring needs NO join
    # back to the corpus-sized per-doc-length table — at 100 TB that
    # join would shuffle a slim full-corpus column per query batch.
    tf = persist_scoped(
        "bm25.tf",
        toks.select(
            "doc_id",
            F.size("tk").alias("dl"),
            F.explode("tk").alias("t"),
        )
        .filter(F.col("t").isin(*_ALL_TERMS))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count("*").cast("bigint").alias("tf")),
    )
    dfs = tf.groupBy("t").agg(F.count("*").cast("bigint").alias("df"))
    scored = persist_scoped(
        "bm25.scored",
        tf.join(F.broadcast(dfs), "t")
        .crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            "t",
            f"{_IDF} AS idf_micro",
            "tf",
            "dl",
            "n_docs",
            "sum_dl",
        )
        .selectExpr("doc_id", "t", f"{_CONTRIB.format(idiv='div')} AS contrib"),
    )
    branches = None
    for qid, ts in BM25_QUERIES:
        b = (
            scored.filter(F.col("t").isin(*ts))
            .groupBy("doc_id")
            .agg(
                F.sum("contrib").cast("bigint").alias("score_micro"),
                F.count("*").cast("bigint").alias("n_terms_hit"),
            )
            .orderBy(F.col("score_micro").desc(), "doc_id")
            .limit(BM25_TOPK)
            .select(F.lit(qid).alias("query_id"), "doc_id", "score_micro", "n_terms_hit")
        )
        branches = b if branches is None else branches.unionByName(b)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    return branches.select(
        "query_id",
        "doc_id",
        "score_micro",
        "n_terms_hit",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )


@register("text_bm25_topk", oracle=_oracle_bm25())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"))
