"""Johnson-Lindenstrauss sign random projection — the data-independent
dimension cut, audited by measured recall.

PQ (similarity/adc.py) and matryoshka truncation (matryoshka.py) both
need either a training pass or co-trained embeddings; a JL SIGN
projection needs neither: a fixed seeded ±1 matrix maps d=64 → m=16
with distance distortion bounded by the JL lemma, so it is the cut a
pipeline can apply to ARBITRARY third-party embeddings on day one —
no k-means fit over the corpus, no model requirement.  Like the other
two, it must be MEASURED before being trusted: this operator reports
per-query overlap between the exact full-dim top-k and the top-k
computed in the 16-dim projected space (recall@k of the cheap pass).

Engineering shape: the sign matrix is 64×16 literals baked into the
expression text (the similarity/lsh.py plane discipline), so the
projection is a pure codegen projection — 16 fixed-order signed sums
per row, zero Python, zero shuffle, and the SAME operation sequence in
Spark and DuckDB (left-to-right double adds over literal-signed
elements) — bit-exact across engines with no tolerance.  The projected
table is 4× smaller than the source; at 100 TB that is 4× less index
I/O and 4× cheaper candidate dots for any downstream ANN stage, with
this audit's recall as the accept/reject gate.

Measured verdict on THIS corpus: recall@5 = 0.10 at m=16 (0.12 at
m=32; the trained-prefix sibling sim_matryoshka_recall measures 0.08
at the same width) — the synthetic embeddings are near-isotropic, so
every 4× dimension cut fails and the audit's answer is REJECT.  That
is the operator working as designed: it exists to stop a pipeline from
silently shipping a cheap pass that loses the neighborhood structure,
and a corpus with real cluster structure is exactly where the same
audit flips to accept.

Reference parity: no vector surface in the reference; north-star
similarity family (SURVEY §2 extension), sibling of
sim_matryoshka_recall (trained prefix) and sim_pq_adc_recall (trained
codebook) — this is the untrained corner of the triangle.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import duck_dot, duck_sq_norm, spark_sq_norm
from ..registry import register
from .brute_force import N_QUERIES, TOP_K, cosine_topk
from .matryoshka import _ranked_sql

SRC_DIMS = 64
PROJ_DIMS = 16
_SEED = 20240815

# The fixed sign matrix: SIGNS[j][i] ∈ {+1, -1} for output dim j,
# input dim i.  Seeded once at import — both engines receive the same
# literals, so there is no cross-engine hash function to agree on.
_rng = random.Random(_SEED)
SIGNS = [
    [1 if _rng.random() < 0.5 else -1 for _ in range(SRC_DIMS)]
    for _ in range(PROJ_DIMS)
]


def _proj_term(sign: int, elem: str) -> str:
    op = "+" if sign > 0 else "-"
    return f" {op} CAST({elem} AS DOUBLE)"


def spark_projected(col: str) -> str:
    """array(p_0 … p_{PROJ_DIMS-1}): each p_j a fixed-order signed sum
    of the source elements (0-based indexing)."""
    dims = [
        "0.0D"
        + "".join(
            _proj_term(SIGNS[j][i], f"{col}[{i}]") for i in range(SRC_DIMS)
        )
        for j in range(PROJ_DIMS)
    ]
    return "array(" + ", ".join(dims) + ")"


def duck_projected(col: str) -> str:
    """Same sums, 1-based indexing, identical add order."""
    dims = [
        "CAST(0.0 AS DOUBLE)"
        + "".join(
            _proj_term(SIGNS[j][i], f"{col}[{i + 1}]")
            for i in range(SRC_DIMS)
        )
        for j in range(PROJ_DIMS)
    ]
    return "[" + ", ".join(dims) + "]"


@register(
    "emb_random_projection",
    oracle=f"""
    WITH {_ranked_sql('embedding', 'full')},
    {_ranked_sql(duck_projected('embedding'), 'rp')}
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST({TOP_K} AS BIGINT) AS k
    FROM r_full f
    LEFT JOIN r_rp t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query overlap between the exact full-dim top-{TOP_K} and the
    top-{TOP_K} in the {PROJ_DIMS}-dim JL sign projection —
    `n_overlap / k` is recall@{TOP_K} of the projected search.  The
    projection itself is 16 codegen sums per row (no Python, no
    shuffle); both rankings then reuse brute_force.cosine_topk."""
    e = load_table(spark, sf_dir, "embeddings")

    def ranked(emb_expr: str) -> DataFrame:
        v = e.selectExpr("vec_id", f"{emb_expr} AS embedding").selectExpr(
            "vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq"
        )
        q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
            "vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq"
        )
        return cosine_topk(q, v).select("query_id", "neighbor_id")

    full = ranked("embedding")
    rp = ranked(spark_projected("embedding")).select(
        F.col("query_id").alias("t_query"),
        F.col("neighbor_id").alias("t_neighbor"),
    )
    return (
        full.join(
            rp,
            (full["query_id"] == rp["t_query"])
            & (full["neighbor_id"] == rp["t_neighbor"]),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("t_neighbor").cast("bigint").alias("n_overlap"))
        .withColumn("k", F.lit(TOP_K).cast("bigint"))
    )
