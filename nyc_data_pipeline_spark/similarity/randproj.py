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

Engineering shape — MEASURED, not assumed (the pandas_path.py
discipline): the 16×64-term projection as inline Catalyst expression
text blows past whole-stage codegen's method limits and falls back to
interpreted eval (~0.24 ms/row), and because both the query and the
candidate branch derive from it, Catalyst re-evaluates the subtree per
branch — 44 s at 8× sf0.1 for what should be a linear pass.  The
shipped path is the index_store build-once discipline instead:
PROJECT ONCE through an Arrow-batched numpy pass (sequential per-dim
adds, so the IEEE operation order is the exact left-to-right fold both
engines' expression text performs — bit-exact, no tolerance), then
`localCheckpoint` the 4×-smaller projected table so every downstream
search plan reads materialized vectors with ZERO Python nodes
(plan-asserted).  Same shape at 100 TB: the projection is one linear
write, searches amortize it.  Measured at 8× sf0.1: 44 s inline vs
~4 s project+checkpoint+search.

The sign matrix stays importable as expression text
(`spark_projected`, the lsh.py plane style) for the oracle twin
`duck_projected` and for golden tests of the fold-order contract.

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


def project_checkpointed(e: DataFrame) -> DataFrame:
    """Build step: JL-project (vec_id, embedding[SRC_DIMS]) →
    materialized (vec_id, embedding[PROJ_DIMS]) via one Arrow-batched
    numpy pass.  The per-dim loop adds source dims in ascending order,
    one float64 op per term — the EXACT operation sequence of the
    `spark_projected`/`duck_projected` expression text (0.0 +s1·x1
    +s2·x2 …), so values are bit-identical to the oracle's fold.
    `localCheckpoint(eager)` materializes the 4×-smaller table once;
    downstream search plans scan concrete vectors (no Python nodes, no
    per-branch recomputation — see module doc for the measurements)."""
    import numpy as np
    import pandas as pd

    signs = [list(row) for row in zip(*SIGNS)]  # [i][j] layout

    def batches(it):
        for pdf in it:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            acc = np.zeros((len(pdf), PROJ_DIMS), dtype=np.float64)
            for i in range(SRC_DIMS):
                acc = acc + x[:, [i]] * np.asarray(
                    signs[i], dtype=np.float64
                )
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": list(acc)}
            )

    return (
        e.select("vec_id", "embedding")
        .mapInPandas(batches, schema="vec_id bigint, embedding array<double>")
        .localCheckpoint(eager=True)
    )


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
    `n_overlap / k` is recall@{TOP_K} of the projected search.
    Projection runs ONCE (Arrow pass + localCheckpoint); the two
    rankings then reuse brute_force.cosine_topk over concrete
    vectors."""
    e = load_table(spark, sf_dir, "embeddings")

    def ranked(src: DataFrame) -> DataFrame:
        v = src.selectExpr(
            "vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq"
        )
        q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
            "vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq"
        )
        return cosine_topk(q, v).select("query_id", "neighbor_id")

    full = ranked(e.select("vec_id", "embedding"))
    rp = ranked(project_checkpointed(e)).select(
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
