"""Vectorized Pandas-UDF (Arrow) scoring path for cosine top-k.

The engine's default dot product is a JVM codegen fold
(functions/vectors.py).  This module is the measured alternative the
UDF policy (SURVEY §2.10) calls for: a scalar `@pandas_udf` that
receives Arrow record batches and scores them with numpy — the shape
that wins when per-row dimensionality is large enough to be
BLAS-bound.  bench.py carries both so the crossover is measured, not
assumed.

Bit-exactness: numpy's pairwise summation would differ from the JVM's
left-to-right fold in the last ulp, so the UDF accumulates
sequentially over the 64 dims while vectorizing over rows — the same
IEEE double operation sequence per row, identical results, same
oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..functions.vectors import spark_sq_norm
from ..registry import register
from .brute_force import N_QUERIES, TOP_K


def _dot_fold_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    qa = np.stack(a.to_numpy())
    ca = np.stack(b.to_numpy())
    acc = np.zeros(len(qa), dtype=np.float64)
    for i in range(qa.shape[1]):
        acc = acc + qa[:, i].astype(np.float64) * ca[:, i].astype(np.float64)
    return pd.Series(acc)


def dot_fold():
    """Built lazily: pandas_udf type resolution needs an active session,
    and registry import must stay session-free."""
    return pandas_udf(_dot_fold_impl, "double")


def cosine_topk_pandas(
    queries: DataFrame, candidates: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Same plan as brute_force.cosine_topk with the dot product moved
    to an Arrow-batched pandas_udf (ArrowEvalPython in the plan —
    batch transfer, never per-row pickling)."""
    scored = candidates.join(
        F.broadcast(queries), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot_fold()(F.col("q_emb"), F.col("embedding"))
            / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("sq")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# Same semantics, same oracle text as the JVM-fold brute force.
from .brute_force import sim_topk_bruteforce as _bf  # noqa: E402
from ..registry import ORACLE  # noqa: E402


@register("sim_topk_pandas_udf", oracle=ORACLE["sim_topk_bruteforce"])
def sim_topk_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors via the Arrow pandas_udf path;
    bit-identical to sim_topk_bruteforce (same fold order)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.selectExpr("vec_id", "embedding", f"{spark_sq_norm('embedding')} AS sq")
    q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "embedding AS q_emb", "sq AS q_sq"
    )
    return cosine_topk_pandas(q, v)
