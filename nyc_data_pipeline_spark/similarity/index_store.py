"""Persisted ANN index: build once as parquet artifacts, probe many.

`sim_pq_adc_recall` (adc.py) proves the ADC search algebra but rebuilds
the codebook and the PQ code table inside the same plan that searches
them.  A production 100 TB vector deployment never does that: the index
build is one expensive corpus pass whose OUTPUT — the codebook
(N_CODES x N_SUB x dims integer rows, KBs) and the code table (one
narrow row per (vector, subspace)) — is committed to storage, and every
later query session loads the artifacts and pays only the search.  This
module adds that missing property on the manifest pattern of
sources/timetravel.py: immutable parquet artifact directories plus a
tiny JSON manifest naming the live version of each artifact, so an
index rebuild is a new version directory + manifest swap that in-flight
readers never observe.

`sim_adc_from_index` runs the full production sequence: commit the
index (build pass), then construct the search — query LUT from fresh
query vectors, ADC shortlist over the PERSISTED code table, exact
integer-L2 rerank on shortlist members only — where the search plan's
only corpus-derived inputs are parquet scans of the committed
artifacts (tests/test_plans.py asserts the plan reads the index store
and never re-derives the codebook from `embeddings`).  All arithmetic
is the integer micro-unit algebra of adc.py, so the DuckDB oracle —
which independently recomputes the whole index from the raw table —
certifies both the build and the search bit-for-bit.

Reference parity: no vector surface in the reference (core is a
single-table ETL, spark_consumer.py:61-78); north-star M4/similarity
extension (SURVEY §2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..sources.scans import scratch_dir
from .adc import (
    N_CODES,
    N_SUB,
    SEED_SPLIT,
    SHORTLIST,
    _codebook,
    _INT_L2,
    _MICRO_ARR,
    _micro_rows,
    pq_assign,
)
from .brute_force import N_QUERIES, TOP_K
from .centroids import MICRO, PQ_SUB_DIMS


def build_pq_index(emb: DataFrame, table_dir: str, version: int = 1) -> dict:
    """The index BUILD pass: derive the seed codebook and per-vector PQ
    codes from the corpus, commit both as immutable parquet under
    v{version}/, and publish a manifest naming them.  Returns the
    manifest dict."""
    v = _micro_rows(emb)
    cmicro = _codebook(v)
    vdir = os.path.join(table_dir, f"v{version}")
    cb_path = os.path.join(vdir, "codebook")
    codes_path = os.path.join(vdir, "codes")
    cmicro.write.mode("overwrite").parquet(cb_path)
    # the code table is the artifact the corpus-scale search shuffles
    # on; repartition by subspace/code so a probe's broadcast-LUT join
    # streams it without a further exchange at read time.
    pq_assign(v, cmicro).repartition("sub", "code").write.mode(
        "overwrite"
    ).parquet(codes_path)
    manifest = {
        "version": version,
        "codebook": cb_path,
        "codes": codes_path,
        "params": {
            "n_codes": N_CODES,
            "n_sub": N_SUB,
            "sub_dims": PQ_SUB_DIMS,
            "seed_split": SEED_SPLIT,
            "micro": MICRO,
        },
    }
    os.makedirs(table_dir, exist_ok=True)
    with open(os.path.join(table_dir, f"manifest-v{version}.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def load_pq_index(
    spark: SparkSession, table_dir: str, version: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Load (codebook, codes) from the manifest — parquet scans only;
    nothing is recomputed from the raw corpus."""
    with open(os.path.join(table_dir, f"manifest-v{version}.json")) as f:
        manifest = json.load(f)
    return (
        spark.read.parquet(manifest["codebook"]),
        spark.read.parquet(manifest["codes"]),
    )


def adc_search(
    queries: DataFrame, cmicro: DataFrame, codes: DataFrame, corpus: DataFrame
) -> DataFrame:
    """The probe side of the two-stage search, against an ALREADY-BUILT
    index: per-query LUT (broadcast), ADC shortlist over the persisted
    code table, exact integer-L2 rerank on shortlist members.
    `queries` = (query_id, dim, qi) micro rows; `corpus` = the raw
    vector table (rerank reads true vectors, as production does)."""
    qd = F.col("qi") - F.col("ci")
    lut = (
        queries.join(F.broadcast(cmicro), "dim")
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
    m = corpus.selectExpr("vec_id", f"{_MICRO_ARR} AS m")
    qm = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id AS q_id", f"{_MICRO_ARR} AS qm")
    )
    rr = (
        short.join(m, short["neighbor_id"] == m["vec_id"])
        .join(F.broadcast(qm), short["query_id"] == qm["q_id"])
        .selectExpr("query_id", "neighbor_id", f"{_INT_L2} AS dist")
    )
    w_rr = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(w_rr))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


@register(
    "sim_adc_from_index",
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
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           CAST(dist AS BIGINT) AS dist
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY dist ASC, neighbor_id) AS rank
        FROM rr
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_adc_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once / probe-many: commit the PQ index (codebook + code
    table) as manifest-tracked parquet, then answer the top-{TOP_K}
    searches READING the persisted artifacts — the returned plan scans
    the index store, never the corpus-to-codebook derivation.  The
    oracle recomputes the entire index independently in DuckDB, so the
    persisted artifacts are certified value-for-value too."""
    emb = load_table(spark, sf_dir, "embeddings")
    table_dir = scratch_dir("pq_index", sf_dir)
    build_pq_index(emb, table_dir, version=1)
    cmicro, codes = load_pq_index(spark, table_dir, version=1)
    queries = _micro_rows(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"), "dim", "vi"
    ).withColumnRenamed("vi", "qi")
    return adc_search(queries, cmicro, codes, emb)
