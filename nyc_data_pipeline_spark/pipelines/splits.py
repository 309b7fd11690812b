"""Deterministic train/val/test splitting for a training corpus.

The one operation every training-data pipeline runs last: partition the
corpus into train/validation/test such that (a) the assignment is a
PURE FUNCTION of the example's identity — reprocessing, backfills, and
incremental batches land every doc in the same split forever, with no
split-leakage between runs — and (b) the split is auditable per source
(stratification report).  ``rand()``-based splits violate (a); file- or
partition-based splits violate (b) under skew.

The assignment hash is DIFFERENT from the sampling hash
(`pipelines.mixing._BUCKET`): reusing one hash for two decisions
correlates them (every sampled-in doc would land in the same split
region — a classic silent-leakage bug), so this module salts with its
own multiplier.

Scale shape: the split decision is a zero-shuffle codegen'd projection
over the scan; the stratification report is one map-side-combined
rollup on (source, split).  At 100 TB the assignment costs scan
throughput and nothing else, and writing the three splits is one
partitionBy("split") pass.

Reference parity note: the reference has no splits (it is an ETL
dashboard); this is north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import duck_tokens
from ..registry import register

HASH_MOD = 1_000_000_007
SPLIT_MULT = 2_246_822_519  # xxhash prime — distinct from mixing.MIX_MULT
TRAIN_PERMILLE = 900
VAL_PERMILLE = 50  # test gets the remaining 50

# h(doc_id) in [0, 1000); doc_id reduced mod HASH_MOD first so the
# multiply stays inside int64 (1e9 * 2.25e9 < 2^63).
_SPLIT_BUCKET = f"(((doc_id % {HASH_MOD}) * {SPLIT_MULT}) % {HASH_MOD}) % 1000"

_SPLIT_CASE = f"""CASE
    WHEN {_SPLIT_BUCKET} < {TRAIN_PERMILLE} THEN 'train'
    WHEN {_SPLIT_BUCKET} < {TRAIN_PERMILLE + VAL_PERMILLE} THEN 'val'
    ELSE 'test' END"""


def assign_split(d: DataFrame) -> DataFrame:
    """Add the deterministic `split` column to a frame with doc_id."""
    return d.withColumn("split", F.expr(_SPLIT_CASE))


@register(
    "sample_train_split",
    oracle=f"""
    SELECT source, {_SPLIT_CASE} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    GROUP BY 1, 2
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic {TRAIN_PERMILLE}/{VAL_PERMILLE}/rest
    train/val/test assignment with its stratification report: per
    (source, split) doc counts, char mass, and min doc_id (a spot-check
    handle).  The report is what a release audit reads — it proves the
    split ratios hold within every source, not just globally."""
    d = assign_split(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source", "split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# --- Neyman-allocation stratified sampling ---------------------------------
#
# Proportional sampling wastes budget on homogeneous strata; Neyman
# allocation (optimal for estimating a mean under a fixed budget) sizes
# each stratum's sample by N_h * sigma_h.  The integer identity
#     (N_h * sigma_h)^2 = N_h * sum(x^2) - (sum(x))^2
# lets the weight be computed EXACTLY from one pass of integer sums;
# the only float ops are one sqrt per stratum (IEEE-correctly-rounded
# in both engines, immediately floored to integer micro-units).
#
# Selection is hash-THRESHOLD, not top-n-per-stratum: the per-stratum
# cutoff (alloc_h * HASH_MOD) div N_h is an exact integer, and a doc is
# sampled iff its salted hash falls below its stratum's cutoff — a
# zero-shuffle projection + broadcast join, where a row_number() window
# would sort every stratum.  The achieved count is binomial around
# alloc_h (the report records both, the honest contract of threshold
# sampling); alloc_h > N_h caps at "take all" with no special case
# (cutoff >= HASH_MOD admits every hash).
#
# Overflow: n_chars <= ~5e3, so sum(x^2) fits int64 up to ~3.7e11 docs
# per stratum; budget * s_micro fits while the corpus-wide char mass
# stays under ~9e18 micro-units.  Past that, lift the carriers to
# decimal(38,0) (the trends.py pattern) — same plan.

SAMPLE_DIV = 10  # budget = corpus size / 10
# Murmur3's c1 constant — distinct from SPLIT_MULT AND mixing.MIX_MULT
# (2_654_435_761): three independent decisions, three salts, or the
# sampling/splitting/allocation choices correlate silently.
NEYMAN_MULT = 3_432_918_353

_NEYMAN_BUCKET = f"((doc_id % {HASH_MOD}) * {NEYMAN_MULT}) % {HASH_MOD}"

_ALLOC_SQL = f"""
    stats AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source
    ),
    wts AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS neyman_w_micro
        FROM stats
    ),
    alloc AS (
        SELECT source, n_docs, neyman_w_micro,
               (SUM(n_docs) OVER () // {SAMPLE_DIV}) * neyman_w_micro
                   // SUM(neyman_w_micro) OVER () AS alloc_raw
        FROM wts
    ),
    plan AS (
        SELECT source, n_docs, neyman_w_micro,
               CASE WHEN alloc_raw > n_docs THEN n_docs
                    ELSE alloc_raw END AS alloc,
               CASE WHEN alloc_raw > n_docs THEN n_docs
                    ELSE alloc_raw END * {HASH_MOD} // n_docs AS cutoff
        FROM alloc
    )"""


@register(
    "sample_neyman_threshold",
    oracle=f"""
    WITH {_ALLOC_SQL},
    sel AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_selected,
               CAST(MIN(d.doc_id) AS BIGINT) AS min_sel_doc
        FROM documents d JOIN plan p ON d.source = p.source
        WHERE {_NEYMAN_BUCKET} < p.cutoff
        GROUP BY d.source
    )
    SELECT p.source, p.n_docs, p.neyman_w_micro,
           CAST(p.alloc AS BIGINT) AS alloc,
           COALESCE(s.n_selected, 0) AS n_selected,
           s.min_sel_doc
    FROM plan p LEFT JOIN sel s ON p.source = s.source
    """,
)
def sample_neyman_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Neyman allocation over `source` (budget = corpus
    size / {SAMPLE_DIV}, weight = N_h·sigma_h on n_chars) plus the
    achieved hash-threshold sample: (source, n_docs, neyman_w_micro,
    alloc, n_selected, min_sel_doc)."""
    return neyman_threshold_sample(load_table(spark, sf_dir, "documents"))


def neyman_threshold_sample(d: DataFrame) -> DataFrame:
    """The composable operator behind `sample_neyman_threshold` (also
    driven by scripts/scale_probe.py over key-shifted corpora)."""
    stats = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    wts = stats.selectExpr(
        "source",
        "n_docs",
        "CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))"
        " * 1000000.0) AS BIGINT) AS neyman_w_micro",
    )
    plan = (
        wts.withColumn(
            "alloc_raw",
            F.expr(
                f"(SUM(n_docs) OVER () div {SAMPLE_DIV}) * neyman_w_micro"
                " div SUM(neyman_w_micro) OVER ()"
            ),
        )
        .withColumn("alloc", F.least("alloc_raw", "n_docs"))
        .withColumn("cutoff", F.expr(f"alloc * {HASH_MOD} div n_docs"))
        .select("source", "n_docs", "neyman_w_micro", "alloc", "cutoff")
    )
    sel = (
        d.join(F.broadcast(plan.select("source", "cutoff")), "source")
        .filter(F.expr(_NEYMAN_BUCKET) < F.col("cutoff"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_selected"),
            F.min("doc_id").cast("bigint").alias("min_sel_doc"),
        )
    )
    return (
        plan.join(sel, "source", "left")
        .select(
            "source",
            "n_docs",
            "neyman_w_micro",
            F.col("alloc").cast("bigint").alias("alloc"),
            F.coalesce("n_selected", F.lit(0)).cast("bigint").alias("n_selected"),
            "min_sel_doc",
        )
    )


# --- Efraimidis-Spirakis weighted sampling without replacement -----------
#
# Neyman (above) decides HOW MANY to take per stratum; this operator
# decides WHICH rows when inclusion probability must be proportional
# to a per-row weight.  Efraimidis & Spirakis 2006: draw u ~ U(0,1]
# per row, rank by u^(1/w) descending, keep the top n — exactly a
# sequential weighted sample without replacement (their Thm 2).  The
# monotone-equivalent rank key ln(u)/w avoids pow; u comes from a
# deterministic bijective hash of the row key, so the "random" sample
# is reproducible run-to-run and engine-to-engine — the property a
# training-data pipeline needs for auditable subsampling.
#
# Cross-engine exactness: ln(u) is the one libm call — micro-nat
# rounded (the dsir.py pattern) before the division by the weight;
# the weight itself routes DECIMAL→VARCHAR→DOUBLE on the DuckDB side
# (exprs.sql_d2d) to match Spark's BigDecimal.doubleValue.
#
# Scale shape: one shuffle on the stratum key; per-stratum top-n is a
# row_number window over ~1/80th of the table per cell (the accepted
# equidepth_segment regime — production strata are finer: day ×
# segment).  Nothing global; no driver action.

ES_P = 2_147_483_647
ES_A, ES_B = 1_540_483_477, 610_639_321  # gcd(A, P) = 1: bijection
ES_N_PER = 5

_ES_H = f"(((o_orderkey % {ES_P}) * {ES_A} + {ES_B}) % {ES_P}) + 1"
_ES_LNU = (
    f"CAST(round(ln(CAST({_ES_H} AS DOUBLE) / {ES_P}.0) * 1000000.0, 0)"
    " AS BIGINT)"
)


@register(
    "sample_weighted_es",
    oracle=f"""
    WITH keyed AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               o_orderkey,
               CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS weight,
               {_ES_LNU} AS lnu_micro
        FROM orders
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY month
                   ORDER BY CAST(lnu_micro AS DOUBLE) / weight DESC,
                            o_orderkey) AS es_rank
        FROM keyed
    )
    SELECT month, CAST(es_rank AS BIGINT) AS es_rank, o_orderkey,
           weight, lnu_micro
    FROM ranked WHERE es_rank <= {ES_N_PER}
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_es_sample(load_table(spark, sf_dir, "orders"))


def weighted_es_sample(orders: DataFrame) -> DataFrame:
    """Per-month weighted sample of ES_N_PER orders, inclusion odds
    proportional to o_totalprice (Efraimidis-Spirakis keys over a
    deterministic hash)."""
    from pyspark.sql import Window

    keyed = orders.selectExpr(
        "date_format(o_orderdate, 'yyyy-MM') AS month",
        "o_orderkey",
        "CAST(o_totalprice AS DOUBLE) AS weight",
        f"{_ES_LNU} AS lnu_micro",
    )
    w = Window.partitionBy("month").orderBy(
        (F.col("lnu_micro").cast("double") / F.col("weight")).desc(),
        "o_orderkey",
    )
    return (
        keyed.withColumn("es_rank", F.row_number().over(w))
        .filter(F.col("es_rank") <= ES_N_PER)
        .select(
            "month",
            F.col("es_rank").cast("bigint").alias("es_rank"),
            "o_orderkey",
            "weight",
            "lnu_micro",
        )
    )


# ---------------------------------------------------------------------------
# Training-shard export: the curated corpus's LAST hop before the
# trainer.  Three properties a 100 TB export must have, all delivered
# by one hash-partitioned linear pass:
#   1. DETERMINISM — shard assignment and intra-shard order are pure
#      functions of doc_id (re-running the export after a cluster
#      failure yields byte-identical shards; `df.sample`/`rand()`
#      would not);
#   2. BALANCE — the multiplicative hash spreads doc_ids uniformly, so
#      no trainer data-loader straggles on a fat shard;
#   3. DECORRELATION — the intra-shard ORDER is a second, independent
#      hash, so a shard read sequentially is an unbiased sample of the
#      whole corpus (source/time runs in doc_id order never survive
#      into the training stream — the "global shuffle" trainers need,
#      without a global sort).
# Scale shape: one shuffle keyed by shard, sortWithinPartitions (no
# global sort barrier), one file per shard directory; stats read back
# from the committed files so the oracle certifies WHAT WAS WRITTEN.
# The two hashes use distinct primes per the mixing.py/splits.py
# one-hash-one-decision discipline.
N_SHARDS = 16
SHARD_MULT = 1_540_483_477  # murmur2 multiplier — shard decision
ORDER_MULT = 2_038_074_743  # distinct prime — intra-shard order

_SHARD = f"(((doc_id % {HASH_MOD}) * {SHARD_MULT}) % {HASH_MOD}) % {N_SHARDS}"
_ORDER = f"((doc_id % {HASH_MOD}) * {ORDER_MULT}) % {HASH_MOD}"


@register(
    "sample_shard_export",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_SHARD} AS shard, {_ORDER} AS order_key,
               CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(order_key) AS BIGINT) AS head_key,
           CAST(arg_min(doc_id, order_key) AS BIGINT) AS head_doc
    FROM d GROUP BY shard
    """,
)
def sample_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the corpus into {N_SHARDS} deterministic
    hash-shards (shard = h1(doc_id), intra-shard order = h2(doc_id)),
    then read the COMMITTED files back and report per-shard stats —
    n_docs/sum_tokens certify balance and completeness, head_key/
    head_doc certify the deterministic order actually written.  The
    oracle recomputes both hashes from raw rows, so a doc routed to
    the wrong shard (or an order drift) breaks the hash."""
    from ..functions.text import spark_tokens
    from ..sources.scans import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    d = docs.selectExpr(
        "doc_id",
        f"{_SHARD} AS shard",
        f"{_ORDER} AS order_key",
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS n_tokens",
    )
    out = scratch_dir("train_shards", sf_dir)
    (
        d.repartition(N_SHARDS, F.col("shard"))
        .sortWithinPartitions("shard", "order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("order_key").cast("bigint").alias("head_key"),
            F.min_by("doc_id", "order_key").cast("bigint").alias("head_doc"),
        )
    )
