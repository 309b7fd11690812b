"""Training-data mixing and sequence packing.

Two operators every pretraining pipeline runs between curation and
tokenization:

- ``sample_weighted_mix`` — per-source weighted sampling ("data
  mixing"): up-weight high-quality sources, down-sample the crawl.
  Deterministic hash-based sampling (not ``rand()``) so reruns and
  incremental reprocessing select the same documents, and the selection
  is reproducible across engines — the property that makes ablations
  comparable.
- ``pack_token_budget`` — concat-and-chunk sequence packing: documents
  are concatenated in a deterministic order and split into fixed-size
  token windows; each doc learns which training sequence(s) it lands
  in.  This is the bookkeeping view of the packing step every trainer
  performs (which docs share a sequence, where each doc starts).

Reference parity: the reference pipeline has no sampling/packing stage
(it is a taxi-trip ETL); these extend the engine toward the
training-data workload BASELINE.json targets.

Scale shapes are documented per operator; both are verified against
DuckDB oracles (hash arithmetic and window sums are exact integer
math in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..functions.text import (
    duck_token_hashes,
    duck_tokens,
    spark_token_hashes,
    spark_tokens,
)
from ..registry import register

# --- deterministic per-source sampling ------------------------------------

# Same modulus as functions.text.HASH_MOD (shared cross-engine hash field).
HASH_MOD = 1_000_000_007
MIX_MULT = 2_654_435_761  # Knuth multiplicative constant
# Sampling rates in permille, by source; integer thresholds so the
# keep-decision is pure integer arithmetic (exact in both engines).
MIX_PERMILLE = {"src0": 1000, "src1": 600, "src2": 350}
MIX_DEFAULT_PERMILLE = 150


def _permille_case(src_col: str) -> str:
    whens = " ".join(
        f"WHEN {src_col} = '{s}' THEN {p}" for s, p in MIX_PERMILLE.items()
    )
    return f"CASE {whens} ELSE {MIX_DEFAULT_PERMILLE} END"


# h(doc_id) in [0, HASH_MOD); doc_id is reduced mod HASH_MOD first so
# the multiply never overflows int64 (1e9 * 2.65e9 < 2^63).
_BUCKET = (
    f"(((doc_id % {HASH_MOD}) * {MIX_MULT}) % {HASH_MOD}) % 1000"
)


@register(
    "sample_weighted_mix",
    oracle=f"""
    SELECT doc_id, source,
           CAST(1000 AS DOUBLE) / ({_permille_case('source')}) AS weight
    FROM documents
    WHERE {_BUCKET} < ({_permille_case('source')})
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: deterministic per-source weighted sampling.

    Each doc is kept iff ``hash(doc_id) mod 1000 < rate_permille(source)``
    — a pure integer decision, so the SAME docs are selected on every
    run, on every engine, and when the corpus is reprocessed
    incrementally (a ``rand() < p`` sample has none of these).  Kept
    rows carry ``weight = 1/rate`` for unbiased downstream statistics.

    Scale shape: ZERO shuffles — a codegen'd narrow filter over the
    scan; the rate table is a literal CASE (real pipelines broadcast a
    small source→rate dim, same plan shape).  At 100 TB this is pure
    scan throughput."""
    d = load_table(spark, sf_dir, "documents")
    permille = F.expr(_permille_case("source"))
    return (
        d.withColumn("_bucket", F.expr(_BUCKET))
        .filter(F.col("_bucket") < permille)
        .select(
            "doc_id",
            "source",
            (F.lit(1000).cast("double") / permille).alias("weight"),
        )
    )


# --- concat-and-chunk sequence packing ------------------------------------

PACK_BUDGET = 256  # tokens per training sequence


@register(
    "pack_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                    AS BIGINT) AS cum
        FROM t WHERE n_tok >= 1
    )
    SELECT doc_id, source, n_tok,
           cum - n_tok AS start_off,
           (cum - n_tok) // {PACK_BUDGET} AS seq_id,
           (cum - n_tok) % {PACK_BUDGET} AS seq_off,
           ((cum - 1) // {PACK_BUDGET})
             - ((cum - n_tok) // {PACK_BUDGET}) + 1 AS n_seqs
    FROM c
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): per source, docs are laid
    end-to-end in doc_id order and cut into {PACK_BUDGET}-token
    sequences; each doc reports its starting sequence (``seq_id``),
    offset within it (``seq_off``), and how many sequences it spans
    (``n_seqs``) — the map a trainer uses to build attention-mask
    boundaries and to trace a training sequence back to its documents.

    Scale shape: one shuffle on ``source`` + a per-partition sort for
    the running sum — identical to every window operator here.  The
    stream is packed per source shard, which is how production packing
    runs anyway (a single global order would serialize the corpus
    through one partition); a global pack falls out of the same plan
    with a two-phase partition-offset cumsum."""
    return pack_docs(load_table(spark, sf_dir, "documents"))


def pack_docs(d: DataFrame) -> DataFrame:
    """Reusable core of pack_token_budget over any (doc_id, source, text)."""
    w = Window.partitionBy("source").orderBy("doc_id")
    b = PACK_BUDGET
    return (
        d.select(
            "doc_id",
            "source",
            F.size(F.expr(spark_tokens("text"))).cast("bigint").alias("n_tok"),
        )
        .filter(F.col("n_tok") >= 1)
        .withColumn("cum", F.sum("n_tok").over(w))
        .selectExpr(
            "doc_id",
            "source",
            "n_tok",
            "cum - n_tok AS start_off",
            f"(cum - n_tok) div {b} AS seq_id",
            f"(cum - n_tok) % {b} AS seq_off",
            f"((cum - 1) div {b}) - ((cum - n_tok) div {b}) + 1 AS n_seqs",
        )
    )


# --- language-balanced sampling -------------------------------------------


@register(
    "sample_lang_balanced",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY lang
    ),
    t AS (SELECT MIN(cnt) AS target FROM c),
    r AS (
        SELECT lang, cnt,
               CAST(least(1000, (target * 1000) // cnt) AS BIGINT)
                   AS rate_permille
        FROM c, t
    )
    SELECT d.doc_id, d.lang, r.rate_permille,
           CAST(1000 AS DOUBLE) / r.rate_permille AS weight
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE {_BUCKET} < r.rate_permille
    """,
)
def sample_lang_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced sampling: down-sample every language to
    (approximately) the size of the smallest one, so no language
    dominates the mix.  Rates are integer permille derived from the
    per-language counts (target = min count), and the keep-decision is
    the same deterministic doc_id hash as ``sample_weighted_mix`` —
    reruns, engines, and incremental batches select identical docs.

    Scale shape: one count aggregate (tiny result: one row per
    language), a 1-row min, then the rate table BROADCASTS back onto
    the corpus scan — the corpus itself never shuffles; the filter is
    codegen'd integer arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("cnt"))
    t = c.agg(F.min("cnt").alias("target"))
    r = c.crossJoin(F.broadcast(t)).select(
        "lang",
        F.least(
            F.lit(1000).cast("bigint"),
            F.expr("target * 1000 DIV cnt"),
        ).alias("rate_permille"),
    )
    return (
        d.join(F.broadcast(r), "lang")
        .withColumn("_bucket", F.expr(_BUCKET))
        .filter(F.col("_bucket") < F.col("rate_permille"))
        .select(
            "doc_id",
            "lang",
            "rate_permille",
            (F.lit(1000).cast("double") / F.col("rate_permille")).alias(
                "weight"
            ),
        )
    )


# --- curriculum buckets ----------------------------------------------------

CURRICULUM_BUCKETS = 10


@register(
    "curriculum_quality_buckets",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source, n_chars,
               CAST(ntile({CURRICULUM_BUCKETS}) OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS INTEGER) AS bucket
        FROM documents
    )
    SELECT source, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY source, bucket
    """,
)
def curriculum_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: per source, docs are ranked by length
    (the cheap difficulty proxy; swap in any score column) and cut
    into {CURRICULUM_BUCKETS} equal-depth buckets with NTILE — the
    stage boundaries a curriculum scheduler feeds from easy to hard.
    The order (n_chars, doc_id) is total, so bucket assignment is
    deterministic under any partitioning.

    Scale shape: the window partitions by source (no global sort — a
    corpus-wide NTILE would serialize one partition); the per-bucket
    rollup reuses the same (source) clustering, map-side partials on a
    {CURRICULUM_BUCKETS}-row-per-source result."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.ntile(CURRICULUM_BUCKETS).over(w).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --- overlapping document chunking -----------------------------------------

CHUNK_SIZE = 128   # tokens per chunk
CHUNK_STRIDE = 96  # stride < size -> 32-token overlap between chunks


@register(
    "chunk_documents_stride",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tok,
               unnest(generate_series(
                   0,
                   greatest(n_tok - 1, 0) // {CHUNK_STRIDE}
               )) AS chunk_idx
        FROM t WHERE n_tok >= 1
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           chunk_idx * {CHUNK_STRIDE} AS tok_start,
           least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n_tok) AS tok_end
    FROM c
    WHERE chunk_idx * {CHUNK_STRIDE} < n_tok
    """,
)
def chunk_documents_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunking: split each document into {CHUNK_SIZE}-token
    windows advancing by {CHUNK_STRIDE} tokens ({CHUNK_SIZE - CHUNK_STRIDE}
    overlap) — the retrieval/embedding-index prep step (RAG chunking,
    long-doc embedding).  Emits (doc_id, chunk_idx, tok_start, tok_end)
    bookkeeping; slicing the actual text rides the same bounds.

    Scale shape: pure per-row sequence explode — no shuffle at all; the
    chunk count per doc is ceil(n_tok/stride), so output size is
    linear in corpus token count."""
    d = load_table(spark, sf_dir, "documents")
    t = d.selectExpr(
        "doc_id",
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS n_tok",
    ).filter(F.col("n_tok") >= 1)
    return (
        t.select(
            "doc_id",
            "n_tok",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n_tok") - 1) / CHUNK_STRIDE).cast("bigint"),
                )
            ).alias("chunk_idx"),
        )
        .filter(F.col("chunk_idx") * CHUNK_STRIDE < F.col("n_tok"))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_STRIDE).alias("tok_start"),
            F.least(
                F.col("chunk_idx") * CHUNK_STRIDE + CHUNK_SIZE, F.col("n_tok")
            ).alias("tok_end"),
        )
    )


# --- tokenizer vocabulary coverage -----------------------------------------

VOCAB_TOP_K = 500  # corpus-frequency vocab size for the coverage probe


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({duck_tokens('text')}) AS tk FROM documents
    ),
    vocab AS (
        SELECT tk FROM (
            SELECT tk, COUNT(*) AS freq,
                   row_number() OVER (ORDER BY COUNT(*) DESC, tk) AS rk
            FROM tok GROUP BY tk
        ) WHERE rk <= {VOCAB_TOP_K}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tk IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.tk IS NOT NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (tk)
    GROUP BY doc_id
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: per-document out-of-vocabulary
    rate against the corpus's top-{VOCAB_TOP_K} tokens (stand-in for a
    fixed tokenizer vocab — swap in a broadcast vocab table in
    production).  High OOV flags encoding noise, language mismatch, or
    tokenizer drift before a training run wastes compute on it.

    Scale shape: the vocab derives from one token-frequency aggregate
    and is TOP-K-small, so it BROADCASTS into the coverage join — the
    corpus token stream never shuffles for membership; the per-doc
    rollup keys on doc_id.  The top-k selection is ``ORDER BY ...
    LIMIT k`` (TakeOrderedAndProject: per-partition size-k heaps, driver
    merge) — NOT a global-order ``row_number`` window, which would drag
    the whole distinct-token table (billions of terms at web scale)
    through a single partition."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.selectExpr(
        "doc_id", f"explode({spark_tokens('text')}) AS tk"
    )
    vocab = (
        tok.groupBy("tk")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tk"))
        .limit(VOCAB_TOP_K)
        .select("tk", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tk", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNotNull(), 0).otherwise(1)
            ).cast("bigint").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


RESERVOIR_K = 20
# Knuth-style multiplicative scramble of the doc id: a deterministic,
# engine-portable stand-in for a random draw (both engines compute the
# identical int64 arithmetic; xxhash64/hash() would NOT cross engines).
# doc_id is reduced mod 2^31-1 BEFORE the multiply so the product stays
# < 2^62: plain `doc_id * 2654435761` overflows int64 for ids ≳ 3.47e9,
# where Spark (non-ANSI) wraps silently but DuckDB raises — which would
# break cross-engine determinism exactly at production-scale ids.
_RES_RANK = "((doc_id % 2147483647) * 2654435761) % 2147483647"


@register(
    "sample_reservoir_per_key",
    oracle=f"""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY {_RES_RANK}, doc_id
    ) <= {RESERVOIR_K}
    """,
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota sampling: exactly min(K, group size) docs per source,
    drawn by deterministic hash rank — the per-key reservoir that eval
    sets, human-review queues, and per-domain caps use (complements
    `sample_lang_balanced`, which is rate-based: quotas bound the OUTPUT
    size per key regardless of key skew; rates do not).

    Scale shape: one window shuffle keyed on source; per-key state in
    the window sort is a stream, and at extreme per-key cardinality the
    same result comes from groupBy(source).agg(min_by heap) two-phase —
    rank function and tiebreak (rank, doc_id) make the selection
    rerun/engine-stable either way."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.expr(_RES_RANK), "doc_id")
    return (
        d.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= RESERVOIR_K)
        .drop("rn")
    )


@register(
    "chunk_dedup_exact",
    oracle=f"""
    WITH th AS (
        SELECT doc_id, {{DTH}} AS hs FROM documents
    ),
    t AS (
        SELECT doc_id, hs, CAST(len(hs) AS BIGINT) AS n_tok FROM th
        WHERE len(hs) >= 1
    ),
    c AS (
        SELECT hs, n_tok,
               unnest(generate_series(
                   0, greatest(n_tok - 1, 0) // {CHUNK_STRIDE})) AS ci
        FROM t
    ),
    f AS (
        SELECT list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_slice(hs, ci * {CHUNK_STRIDE} + 1,
                                  least(ci * {CHUNK_STRIDE} + {CHUNK_SIZE},
                                        n_tok))),
                   (a, b) -> (a * 31 + b) % {HASH_MOD}) AS fp
        FROM c WHERE ci * {CHUNK_STRIDE} < n_tok
    ),
    g AS (SELECT fp, COUNT(*) AS n_copies FROM f GROUP BY fp)
    SELECT CAST(n_copies AS BIGINT) AS n_copies,
           CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM g GROUP BY n_copies
    """.replace("{DTH}", duck_token_hashes(duck_tokens("text"))),
)
def chunk_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-level exact dedup: the stride chunks every RAG/embedding
    index is built from get an order-sensitive rolling fingerprint
    (polynomial fold of the chunk's token hashes), and identical
    chunks collapse corpus-wide — boilerplate headers/footers and
    copy-pasta produce duplicate chunks inside otherwise-distinct
    documents, which doc-level dedup cannot see.  Output is the
    duplication histogram (n_copies → n_groups).  Scale shape: chunk
    fan-out is the zero-shuffle explode of `chunk_documents_stride`;
    the fold is per-chunk bounded work ({CHUNK_SIZE} elements); one
    map-side-combined shuffle on the fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    t = d.selectExpr(
        "doc_id",
        f"{spark_token_hashes(spark_tokens('text'))} AS hs",
    ).selectExpr("doc_id", "hs", "CAST(size(hs) AS BIGINT) AS n_tok").filter(
        F.col("n_tok") >= 1
    )
    chunks = t.select(
        "hs",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n_tok") - 1) / CHUNK_STRIDE).cast("bigint"),
            )
        ).alias("ci"),
    ).filter(F.col("ci") * CHUNK_STRIDE < F.col("n_tok"))
    fp = chunks.selectExpr(
        f"aggregate(slice(hs, ci * {CHUNK_STRIDE} + 1, "
        f"CAST(least(ci * {CHUNK_STRIDE} + {CHUNK_SIZE}, n_tok) "
        f"- ci * {CHUNK_STRIDE} AS INT)), "
        f"CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % {HASH_MOD}) AS fp"
    )
    g = fp.groupBy("fp").agg(F.count("*").alias("n_copies"))
    return g.groupBy(F.col("n_copies").cast("bigint").alias("n_copies")).agg(
        F.count("*").cast("bigint").alias("n_groups")
    )


@register(
    "dedup_cross_chunk_share",
    oracle=f"""
    WITH th AS (
        SELECT doc_id, {{DTH}} AS hs FROM documents
    ),
    t AS (
        SELECT doc_id, hs, CAST(len(hs) AS BIGINT) AS n_tok FROM th
        WHERE len(hs) >= 1
    ),
    c AS (
        SELECT doc_id, hs, n_tok,
               unnest(generate_series(
                   0, greatest(n_tok - 1, 0) // {CHUNK_STRIDE})) AS ci
        FROM t
    ),
    f AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_slice(hs, ci * {CHUNK_STRIDE} + 1,
                                  least(ci * {CHUNK_STRIDE} + {CHUNK_SIZE},
                                        n_tok))),
                   (a, b) -> (a * 31 + b) % {HASH_MOD}) AS fp
        FROM c WHERE ci * {CHUNK_STRIDE} < n_tok
    ),
    fd AS (
        SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM f GROUP BY fp
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN fd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks
    FROM f JOIN fd ON fd.fp = f.fp
    GROUP BY f.doc_id
    """.replace("{DTH}", duck_token_hashes(duck_tokens("text"))),
)
def dedup_cross_chunk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CROSS-document duplication share, chunk-exact (the
    document-fraction view of Lee et al. 2021's exact substring dedup,
    at stride-chunk granularity): a chunk counts as shared only when
    its rolling fingerprint appears in at least one OTHER document —
    intra-doc repeats (chunk_dedup_exact's histogram) deliberately
    don't count.  `n_shared_chunks / n_chunks` is the removal/trimming
    score curation applies thresholds to; both counts are emitted so
    the ratio stays exact.

    Scale shape: chunk fan-out is a zero-shuffle explode; one shuffle
    groups fingerprints (map-side combined, short digests only); the
    join back to chunks is fp-keyed on the same partitioning; the final
    per-doc rollup is the only other shuffle.  Linear end to end — the
    full suffix-array construction this approximates is O(n log n)
    sort-heavy; stride chunks trade boundary-straddling duplicates for
    that headroom."""
    d = load_table(spark, sf_dir, "documents")
    t = d.selectExpr(
        "doc_id",
        f"{spark_token_hashes(spark_tokens('text'))} AS hs",
    ).selectExpr("doc_id", "hs", "CAST(size(hs) AS BIGINT) AS n_tok").filter(
        F.col("n_tok") >= 1
    )
    chunks = t.select(
        "doc_id",
        "hs",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n_tok") - 1) / CHUNK_STRIDE).cast("bigint"),
            )
        ).alias("ci"),
    ).filter(F.col("ci") * CHUNK_STRIDE < F.col("n_tok"))
    # The fingerprint table feeds BOTH the distinct-doc rollup and the
    # join probe (a diamond — without persist the tokenize+hash+fold
    # chain runs twice; no ReusedExchange fires because the two
    # consumers need different partitionings).  Measured 1.96 s →
    # 0.62 s warm at sf0.1 (the containment.py / pagerank lesson).
    f = persist_scoped(
        "mixing.chunk_fp",
        chunks.selectExpr(
            "doc_id",
            f"aggregate(slice(hs, ci * {CHUNK_STRIDE} + 1, "
            f"CAST(least(ci * {CHUNK_STRIDE} + {CHUNK_SIZE}, n_tok) "
            f"- ci * {CHUNK_STRIDE} AS INT)), "
            f"CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % {HASH_MOD}) AS fp",
        ),
    )
    fd = f.groupBy("fp").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        f.join(fd, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_chunks"),
        )
    )


# --- temperature-scaled language mixture -----------------------------------
#
# Balanced sampling (sample_lang_balanced) flattens every language to
# the smallest one — too aggressive when head languages carry most of
# the usable signal.  Multilingual pretraining instead samples from
# p_l^alpha renormalized (mBERT/XLM-R/mT5 exposure smoothing): alpha=1
# keeps the raw skew, alpha=0 is uniform, and values in between
# up-weight tail languages without drowning the head.  alpha = 1/2
# makes the un-normalized weight EXACTLY sqrt(count) — one
# IEEE-correctly-rounded sqrt per language, floored to integer
# micro-units (the Neyman-allocation arithmetic, which optimizes a
# different objective: estimator variance there, exposure smoothing
# here).  Everything downstream is exact int64: per-language allocation
# by floor division of the doc budget, keep-rate in permille, and a
# deterministic hash threshold with its OWN salt (three independent
# decisions in this repo — mixing, splitting, allocation — use three
# multipliers; a shared one correlates them silently).
#
# Scale shape: one count aggregate (|langs| rows), the rate table
# BROADCASTS onto the corpus scan, and the keep decision is codegen'd
# integer arithmetic — the corpus never shuffles.  Overflow: budget *
# w_micro stays in int64 up to ~1e12-doc corpora; past that lift the
# carriers to decimal(38,0) (trends.py pattern).

TEMP_BUDGET_DIV = 4  # sample budget = corpus size / 4
TEMP_MULT = 16_777_619  # FNV-1a 32-bit prime; salts vs MIX/SPLIT/NEYMAN

_TEMP_BUCKET = f"(((doc_id % {HASH_MOD}) * {TEMP_MULT}) % {HASH_MOD}) % 1000"


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, cnt,
               CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_micro
        FROM c
    ),
    r AS (
        SELECT lang, cnt, w_micro,
               CAST(least(1000,
                     ((SUM(cnt) OVER () // {TEMP_BUDGET_DIV}) * w_micro
                      // SUM(w_micro) OVER ()) * 1000 // cnt)
                   AS BIGINT) AS rate_permille
        FROM w
    )
    SELECT d.doc_id, d.lang, r.rate_permille,
           CAST(1000 AS DOUBLE) / r.rate_permille AS weight
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE {_TEMP_BUCKET} < r.rate_permille
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha = 1/2) language sampling: keep-rates derived
    from sqrt(count) shares of a corpus/{TEMP_BUDGET_DIV} budget, so
    tail languages are up-weighted relative to raw frequency but the
    head still dominates; deterministic salted-hash keep decision."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("cnt"))
    w = c.selectExpr(
        "lang",
        "cnt",
        "CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT)"
        " AS w_micro",
    )
    r = w.withColumn(
        "rate_permille",
        F.expr(
            f"least(1000, ((SUM(cnt) OVER () div {TEMP_BUDGET_DIV}) * w_micro"
            " div SUM(w_micro) OVER ()) * 1000 div cnt)"
        ),
    ).select("lang", "rate_permille")
    return (
        d.join(F.broadcast(r), "lang")
        .filter(F.expr(_TEMP_BUCKET) < F.col("rate_permille"))
        .select(
            "doc_id",
            "lang",
            "rate_permille",
            (F.lit(1000).cast("double") / F.col("rate_permille")).alias("weight"),
        )
    )
