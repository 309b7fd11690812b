"""SimHash near-duplicate detection (north-star M4) — oracle-checked.

32-bit SimHash over word-bigram shingle hashes: each shingle votes ±1
per bit position (by its hash's bit), the sign of each bit-sum becomes
the fingerprint bit.  Near-duplicates are pairs within a small Hamming
distance.

Scale shape: fingerprinting is explode → groupBy(doc) — one shuffle of
(doc_id, hash) pairs.  Pairing is band-then-verify, never all-pairs:
the 32-bit fingerprint splits into MAX_HAMMING+1 = 7 blocks, candidates
equi-join on any equal (block, value) — by pigeonhole, Hamming ≤ 6
forces at least one of 7 blocks equal, so the banding is lossless and
the exact all-pairs DuckDB oracle certifies identical output.  Exact
bit_count verification runs on candidates only.  Same candidate-
generation cost model as MinHash LSH: O(n·blocks) rows shuffled on
short keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import (
    duck_bigrams,
    duck_token_hashes,
    duck_tokens,
    spark_bigrams,
    spark_token_hashes,
    spark_tokens,
)
from ..registry import register

BITS = 32
MAX_HAMMING = 6

# Pigeonhole banding: with MAX_HAMMING+1 blocks, any pair within
# MAX_HAMMING must agree on at least one whole block.
_WIDTHS = [5, 5, 5, 5, 4, 4, 4]  # sums to BITS; len == MAX_HAMMING + 1
_OFFSETS = [sum(_WIDTHS[:i]) for i in range(len(_WIDTHS))]


def _band_structs() -> str:
    parts = [
        f"struct({i} AS blk, (shiftright(simhash, {off}) & {(1 << w) - 1}) AS val)"
        for i, (off, w) in enumerate(zip(_OFFSETS, _WIDTHS))
    ]
    return f"array({', '.join(parts)})"


def _spark_bitsums() -> list[str]:
    return [
        f"SUM(CASE WHEN (shiftright(t, {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(BITS)
    ]


def _duck_bitsums() -> str:
    return ",\n               ".join(
        f"SUM(CASE WHEN ((t >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(BITS)
    )


def _fingerprint_expr() -> str:
    terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(BITS)
    )
    return f"({terms})"


def simhash_fingerprints(shingle_hashes: DataFrame) -> DataFrame:
    """(doc_id, t bigint) exploded shingle hashes → (doc_id, simhash).

    Measured negative result (r2): feeding this from the window-based
    gram-id path (textops.gram_id_rows, distinct=False) is SLOWER than
    the bigram-string fold here — 5.5 s vs 3.6 s at 32× sf0.1 —
    because simhash needs the full positional multiset, and a per-doc
    posexplode+sort outweighs the per-char fold for n=2.  gram_id_rows
    wins only where grams are deduped per doc or n is large
    (decontaminate n=5: 13.8 s → 2.5 s; boilerplate: 12 s → 1.6 s)."""
    sums = shingle_hashes.groupBy("doc_id").agg(
        *[F.expr(e) for e in _spark_bitsums()]
    )
    return sums.selectExpr("doc_id", f"{_fingerprint_expr()} AS simhash")


def _bands_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.selectExpr("doc_id", f"{spark_tokens('text')} AS toks").filter(
        F.size("toks") >= 2
    )
    exploded = toks.selectExpr(
        "doc_id", f"explode({spark_token_hashes(spark_bigrams('toks'))}) AS t"
    )
    fp = simhash_fingerprints(exploded)
    return fp.selectExpr(
        "doc_id", "simhash", f"explode({_band_structs()}) AS bk"
    ).select(
        "doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val")
    )


def _keep_one_sql_prefix() -> str:
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {i} AS blk, (simhash >> {off}) & {(1 << w) - 1} AS val FROM fp"
        for i, (off, w) in enumerate(zip(_OFFSETS, _WIDTHS))
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {duck_tokens('text')} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest({duck_token_hashes(duck_bigrams('toks'))}) AS t
        FROM toks WHERE len(toks) >= 2
    ),
    sums AS (
        SELECT doc_id,
               {_duck_bitsums()}
        FROM sh GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, {_fingerprint_expr()} AS simhash FROM sums),
    bands AS (
        {band_selects}
    ),
    bucket_reps AS (
        SELECT blk, val, min(doc_id) AS bucket_rep FROM bands GROUP BY blk, val
    )
    """


@register(
    "dedup_simhash_keep_one",
    oracle=_keep_one_sql_prefix()
    + """
    SELECT b.doc_id, min(r.bucket_rep) AS rep_id
    FROM bands b
    JOIN bucket_reps r ON b.blk = r.blk AND b.val = r.val
    GROUP BY b.doc_id
    """,
)
def dedup_simhash_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear SimHash dedup: every doc gets the min doc_id over its
    7 band buckets as canonical representative — O(n·blocks) rows
    shuffled regardless of duplicate-cluster size (pair emission is
    Ω(#pairs) = quadratic in cluster size; measured in
    scripts/scale_probe.py).  LSH-only merge semantics (no Hamming
    verify), same accepted trade as dedup_minhash_keep_one."""
    bands = _bands_frame(spark, sf_dir)
    bucket_reps = bands.groupBy("blk", "val").agg(F.min("doc_id").alias("bucket_rep"))
    return (
        bands.join(bucket_reps, ["blk", "val"])
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {duck_tokens('text')} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest({duck_token_hashes(duck_bigrams('toks'))}) AS t
        FROM toks WHERE len(toks) >= 2
    ),
    sums AS (
        SELECT doc_id,
               {_duck_bitsums()}
        FROM sh GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, {_fingerprint_expr()} AS simhash FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32) over bigram shingles; pairs with Hamming ≤ 6 via
    lossless 7-block banding (candidates) + exact bit_count verify."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.selectExpr("doc_id", f"{spark_tokens('text')} AS toks").filter(
        F.size("toks") >= 2
    )
    exploded = toks.selectExpr(
        "doc_id", f"explode({spark_token_hashes(spark_bigrams('toks'))}) AS t"
    )
    fp = simhash_fingerprints(exploded)
    # fp ends in a groupBy exchange, so both band-join branches read a
    # ReusedExchange (no fingerprint recompute).
    bands = fp.selectExpr(
        "doc_id", "simhash", f"explode({_band_structs()}) AS bk"
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val"))
    a = bands.selectExpr("blk", "val", "doc_id AS doc_a", "simhash AS ha")
    b = bands.selectExpr("blk", "val", "doc_id AS doc_b", "simhash AS hb")
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return cand.selectExpr(
        "doc_a", "doc_b", "CAST(bit_count(ha ^ hb) AS INT) AS hamming"
    ).filter(F.col("hamming") <= MAX_HAMMING)
