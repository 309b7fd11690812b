"""SimHash near-duplicate detection (north-star M4) — oracle-checked.

32-bit SimHash over word-bigram shingle hashes: each shingle votes ±1
per bit position (by its hash's bit), the sign of each bit-sum becomes
the fingerprint bit.  Near-duplicates are pairs within a small Hamming
distance.

Scale shape: fingerprinting is explode → groupBy(doc) — one shuffle of
(doc_id, hash) pairs.  Pairing here is the exact all-pairs form (fine
for the fixture corpus and honest for the oracle); at 100 TB the
standard trick applies unchanged on top of this output: split the
32-bit fingerprint into 4 byte-blocks, equi-join on any equal block
(pigeonhole: Hamming ≤ 3 ⇒ some block equal), verify bit_count on
candidates only — the same band-then-verify shape as MinHash LSH.
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
    """(doc_id, t bigint) exploded shingle hashes → (doc_id, simhash)."""
    sums = shingle_hashes.groupBy("doc_id").agg(
        *[F.expr(e) for e in _spark_bitsums()]
    )
    return sums.selectExpr("doc_id", f"{_fingerprint_expr()} AS simhash")


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
    """SimHash(32) over bigram shingles; pairs with Hamming ≤ 6."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.selectExpr("doc_id", f"{spark_tokens('text')} AS toks").filter(
        F.size("toks") >= 2
    )
    exploded = toks.selectExpr(
        "doc_id", f"explode({spark_token_hashes(spark_bigrams('toks'))}) AS t"
    )
    fp = simhash_fingerprints(exploded)
    a = fp.selectExpr("doc_id AS doc_a", "simhash AS ha")
    b = fp.selectExpr("doc_id AS doc_b", "simhash AS hb")
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .selectExpr("doc_a", "doc_b", "CAST(bit_count(ha ^ hb) AS INT) AS hamming")
        .filter(F.col("hamming") <= MAX_HAMMING)
    )
