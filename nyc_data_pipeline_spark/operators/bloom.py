"""Bloom-filter semi-join prefilter, built from integer primitives.

The 100 TB join discipline this demonstrates: when a selective build
side must filter a huge probe side, shipping the KEYS is wasteful —
ship a fixed-size bit array instead and let the probe side discard
non-members before the real join ever shuffles.  Spark applies this
internally (runtime bloom-filter injection), but the internal
`bloom_filter_agg` is not a user-callable function and its sketch has
no cross-engine twin — so this operator builds the filter from plain
integer arithmetic: K_HASH multiplicative hashes into a
BLOOM_WORDS×BITS_PER_WORD bit array carried as int64 words, aggregated
with bit_or.  That keeps every bit REPRODUCIBLE in DuckDB, so the
oracle hash-checks the filter's exact contents (membership counts and
the false-positive count itself), not just an error bound.

Bits per word is 60, not 64, so the mask shift never touches the sign
bit — two's-complement shift semantics at bit 63 are the kind of
cross-engine edge this repo's exact-integer policy exists to avoid.

Scale shape: the build side reduces to BLOOM_WORDS rows (a fixed-size
partial-aggregable bit array — the mergeable-sketch property that makes
bloom filters distribution-friendly), which BROADCASTS; the probe side
expands K_HASH rows per key, joins the broadcast word table, and
reduces back — linear in the probe, constant-size state, no shuffle of
either table.  The guarantee the output certifies: zero false
negatives (every exact member passes), false positives bounded and
counted exactly.

Reference parity note: the reference has no joins at all; this is
north-star join-infrastructure surface (SURVEY §2.3 [GAP] rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

HASH_MOD = 1_000_000_007
# Three independent multiplicative hashes (odd constants; key reduced
# mod HASH_MOD first so each multiply stays inside int64).
HASH_MULTS = (2_654_435_761, 2_246_822_519, 3_266_489_917)
# 2048 words × 60 bits ≈ 123 k bits (15 KB broadcast): ~10 bits/key at
# the sf0.1 build side (~4.5 k keys), i.e. FP ≈ 0.1% — and the word
# table stays a trivial broadcast at any filter size.  An undersized
# filter doesn't break correctness, it just reports a large
# n_false_pos (measured: 16 words → 43% FP at sf0.01 — the audit row
# makes sizing mistakes visible instead of silent).
BLOOM_WORDS = 2048
BITS_PER_WORD = 60  # avoid the int64 sign bit
BLOOM_BITS = BLOOM_WORDS * BITS_PER_WORD
ACCTBAL_MIN = 7_000.0  # build-side predicate: high-balance customers


def _hash_exprs(key: str) -> list[str]:
    """SQL expressions for the K bit positions of `key` (both engines)."""
    return [
        f"((({key} % {HASH_MOD}) * {m}) % {HASH_MOD}) % {BLOOM_BITS}"
        for m in HASH_MULTS
    ]


@register(
    "join_bloom_prefilter",
    oracle=f"""
    WITH build AS (
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > {ACCTBAL_MIN}
    ),
    bits AS (
        {" UNION ALL ".join(
            f"SELECT ({h}) // {BITS_PER_WORD} AS word,"
            f" (1::BIGINT << (({h}) % {BITS_PER_WORD})) AS mask FROM build"
            for h in _hash_exprs("k")
        )}
    ),
    bloom AS (
        SELECT word, bit_or(mask) AS bits FROM bits GROUP BY word
    ),
    probe AS (
        SELECT o_orderkey, o_custkey AS k FROM orders
    ),
    probe_bits AS (
        {" UNION ALL ".join(
            f"SELECT o_orderkey, ({h}) // {BITS_PER_WORD} AS word,"
            f" (1::BIGINT << (({h}) % {BITS_PER_WORD})) AS mask FROM probe"
            for h in _hash_exprs("k")
        )}
    ),
    hits AS (
        SELECT p.o_orderkey,
               SUM(CASE WHEN (b.bits & p.mask) = p.mask
                        THEN 1 ELSE 0 END) AS n_hit
        FROM probe_bits p LEFT JOIN bloom b ON p.word = b.word
        GROUP BY p.o_orderkey
    ),
    passed AS (
        SELECT o_orderkey FROM hits WHERE n_hit = {len(HASH_MULTS)}
    ),
    exact AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT k FROM build)
    )
    SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_probe,
           CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_bloom_pass,
           CAST((SELECT COUNT(*) FROM passed) AS BIGINT)
             - CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_false_pos
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Bloom prefilter for a semi join: high-balance
    customers build a {BLOOM_BITS}-bit filter (BLOOM_WORDS int64 words
    via bit_or — a mergeable, broadcastable sketch); every order probes
    it with {len(HASH_MULTS)} hashes.  Output is one audit row:
    (n_probe, n_exact, n_bloom_pass, n_false_pos) — the oracle rebuilds
    the identical bit array, so the driver hash-checks zero false
    negatives AND the exact false-positive count, not a probabilistic
    bound."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.where(F.col("c_acctbal") > ACCTBAL_MIN).select(
        F.col("c_custkey").alias("k")
    )
    hashes = _hash_exprs("k")

    def bit_rows(df: DataFrame, extra: list[str]) -> DataFrame:
        parts = [
            df.selectExpr(
                *extra,
                f"({h}) div {BITS_PER_WORD} AS word",
                f"shiftleft(1L, int(({h}) % {BITS_PER_WORD})) AS mask",
            )
            for h in hashes
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    bloom = bit_rows(build, []).groupBy("word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    probe = orders.select("o_orderkey", F.col("o_custkey").alias("k"))
    probe_bits = bit_rows(probe, ["o_orderkey"])
    hits = (
        probe_bits.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            ((F.col("bits").bitwiseAND(F.col("mask"))) == F.col("mask")).cast(
                "int"
            ),
        )
        .groupBy("o_orderkey")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    n_pass = (
        hits.where(F.col("n_hit") == len(HASH_MULTS))
        .agg(F.count("*").alias("n_bloom_pass"))
    )
    n_exact = (
        orders.join(F.broadcast(build), orders["o_custkey"] == build["k"], "left_semi")
        .agg(F.count("*").alias("n_exact"))
    )
    n_probe = orders.agg(F.count("*").alias("n_probe"))
    return (
        n_probe.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_pass))
        .select(
            F.col("n_probe").cast("bigint").alias("n_probe"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_bloom_pass").cast("bigint").alias("n_bloom_pass"),
            (F.col("n_bloom_pass") - F.col("n_exact"))
            .cast("bigint")
            .alias("n_false_pos"),
        )
    )
