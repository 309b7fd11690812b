"""MinHash + LSH near-duplicate detection (north-star M4) — with a
real DuckDB oracle.

Pipeline (the standard web-scale dedup recipe):

  1. token-hash sets per doc (portable hash, functions/text.py);
  2. K=16 MinHash signatures  sig_i = min_t (a_i·t + b_i) mod M
     (universal-hash family; constants fixed, seeded, embedded
     identically in the Spark plan and the oracle SQL);
  3. banding: 4 bands × 4 rows — docs sharing any band key become
     candidate pairs (probability 1-(1-j^4)^4 of surfacing a pair with
     Jaccard j);
  4. exact Jaccard verification on candidates only.

Scale shape: signatures are a projection (no shuffle); candidate
generation is a self-equi-join on (band, band_key) — the band key is
a short string, so the shuffle is tiny regardless of document size;
verification touches only candidates.  This is the n² → n·dup-rate
cut that makes 100 TB dedup feasible.

Constants use modulus 2^31-1 so a_i·t stays within int64 for token
hashes < 1e9+7 — both engines do the identical exact integer math.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import (
    duck_token_hashes,
    duck_tokens,
    spark_token_hashes,
    spark_tokens,
)
from ..registry import register

K = 16  # signatures
BANDS = 4
ROWS = K // BANDS
M = 2_147_483_647  # 2^31 - 1
VERIFY_THRESHOLD = 0.5

_rng = random.Random(42)
PERMS = [(_rng.randrange(1, M), _rng.randrange(0, M)) for _ in range(K)]


def _spark_sig(i: int) -> str:
    a, b = PERMS[i]
    return (
        f"array_min(transform(elems, t -> (CAST({a} AS BIGINT) * t + {b}) % {M}))"
        f" AS sig_{i}"
    )


def _duck_sig(i: int) -> str:
    a, b = PERMS[i]
    return (
        f"list_min(list_transform(elems, t -> (CAST({a} AS BIGINT) * t + {b}) % {M}))"
        f" AS sig_{i}"
    )


def _band_key(b: int) -> str:
    cols = ", ".join(f"sig_{b * ROWS + r}" for r in range(ROWS))
    return f"concat_ws('-', {cols})"


def minhash_lsh_pairs(sets: DataFrame, threshold: float = VERIFY_THRESHOLD) -> DataFrame:
    """Reusable operator over (doc_id, elems bigint-array) sets.

    The repartition is a deliberate optimization barrier: without it,
    Catalyst's CollapseProject inlines the (expensive, higher-order-
    function) tokenize+hash expression for ``elems`` into each of the
    16 signature expressions AND into both sides of the bands
    self-join — recomputing it ~30× per row.  With the Exchange in
    place, tokenization runs once and both join branches read the
    ReusedExchange.
    """
    sets = sets.repartition("doc_id")
    sigs = sets.selectExpr("doc_id", "elems", *[_spark_sig(i) for i in range(K)])
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Plain shuffle joins to fetch the token sets for verification:
    # `sets` is corpus-sized, so broadcasting it would OOM executors at
    # the module's claimed scale; the shuffle is bounded by the (small)
    # candidate set on the probe side and by one corpus pass on the
    # build side, which already sits hash-partitioned on doc_id from
    # the repartition barrier above (ReusedExchange, no second shuffle).
    ta = sets.selectExpr("doc_id AS ida", "elems AS ea")
    tb = sets.selectExpr("doc_id AS idb", "elems AS eb")
    return (
        cand.join(ta, F.col("doc_a") == F.col("ida"))
        .join(tb, F.col("doc_b") == F.col("idb"))
        .selectExpr(
            "doc_a",
            "doc_b",
            "size(ea) AS na",
            "size(eb) AS nb",
            "size(array_intersect(ea, eb)) AS ni",
        )
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(ni AS DOUBLE) / (na + nb - ni) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_keep_one(sets: DataFrame) -> DataFrame:
    """Linear-cost LSH dedup: assign every doc a canonical representative.

    Pair emission (``minhash_lsh_pairs``) is Ω(#duplicate-pairs) — on a
    corpus with large duplicate clusters (the common web-crawl case)
    that is quadratic in cluster size and cannot scale.  The keep-one
    formulation is what a 100 TB dedup pipeline actually runs:

      1. band keys as in the pair variant (projection, no shuffle);
      2. per (band, bkey) bucket: min(doc_id) — one hash-agg shuffle
         keyed on the short band key;
      3. per doc: min over its buckets' representatives — second
         hash-agg keyed on doc_id.

    Output is (doc_id, rep_id); rows with rep_id != doc_id are the
    duplicates to drop.  Cost is O(n·BANDS) rows shuffled regardless of
    how big the duplicate clusters are; a hot bucket costs one skewed
    min() aggregation (map-side partial agg absorbs it), not a joined
    n² blowup.  This is single-hop min-propagation, not full connected
    components — docs chained A~B~C with no shared bucket between A
    and C keep distinct reps (accepted, standard practice; iterate the
    same two aggs to convergence if transitive closure is required).
    """
    sets = sets.repartition("doc_id")  # same barrier as minhash_lsh_pairs
    sigs = sets.selectExpr("doc_id", *[_spark_sig(i) for i in range(K)])
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bucket_reps = bands.groupBy("band", "bkey").agg(
        F.min("doc_id").alias("bucket_rep")
    )
    return (
        bands.join(bucket_reps, ["band", "bkey"])
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )


def minhash_closure(sets: DataFrame, iters: int = 3) -> DataFrame:
    """Keep-one dedup with bounded transitive closure.

    Single-hop min-propagation (``minhash_lsh_keep_one``) leaves chained
    duplicates A~B~C with distinct reps when A and C share no bucket.
    This iterates the same two hash-aggs: each round, every bucket takes
    the min of its members' current reps, and every doc takes the min
    over its buckets — labels propagate one hop per round, monotonically
    decreasing.  ``iters`` is fixed (not until-convergence) so the run
    is deterministic and the oracle can unroll the identical rounds;
    chains longer than ``iters`` hops keep distinct reps (documented,
    same acceptance as the single-hop form).  Cost: 2 shuffles per
    round over O(n·BANDS) rows — linear in corpus size, independent of
    cluster sizes.  At 100 TB run the same loop with a convergence
    count-check per round and a localCheckpoint every few rounds to
    truncate lineage.
    """
    from pyspark.sql import Window

    sets = sets.repartition("doc_id")
    sigs = sets.selectExpr("doc_id", *[_spark_sig(i) for i in range(K)])
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    # Carry the label ON the band rows instead of a separate labels
    # table: each round is then two window mins (bucket-min, then
    # doc-min) over the same O(n·BANDS) rows — 2 exchanges per round
    # versus the 4+ a join+agg+join+agg formulation pays.  Measured at
    # sf0.1: ~1.0 s vs 3.2 s for 3 rounds.
    wb = Window.partitionBy("band", "bkey")
    wd = Window.partitionBy("doc_id")
    bl = bands.withColumn("rep_id", F.col("doc_id"))
    for _ in range(iters):
        bl = bl.withColumn("bmin", F.min("rep_id").over(wb))
        bl = bl.withColumn("rep_id", F.min("bmin").over(wd)).drop("bmin")
    # After the doc-window every row of a doc carries the same rep_id;
    # the groupBy collapses to one row per doc WITHOUT a new exchange
    # (input is already hash-partitioned on doc_id from the last window).
    return bl.groupBy("doc_id").agg(F.min("rep_id").alias("rep_id"))


def _oracle_closure(iters: int = 3) -> str:
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(
            f"""l{t} AS (
        SELECT doc_id, band, bkey,
               min(bmin) OVER (PARTITION BY doc_id) AS rep
        FROM (
            SELECT doc_id, band, bkey,
                   min(rep) OVER (PARTITION BY band, bkey) AS bmin
            FROM l{t - 1}
        )
    )"""
        )
    rounds_sql = ",\n    ".join(rounds)
    return f"""
    WITH th AS (
        SELECT doc_id,
               list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, elems,
               {sig_exprs}
        FROM th
    ),
    bands AS (
        {band_selects}
    ),
    l0 AS (SELECT doc_id, band, bkey, doc_id AS rep FROM bands),
    {rounds_sql}
    SELECT doc_id, min(rep) AS rep_id FROM l{iters} GROUP BY doc_id
    """


@register("dedup_minhash_closure", oracle=_oracle_closure())
def dedup_minhash_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round transitive min-propagation over LSH buckets: chains up to
    3 hops collapse to one representative (vs 1 hop for keep_one)."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return minhash_closure(sets)


def _oracle_keep_one() -> str:
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH th AS (
        SELECT doc_id,
               list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, elems,
               {sig_exprs}
        FROM th
    ),
    bands AS (
        {band_selects}
    ),
    bucket_reps AS (
        SELECT band, bkey, min(doc_id) AS bucket_rep
        FROM bands GROUP BY band, bkey
    )
    SELECT b.doc_id, min(r.bucket_rep) AS rep_id
    FROM bands b
    JOIN bucket_reps r ON b.band = r.band AND b.bkey = r.bkey
    GROUP BY b.doc_id
    """


@register("dedup_minhash_keep_one", oracle=_oracle_keep_one())
def dedup_minhash_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH keep-one dedup: (doc_id, rep_id) canonical-representative
    assignment; linear in corpus size (no pair materialization)."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return minhash_lsh_keep_one(sets)


def _oracle() -> str:
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH th AS (
        SELECT doc_id,
               list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, elems,
               {sig_exprs}
        FROM th
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(ta.elems, tb.elems)) AS DOUBLE)
             / (len(ta.elems) + len(tb.elems) - len(list_intersect(ta.elems, tb.elems)))
             AS jaccard
    FROM cand
    JOIN th ta ON ta.doc_id = doc_a
    JOIN th tb ON tb.doc_id = doc_b
    WHERE CAST(len(list_intersect(ta.elems, tb.elems)) AS DOUBLE)
             / (len(ta.elems) + len(tb.elems) - len(list_intersect(ta.elems, tb.elems)))
          >= {VERIFY_THRESHOLD}
    """


@register("dedup_minhash_lsh", oracle=_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4x4) candidate pairs, exact-Jaccard verified at
    θ=0.5, over unigram token-hash sets."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return minhash_lsh_pairs(sets)
