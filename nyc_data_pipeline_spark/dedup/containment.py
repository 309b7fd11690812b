"""Containment dedup: sub/superset duplicates that Jaccard misses.

A 100-token excerpt pasted into a 10,000-token page has Jaccard
similarity ≈ 0.01 against it — every resemblance-based dedup
(MinHash/SimHash) keeps both.  What catches it is CONTAINMENT
(Broder's "containment" measure): C(A, B) = |A ∩ B| / |A|, which is
~1.0 whenever A's tokens are (almost) all inside B regardless of B's
size.  LLM-curation stacks use this to drop quotes, mirrors-with-
boilerplate, and partial scrapes that survive near-dup filtering.

Scale shape (linear, never all-pairs): candidates are the same
doc → bucket-representative star edges the CC dedup uses
(O(n·BANDS), one edge per LSH band membership — dedup/graph.py), and
containment is evaluated ONLY on those edges via one equi-join that
brings the two token-hash sets of an edge together.  Token sets are
per-doc arrays (bounded by doc length), the intersection is a
codegen'd array_intersect, and the decision is an exact integer
predicate (100·|A∩B| ≥ PCT·|A|) — no floats, bit-identical across
engines.

Reference parity note: the reference has no dedup at all
(ON CONFLICT upserts only, database_handler.py:197-268); north-star
curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..functions.text import duck_token_hashes, duck_tokens, spark_token_hashes, spark_tokens
from ..registry import register
from .minhash import BANDS, K, _band_key, _duck_sig, _spark_sig

CONTAIN_PCT = 60  # doc contained in rep if |A∩B| ≥ 60% of |A|


def _oracle_containment() -> str:
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
        SELECT band, bkey, min(doc_id) AS rep
        FROM bands GROUP BY band, bkey
    ),
    edges AS (
        SELECT DISTINCT b.doc_id AS u, r.rep AS v
        FROM bands b
        JOIN bucket_reps r ON b.band = r.band AND b.bkey = r.bkey
        WHERE b.doc_id <> r.rep
    )
    SELECT e.u AS doc_id, e.v AS rep_id,
           CAST(len(a.elems) AS BIGINT) AS n_doc,
           CAST(len(list_intersect(a.elems, b.elems)) AS BIGINT) AS n_inter,
           100 * len(list_intersect(a.elems, b.elems))
               >= {CONTAIN_PCT} * len(a.elems) AS contained
    FROM edges e
    JOIN th a ON a.doc_id = e.u
    JOIN th b ON b.doc_id = e.v
    """


@register("dedup_containment_rep", oracle=_oracle_containment())
def dedup_containment_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment of each doc in its LSH bucket representative:
    (doc_id, rep_id, n_doc, n_inter, contained).  See module docstring
    for why containment complements Jaccard and why the edge set stays
    linear in corpus size.

    The shingle table feeds THREE consumers (the sig/band path and both
    elems sides of the audit join), so it is persisted — without it
    each consumer re-runs the tokenize+hash lambdas over the whole
    corpus, a 4× recomputation that scripts/scale_probe.py measured
    as the dominant cost at 32× data (70 s → ~7 s).  At 100 TB the
    same decision is "materialize the signature table once" — the
    shape dedup_incremental_probe already assumes."""
    d = load_table(spark, sf_dir, "documents")
    sets = persist_scoped(
        "containment.sets",
        d.selectExpr(
            "doc_id",
            f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
        ).repartition("doc_id"),  # CollapseProject barrier (see minhash.py)
    )
    sigs = sets.selectExpr("doc_id", "elems", *[_spark_sig(i) for i in range(K)])
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bucket_reps = bands.groupBy("band", "bkey").agg(F.min("doc_id").alias("rep"))
    edges = (
        bands.join(bucket_reps, ["band", "bkey"])
        .where(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("u"), F.col("rep").alias("v"))
        .distinct()
    )
    a = sets.select(F.col("doc_id").alias("u"), F.col("elems").alias("a_elems"))
    b = sets.select(F.col("doc_id").alias("v"), F.col("elems").alias("b_elems"))
    inter = F.size(F.array_intersect("a_elems", "b_elems"))
    return (
        edges.join(a, "u")
        .join(b, "v")
        .select(
            F.col("u").alias("doc_id"),
            F.col("v").alias("rep_id"),
            F.size("a_elems").cast("bigint").alias("n_doc"),
            inter.cast("bigint").alias("n_inter"),
            (100 * inter >= CONTAIN_PCT * F.size("a_elems")).alias("contained"),
        )
    )


def _oracle_est_vs_true() -> str:
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(K)
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
        SELECT band, bkey, min(doc_id) AS rep
        FROM bands GROUP BY band, bkey
    ),
    edges AS (
        SELECT DISTINCT b.doc_id AS u, r.rep AS v
        FROM bands b
        JOIN bucket_reps r ON b.band = r.band AND b.bkey = r.bkey
        WHERE b.doc_id <> r.rep
    )
    SELECT e.u AS doc_id, e.v AS rep_id,
           CAST({match_sum} AS INTEGER) AS n_sig_match,
           CAST(len(list_intersect(a.elems, b.elems)) AS BIGINT) AS j_inter,
           CAST(len(a.elems) + len(b.elems)
                - len(list_intersect(a.elems, b.elems)) AS BIGINT) AS j_union
    FROM edges e
    JOIN sigs a ON a.doc_id = e.u
    JOIN sigs b ON b.doc_id = e.v
    """


@register("dedup_minhash_est_vs_true", oracle=_oracle_est_vs_true())
def dedup_minhash_est_vs_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate edge, the MinHash
    ESTIMATE (matching signatures out of K={K}: E[match/K] = Jaccard)
    next to the TRUE Jaccard carriers (intersection, union) — the
    measurement that justifies band/row tuning with data instead of
    the textbook formula.  All-integer output; candidates are the
    linear star-edge set, so the audit costs two bounded equi-joins,
    never all-pairs.  The signature table feeds three consumers (bands
    + both join sides) and is persisted for the same reason as
    `dedup_containment_rep` — recomputing the sig lambdas per consumer
    is the real cost at scale, not the joins."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    ).repartition("doc_id")  # CollapseProject barrier (see minhash.py)
    sigs = persist_scoped(
        "containment.sigs",
        sets.selectExpr("doc_id", "elems", *[_spark_sig(i) for i in range(K)]),
    )
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bucket_reps = bands.groupBy("band", "bkey").agg(F.min("doc_id").alias("rep"))
    edges = (
        bands.join(bucket_reps, ["band", "bkey"])
        .where(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("u"), F.col("rep").alias("v"))
        .distinct()
    )
    a = sigs.select(
        F.col("doc_id").alias("u"),
        F.col("elems").alias("a_elems"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(K)],
    )
    b = sigs.select(
        F.col("doc_id").alias("v"),
        F.col("elems").alias("b_elems"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(K)],
    )
    match_sum = sum(
        F.when(F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}"), 1).otherwise(0)
        for i in range(K)
    )
    inter = F.size(F.array_intersect("a_elems", "b_elems"))
    return (
        edges.join(a, "u")
        .join(b, "v")
        .select(
            F.col("u").alias("doc_id"),
            F.col("v").alias("rep_id"),
            match_sum.cast("int").alias("n_sig_match"),
            inter.cast("bigint").alias("j_inter"),
            (F.size("a_elems") + F.size("b_elems") - inter)
            .cast("bigint")
            .alias("j_union"),
        )
    )
