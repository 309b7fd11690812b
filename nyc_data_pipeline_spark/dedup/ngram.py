"""N-gram / token-set Jaccard near-duplicate detection (north-star M4).

Scalable shape — the inverted index join, never the all-pairs cross
join:

    tokens → explode (doc, token) → self-join on token → count common
    → |A ∩ B| ; |A ∪ B| = |A| + |B| − |A ∩ B| ; filter jaccard ≥ θ

Cost is Σ_token df(token)² (bounded by dropping ultra-common tokens at
real scale) instead of n² documents.  MinHash/LSH (dedup/minhash.py) is
the next cut when even the inverted index is too hot; this operator is
the exact referee for it.
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

_JACCARD_UNIGRAM = 0.85
_JACCARD_BIGRAM = 0.25


def _pairs_sql(sets_cte: str, threshold: float) -> str:
    """DuckDB: inverted-index pair generation over (doc_id, elems)."""
    return f"""
    WITH sets AS ({sets_cte}),
    sizes AS (SELECT doc_id, len(elems) AS sz FROM sets),
    posting AS (SELECT doc_id, unnest(elems) AS e FROM sets),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM posting a JOIN posting b ON a.e = b.e AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {threshold}
    """


def jaccard_pairs(sets: DataFrame, threshold: float) -> DataFrame:
    """Reusable operator: sets = (doc_id, elems array).  Returns doc
    pairs with Jaccard >= threshold via the inverted-index join."""
    sizes = sets.select("doc_id", F.size("elems").alias("sz"))
    posting = sets.select("doc_id", F.explode("elems").alias("e"))
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.e") == F.col("b.e")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    # sizes is one row per document — corpus-sized, so no broadcast
    # (an executor-resident copy of a 100 TB corpus's doc list would
    # OOM).  The pairs side dominates cost anyway; these joins shuffle
    # at most one (doc_id, sz) row per doc.
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@register(
    "dedup_jaccard_unigram",
    oracle=_pairs_sql(
        f"SELECT doc_id, list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems "
        f"FROM documents",
        _JACCARD_UNIGRAM,
    ),
)
def dedup_jaccard_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dups (θ=0.85) over portable token hashes."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return jaccard_pairs(sets, _JACCARD_UNIGRAM)


_DF_CAP_FRACTION = 0.10  # tokens present in >10% of docs are stop-tokens


def jaccard_pairs_df_capped(
    sets: DataFrame, threshold: float, cap: int | None = None
) -> DataFrame:
    """Inverted-index Jaccard over the capped vocabulary: tokens with
    document frequency > cap are dropped from postings AND set sizes
    (Jaccard is redefined over the kept vocabulary — the crawl-scale
    practice).  This bounds the join cost at Σ_kept df(token)² ≤
    #tokens·cap², eliminating the hot-token quadratic; docs left with
    no kept tokens exit the candidate space entirely.

    When ``cap`` is None it is derived IN-PLAN as ceil(#docs ·
    _DF_CAP_FRACTION) via a 1-row aggregate broadcast into the df
    filter — no driver-side ``count()`` action, so the corpus is
    scanned once, not twice (same pattern as text_boilerplate_score)."""
    posting = sets.select("doc_id", F.explode("elems").alias("e"))
    df_by_tok = posting.groupBy("e").agg(F.count("*").alias("df"))
    if cap is None:
        cap_row = sets.agg(
            F.ceil(F.count("*") * _DF_CAP_FRACTION).cast("bigint").alias("cap")
        )
        keep = (
            df_by_tok.crossJoin(F.broadcast(cap_row))
            .filter(F.col("df") <= F.col("cap"))
        )
    else:
        keep = df_by_tok.filter(F.col("df") <= cap)
    capped = posting.join(keep.select("e"), "e")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = capped.alias("a"), capped.alias("b")
    common = (
        a.join(b, (F.col("a.e") == F.col("b.e")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")  # corpus-sized: no broadcast
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _capped_sql(sets_cte: str, threshold: float) -> str:
    return f"""
    WITH sets AS ({sets_cte}),
    cap AS (SELECT CAST(ceil(COUNT(*) * {_DF_CAP_FRACTION}) AS BIGINT) AS c
            FROM sets),
    posting0 AS (SELECT doc_id, unnest(elems) AS e FROM sets),
    keep AS (
        SELECT e FROM posting0 GROUP BY e
        HAVING COUNT(*) <= (SELECT c FROM cap)
    ),
    posting AS (SELECT doc_id, e FROM posting0 WHERE e IN (SELECT e FROM keep)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM posting a JOIN posting b ON a.e = b.e AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {threshold}
    """


@register(
    "dedup_jaccard_df_capped",
    oracle=_capped_sql(
        f"SELECT doc_id, list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems "
        f"FROM documents",
        _JACCARD_UNIGRAM,
    ),
)
def dedup_jaccard_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Jaccard (θ=0.85) over the df-capped vocabulary (cap =
    ceil(10% of corpus), derived in-plan) — the bounded-join form of
    dedup_jaccard_unigram for hot-token corpora."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return jaccard_pairs_df_capped(sets, _JACCARD_UNIGRAM)


@register(
    "dedup_jaccard_bigram_shingles",
    oracle=_pairs_sql(
        f"SELECT doc_id, list_distinct({duck_bigrams('toks')}) AS elems "
        f"FROM (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents) "
        f"WHERE len(toks) >= 2",
        _JACCARD_BIGRAM,
    ),
)
def dedup_jaccard_bigram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram shingle Jaccard (θ=0.25): order-sensitive near-dup
    signal (catches copied passages that unigram sets overrate)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.selectExpr("doc_id", f"{spark_tokens('text')} AS toks").filter(
        F.size("toks") >= 2
    )
    sets = toks.selectExpr(
        "doc_id", f"array_distinct({spark_bigrams('toks')}) AS elems"
    )
    return jaccard_pairs(sets, _JACCARD_BIGRAM)


# --- Fuzzy string join (entity resolution: trigram blocking + edit-
# distance verify) -----------------------------------------------------

# Trigrams present in more of the domain than this fraction are blocked
# out of candidate generation.  0.25 here because the fixture's name
# domain is 64 strings built from a tiny vocabulary (informative
# word-trigrams still hit ~20% of names); a realistic million-string
# domain uses a far smaller fraction or an absolute df cap — the knob,
# not the recipe, is corpus-specific.
FUZZ_CAP_FRACTION = 0.25
FUZZ_SHARED_MIN = 2  # candidate pairs must share >= 2 rare trigrams
FUZZ_MAX_DIST = 1  # verified edit-distance budget

# Shared expression text so both engines derive the IDENTICAL dirty
# variant (delete the middle character) and trigram set.
_MID = "greatest(1, length({c}) {div} 2)"


def _sp_grams(col: str) -> str:
    return (
        f"explode(array_distinct(transform("
        f"sequence(1, greatest(1, length({col}) - 2)), "
        f"i -> substr({col}, i, 3))))"
    )


def _dk_grams(col: str) -> str:
    return (
        f"unnest(list_transform("
        f"generate_series(1, greatest(1, length({col}) - 2)), "
        f"i -> substr({col}, i, 3)))"
    )


@register(
    "join_fuzzy_trigram",
    oracle=f"""
    WITH names AS (
        SELECT lower(p_name) AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    ),
    dirty AS (
        SELECT DISTINCT
               concat(substr(name, 1, {_MID.format(c='name', div='//')} - 1),
                      substr(name, {_MID.format(c='name', div='//')} + 1))
                 AS dirty_name
        FROM names
    ),
    cg AS (
        SELECT DISTINCT name, {_dk_grams('name')} AS g FROM names
    ),
    dg AS (
        SELECT DISTINCT dirty_name, {_dk_grams('dirty_name')} AS g FROM dirty
    ),
    cap AS (
        SELECT CAST(ceil(COUNT(*) * {FUZZ_CAP_FRACTION}) AS BIGINT) AS c
        FROM names
    ),
    rare AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT name) AS df FROM cg GROUP BY g), cap
        WHERE df <= c
    ),
    cgr AS (SELECT cg.name, cg.g FROM cg JOIN rare USING (g)),
    dgr AS (SELECT dg.dirty_name, dg.g FROM dg JOIN rare USING (g)),
    cand AS (
        SELECT dirty_name, name, COUNT(*) AS n_shared
        FROM dgr JOIN cgr USING (g)
        GROUP BY 1, 2 HAVING COUNT(*) >= {FUZZ_SHARED_MIN}
    )
    SELECT c.dirty_name, c.name AS clean_name,
           CAST(levenshtein(c.dirty_name, c.name) AS INTEGER) AS distance,
           n.n_parts
    FROM cand c JOIN names n ON n.name = c.name
    WHERE levenshtein(c.dirty_name, c.name) <= {FUZZ_MAX_DIST}
    """,
)
def join_fuzzy_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (entity resolution): match dirty strings to
    the clean name domain by trigram blocking + exact Levenshtein
    verify — the classic q-gram recipe (pairs within edit distance d
    must share many q-grams; here >= {FUZZ_SHARED_MIN} RARE trigrams,
    with trigrams present in > {FUZZ_CAP_FRACTION:.0%} of the domain
    df-capped out, the dedup_jaccard_df_capped convention).  The
    fixture has no naturally dirty strings, so each part name's
    middle-character-deleted variant stands in for the misspelled feed
    (the recrawl-injection convention).

    Scale shape — the key move is joining on the NAME DOMAIN, not the
    table: dirty/clean feeds first collapse to distinct strings (the
    domain is orders of magnitude smaller than a 100 TB fact table),
    the trigram block is O(|domain|·L) rows with pair fan-out bounded
    by the df cap, the Levenshtein DP runs only on surviving
    candidates, and the match table broadcasts back onto the fact
    rows (here: n_parts carries the fact-side weight).  Both engines
    run the same classic-DP levenshtein, so distances compare as
    exact integers."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.selectExpr("lower(p_name) AS name")
        .groupBy("name")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )
    mid = _MID.format(c="name", div="div")
    dirty = names.selectExpr(
        f"concat(substr(name, 1, {mid} - 1), substr(name, {mid} + 1))"
        " AS dirty_name"
    ).distinct()
    cg = names.selectExpr("name", f"{_sp_grams('name')} AS g")
    dg = dirty.selectExpr("dirty_name", f"{_sp_grams('dirty_name')} AS g")
    cap = names.agg(
        F.ceil(F.count("*") * FUZZ_CAP_FRACTION).cast("bigint").alias("c")
    )
    rare = (
        cg.groupBy("g")
        .agg(F.countDistinct("name").alias("df"))
        .join(F.broadcast(cap))
        .where("df <= c")
        .select("g")
    )
    cand = (
        dg.join(rare, "g")
        .join(cg.join(rare, "g"), "g")
        .groupBy("dirty_name", "name")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= FUZZ_SHARED_MIN)
    )
    return (
        cand.where(F.levenshtein("dirty_name", "name") <= FUZZ_MAX_DIST)
        .join(names, "name")
        .selectExpr(
            "dirty_name",
            "name AS clean_name",
            "CAST(levenshtein(dirty_name, name) AS INT) AS distance",
            "n_parts",
        )
    )


# --- Prefix filtering: exact Jaccard with a PRUNED candidate space ----------
#
# The inverted-index join above pays Σ_token df(token)²; the df-capped
# variant bounds that by REDEFINING Jaccard over a smaller vocabulary.
# Prefix filtering (PPJoin's core idea) keeps the EXACT semantics and
# still prunes: order the vocabulary globally by (document frequency
# asc, token asc) — rarest first — sort each doc's tokens in that
# order, and index only its PREFIX of length
#
#     p = |d| - ceil(t*|d|) + 1
#
# If J(a,b) >= t, the pair shares more than |a|+|b| - 2*ceil overlap
# tokens, so the pigeonhole argument forces at least one SHARED PREFIX
# token — candidates = the equi-join on prefix tokens only (plus the
# standard length filter t*|b| <= |a| <= |b|/t), then one exact verify
# per candidate.  Prefixes concentrate the RARE end of the vocabulary,
# so Σ df_prefix(token)² collapses relative to the full index; unlike
# the df-cap, no pair is ever lost.  The oracle is deliberately the
# NAIVE full-index form: a hash match is a machine check that the
# pruning theorem held — any candidate the prefix filter wrongly
# skipped would break it.

def jaccard_pairs_prefix_filter(
    sets: DataFrame, threshold_pct: int
) -> DataFrame:
    """sets = (doc_id, elems array<bigint>); returns (doc_a, doc_b,
    jaccard) for exact Jaccard >= threshold_pct/100, candidates from
    the prefix-token join.  Integer prefix arithmetic: with t = c/100,
    ceil(t*sz) = (c*sz + 99) div 100."""
    c = int(threshold_pct)
    posting = sets.select("doc_id", F.explode("elems").alias("e"))
    df_by_tok = posting.groupBy("e").agg(F.count("*").alias("df"))
    prefixes = (
        posting.join(df_by_tok, "e")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "e"))).alias(
                "sorted_toks"
            ),
            F.count("*").alias("sz"),
        )
        .withColumn(
            "p",
            F.expr(f"CAST(sz - ((({c}) * sz + 99) div 100) + 1 AS INT)"),
        )
        .select(
            "doc_id",
            "sz",
            F.expr(
                "transform(slice(sorted_toks, 1, p), s -> s.e)"
            ).alias("prefix"),
        )
    )
    pp = prefixes.select(
        "doc_id", "sz", F.explode("prefix").alias("e")
    )
    a, b = pp.alias("a"), pp.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.e") == F.col("b.e"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: t*|b| <= |a| (a's size may be smaller or
            # larger; enforce both directions with integer arithmetic)
            & (100 * F.col("a.sz") >= c * F.col("b.sz"))
            & (100 * F.col("b.sz") >= c * F.col("a.sz")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("elems").alias("ea")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("elems").alias("eb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("ea", "eb")).cast("double")
                / (
                    F.size("ea")
                    + F.size("eb")
                    - F.size(F.array_intersect("ea", "eb"))
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= c / 100.0)
        .select("doc_a", "doc_b", "jaccard")
    )


@register(
    "dedup_jaccard_prefix_filter",
    oracle=_pairs_sql(
        f"SELECT doc_id, list_distinct({duck_token_hashes(duck_tokens('text'))}) AS elems "
        f"FROM documents",
        _JACCARD_UNIGRAM,
    ),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Jaccard (θ=0.85) via PREFIX FILTERING — identical output
    to `dedup_jaccard_unigram` from a candidate space built on prefix
    tokens only (rarest (1-θ)|d|+1 per doc) plus the length filter.
    The oracle is the NAIVE full-inverted-index referee, so the hash
    match certifies zero false negatives from the pruning theorem.
    Measured at sf0.01: 2,264,990 full-index join rows collapse to
    54,895 verified candidates (41×) with identical output."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    return jaccard_pairs_prefix_filter(sets, int(_JACCARD_UNIGRAM * 100))
