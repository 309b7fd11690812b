"""Composed entity resolution: block → verify → cluster → canonical
record (the master-data / dirty-customer-file pipeline).

`join_fuzzy_trigram` (dedup/ngram.py) matches a dirty feed AGAINST a
clean domain; real entity resolution has no clean side — a record file
where the same real-world entity appears under typos must be resolved
against ITSELF and collapsed to canonical survivors.  This composition
wires the engine's existing pieces into that pipeline:

1. BLOCK  — df-capped rare-trigram candidate pairs over the record
   set (the q-gram recipe of join_fuzzy_trigram, self-join form:
   pairs must share >= {FUZZ_SHARED_MIN} rare trigrams, stop-grams
   df-capped out so no block explodes);
2. VERIFY — exact Levenshtein <= {FUZZ_MAX_DIST} on the candidates
   only (both engines run the same classic DP);
3. CLUSTER — alternating-star connected components over the verified
   match edges (dedup/graph.connected_components — typo chains
   A~B~C collapse transitively, not just pairwise);
4. SURVIVE — one canonical record per cluster: min rec_id wins,
   attributes roll up (member count, dirty-record count, summed
   weight, the canonical spelling).

Fixture: the part-name domain with each name's middle-char-deleted
variant injected as a second record (the recrawl convention of
join_fuzzy_trigram) — clean records carry their part count as weight,
injected dirties carry zero, so the survivor's rolled-up weight
equals the clean side's and the member counts expose the typo
clusters.  Two distinct names CAN collide on the same dirty variant;
those chains are exactly what step 3 exists for.

Scale shape: every stage is the documented shape of its donor —
linear blocking bounded by the df cap, DP only on candidates,
CC over match edges (|edges| ~ |duplicates|, not |records|²), one
aggregation for survivorship.  The oracle replays all four stages,
CC via a recursive CTE over the identical edge list (the
dedup_cc_fixpoint referee pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup.graph import connected_components
from ..dedup.ngram import (
    FUZZ_CAP_FRACTION,
    FUZZ_MAX_DIST,
    FUZZ_SHARED_MIN,
    _MID,
    _dk_grams,
    _sp_grams,
)
from ..registry import register

_DIRTY_OFF = 1_000_000_000


@register(
    "pipeline_entity_resolution",
    oracle=f"""
    WITH RECURSIVE names AS (
        SELECT lower(p_name) AS name,
               CAST(MIN(p_partkey) AS BIGINT) AS nid,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    ),
    recs AS (
        SELECT nid AS rec_id, name, n_parts AS w FROM names
        UNION ALL
        SELECT nid + {_DIRTY_OFF},
               concat(substr(name, 1, {_MID.format(c='name', div='//')} - 1),
                      substr(name, {_MID.format(c='name', div='//')} + 1)),
               CAST(0 AS BIGINT)
        FROM names
    ),
    grams AS (
        SELECT DISTINCT rec_id, name, {_dk_grams('name')} AS g FROM recs
    ),
    cap AS (
        SELECT CAST(ceil(COUNT(*) * {FUZZ_CAP_FRACTION}) AS BIGINT) AS c
        FROM recs
    ),
    rare AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT rec_id) AS df FROM grams GROUP BY g
        ), cap
        WHERE df <= c
    ),
    gr AS (SELECT grams.rec_id, grams.name, grams.g
           FROM grams JOIN rare USING (g)),
    cand AS (
        SELECT a.rec_id AS u, a.name AS un, b.rec_id AS v, b.name AS vn
        FROM gr a JOIN gr b ON a.g = b.g AND a.rec_id < b.rec_id
        GROUP BY 1, 2, 3, 4
        HAVING COUNT(*) >= {FUZZ_SHARED_MIN}
    ),
    edges AS (
        SELECT u, v FROM cand
        WHERE levenshtein(un, vn) <= {FUZZ_MAX_DIST}
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach(n, r) AS (
        SELECT rec_id, rec_id FROM recs
        UNION
        SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n
    ),
    labels AS (SELECT n AS rec_id, MIN(r) AS cluster FROM reach GROUP BY n),
    resolved AS (
        SELECT l.cluster, r.rec_id, r.name, r.w
        FROM recs r JOIN labels l USING (rec_id)
    )
    SELECT CAST(cluster AS BIGINT) AS canonical_id,
           arg_min(name, rec_id) AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN rec_id >= {_DIRTY_OFF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dirty,
           CAST(SUM(w) AS BIGINT) AS total_weight
    FROM resolved
    GROUP BY cluster
    HAVING COUNT(*) >= 2
    """,
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-ER over the part-name record file (clean + injected typo
    records): rare-trigram blocking → Levenshtein verify → CC
    clustering → canonical survivors with rolled-up attributes
    (module doc).  Returns one row per multi-member entity."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.lower("p_name").alias("name"))
        .agg(
            F.min("p_partkey").cast("bigint").alias("nid"),
            F.count("*").cast("bigint").alias("n_parts"),
        )
    )
    mid = _MID.format(c="name", div="div")
    recs = names.selectExpr(
        "nid AS rec_id", "name", "n_parts AS w"
    ).unionByName(
        names.selectExpr(
            f"nid + {_DIRTY_OFF} AS rec_id",
            f"concat(substr(name, 1, {mid} - 1), substr(name, {mid} + 1))"
            " AS name",
            "CAST(0 AS BIGINT) AS w",
        )
    )
    grams = recs.selectExpr(
        "rec_id", "name", f"{_sp_grams('name')} AS g"
    ).distinct()
    cap = recs.agg(
        F.ceil(F.count("*") * FUZZ_CAP_FRACTION).cast("bigint").alias("c")
    )
    rare = (
        grams.groupBy("g")
        .agg(F.countDistinct("rec_id").alias("df"))
        .join(F.broadcast(cap))
        .where("df <= c")
        .select("g")
    )
    gr = grams.join(rare, "g")
    a, b = gr.alias("a"), gr.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .groupBy(
            F.col("a.rec_id").alias("u"),
            F.col("a.name").alias("un"),
            F.col("b.rec_id").alias("v"),
            F.col("b.name").alias("vn"),
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= FUZZ_SHARED_MIN)
    )
    edges = cand.where(
        F.levenshtein("un", "vn") <= FUZZ_MAX_DIST
    ).select("u", "v")
    cc = connected_components(edges)
    resolved = recs.join(
        cc, recs["rec_id"] == cc["node"], "left"
    ).select(
        F.coalesce("rep_id", "rec_id").alias("cluster"),
        "rec_id",
        "name",
        "w",
    )
    return (
        resolved.groupBy(F.col("cluster").cast("bigint").alias("canonical_id"))
        .agg(
            F.min_by("name", "rec_id").alias("canonical_name"),
            F.count("*").cast("bigint").alias("n_members"),
            F.sum((F.col("rec_id") >= _DIRTY_OFF).cast("bigint"))
            .cast("bigint")
            .alias("n_dirty"),
            F.sum("w").cast("bigint").alias("total_weight"),
        )
        .where(F.col("n_members") >= 2)
    )
