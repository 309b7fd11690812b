"""Connected components over the dedup candidate graph — full
transitive closure, run to fixpoint.

The keep-one form (`dedup_minhash_keep_one`) is single-hop
min-propagation and the bounded closure (`dedup_minhash_closure`)
stops after k rounds: chains of near-duplicates longer than k hops
keep distinct representatives.  The production-complete clustering is
full connected components — every document in a near-duplicate cluster
maps to the cluster-wide min doc_id no matter how long the chain —
computed here with the alternating Large-Star / Small-Star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014), the standard shuffle-bounded CC for web-scale graphs.

Scale shape:

- The input edge list is the doc → bucket-representative star graph
  (one edge per (doc, band) bucket membership, O(n·BANDS) edges —
  linear in corpus size).  It has exactly the same connectivity as the
  quadratic co-bucket pair graph, which is never materialized.
- Each round is two window-min passes over the edge list, keyed on
  node id (one shuffle each — the groupBy+self-join formulation pays
  two); edge count never exceeds the input edge count, so every round
  shuffles O(n·BANDS) rows.
- Rounds: O(log n) to converge (alternating stars contract paths
  exponentially); the driver-side loop is control flow only — one
  4-value checksum aggregate per round decides convergence.
- `localCheckpoint` each round truncates lineage so the plan stays
  constant-size across iterations (on a cluster, use a reliable
  checkpoint dir or persist+count instead if executor loss during the
  loop must be survivable).

The fixpoint (component-min labeling) is unique regardless of how many
rounds it takes, so an until-convergence loop is oracle-safe: DuckDB
reproduces it with a recursive CTE over the identical edge list.

Reference parity note: the reference has no graph operators at all
(its dedup story is Postgres ON CONFLICT upserts,
database_handler.py:197-268); this family exists for the north-star
LLM-curation engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..functions.text import duck_token_hashes, duck_tokens, spark_token_hashes, spark_tokens
from .minhash import BANDS, K, _band_key, _duck_sig, _spark_sig


def _large_star(e: DataFrame) -> DataFrame:
    """For every node u (over symmetric neighbors): connect each larger
    neighbor v > u to m = min(N(u) ∪ {u}).

    min(N(u)) is a window-min over the u-partition rather than a
    groupBy+self-join: one shuffle of the edge list instead of two,
    identical result (r4 constant-factor trim)."""
    sym = e.union(e.selectExpr("v AS u", "u AS v"))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node u (over smaller neighbors only): connect each
    neighbor (and u itself) to m = min(N(u) ∪ {u}).  Output edges are
    canonical (u > v).  Same window-min-for-groupBy+join trade as
    ``_large_star``."""
    d = e.selectExpr("greatest(u, v) AS u", "least(u, v) AS v").where("u <> v")
    w = Window.partitionBy("u")
    # all v < u in the canonical orientation, so min(v) = min(N(u) ∪ {u})
    j = d.withColumn("m", F.min("v").over(w))
    return (
        j.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(j.select("u", F.col("m").alias("v")))
        .where("u <> v")
        .distinct()
    )


def _checksum(e: DataFrame) -> tuple:
    """Cheap multiset fingerprint of the edge list (one aggregate): a
    changed edge set changes (count, sum_u, sum_v, xor-ish hash sum)
    except with negligible collision probability."""
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),  # overflow-free fingerprint
    ).collect()[0]
    return (row["n"], row["su"], row["sv"], row["h"])


def connected_components(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """(u, v) undirected edge list → (node, rep_id = component min).

    Only nodes that appear in an edge are emitted; callers supply
    singletons via a left join + coalesce.
    """
    e = edges.selectExpr("CAST(u AS BIGINT) AS u", "CAST(v AS BIGINT) AS v").where(
        "u <> v"
    )
    e = e.localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # Probe convergence every round: the checksum is a 1-row
        # aggregate over the just-checkpointed edges — far cheaper
        # than the star round a sparser probe cadence would waste
        # (measured at sf0.1: per-round probing beats every-2nd).
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")
    # Fixpoint edge set is a star per component: (member, component_min).
    members = e.groupBy("u").agg(F.min("v").alias("rep_id")).selectExpr(
        "u AS node", "rep_id"
    )
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "rep_id", F.col("node")
    )
    return members.unionByName(roots).groupBy("node").agg(
        F.min("rep_id").alias("rep_id")
    )


def _star_edges_sql() -> tuple[str, str]:
    """(spark bands SQL is built in code; this returns the shared DuckDB
    CTE prefix producing the identical star edge list)."""
    sig_exprs = ",\n               ".join(_duck_sig(i) for i in range(K))
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b)} AS bkey FROM sigs"
        for b in range(BANDS)
    )
    return sig_exprs, band_selects


def edges_cte_prefix() -> str:
    """Shared DuckDB CTE chain `th … sym` producing the symmetrized
    star edge list — reused by the CC oracle here and the PageRank
    oracle (operators/pagerank.py), which run different algorithms over
    the identical graph."""
    sig_exprs, band_selects = _star_edges_sql()
    return f"""th AS (
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
    ),
    sym AS (
        SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
    )"""


def _oracle_cc() -> str:
    return f"""
    WITH RECURSIVE {edges_cte_prefix()},
    reach(n, r) AS (
        SELECT doc_id, doc_id FROM th
        UNION
        SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n
    )
    SELECT n AS doc_id, min(r) AS rep_id FROM reach GROUP BY n
    """


def star_edges(documents: DataFrame) -> DataFrame:
    """LSH bucket star edges (directed doc → bucket representative,
    distinct): the O(n·BANDS) linear candidate graph shared by the CC
    fixpoint and PageRank (operators/pagerank.py)."""
    sets = documents.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    ).repartition("doc_id")  # CollapseProject barrier (see minhash.py)
    sigs = sets.selectExpr("doc_id", *[_spark_sig(i) for i in range(K)])
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(b)} AS bkey)" for b in range(BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bucket_reps = bands.groupBy("band", "bkey").agg(F.min("doc_id").alias("rep"))
    return (
        bands.join(bucket_reps, ["band", "bkey"])
        .where(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("u"), F.col("rep").alias("v"))
        .distinct()
    )


@register("dedup_cc_fixpoint", oracle=_oracle_cc())
def dedup_cc_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-transitive-closure MinHash dedup: LSH bucket star edges
    (linear in corpus size) → alternating-star connected components →
    (doc_id, rep_id = cluster-wide min).  Upgrades the bounded 3-round
    closure to the production fixpoint."""
    d = load_table(spark, sf_dir, "documents")
    edges = star_edges(d)
    cc = connected_components(edges)
    return (
        d.select("doc_id")
        .join(cc, d["doc_id"] == cc["node"], "left")
        .select("doc_id", F.coalesce("rep_id", "doc_id").alias("rep_id"))
    )
