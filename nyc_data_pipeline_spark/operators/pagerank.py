"""PageRank over the document-similarity graph — fixed-K power
iteration in exact integer arithmetic.

LLM-curation use: rank documents by how central they are in the
near-duplicate / similarity graph.  High-rank nodes are hubs of
templated or boilerplate content (a cluster's "most duplicated"
member); rank also serves as a tie-breaking quality signal when
choosing cluster representatives (keep the LOW-rank member = the most
distinctive copy).

Graph and algorithm, Spark-first:

- Nodes are documents; edges are the symmetrized MinHash-LSH star
  graph from dedup/graph.py::star_edges — O(n·BANDS) edges, linear in
  corpus size, the same graph the CC fixpoint clusters.  The quadratic
  co-bucket pair graph is never materialized.
- K = 3 power-iteration steps, unrolled into one declarative plan (no
  driver-side data movement; the loop builds the plan, Catalyst
  executes it once).  Each step is: join ranks onto the edge list by
  source (shuffle on node id), one map-side-combined groupBy on the
  destination, and a left join back onto the node set so isolated
  documents keep receiving the teleport mass.  Per-step cost is two
  node-keyed shuffles over O(E) rows — the standard Pregel-free
  formulation; at 100 TB each step is a linear shuffle, and K is a
  constant.
- EXACT arithmetic: floats would diverge across engines (summation
  order) and across Spark partitionings.  Ranks are integers scaled by
  SCALE = 1e12, carried as decimal(38,0) end-to-end (the trends.py
  carrier pattern) to match the oracle's HUGEINT: each contribution is
  the exact floor of rank/degree and the damping update is the exact
  floor of (15·SCALE + 85·Σcontrib)/100 — the d = 0.85 teleport in
  integer form.  Magnitudes: total mass is conserved at ~n·SCALE, so
  the 85× damping blow-up peaks near 85·n·SCALE ≈ 10^26 for a 10^12-
  document corpus — comfortably inside decimal(38,0); no node-count
  ceiling remains.  The rank is emitted as a decimal STRING (the
  num/den-style cross-engine contract): int64 could not carry a hub's
  rank beyond ~10^6 nodes once the damping multiplier is accounted
  for, and silently wrapping there was exactly the class of bug the
  exact-arithmetic design exists to exclude.
- Spark's decimal `/` rounds HALF_UP at scale 6 and its `div` operator
  narrows results to BIGINT, so exact floor-division is built as
  floor(a/b) with a one-step correction (see `_idiv`).

The DuckDB oracle replays the identical three steps as unrolled CTEs
over the identical edge list, so the driver hash certifies every
intermediate division and the final ranks bit-for-bit.

Reference parity: no graph surface in the reference (SURVEY §2 [GAP]);
north-star curation operator, same family as dedup_cc_fixpoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..dedup.graph import edges_cte_prefix, star_edges
from ..registry import register

SCALE = 1_000_000_000_000  # rank carrier: 1.0 == 10^12
ITERS = 3

D38 = "decimal(38,0)"


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division of non-negative decimal(38,0) carriers.

    Spark's decimal `/` rounds the quotient HALF_UP at scale 6, so
    floor(a/b) lands one too high whenever the true remainder exceeds
    b·(1 − 5·10⁻⁷) — reachable once b (a node's degree, here) passes
    ~2·10⁶.  The `div` operator computes the exact integral quotient
    but narrows it to BIGINT, reintroducing the int64 ceiling.  floor
    plus a single compare-and-correct is exact at full decimal width:
    the candidate is floor(a/b) or floor(a/b)+1, never further off.
    """
    q = F.floor(a / b).cast(D38)
    return F.when(q * b > a, q - F.lit(1).cast(D38)).otherwise(q)


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = ITERS) -> DataFrame:
    """(nodes[node], edges[u, v] directed) → (node, rank, degree).
    Integer power iteration in decimal(38,0); `degree` is the
    out-degree used for the contribution split (0 for isolated nodes,
    which then hold the pure teleport rank)."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    # Degree rides along with the source side of every step's join.
    # The edge+degree table feeds every iteration (a diamond DAG —
    # without persist, Spark re-derives the MinHash signatures and the
    # band join K times; the containment.py lesson, SCALE.md §11).
    # persist_scoped bounds the cache to one live entry across
    # repeated invocations in a long session (bench/sweep loops).
    src = persist_scoped(
        "pagerank.src", sym.join(deg, "u").select("u", "v", "d")
    )
    zero = F.lit(0).cast(D38)
    r = nodes.select("node", F.lit(SCALE).cast(D38).alias("rank"))
    for _ in range(iters):
        contrib = (
            src.join(r, src["u"] == r["node"])
            .select("v", _idiv(F.col("rank"), F.col("d").cast(D38)).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").cast(D38).alias("s"))
        )
        damped = F.lit(15 * SCALE).cast(D38) + F.lit(85).cast(D38) * F.coalesce(
            F.col("s"), zero
        )
        r = nodes.join(contrib, nodes["node"] == contrib["v"], "left").select(
            "node", _idiv(damped, F.lit(100).cast(D38)).alias("rank")
        )
    return r.join(deg, r["node"] == deg["u"], "left").select(
        "node", "rank", F.coalesce("d", F.lit(0)).cast("bigint").alias("degree")
    )


def _oracle_pagerank() -> str:
    deg = """deg AS (
        SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    ),
    r0 AS (
        SELECT doc_id AS node, CAST({scale} AS HUGEINT) AS rank FROM documents
    )""".format(scale=SCALE)
    steps = []
    for i in range(1, ITERS + 1):
        steps.append(
            f"""c{i} AS (
        SELECT e.v AS node, SUM(r.rank // dg.d) AS s
        FROM sym e
        JOIN r{i - 1} r ON r.node = e.u
        JOIN deg dg ON dg.u = e.u
        GROUP BY e.v
    ),
    r{i} AS (
        SELECT d.doc_id AS node,
               (15 * CAST({SCALE} AS HUGEINT)
                + 85 * COALESCE(c.s, CAST(0 AS HUGEINT))) // 100 AS rank
        FROM documents d LEFT JOIN c{i} c ON c.node = d.doc_id
    )"""
        )
    joined_steps = ",\n    ".join(steps)
    return f"""
    WITH {edges_cte_prefix()},
    {deg},
    {joined_steps}
    SELECT r.node AS doc_id, CAST(r.rank AS VARCHAR) AS rank,
           CAST(COALESCE(dg.d, 0) AS BIGINT) AS degree
    FROM r{ITERS} r LEFT JOIN deg dg ON dg.u = r.node
    """


@register("graph_pagerank", oracle=_oracle_pagerank())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three integer power-iteration steps over the symmetrized LSH
    star graph; isolated docs settle at the teleport floor 0.15·SCALE
    (after the first step), hubs accumulate contribution mass.  Rank
    is an exact decimal string (overflow-free at any corpus size)."""
    d = load_table(spark, sf_dir, "documents")
    pr = pagerank(d.select(F.col("doc_id").alias("node")), star_edges(d))
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("rank").cast("string").alias("rank"),
        "degree",
    )
