"""Triangle counting + global clustering coefficient, degree-ordered.

The graph-analytics staple (Suri-Vassilvitskii WWW'11 "Counting
triangles and the curse of the last reducer"): naive wedge-join on an
unoriented edge list puts every high-degree node's d² wedges in one
reducer.  The fix every distributed system uses is DEGREE ORIENTATION:
direct each undirected edge from its lower-(degree, id) endpoint to the
higher one.  Every triangle then has exactly one source node with two
out-edges, each node's out-degree is O(√m), and the wedge join's worst
reducer shrinks from d_max² to m^1.5 total work — the difference
between "last reducer runs for a day" and linear-ish scaling.

Graph here: the co-purchase graph over parts — an undirected edge
links two parts that appear in the same order (distinct parts per
order first; order size is bounded ≤ 7 lines, so pair emission is
O(21·|orders|), linear).  Three hash shuffles end-to-end: distinct
edges, degree join + wedge self-join, closing-edge semi-join.  All
integer; the clustering coefficient is reported in ppm via
cross-multiplied integer division.

Reference parity: no graph surface in the reference (single-table ETL,
spark_consumer.py:61-78); extends the engine's graph family
(dedup/graph.py CC, operators/pagerank.py, operators/labelprop.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# One shipping year of co-purchases: the demo stays wedge-tractable at
# any fixture SF (the full-history graph at sf0.1 already carries 148M
# wedges — fine for the operator, wasteful for a correctness fixture);
# a production run shards by time slice exactly like this anyway.
TRI_LO, TRI_HI = "1995-01-01", "1995-12-31"

_EDGE_SQL = f"""
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE CAST(a.l_shipdate AS DATE) BETWEEN '{TRI_LO}' AND '{TRI_HI}'
          AND CAST(b.l_shipdate AS DATE) BETWEEN '{TRI_LO}' AND '{TRI_HI}'
"""


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v FROM edges
        ) GROUP BY node
    ),
    oriented AS (
        -- orient low-(degree, id) -> high-(degree, id)
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
                   AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
                   AS dst
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
        -- wedge endpoints keep id order (w1.dst < w2.dst) and stored
        -- edges are id-ordered (u < v), so the closing edge can only be
        -- (w1.dst, w2.dst): a pure equi-join, never a nested loop.
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM oriented w1
        JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst
        JOIN edges c ON c.u = w1.dst AND c.v = w2.dst
    ),
    gstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    estats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT g.n_nodes, e.n_edges, g.n_wedges, t.n_triangles,
           CAST(CASE WHEN g.n_wedges = 0 THEN 0
                     ELSE 3 * t.n_triangles * 1000000 // g.n_wedges END
                AS BIGINT) AS clustering_ppm
    FROM gstats g, estats e, tri t
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph summary of the part co-purchase graph: nodes,
    edges, wedges (from the degree table, no enumeration), triangles
    (degree-oriented wedge join), and the global clustering coefficient
    3·T/W in ppm."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").cast("date").between(TRI_LO, TRI_HI)
        )
        .select("l_orderkey", "l_partkey")
    )
    return triangle_count(
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """`edges` = undirected distinct (u < v) pairs.  Returns one row:
    n_nodes, n_edges, n_wedges, n_triangles, clustering_ppm."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    with_deg = (
        edges.join(deg.withColumnRenamed("node", "u")
                   .withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v")
              .withColumnRenamed("d", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.dst") < F.col("w2.dst")),
    ).select(F.col("w1.dst").alias("x"), F.col("w2.dst").alias("y"))
    # wedge endpoints keep id order (x < y) and stored edges are
    # id-ordered (u < v): the closing edge can only be (x, y) — a pure
    # (two-column) equi-join, never a nested loop.
    tri = (
        wedges.join(
            edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
            ["x", "y"],
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    gstats = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    estats = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        gstats.crossJoin(F.broadcast(estats))
        .crossJoin(F.broadcast(tri))
        .selectExpr(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            "CAST(CASE WHEN n_wedges = 0 THEN 0"
            " ELSE 3 * n_triangles * 1000000 div n_wedges END"
            " AS BIGINT) AS clustering_ppm",
        )
    )
