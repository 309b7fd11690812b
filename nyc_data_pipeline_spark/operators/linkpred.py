"""Link prediction over the co-purchase graph: common-neighbor /
resource-allocation scoring of NON-edges.

The missing-edge question ("which two parts are never co-purchased
but share many co-purchase partners?") is the recommender / graph-
curation staple.  Scores per candidate pair (x, y), all integer-exact:

- n_common      = |N(x) ∩ N(y)|            (common-neighbor count)
- ra_micro      = Σ_w 1e6 div d(w)          (Zhou-Lü-Zhang resource
                  allocation index over common neighbors w — hubs
                  contribute less, the principled down-weighting)
- jaccard_ppm   = 1e6·common div (d(x)+d(y)-common)

Scale shape — and how it differs from triangle counting: a triangle
has one degree-oriented source, so triangles enumerate only oriented
wedges (m^1.5 bound).  Common-neighbor counting needs EVERY wedge
x–w–y exactly once, so the wedge volume is Σ d(w)² and the only
defense is capping the CENTER degree: wedges through hubs are both
the quadratic blowup AND the weakest link-evidence (RA already
down-weights them toward zero), so centers with d(w) > {HUB_CAP} are
excluded outright — the documented trade every production link
predictor makes (the oracle replicates the cap, so it is semantics,
not approximation).  After the cap: one self-join on the center key,
one (x, y) aggregation, one anti-join against the stored edges, one
broadcast-degree join — every stage linear in the capped wedge set.
Top-{TOP_N} selection is TakeOrderedAndProject, never a global sort.

Reference parity: no graph surface in the reference; extends the
graph family (triangles.py, kcore.py, pagerank.py, labelprop.py) with
the edge-PREDICTION member.  Fixture: the 1995 co-purchase year slice
shared with graph_triangle_count (operators/triangles.py TRI_LO/HI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triangles import _EDGE_SQL, TRI_HI, TRI_LO

HUB_CAP = 10   # max center degree for wedge emission (~p99 of the slice)
TOP_N = 20
_M = 1_000_000


@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v FROM edges
        ) GROUP BY node
    ),
    adj AS (
        SELECT u AS w, v AS x FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    wedge AS (
        SELECT a.x AS x, b.x AS y, d.d AS dw
        FROM adj a
        JOIN adj b ON a.w = b.w AND a.x < b.x
        JOIN deg d ON d.node = a.w
        WHERE d.d <= {HUB_CAP}
    ),
    cand AS (
        SELECT x, y,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM({_M} // dw) AS BIGINT) AS ra_micro
        FROM wedge
        GROUP BY x, y
    ),
    nonedge AS (
        SELECT c.* FROM cand c
        ANTI JOIN edges e ON e.u = c.x AND e.v = c.y
    ),
    scored AS (
        SELECT n.x, n.y, n.n_common, n.ra_micro,
               CAST(n.n_common * {_M} // (dx.d + dy.d - n.n_common)
                    AS BIGINT) AS jaccard_ppm
        FROM nonedge n
        JOIN deg dx ON dx.node = n.x
        JOIN deg dy ON dy.node = n.y
    )
    SELECT * FROM (
        SELECT x, y, n_common, ra_micro, jaccard_ppm,
               CAST(row_number() OVER (
                   ORDER BY ra_micro DESC, jaccard_ppm DESC, x, y
               ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_N}
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_N} predicted links (non-edges) of the 1995 co-purchase
    graph by resource-allocation index, with common-neighbor count and
    Jaccard ppm as companion evidence — all integer-exact, hub centers
    above degree {HUB_CAP} excluded by design (see module doc)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").cast("date").between(TRI_LO, TRI_HI))
        .select("l_orderkey", "l_partkey")
    )
    edges = (
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
    return common_neighbor_topn(edges)


def common_neighbor_topn(
    edges: DataFrame, hub_cap: int = HUB_CAP, top_n: int = TOP_N
) -> DataFrame:
    """`edges` = undirected distinct (u < v) pairs → top-n scored
    non-edges.  Reusable core (the triangles.triangle_count shape).
    The edge set feeds THREE consumers (degrees, adjacency, the
    non-edge anti-join), and its producer is typically an expensive
    distinct self-join — localCheckpoint materializes it once instead
    of re-deriving it per consumer (the dedup_cc_fixpoint
    discipline)."""
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    adj = edges.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    centers = deg.filter(F.col("d") <= hub_cap).select(
        F.col("node").alias("cw"), F.col("d").alias("dw")
    )
    a, b = adj.alias("a"), adj.alias("b")
    wedge = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.x") < F.col("b.x")))
        .join(centers, F.col("a.w") == F.col("cw"))
        .select(
            F.col("a.x").alias("x"),
            F.col("b.x").alias("y"),
            "dw",
        )
    )
    cand = wedge.groupBy("x", "y").agg(
        F.count("*").cast("bigint").alias("n_common"),
        F.sum(F.expr(f"{_M} div dw")).cast("bigint").alias("ra_micro"),
    )
    nonedge = cand.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    scored = (
        nonedge.join(
            deg.select(F.col("node").alias("x"), F.col("d").alias("dx")), "x"
        )
        .join(
            deg.select(F.col("node").alias("y"), F.col("d").alias("dy")), "y"
        )
        .withColumn(
            "jaccard_ppm",
            F.expr(f"CAST(n_common * {_M} div (dx + dy - n_common) AS BIGINT)"),
        )
        .select("x", "y", "n_common", "ra_micro", "jaccard_ppm")
    )
    from pyspark.sql import Window

    order = [
        F.desc("ra_micro"), F.desc("jaccard_ppm"), F.asc("x"), F.asc("y")
    ]
    # top-n FIRST via orderBy+limit (TakeOrderedAndProject — per-
    # partition heaps, no global sort and no single-partition window
    # over the full candidate set), THEN rank the n survivors with a
    # window that only ever sees n rows (the order_limit_topk pattern).
    return (
        scored.orderBy(*order)
        .limit(top_n)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        )
    )
