"""Recursive CTE surface (Spark 4's WITH RECURSIVE).

Spark 4 adds ANSI recursive CTEs — iterative plans expressed
declaratively, where each recursion step is a distributed join of the
previous step's frontier against the base relation (the engine's
driver-loop equivalents: dedup/graph.py's alternating-star CC, the
PageRank unroll).  This module registers the literal-SQL form (the
§3.3 `spark.sql` read path) so the catalog covers recursion as a
first-class query shape, with DuckDB's own WITH RECURSIVE as the
referee.

The hierarchy is synthesized deterministically from the customer key
(parent = custkey div 7): a ~3-level management chain over any
customer table, no fixture changes needed.

Scale shape: each recursion level is one (frontier ⋈ base) hash join
— frontier size is the level's node count, so total work is
O(edges · depth); Spark caps runaway recursion via its recursion
limits (depth here is log₇(n)).  For graphs where the FLAT recursion
result itself is quadratic (transitive closure over large components),
the alternating-star loop in dedup/graph.py remains the right
physical form — this is the declarative tool for hierarchy-shaped
(bounded-fanout, bounded-depth) recursion: org charts, BOM explosions,
category trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import register

_HIERARCHY_SQL = """
    WITH RECURSIVE h(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0
        FROM customer WHERE c_custkey < 7
        UNION ALL
        SELECT c.c_custkey, h.root, h.depth + 1
        FROM customer c JOIN h ON c.c_custkey / 7 = h.custkey
        WHERE c.c_custkey >= 7
    )
    SELECT CAST(custkey AS BIGINT) AS custkey,
           CAST(root AS BIGINT) AS root,
           CAST(depth AS INTEGER) AS depth
    FROM h
"""


@register(
    "sql_recursive_hierarchy",
    # DuckDB runs the identical ANSI text, except integer division
    # spells differently (Spark: `div`; DuckDB: `//`).
    oracle=_HIERARCHY_SQL.replace("c.c_custkey / 7", "c.c_custkey // 7"),
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org-chart walk over the synthesized parent relation
    (parent = custkey div 7, roots = custkey < 7): every customer
    labeled with its root ancestor and depth, via WITH RECURSIVE run
    as literal SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_HIERARCHY_SQL.replace("c.c_custkey / 7", "c.c_custkey div 7"))


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment,
           t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) t
"""


@register("sql_lateral_topn", oracle=_LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-3 orders per customer written
    the way an analyst writes it (per-row subquery with ORDER BY ...
    LIMIT), identical ANSI text on both engines.  Catalyst DECORRELATES
    it: the physical plan is the same shuffle-join + per-key ranked
    window as `window_topn_per_group`, not an O(|customer|) loop of
    point queries — run .explain and there is no subquery left.  This
    is the declarative-surface twin of the window form: same result
    set (modulo the inner-join-vs-outer difference: customers with no
    orders drop here), one optimizer doing the rewrite instead of the
    query author.  Customers without orders are absent from both
    engines' outputs (LATERAL without OUTER is an inner apply)."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
