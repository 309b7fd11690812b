"""Set operations (SURVEY §2.7 — all [GAP]).

union/unionByName, intersect, except, distinct.  All are built-in
Catalyst operators; intersect/except plan as aggregates + joins, so
they scale exactly like the join surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _custkeys_in_year(spark, sf_dir: str, year: int) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= f"{year}-01-01")
        & (F.col("o_orderdate") < f"{year + 1}-01-01")
    ).select("o_custkey")


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n
    FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union): Spark `unionByName` — concatenation of
    partitions, zero shuffle until the downstream groupBy."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.unionByName(b).groupBy("o_custkey").agg(F.count("*").alias("n"))


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both years."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers active in 1996 but not 1997
    (churn-shaped query)."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.subtract(b)


@register(
    "set_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT / dropDuplicates — hash aggregate on the key columns."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "set_union_schema_drift",
    oracle="""
    SELECT doc_id, lang, source, n_chars, NULL AS quality_tier FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, lang, NULL AS source, n_chars,
           CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS quality_tier
    FROM documents
    """,
)
def set_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the schema-evolution union
    a crawl pipeline needs when snapshot N+1 adds/drops columns — missing
    columns null-fill by NAME, never by position (the positional-union
    silent-corruption class of bug)."""
    d = load_table(spark, sf_dir, "documents")
    old_snapshot = d.select("doc_id", "lang", "source", "n_chars")
    new_snapshot = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "lang",
        "n_chars",
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("quality_tier"),
    )
    return old_snapshot.unionByName(new_snapshot, allowMissingColumns=True)


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id % 10 AS user_decile,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 via the real pivot API: groupBy().pivot(values=...).count().
    Passing explicit pivot values skips the extra distinct-values scan
    Spark otherwise runs — the required form at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_decile"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "reshape_unpivot",
    oracle="""
    WITH counts AS (
        SELECT user_id % 10 AS user_decile, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.user_decile, t.event_type
        FROM (SELECT DISTINCT user_id % 10 AS user_decile FROM events) d,
             (VALUES ('click'), ('error'), ('purchase'), ('signup'),
                     ('view')) AS t(event_type)
    )
    SELECT g.user_decile, g.event_type,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM grid g
    LEFT JOIN counts c
      ON g.user_decile = c.user_decile AND g.event_type = c.event_type
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→tall reshape via the native ``unpivot`` (melt) operator —
    the inverse of ``agg_pivot``, and the standard move when a
    metrics-per-column extract has to go back into a long
    (key, metric, value) model.  The pivot→unpivot roundtrip fills
    absent (decile, type) combinations with 0, which the oracle
    reproduces with an explicit grid.  Unpivot is a zero-shuffle
    projection (each input row fans out to 5 output rows in place)."""
    wide = agg_pivot(spark, sf_dir)
    return wide.unpivot(
        ["user_decile"],
        ["click", "error", "purchase", "signup", "view"],
        "event_type",
        "n",
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority FROM orders
    EXCEPT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderkey % 3 = 0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicities subtract instead of
    collapsing — the form that preserves row counts for reconciliation
    jobs (distinct EXCEPT would silently drop duplicates)."""
    o = load_table(spark, sf_dir, "orders")
    all_rows = o.select("o_orderstatus", "o_orderpriority")
    removed = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    return all_rows.exceptAll(removed)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderkey % 2 = 0
    INTERSECT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderkey % 3 = 0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): min of multiplicities."""
    o = load_table(spark, sf_dir, "orders")
    evens = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    thirds = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    return evens.intersectAll(thirds)
