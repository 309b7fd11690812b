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
