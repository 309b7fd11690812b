"""Extended relational plans: the rest of the TPC-H query shapes,
adapted to the fixture schema.

The fixture star schema is a reduced TPC-H (no partsupp table; no
commit/receipt dates, comments, phones, containers), so each query
keeps its canonical PLAN SHAPE — the thing that matters at 100 TB —
with predicates adapted to the columns that exist:

- q7  two-nation volume join (nation dims broadcast twice)
- q8  market-share: conditional share of a grouped total
- q9  profit by nation×year (partsupp-less: revenue, 5-way join)
- q13 customer order-count distribution (outer join + double agg)
- q15 top supplier vs a scalar max (self-agg equality, decorrelated)
- q16 supplier-count per part attributes (anti-join + count distinct)
- q17 small-quantity revenue vs per-part average (decorrelated scalar)
- q19 disjunctive pushdown (OR-of-ANDs predicate, broadcast part)
- q20 nested-IN reduction to semi-join chains
- q21 multi-supplier orders where exactly one supplier is open
  (EXISTS + NOT-EXISTS → semi + anti)
- q2  per-part best supplier (correlated min → window on join)
- q11 group share vs global scalar (HAVING against a 1-row broadcast)

All money aggregates go through the exprs.py decimal-exact helpers so
Spark and DuckDB agree bitwise; dimension sides broadcast; fact scans
carry pushed filters (verified in tests/test_plans.py for the family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import davg, dec, dsum, sql_davg, sql_dsum, ts_us
from ..registry import register

_SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,6)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,6)))"
)


def _revenue() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def _sql_dsum_rev(extra: str = "") -> str:
    return f"CAST(CAST(SUM({_SQL_REVENUE}{extra}) AS VARCHAR) AS DOUBLE)"


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_sql_dsum_rev()} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                             AND TIMESTAMP '1996-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year.

    Plan shape: both nation dims and supplier/customer broadcast; the
    only shuffles are lineitem⋈orders on orderkey and the final tiny
    group-by.  The disjunctive nation pair filter is applied after the
    joins (it spans both sides) but the date filter pushes to the
    lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") <= "1996-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.selectExpr("n_nationkey AS s_nk", "n_name AS supp_nation")
    n2 = n.selectExpr("n_nationkey AS c_nk", "n_name AS cust_nation")
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _revenue().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_SQL_REVENUE} AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
          AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(CAST(
               SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                        ELSE CAST(0 AS DECIMAL(38,12)) END)
             AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST(volume AS DECIMAL(38,12))) AS VARCHAR)
               AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional market volume by year.

    The share is a conditional decimal sum over a grouped total —
    numerator and denominator accumulate in the same aggregate (one
    pass), divided exactly as decimals before the final double cast.
    Every dimension broadcasts; lineitem⋈orders is the one big
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.selectExpr("n_nationkey AS c_nk", "n_regionkey AS c_rk")
    n2 = n.selectExpr("n_nationkey AS s_nk", "n_name AS supp_nation")
    vol = _revenue()
    d38 = "decimal(38,12)"
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3",
                        F.col("volume").cast(d38),
                    ).otherwise(F.lit(0).cast(d38))
                ).cast("double")
                # double/double, not decimal/decimal: Spark caps the
                # decimal-division result scale at 6, DuckDB does not —
                # the exact decimal SUMS are cast first, then divided
                # as IEEE doubles (identical op both engines).
                / F.sum(F.col("volume").cast(d38)).cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, {_sql_dsum_rev()} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice, l_discount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (partsupp-less fixture: profit = discounted
    revenue) — nation×year rollup behind a LIKE-filtered part dim.

    The LIKE '%red%' cannot push as a parquet filter (substring), but
    the part dim is small and broadcasts, so the fact side still never
    shuffles for it; lineitem⋈orders is the one exchange before the
    final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("rev"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("rev").cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (outer
    join keeps zero-order customers; the join predicate's extra filter
    lives in the ON clause, not WHERE, or those customers vanish).

    Shape: one shuffle join on custkey, per-customer count, then a
    tiny re-aggregation on the count value itself."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_sql_dsum_rev()} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's maximum revenue.

    The correlated "= (SELECT MAX(...))" decorrelates to a 1-row
    broadcast joined back against the per-supplier aggregate — no
    second scan of lineitem, no window over the whole table."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'MEDIUM POLISHED%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute,
    excluding a supplier denylist (NOT IN → broadcast anti-join; the
    denylist predicate is adapted to the fixture's s_acctbal).

    COUNT(DISTINCT) expands to the standard two-phase partial
    distinct; part is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM POLISHED%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )
