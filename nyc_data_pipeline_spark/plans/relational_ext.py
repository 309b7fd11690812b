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


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH li_p AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11' AND p_size < 15
    ),
    thr AS (
        SELECT l_partkey AS t_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,12))
                   AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM li_p GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
    FROM li_p JOIN thr ON l_partkey = t_partkey
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * cnt < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders below 20% of the part's average
    quantity.

    The correlated scalar AVG decorrelates to a per-part aggregate
    joined back to the same filtered fact slice; the 0.2×avg
    comparison is algebraically cleared of division
    (qty < 0.2·sum/cnt ⟺ 5·qty·cnt < sum) so the predicate is exact
    decimal arithmetic — no float rounding in the filter.  Both the
    aggregate and the re-join key on l_partkey, so AQE plans the
    second join off the same shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 15)
    )
    li_p = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li_p.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(dec("l_quantity")).cast("decimal(38,12)").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li_p.join(thr, F.col("l_partkey") == F.col("t_partkey"))
        .filter(dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_sql_dsum_rev()} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs predicate spanning both
    join sides.

    Catalyst extracts the common l_quantity bounds (1..30) and the
    p_brand IN set as derivable conjuncts pushed to each scan, then
    applies the full disjunction post-join — the part side stays a
    broadcast, the fact side is one filtered scan, zero shuffles
    before the single-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q2_best_supplier",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size = 15 AND p_type = 'LARGE'
    ),
    ranked AS (
        SELECT l_partkey AS p_key, s_suppkey, s_name, s_acctbal,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rk
        FROM pairs JOIN supplier ON s_suppkey = l_suppkey
    )
    SELECT r.p_key AS p_partkey, p.p_name, r.s_suppkey, r.s_name,
           r.s_acctbal, n.n_name
    FROM ranked r
    JOIN part p ON p.p_partkey = r.p_key
    JOIN supplier s ON s.s_suppkey = r.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE r.rk = 1
    ORDER BY r.s_acctbal DESC, n.n_name, r.s_name, r.p_key
    """,
)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-less): for each part of a given
    size/type, the supplier with the highest account balance among
    those who actually supplied it (distinct lineitem pairs play
    partsupp).

    The correlated "= (SELECT MIN(ps_supplycost)…)" of the original
    becomes a rank-1 window over the per-part supplier set — the
    standard decorrelation; supplier/nation/part dims broadcast, the
    only wide shuffle is the distinct on (partkey, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pairs = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    ranked = (
        pairs.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        ranked.join(
            F.broadcast(p.select("p_partkey", "p_name")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               -- 24+14=38 digits: forces DuckDB's multiply onto int128
               -- (18,6)x(18,6) runs in int64 there and overflows; the
               -- product values are identical either way
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))
                        * CAST(l_quantity AS DECIMAL(14,6)))
                    AS DECIMAL(38,12)) AS value_dec
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(value_dec) AS DECIMAL(38,12)) AS total FROM v)
    SELECT l_partkey,
           CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS value
    FROM v, tot
    WHERE CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) * 1000
          > CAST(CAST(total AS VARCHAR) AS DOUBLE)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supply value from one nation
    exceeds a fraction (0.1%) of that nation's total supply value.

    The "HAVING > (SELECT SUM(...)·fraction)" decorrelates to a 1-row
    broadcast joined against the per-part aggregate; the fraction
    comparison multiplies rather than divides (value·1000 > total) on
    the exact decimal sums cast to double — see the inline note."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    v = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_quantity"))
            .cast("decimal(38,12)")
            .alias("value_dec")
        )
    )
    tot = v.agg(F.sum("value_dec").cast("decimal(38,12)").alias("total"))
    # The threshold compares the two exact decimal sums as DOUBLES
    # (identical IEEE multiply/compare in both engines): value·1000
    # overflows DuckDB's decimal multiplication at DECIMAL(38,12).
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_dec").cast("double") * 1000
            > F.col("total").cast("double")
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DECIMAL(38,12)) AS supp_qty
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
        GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
        SELECT l_partkey AS t_partkey,
               CAST(SUM(supp_qty) AS DECIMAL(38,12)) AS part_qty
        FROM ps GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM ps
    JOIN pt ON l_partkey = t_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE supp_qty * 8 > part_qty
    ORDER BY s_suppkey
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty-less): suppliers who shipped more
    than an eighth of some red part's total shipped quantity (the
    synthetic corpus spreads parts across ~26 suppliers, so "half"
    never happens; the shape is the point) — the nested
    IN chain (suppliers ⊃ parts ⊃ quantity threshold) reduced to
    aggregate + join + semi-distinct.

    The part name filter becomes a broadcast semi-join on the
    lineitem scan; both aggregates share the (partkey, suppkey)
    shuffle (the per-part rollup reuses the first aggregate's
    output); the >eighth comparison is division-free decimal math."""
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    ps = (
        li.join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("decimal(38,12)").alias("supp_qty"))
    )
    pt = ps.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").cast("decimal(38,12)").alias("part_qty")
    )
    return (
        ps.join(pt, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("supp_qty") * 8 > F.col("part_qty"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_linestatus = 'O'
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt-date-less: l_linestatus='O' plays
    "late"): suppliers holding up multi-supplier orders — their line
    is open and every other supplier's line in the order is done.

    EXISTS → left-semi and NOT EXISTS → left-anti, both on
    l_orderkey with the supplier-inequality in the join condition —
    Spark runs them as two hash joins over the same orderkey
    clustering; no correlated per-row subquery execution."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_linestatus") == "O").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.selectExpr("l_orderkey AS o2", "l_suppkey AS s2")
    l3 = li.filter(F.col("l_linestatus") == "O").selectExpr(
        "l_orderkey AS o3", "l_suppkey AS s3"
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )
