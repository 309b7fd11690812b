"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
built-ins).

The 100 TB pattern these exist for: per-partition / per-day / per-type
sketch PARTIAL STATES are tiny (KBs), mergeable, and reaggregatable —
"distinct users per day" rolls up to "distinct users per month" by
UNIONING sketches, never rescanning the corpus.  Plain
COUNT(DISTINCT) cannot do that (distinct counts don't add).

`approx_hll_user_reach` emits per-event-type sketches AND the merged
total from `hll_union_agg` over those same sketches — the roll-up is
computed from partial states, demonstrating the mergeability contract.
Estimates are deterministic for fixed input (the sketch is
hash-based, no RNG) but implementation-specific, so the raw estimate
has no cross-engine twin.  Instead the query emits, per group, the
in-plan EXACT distinct count plus a boolean `within_5pct` comparing
the sketch estimate to it — DuckDB reproduces the exact count and
expects `true` (HLL lgk=12 → relative standard error ≈ 1.6%), turning
the error-bound property into a driver-hashed fact rather than a
pytest-only assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, persist_scoped
from ..registry import register

LGK = 12  # sketch precision: 2^12 buckets, ~1.6% relative standard error


@register(
    "approx_hll_user_reach",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events
    """,
)
def approx_hll_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach per event type via HLL sketches, plus the
    all-types total merged FROM THE SKETCHES (hll_union_agg over the
    per-type partial states — the merged ESTIMATE never rescans
    events; the exact ALL count exists only as the referee).  Output:
    (event_type, exact_distinct, within_5pct); event_type='ALL' is the
    merged row.  The oracle reproduces the exact counts and pins
    within_5pct=true, machine-checking the sketch's error bound."""
    ev = load_table(spark, sf_dir, "events")
    # Dedupe (event_type, user_id) pairs first — an HLL sketch is a
    # function of the SET of hashed values, so the sketch over deduped
    # pairs is bit-identical to the sketch over the raw stream, and
    # the per-type exact referee becomes a plain COUNT over the pair
    # set instead of a count-distinct EXPAND over the corpus.  At
    # 100 TB the pair set is users×types, orders of magnitude under
    # the event count: each referee leg shuffles map-side-combined
    # pairs, never corpus rows.  Deliberately NOT persisted — the two
    # consumers' distinct shuffles on the reduced pair set are cheaper
    # than materializing a cache entry (measured 0.45 s vs 0.73 s
    # steady-state at sf0.1).
    pairs = ev.select("event_type", "user_id").distinct()
    per_type = pairs.groupBy("event_type").agg(
        F.expr(f"hll_sketch_agg(user_id, {LGK})").alias("sketch"),
        F.count("*").alias("exact_distinct"),
    )
    typed = per_type.select(
        "event_type",
        "exact_distinct",
        F.expr("hll_sketch_estimate(sketch)").alias("est"),
    )
    merged = (
        per_type.agg(F.expr("hll_union_agg(sketch)").alias("sketch"))
        .crossJoin(
            F.broadcast(
                pairs.select("user_id")
                .distinct()
                .agg(F.count("*").alias("exact_distinct"))
            )
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_distinct",
            F.expr("hll_sketch_estimate(sketch)").alias("est"),
        )
    )
    return typed.unionByName(merged).select(
        "event_type",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimation + heavy-hitter audit.
# ---------------------------------------------------------------------------

# D pairwise-independent hash rows over W buckets.  The counter table is
# D*W integers regardless of input size (here 4*64 = 256 cells): that is
# the whole point at 100 TB — per-partition partial counters merge by
# plain addition (the groupBy's map-side combine IS the sketch merge),
# the result broadcasts anywhere, and point-lookup frequency estimates
# cost O(D).  Every arithmetic step is integer, so the DuckDB oracle
# rebuilds the identical counter table and the driver hash certifies
# the sketch itself, not just its error bar.
CMS_D = 4
CMS_W = 64
CMS_P = 2_147_483_647  # Mersenne prime 2^31-1
# (a, b) per row; a in [1, P), b in [0, P) — fixed, public constants.
CMS_AB = [(1_686_629_717, 908_611_469), (1_104_623_143, 474_882_444),
          (790_989_183, 1_530_105_057), (2_060_565_251, 104_582_165)]


def _cms_hash_sql(row: int, col: str, width: int = CMS_W) -> str:
    """((x % P) * a + b) % P % W — identical text for Spark SQL and
    DuckDB (both compute non-negative % for non-negative operands)."""
    a, b = CMS_AB[row]
    return f"((({col} % {CMS_P}) * {a} + {b}) % {CMS_P}) % {width}"


def _oracle_cms() -> str:
    hash_rows = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS hrow, {_cms_hash_sql(i, 'user_id')} AS bucket, cnt"
        " FROM user_counts"
        for i in range(CMS_D)
    )
    probe_rows = "\n        UNION ALL\n        ".join(
        f"SELECT user_id, cnt, {i} AS hrow,"
        f" {_cms_hash_sql(i, 'user_id')} AS bucket FROM top_users"
        for i in range(CMS_D)
    )
    return f"""
    WITH user_counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    cells AS (
        {hash_rows}
    ),
    counters AS (
        SELECT hrow, bucket, CAST(SUM(cnt) AS BIGINT) AS total
        FROM cells GROUP BY hrow, bucket
    ),
    top_users AS (
        SELECT user_id, cnt FROM user_counts
        ORDER BY cnt DESC, user_id LIMIT 10
    ),
    probes AS (
        {probe_rows}
    )
    SELECT p.user_id,
           CAST(MIN(p.cnt) AS BIGINT) AS exact_count,
           CAST(MIN(c.total) AS BIGINT) AS cms_estimate,
           CAST(MIN(c.total) - MIN(p.cnt) AS BIGINT) AS overestimate
    FROM probes p
    JOIN counters c ON c.hrow = p.hrow AND c.bucket = p.bucket
    GROUP BY p.user_id
    """


@register("approx_cms_heavy_hitters", oracle=_oracle_cms())
def approx_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over event user_ids, audited on the
    top-10 heaviest users: per user the exact count, the CMS estimate
    (min over D counter cells), and the overestimate (CMS never
    undercounts — `overestimate >= 0` by construction, expected ≈ N/W
    per colliding row).  The counter build is one explode(D) + groupBy
    — at scale the D·W-cell table then broadcasts to wherever point
    estimates are needed; the exact top-10 here is the referee, not
    the production path (a real pipeline finds candidates from the
    sketch)."""
    ev = load_table(spark, sf_dir, "events")
    user_counts = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    cell_structs = ", ".join(
        f"struct({i} AS hrow, {_cms_hash_sql(i, 'user_id')} AS bucket)"
        for i in range(CMS_D)
    )
    counters = (
        user_counts.selectExpr(f"explode(array({cell_structs})) AS c", "cnt")
        .select(F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"), "cnt")
        .groupBy("hrow", "bucket")
        .agg(F.sum("cnt").alias("total"))
    )
    top = (
        user_counts.orderBy(F.col("cnt").desc(), "user_id")
        .limit(10)
        .selectExpr(
            "user_id", "cnt", f"explode(array({cell_structs})) AS c"
        )
        .select("user_id", "cnt", F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"))
    )
    return (
        top.join(F.broadcast(counters), ["hrow", "bucket"])
        .groupBy("user_id")
        .agg(
            F.min("cnt").cast("bigint").alias("exact_count"),
            F.min("total").cast("bigint").alias("cms_estimate"),
            (F.min("total") - F.min("cnt")).cast("bigint").alias("overestimate"),
        )
    )


@register(
    "approx_cms_merge",
    oracle=f"""
    WITH user_counts AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_a,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_b
        FROM events GROUP BY user_id
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {i} AS hrow, {_cms_hash_sql(i, 'user_id')} AS bucket,"
            " cnt_a, cnt_b FROM user_counts"
            for i in range(CMS_D)
        )}
    )
    SELECT hrow, bucket,
           CAST(SUM(cnt_a) AS BIGINT) AS total_a,
           CAST(SUM(cnt_b) AS BIGINT) AS total_b,
           CAST(SUM(cnt_a) + SUM(cnt_b) AS BIGINT) AS total_merged,
           CAST(SUM(cnt_a + cnt_b) AS BIGINT) AS total_direct,
           TRUE AS merge_equals_direct
    FROM cells GROUP BY hrow, bucket
    """,
)
def approx_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS mergeability contract, machine-checked (the
    agg_histogram_merge pattern applied to the frequency sketch): build
    one counter table per data slice (events split by event_id parity
    — the per-day / per-partition stand-in), merge by plain cell-wise
    ADDITION, and emit both the merged and the direct one-pass counters
    with a pinned equality flag — the oracle reproduces every cell, so
    "sketches of slices sum to the sketch of the union" is a
    driver-hashed fact.  This is the property that lets 1000 executors
    each keep a local D×W table and reduce them in one combine step,
    and lets per-day sketches roll up to months without rescans."""
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(
        F.sum((F.col("event_id") % 2 == 0).cast("long"))
        .cast("bigint")
        .alias("cnt_a"),
        F.sum((F.col("event_id") % 2 == 1).cast("long"))
        .cast("bigint")
        .alias("cnt_b"),
    )
    cell_structs = ", ".join(
        f"struct({i} AS hrow, {_cms_hash_sql(i, 'user_id')} AS bucket)"
        for i in range(CMS_D)
    )
    cells = (
        uc.selectExpr(f"explode(array({cell_structs})) AS c", "cnt_a", "cnt_b")
        .select(
            F.col("c.hrow").alias("hrow"),
            F.col("c.bucket").alias("bucket"),
            "cnt_a",
            "cnt_b",
        )
        .groupBy("hrow", "bucket")
        .agg(
            F.sum("cnt_a").cast("bigint").alias("total_a"),
            F.sum("cnt_b").cast("bigint").alias("total_b"),
            (F.sum("cnt_a") + F.sum("cnt_b")).cast("bigint").alias("total_merged"),
            F.sum(F.col("cnt_a") + F.col("cnt_b"))
            .cast("bigint")
            .alias("total_direct"),
        )
    )
    return cells.withColumn(
        "merge_equals_direct",
        F.col("total_merged") == F.col("total_direct"),
    )


# ---------------------------------------------------------------------------
# CMS inner product: join-cardinality estimation from sketches alone.
# ---------------------------------------------------------------------------
#
# |A join B| on a key equals the inner product sum_k f_A(k)*f_B(k) of the
# two frequency vectors — and the AMS/CMS result is that the inner
# product of each sketch ROW, sum_j cmsA[i][j]*cmsB[i][j], NEVER
# underestimates it (collisions only add non-negative cross terms), with
# min over the D rows as the estimate.  This is how an optimizer prices
# a join it has never executed: both sides keep a 256-integer counter
# table; the estimate costs D*W multiplications, no data movement.
#
# The registered query emits each row's inner product AND the exact join
# size (the referee: the key-keyed join of the two COUNT tables — still
# far cheaper than the raw join), plus the bound boolean per row and for
# the min-row — so the driver hash certifies the overestimate guarantee,
# not just the numbers.  Overflow: cell products fit int64 while
# (rows/W)^2 * keys < 9e18 — beyond ~1e9 rows/side lift the product
# sums to decimal(38,0)/HUGEINT (trends.py carriers).
#
# Width matters for THIS use: the inner-product error is
# ~||fA||1*||fB||1/W, so the 64-bucket heavy-hitter width would drown
# a 15k-row join under a ~350k collision term (measured).  A 4x4096
# table (128 KB) brings the additive error under ~40% of the fixture's
# true size — the knob an optimizer sizes to its key cardinality.


JC_W = 4096  # join-cardinality width; 4 rows x 4096 cells = 128 KB


def _cms_side_sql(name: str, table: str, key: str) -> str:
    rows = "\n            UNION ALL\n            ".join(
        f"SELECT {i} AS hrow, {_cms_hash_sql(i, 'k', JC_W)} AS bucket, cnt"
        f" FROM {name}_counts"
        for i in range(CMS_D)
    )
    return f"""
    {name}_counts AS (
        SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {table} GROUP BY {key}
    ),
    {name}_cells AS (
        SELECT hrow, bucket, CAST(SUM(cnt) AS BIGINT) AS cell FROM (
            {rows}
        ) GROUP BY hrow, bucket
    )"""


@register(
    "approx_join_cardinality",
    oracle=f"""
    WITH {_cms_side_sql('a', 'orders', 'o_custkey')},
    {_cms_side_sql('b', 'customer', 'c_custkey')},
    ip AS (
        SELECT a.hrow, CAST(SUM(a.cell * b.cell) AS BIGINT) AS est
        FROM a_cells a JOIN b_cells b
          ON a.hrow = b.hrow AND a.bucket = b.bucket
        GROUP BY a.hrow
    ),
    tru AS (
        SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS true_size
        FROM a_counts a JOIN b_counts b ON a.k = b.k
    )
    SELECT CAST(hrow AS INT) AS hrow, est, true_size,
           est >= true_size AS bound_ok
    FROM ip, tru
    UNION ALL
    SELECT -1 AS hrow, (SELECT MIN(est) FROM ip) AS est, true_size,
           (SELECT MIN(est) FROM ip) >= true_size AS bound_ok
    FROM tru
    """,
)
def approx_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |orders ⋈ customer on custkey| from two Count-Min
    sketches via the AMS inner product: per-row estimates (hrow 0..3),
    the min-row (hrow = -1, the published estimate), the exact join
    size, and the machine-checked overestimate bound."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def side(df: DataFrame, key: str) -> tuple[DataFrame, DataFrame]:
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count("*").cast("bigint").alias("cnt")
        )
        cell_structs = ", ".join(
            f"struct({i} AS hrow, {_cms_hash_sql(i, 'k', JC_W)} AS bucket)"
            for i in range(CMS_D)
        )
        cells = (
            counts.selectExpr(f"explode(array({cell_structs})) AS c", "cnt")
            .select("c.hrow", "c.bucket", "cnt")
            .groupBy("hrow", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cell"))
        )
        return counts, cells

    a_counts, a_cells = side(orders, "o_custkey")
    b_counts, b_cells = side(cust, "c_custkey")

    ip = (
        a_cells.join(
            b_cells.withColumnRenamed("cell", "b_cell"), ["hrow", "bucket"]
        )
        .groupBy("hrow")
        .agg(F.sum(F.col("cell") * F.col("b_cell")).cast("bigint").alias("est"))
    )
    tru = (
        a_counts.join(b_counts.withColumnRenamed("cnt", "b_cnt"), "k")
        .agg(F.sum(F.col("cnt") * F.col("b_cnt")).cast("bigint").alias("true_size"))
    )
    per_row = ip.crossJoin(F.broadcast(tru))
    min_row = (
        ip.agg(F.min("est").alias("est"))
        .crossJoin(F.broadcast(tru))
        .select(F.lit(-1).alias("hrow"), "est", "true_size")
    )
    return (
        per_row.select("hrow", "est", "true_size")
        .unionByName(min_row)
        .select(
            F.col("hrow").cast("int").alias("hrow"),
            "est",
            "true_size",
            (F.col("est") >= F.col("true_size")).alias("bound_ok"),
        )
    )


# --- KMV / theta sketch: distinct counts under set operations -------------
#
# HLL (above) answers "how many distinct" and merges under UNION — but
# HLL cannot intersect.  The K-minimum-values / theta sketch family
# (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07; Apache DataSketches
# theta) keeps the K smallest distinct hash values; because a uniform
# hash makes any subset's minima a uniform sample, the sketches
# support UNION (merge the value lists, keep K smallest) AND
# INTERSECTION (count common values below theta = min of the two
# sketches' thresholds, scale by P/theta) without rescanning data.
# That is the 100 TB use: per-segment sketches are ~2 KB, computed in
# one linear pass each, and every set-algebra question after that is
# sketch-local.
#
# Hash: h = ((x % P) * a + b) % P + 1 with P = 2^31-1 prime and
# gcd(a, P) = 1 — a BIJECTION on [0, P) (overflow-safe: operands stay
# below 2^62), so for key domains < P the unsaturated sketch is the
# exact value set and every estimate collapses to the exact count.
# The whole operator is integer arithmetic — bit-exact vs DuckDB.
#
# Scale shape: per-group sketch = distinct() (hash shuffle with
# partial aggregation) then global top-K via sort+limit, which Spark
# executes as per-partition top-K heaps merged once (TakeOrdered) —
# never a full sort.  Everything downstream runs on <= 2K rows.

KMV_K = 256
_KMV_A, _KMV_B = CMS_AB[0]
_KMV_GA, _KMV_GB = "1-URGENT", "2-HIGH"


def _kmv_hash(col: str) -> str:
    return f"((({col} % {CMS_P}) * {_KMV_A} + {_KMV_B}) % {CMS_P}) + 1"


def _kmv_est_sql(n: str, th: str, idiv: str = "//") -> str:
    """retained-below-theta estimator; unsaturated sketch is exact.
    ``idiv`` is the engine's integer-division operator (DuckDB ``//``,
    Spark SQL ``div``)."""
    return (
        f"CASE WHEN {n} < {KMV_K} THEN {n} "
        f"ELSE ({KMV_K} - 1) * CAST({CMS_P} AS BIGINT) {idiv} {th} END"
    )


def _oracle_kmv() -> str:
    bound = (
        "CAST(({est} - {ex}) AS DOUBLE) * ({est} - {ex}) * {k2}"
        " <= {sig} * CAST({ex} AS DOUBLE) * {ex}"
    )
    return f"""
    WITH base AS (
        SELECT o_orderpriority AS g, o_custkey AS c,
               {_kmv_hash('o_custkey')} AS h
        FROM orders
        WHERE o_orderpriority IN ('{_KMV_GA}', '{_KMV_GB}')
    ),
    ha AS (SELECT DISTINCT h FROM base WHERE g = '{_KMV_GA}'
           ORDER BY h LIMIT {KMV_K}),
    hb AS (SELECT DISTINCT h FROM base WHERE g = '{_KMV_GB}'
           ORDER BY h LIMIT {KMV_K}),
    hu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
           ORDER BY h LIMIT {KMV_K}),
    sa AS (SELECT COUNT(*) AS n, MAX(h) AS th FROM ha),
    sb AS (SELECT COUNT(*) AS n, MAX(h) AS th FROM hb),
    su AS (SELECT COUNT(*) AS n, MAX(h) AS th FROM hu),
    flags AS (
        SELECT c, MAX(CASE WHEN g = '{_KMV_GA}' THEN 1 ELSE 0 END) AS fa,
               MAX(CASE WHEN g = '{_KMV_GB}' THEN 1 ELSE 0 END) AS fb
        FROM base GROUP BY c
    ),
    ex AS (
        SELECT SUM(fa) AS ea, SUM(fb) AS eb, COUNT(*) AS eu,
               SUM(fa * fb) AS ei
        FROM flags
    ),
    thetas AS (
        SELECT LEAST(CASE WHEN sa.n < {KMV_K} THEN CAST({CMS_P} AS BIGINT) + 1 ELSE sa.th END,
                     CASE WHEN sb.n < {KMV_K} THEN CAST({CMS_P} AS BIGINT) + 1 ELSE sb.th END)
               AS theta
        FROM sa, sb
    ),
    common_cnt AS (
        -- ungrouped COUNT: yields exactly one row (cnt = 0) even when
        -- no common hash falls below theta, so the 'intersect' row is
        -- always present with an explicit est = 0 rather than vanishing.
        SELECT COUNT(*) AS cnt
        FROM ha JOIN hb USING (h), thetas t
        WHERE h < t.theta
    ),
    common AS (SELECT c.cnt, t.theta FROM common_cnt c, thetas t),
    rows_out AS (
        SELECT 'A' AS measure, sa.n AS n_keep, sa.th AS theta,
               {_kmv_est_sql('sa.n', 'sa.th')} AS est, ex.ea AS exact
        FROM sa, ex
        UNION ALL
        SELECT 'B', sb.n, sb.th, {_kmv_est_sql('sb.n', 'sb.th')}, ex.eb
        FROM sb, ex
        UNION ALL
        SELECT 'union', su.n, su.th, {_kmv_est_sql('su.n', 'su.th')}, ex.eu
        FROM su, ex
        UNION ALL
        SELECT 'intersect', c.cnt, c.theta,
               CASE WHEN c.theta > {CMS_P} THEN c.cnt
                    ELSE c.cnt * CAST({CMS_P} AS BIGINT) // c.theta END, ex.ei
        FROM common c, ex
    )
    SELECT measure, CAST(n_keep AS BIGINT) AS n_keep,
           CAST(theta AS BIGINT) AS theta, CAST(est AS BIGINT) AS est,
           CAST(exact AS BIGINT) AS exact,
           {bound.format(est='est', ex='exact', k2=KMV_K - 2, sig=25.0)}
               OR measure = 'intersect'
               AND {bound.format(est='est', ex='exact', k2=KMV_K - 2,
                                 sig=64.0)}
               AS bound_ok
    FROM rows_out
    """


def kmv_set_ops(orders: DataFrame) -> DataFrame:
    """KMV/theta sketches over the urgent- and high-priority customer
    sets: per-sketch distinct estimates plus UNION (merge K smallest)
    and INTERSECTION (common values below theta, scaled by P/theta)
    estimates, each against its in-plan exact referee with a
    machine-checked error band (5 sigma of the KMV standard error;
    8 sigma for the higher-variance intersection).  Unsaturated
    sketches (< K distinct values, e.g. sf0.001) are the complete
    value set, so every estimate there equals the exact count."""
    o = (
        orders
        .filter(F.col("o_orderpriority").isin(_KMV_GA, _KMV_GB))
        .selectExpr(
            "o_orderpriority AS g",
            "o_custkey AS c",
            f"{_kmv_hash('o_custkey')} AS h",
        )
    )

    def sketch(df: DataFrame) -> DataFrame:
        return df.select("h").distinct().orderBy("h").limit(KMV_K)

    # The two sketches and the 1-row exact frame are each consumed by
    # 3-4 downstream rows; without a cache every consumer re-runs the
    # corpus-side distinct+top-K (≈11 scans of orders).  persist_scoped
    # pins the ≤256-row RESULTS, so set algebra after the two linear
    # passes is sketch-local — the whole point of the data structure.
    ha = persist_scoped("kmv.ha", sketch(o.filter(F.col("g") == _KMV_GA)))
    hb = persist_scoped("kmv.hb", sketch(o.filter(F.col("g") == _KMV_GB)))
    hu = sketch(ha.unionByName(hb))

    def stats(df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"), F.max("h").alias("th")
        )

    sa, sb, su = stats(ha), stats(hb), stats(hu)
    ex = (
        o.groupBy("c")
        .agg(
            F.max((F.col("g") == _KMV_GA).cast("int")).alias("fa"),
            F.max((F.col("g") == _KMV_GB).cast("int")).alias("fb"),
        )
        .agg(
            F.sum("fa").alias("ea"),
            F.sum("fb").alias("eb"),
            F.count("*").alias("eu"),
            F.sum(F.col("fa") * F.col("fb")).alias("ei"),
        )
    )
    ex = persist_scoped("kmv.exact", ex)

    unsat = (
        f"CASE WHEN {{n}} < {KMV_K}"
        f" THEN CAST({CMS_P} AS BIGINT) + 1 ELSE {{th}} END"
    )
    thetas = (
        sa.select(F.col("n").alias("na"), F.col("th").alias("tha"))
        .crossJoin(
            F.broadcast(
                sb.select(F.col("n").alias("nb"), F.col("th").alias("thb"))
            )
        )
        .selectExpr(
            f"least({unsat.format(n='na', th='tha')},"
            f" {unsat.format(n='nb', th='thb')}) AS theta"
        )
    )
    # Ungrouped count: one row (cnt = 0) even when no common hash falls
    # below theta — the 'intersect' output row then reports est = 0
    # explicitly instead of disappearing and breaking the 4-row contract.
    common_cnt = (
        ha.join(hb, "h")
        .crossJoin(F.broadcast(thetas))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("cnt"))
    )
    common = thetas.crossJoin(F.broadcast(common_cnt))

    def row(measure: str, s: DataFrame, exact_col: str) -> DataFrame:
        return (
            s.crossJoin(F.broadcast(ex))
            .selectExpr(
                f"'{measure}' AS measure",
                "n AS n_keep",
                "th AS theta",
                f"{_kmv_est_sql('n', 'th', 'div')} AS est",
                f"{exact_col} AS exact",
            )
        )

    row_i = common.crossJoin(F.broadcast(ex)).selectExpr(
        "'intersect' AS measure",
        "cnt AS n_keep",
        "theta",
        f"CASE WHEN theta > {CMS_P} THEN cnt"
        f" ELSE cnt * CAST({CMS_P} AS BIGINT) div theta END AS est",
        "ei AS exact",
    )
    bound = (
        "CAST((est - exact) AS DOUBLE) * (est - exact) * {k2}"
        " <= {sig} * CAST(exact AS DOUBLE) * exact"
    )
    return (
        row("A", sa, "ea")
        .unionByName(row("B", sb, "eb"))
        .unionByName(row("union", su, "eu"))
        .unionByName(row_i)
        .selectExpr(
            "measure",
            "CAST(n_keep AS BIGINT) AS n_keep",
            "CAST(theta AS BIGINT) AS theta",
            "CAST(est AS BIGINT) AS est",
            "CAST(exact AS BIGINT) AS exact",
            f"{bound.format(k2=KMV_K - 2, sig=25.0)}"
            " OR measure = 'intersect'"
            f" AND {bound.format(k2=KMV_K - 2, sig=64.0)} AS bound_ok",
        )
    )


@register("approx_kmv_set_ops", oracle=_oracle_kmv())
def approx_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_set_ops(load_table(spark, sf_dir, "orders"))


# --- CMS-driven top-k: the production candidate path ----------------------
#
# approx_cms_heavy_hitters (above) audits the sketch on a top-10 list
# its referee computed EXACTLY — its docstring notes a real pipeline
# finds the candidates FROM the sketch.  This query is that production
# path, with its recall machine-checked: score every distinct key by
# its CMS estimate (a broadcast of the D·W counter table — counters
# built straight from raw events, no per-key exact pass), take the
# top C = MULT·K candidates by estimate (TakeOrdered heaps), count
# EXACTLY only candidate traffic, and report, for each of the true
# top-K keys (the in-plan referee), whether the sketch surfaced it.
# CMS never underestimates, so a true heavy hitter is missed only if
# ≥ C other keys out-estimate it — the overprovisioning MULT buys the
# recall, and `found_by_sketch` records the result per key.

CMS_TOPK = 10
CMS_CAND_MULT = 3  # candidate overprovisioning factor
# The 64-bucket audit sketch above is deliberately tiny; candidate
# GENERATION needs error << the heavy-hitter gap.  ε ≈ e/W ⇒ with
# W = 16384 the estimate error is ~N/16384 — a 0.5 MB counter table
# (4×16384×8 B), still broadcast-trivial.  Sizing the sketch to the
# tolerance is the production decision this query demonstrates; the
# first draft reused W = 64 and its measured recall fell from 1.0
# (sf0.001) to 0.0 (sf0.1) as collisions swamped the gap.
CMS_TOPK_W = 16384


@register(
    "approx_cms_topk_prod",
    oracle=f"""
    WITH cells AS (
        {" UNION ALL ".join(
            f"SELECT {i} AS hrow, {_cms_hash_sql(i, 'user_id', CMS_TOPK_W)} AS bucket"
            " FROM events"
            for i in range(CMS_D)
        )}
    ),
    counters AS (
        SELECT hrow, bucket, CAST(COUNT(*) AS BIGINT) AS total
        FROM cells GROUP BY hrow, bucket
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    est AS (
        SELECT u.user_id, MIN(c.total) AS cms_est
        FROM (
            {" UNION ALL ".join(
                f"SELECT user_id, {i} AS hrow,"
                f" {_cms_hash_sql(i, 'user_id', CMS_TOPK_W)} AS bucket FROM users"
                for i in range(CMS_D)
            )}
        ) u JOIN counters c USING (hrow, bucket)
        GROUP BY u.user_id
    ),
    cand AS (
        SELECT user_id FROM est
        ORDER BY cms_est DESC, user_id LIMIT {CMS_TOPK * CMS_CAND_MULT}
    ),
    true_top AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM events GROUP BY user_id
        ORDER BY exact_count DESC, user_id LIMIT {CMS_TOPK}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY t.exact_count DESC, t.user_id)
                AS BIGINT) AS rank,
           t.user_id, t.exact_count, e.cms_est,
           t.user_id IN (SELECT user_id FROM cand) AS found_by_sketch
    FROM true_top t JOIN est e USING (user_id)
    """,
)
def approx_cms_topk_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_topk_prod(load_table(spark, sf_dir, "events"))


def cms_topk_prod(ev: DataFrame) -> DataFrame:
    cell_structs = ", ".join(
        f"struct({i} AS hrow, {_cms_hash_sql(i, 'user_id', CMS_TOPK_W)} AS bucket)"
        for i in range(CMS_D)
    )
    counters = (
        ev.selectExpr(f"explode(array({cell_structs})) AS c")
        .select(F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"))
        .groupBy("hrow", "bucket")
        .agg(F.count("*").cast("bigint").alias("total"))
    )
    users = persist_scoped("cms_topk.users", ev.select("user_id").distinct())
    est = persist_scoped(
        "cms_topk.est",
        users.selectExpr("user_id", f"explode(array({cell_structs})) AS c")
        .select("user_id", F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"))
        .join(F.broadcast(counters), ["hrow", "bucket"])
        .groupBy("user_id")
        .agg(F.min("total").alias("cms_est")),
    )
    cand = (
        est.orderBy(F.col("cms_est").desc(), "user_id")
        .limit(CMS_TOPK * CMS_CAND_MULT)
        .select("user_id")
        .withColumn("is_cand", F.lit(True))
    )
    true_top = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "user_id")
        .limit(CMS_TOPK)
    )
    w = Window.orderBy(F.col("exact_count").desc(), "user_id")
    return (
        true_top.join(est, "user_id")
        .join(F.broadcast(cand), "user_id", "left")
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "user_id",
            "exact_count",
            "cms_est",
            F.coalesce("is_cand", F.lit(False)).alias("found_by_sketch"),
        )
    )
