"""Data-quality gates: expectation suites and distribution-drift
checks.

Every serious pipeline fronts its tables with machine-checked
expectations (the Great Expectations / dbt-test / Deequ pattern): null
and domain rates, uniqueness, referential integrity, value ranges —
run as aggregates, emitted as a metrics table, alerted on.  The
reference's only quality gate is its row filter
(spark_consumer.py:77-78); this module is the engine's table-level
generalization, and the drift check is the distribution-level one a
training-data pipeline runs between ingestion batches.

Scale shape: every expectation is a scan-aggregate (map-side combined,
one pass over the table computes ALL checks via conditional sums — not
one scan per check); the referential check is one anti-join against
the broadcast dimension.  The drift check reduces each slice to
|event_type| x |bins| cells before any comparison — corpus-size
independent state, mergeable across partitions.

Everything is integer arithmetic: violation COUNTS, not rates (the
rate is one division away), and the drift flag compares proportions by
cross-multiplication — |n_cur·N_ref − n_ref·N_cur| · S > τ·N_ref·N_cur
instead of |p_cur − p_ref| > τ/S — so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Drift-check knobs: value histogram bins and the proportion threshold
# |p_cur - p_ref| > PSI_TAU / PSI_SCALE (0.05).
PSI_BIN_W = 50
PSI_BINS = 10
PSI_TAU = 5
PSI_SCALE = 100
REF_CUTOFF = "2024-01-15"  # first half = reference slice


@register(
    "dq_expectations_orders",
    oracle="""
    WITH checks AS (
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n_checked,
            CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                AS dup_orderkey,
            CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS null_orderdate,
            CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS nonpos_price,
            CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
        FROM orders
    ),
    fk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS orphans
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    )
    SELECT 'o_orderkey_unique' AS check_name,
           dup_orderkey AS n_violations, n_checked FROM checks
    UNION ALL
    SELECT 'o_orderdate_not_null', null_orderdate, n_checked FROM checks
    UNION ALL
    SELECT 'o_totalprice_positive', nonpos_price, n_checked FROM checks
    UNION ALL
    SELECT 'o_orderstatus_domain', bad_status, n_checked FROM checks
    UNION ALL
    SELECT 'o_custkey_fk', fk.orphans, checks.n_checked
    FROM checks CROSS JOIN fk
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: uniqueness, null, range, domain
    checks fold into ONE scan (conditional sums in a single aggregate);
    referential integrity is one anti-join against the broadcast
    customer dim.  Output is the alerting table (check_name,
    n_violations, n_checked) — all zeros on healthy data, and the
    contract a writer gate enforces before publishing a partition."""
    od = load_table(spark, sf_dir, "orders")
    checks = od.agg(
        F.count("*").cast("bigint").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_orderkey"),
        F.sum(F.col("o_orderdate").isNull().cast("long"))
        .cast("bigint")
        .alias("null_orderdate"),
        F.sum((F.col("o_totalprice") <= 0).cast("long"))
        .cast("bigint")
        .alias("nonpos_price"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long"))
        .cast("bigint")
        .alias("bad_status"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        od.join(
            F.broadcast(cust),
            od["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("orphans"))
    )

    def row(name: str, col: str, frame: DataFrame) -> DataFrame:
        return frame.select(
            F.lit(name).alias("check_name"),
            F.col(col).alias("n_violations"),
            F.col("n_checked"),
        )

    base = checks
    fk = orphans.crossJoin(F.broadcast(checks.select("n_checked")))
    return (
        row("o_orderkey_unique", "dup_orderkey", base)
        .unionByName(row("o_orderdate_not_null", "null_orderdate", base))
        .unionByName(row("o_totalprice_positive", "nonpos_price", base))
        .unionByName(row("o_orderstatus_domain", "bad_status", base))
        .unionByName(row("o_custkey_fk", "orphans", fk))
    )


@register(
    "dq_psi_bins_drift",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '{REF_CUTOFF}' THEN 0 ELSE 1 END
                 AS slice,
               LEAST(CAST(FLOOR(value / {PSI_BIN_W}) AS BIGINT),
                     {PSI_BINS - 1}) AS bin
        FROM events
    ),
    cells AS (
        SELECT event_type, bin,
               CAST(SUM(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ref,
               CAST(SUM(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cur
        FROM binned GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n_ref) AS BIGINT) AS t_ref,
               CAST(SUM(n_cur) AS BIGINT) AS t_cur
        FROM cells GROUP BY 1
    )
    SELECT c.event_type, c.bin, c.n_ref, c.n_cur, t.t_ref, t.t_cur,
           ABS(c.n_cur * t.t_ref - c.n_ref * t.t_cur) * {PSI_SCALE}
               > {PSI_TAU} * t.t_ref * t.t_cur AS drifted
    FROM cells c JOIN tot t ON t.event_type = c.event_type
    """,
)
def dq_psi_bins_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the reference slice (before
    {REF_CUTOFF}) and the current slice, per event type: fixed
    {PSI_BIN_W}-wide value bins, per-cell counts from both slices, and
    an integer-exact flag for |p_cur − p_ref| > 0.05 via
    cross-multiplication (no division anywhere, so both engines agree
    bit-for-bit; PSI/KL scores are one log away for any consumer, from
    these same counts).  At 100 TB each slice reduces map-side to
    |types|·|bins| cells before anything joins."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(REF_CUTOFF).cast("timestamp"), 0)
        .otherwise(1)
        .alias("slice"),
        F.least(
            F.floor(F.col("value") / PSI_BIN_W).cast("bigint"),
            F.lit(PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum((F.col("slice") == 0).cast("long")).cast("bigint").alias("n_ref"),
        F.sum((F.col("slice") == 1).cast("long")).cast("bigint").alias("n_cur"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    j = cells.join(F.broadcast(tot), "event_type")
    diff = F.abs(
        F.col("n_cur") * F.col("t_ref") - F.col("n_ref") * F.col("t_cur")
    )
    return j.select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        "t_ref",
        "t_cur",
        (diff * PSI_SCALE > PSI_TAU * F.col("t_ref") * F.col("t_cur")).alias(
            "drifted"
        ),
    )


DUP_PAY_US = 86_400_000_000  # 24 h pairing window


@register(
    "dq_duplicate_payments",
    oracle=f"""
    WITH raw AS (
        SELECT * FROM orders
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 137 = 0
    ),
    o AS (
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               epoch_us(o_orderdate) AS us
        FROM raw
    )
    SELECT a.o_custkey, a.cents,
           a.o_orderkey AS first_key, b.o_orderkey AS second_key,
           (b.us - a.us) // 3600000000 AS gap_hours
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.cents = b.cents
     AND (b.us > a.us OR (b.us = a.us AND a.o_orderkey < b.o_orderkey))
     AND b.us - a.us <= {DUP_PAY_US}
    """,
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-charge detection: two orders by the same customer for the
    exact same amount within 24 h — the classic payments-integrity
    sweep.  The naive form is a time-theta SELF-join; the scalable
    rewrite equi-joins on (customer, cents, day-bucket) with the A side
    emitting its day and the NEXT day (a ≤24 h window spans at most two
    daily buckets), then applies the exact time predicate as the
    residual — the intervals.py bin-and-residual pattern on a
    structured key.  Pair space is bounded by (customer, amount)
    multiplicity, not table size; everything is integer cents/µs.
    Pairs are oriented by TIME (first = earlier charge), with the
    orderkey as the tiebreak only for same-instant pairs — orienting
    by key alone would silently drop true positives whenever the
    lower-keyed order happens to be the later charge.
    The fixture has no natural double-charges (amounts are near-unique
    per customer), so the query simulates an at-least-once gateway
    replay — every 137th order re-submitted under a new key — the
    exact input shape the sweep exists for (the dedup_exact_hash
    recrawl convention)."""
    od = load_table(spark, sf_dir, "orders")
    od = od.unionByName(
        od.filter(F.col("o_orderkey") % 137 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 10_000_000
        )
    )
    o = od.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
    )
    day = F.expr(f"us div {DUP_PAY_US}")
    a = o.select(
        F.col("o_orderkey").alias("first_key"),
        F.col("o_custkey").alias("o_custkey"),
        "cents",
        F.col("us").alias("a_us"),
        F.explode(F.array(day, day + 1)).alias("bucket"),
    )
    b = o.select(
        F.col("o_orderkey").alias("second_key"),
        F.col("o_custkey").alias("b_cust"),
        F.col("cents").alias("b_cents"),
        F.col("us").alias("b_us"),
        day.alias("bucket"),
    )
    pairs = a.join(
        b,
        (a["o_custkey"] == b["b_cust"])
        & (a["cents"] == b["b_cents"])
        & (a["bucket"] == b["bucket"]),
    ).where(
        (
            (F.col("b_us") > F.col("a_us"))
            | (
                (F.col("b_us") == F.col("a_us"))
                & (F.col("first_key") < F.col("second_key"))
            )
        )
        & (F.col("b_us") - F.col("a_us") <= DUP_PAY_US)
    )
    return pairs.select(
        "o_custkey",
        "cents",
        "first_key",
        "second_key",
        F.expr("(b_us - a_us) div 3600000000").alias("gap_hours"),
    ).distinct()


# --- k-anonymity audit ------------------------------------------------------

K_ANON = 5  # groups smaller than this are re-identification risks


@register(
    "dq_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
        FROM customer
    ),
    classes AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           class_size < {K_ANON} AS at_risk
    FROM classes GROUP BY class_size
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (nation, market segment, account-balance band): the privacy gate a
    pipeline runs before releasing or joining "anonymized" records,
    because any equivalence class smaller than k re-identifies its
    members by linkage (Sweeney's k-anonymity).  Output is the
    class-size histogram — (class_size, n_classes, n_rows, at_risk) —
    so `sum(n_rows) where at_risk` is the exposed-row count and the
    full distribution shows how far generalization must coarsen the
    bands to reach k = {K_ANON}.

    The balance band uses floor(x / 1000.0) on the DOUBLE (both
    engines floor IEEE doubles identically); integer `div` would need
    the sign-split dance because c_acctbal goes negative.

    Scale shape: two stacked map-side-combined aggregates — corpus →
    |classes| → |distinct sizes| — linear scan cost, KB of state; the
    same audit at 100 TB is one pass regardless of how many
    quasi-identifier columns are folded into the key."""
    c = load_table(spark, sf_dir, "customer")
    classes = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").cast("bigint").alias("class_size"))
    )
    return classes.groupBy("class_size").agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        (F.col("class_size") < K_ANON).alias("at_risk"),
    )


# --- l-diversity audit ------------------------------------------------------
#
# k-anonymity alone is not enough: a class of 50 rows that all share
# the SAME sensitive value leaks it to every member (the homogeneity
# attack).  Machanavajjhala et al.'s l-diversity requires each
# equivalence class to contain at least l distinct sensitive values.
# Same two-stacked-aggregate shape as dq_k_anonymity — here the QI is
# (nation, balance band) and the sensitive attribute is the market
# segment; a release gate reads `sum(n_rows) where below_l` as the
# homogeneity-exposed row count.

L_DIV = 3  # classes with fewer distinct sensitive values are exposed


@register(
    "dq_l_diversity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c_mktsegment
        FROM customer
    ),
    classes AS (
        SELECT c_nationkey, bal_band,
               CAST(COUNT(*) AS BIGINT) AS class_size,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
        FROM qi GROUP BY c_nationkey, bal_band
    )
    SELECT n_sensitive,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           n_sensitive < {L_DIV} AS below_l
    FROM classes GROUP BY n_sensitive
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: distribution of distinct-sensitive-value
    counts (market segment) across (nation, balance-band) equivalence
    classes; `below_l` marks classes open to the homogeneity attack
    even when they pass k-anonymity."""
    c = load_table(spark, sf_dir, "customer")
    classes = (
        c.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct("c_mktsegment").cast("bigint").alias("n_sensitive"),
        )
    )
    return classes.groupBy("n_sensitive").agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        (F.col("n_sensitive") < L_DIV).alias("below_l"),
    )


# --- snapshot diff ----------------------------------------------------------

# Deterministic snapshot-B simulation knobs (the table-diff needs two
# versions of a table; the fixture has one, so B is derived from A the
# way dq_duplicate_payments synthesizes replays): every DIFF_DEL-th row
# deleted, every DIFF_UPD-th repriced, every DIFF_STAT-th re-statused,
# every DIFF_INS-th re-inserted under a new key.
DIFF_DEL = 101
DIFF_UPD = 7
DIFF_STAT = 13
DIFF_INS = 97
DIFF_KEY_SHIFT = 20_000_000


@register(
    "dq_table_diff",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderpriority
        FROM orders
    ),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {DIFF_STAT} = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CAST(floor(o_totalprice * 100) AS BIGINT)
                 + CASE WHEN o_orderkey % {DIFF_UPD} = 0 THEN 100
                        ELSE 0 END AS cents,
               o_orderpriority
        FROM orders WHERE o_orderkey % {DIFF_DEL} <> 0
        UNION ALL
        SELECT o_orderkey + {DIFF_KEY_SHIFT}, o_orderstatus,
               CAST(floor(o_totalprice * 100) AS BIGINT), o_orderpriority
        FROM orders WHERE o_orderkey % {DIFF_INS} = 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN ''
                ELSE concat_ws(',',
                    CASE WHEN a.o_orderstatus <> b.o_orderstatus
                         THEN 'o_orderstatus' END,
                    CASE WHEN a.cents <> b.cents THEN 'o_totalprice' END,
                    CASE WHEN a.o_orderpriority <> b.o_orderpriority
                         THEN 'o_orderpriority' END)
           END AS changed_cols
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.cents <> b.cents
       OR a.o_orderpriority <> b.o_orderpriority
    """,
)
def dq_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: which rows were added / removed / changed between
    two versions of a table, and for changed rows WHICH columns moved
    (comma-joined in schema order) — the audit behind CDC validation,
    reconciliation after a backfill, and "what did yesterday's load
    touch".  Snapshot B is derived from A by deterministic rules (see
    the DIFF_* knobs) so the diff has all four outcomes to find.

    Money is compared in integer cents (floor(price·100)) — comparing
    raw doubles for inequality is exact IEEE too, but the cents form
    is what a reconciliation actually keys on.

    Scale shape: one full outer join on the primary key; both sides
    shuffle on o_orderkey ONCE (at 100 TB both snapshots live
    bucketed on the key — the merge_upsert_bucketed layout — and the
    join is Exchange-free).  The unchanged bulk is filtered
    immediately after the join, so the output is delta-sized; no
    row-to-row comparison ever leaves the join site."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderpriority",
    )
    b = (
        a.filter(F.col("o_orderkey") % DIFF_DEL != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % DIFF_STAT == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            (
                F.col("cents")
                + F.when(F.col("o_orderkey") % DIFF_UPD == 0, 100).otherwise(0)
            ).alias("cents"),
            "o_orderpriority",
        )
        .unionByName(
            a.filter(F.col("o_orderkey") % DIFF_INS == 0).select(
                (F.col("o_orderkey") + DIFF_KEY_SHIFT).alias("o_orderkey"),
                "o_orderstatus",
                "cents",
                "o_orderpriority",
            )
        )
    )
    a = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    b = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    j = a.join(b, a["a_o_orderkey"] == b["b_o_orderkey"], "full_outer")
    col_moved = (
        (F.col("a_o_orderstatus") != F.col("b_o_orderstatus"))
        | (F.col("a_cents") != F.col("b_cents"))
        | (F.col("a_o_orderpriority") != F.col("b_o_orderpriority"))
    )
    return (
        j.filter(
            F.col("a_o_orderkey").isNull()
            | F.col("b_o_orderkey").isNull()
            | col_moved
        )
        .select(
            F.coalesce("a_o_orderkey", "b_o_orderkey").alias("o_orderkey"),
            F.when(F.col("a_o_orderkey").isNull(), "added")
            .when(F.col("b_o_orderkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
            F.when(
                F.col("a_o_orderkey").isNull() | F.col("b_o_orderkey").isNull(),
                F.lit(""),
            )
            .otherwise(
                F.concat_ws(
                    ",",
                    F.when(
                        F.col("a_o_orderstatus") != F.col("b_o_orderstatus"),
                        F.lit("o_orderstatus"),
                    ),
                    F.when(
                        F.col("a_cents") != F.col("b_cents"), F.lit("o_totalprice")
                    ),
                    F.when(
                        F.col("a_o_orderpriority") != F.col("b_o_orderpriority"),
                        F.lit("o_orderpriority"),
                    ),
                )
            )
            .alias("changed_cols"),
        )
    )


# --- Benford first-digit audit ---------------------------------------------
#
# Naturally occurring multi-magnitude amounts follow Benford's law
# (P(first digit = d) = log10(1 + 1/d)); fabricated, capped, or
# synthetically generated amounts do not.  Auditors run exactly this
# digit histogram over payment columns as a fraud/DQ screen (Nigrini).
# The fixture's totalprice IS synthetic, so the audit fires — per-digit
# deviation flags are the point, demonstrated on data the law rejects.
#
# Exactness: the first significant digit comes from the DECIMAL/string
# form (no log10 libm call); expected shares are fixed integer ppm
# literals; observed shares are integer divisions.  One linear scan,
# 9-row output — scan throughput at any corpus size.

BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757]  # round(log10(1+1/d) * 1e6), d = 1..9
BENFORD_TOL_PPM = 5000  # flag digits deviating more than 0.5%

_BENFORD_EXP = "CASE " + " ".join(
    f"WHEN digit = {d + 1} THEN {p}" for d, p in enumerate(BENFORD_PPM)
) + " END"


@register(
    "dq_benford_digits",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ),
    hist AS (
        -- guard: an amount < 1 would yield digit 0, which has no arm in
        -- the expected-ppm CASE; restrict the histogram domain to the
        -- 1..9 digits Benford's law is defined over so a fixture change
        -- shrinks the output instead of emitting NULL-flag rows.
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
        FROM digits WHERE digit BETWEEN 1 AND 9 GROUP BY digit
    )
    SELECT digit, n_orders,
           CAST(n_orders * 1000000 // n_total AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_EXP} AS BIGINT) AS exp_ppm,
           CAST(n_orders * 1000000 // n_total - {_BENFORD_EXP}
                AS BIGINT) AS dev_ppm,
           abs(n_orders * 1000000 // n_total - {_BENFORD_EXP})
               > {BENFORD_TOL_PPM} AS flagged
    FROM hist
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of order totals vs Benford
    expectation; per-digit ppm deviation + flag.  The synthetic
    fixture violates the law by construction — the audit firing IS
    the demonstrated behavior."""
    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.selectExpr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT) AS digit"
        )
        # mirror of the oracle's digit guard: only 1..9 have a Benford
        # expectation; an out-of-domain digit (amount < 1) must not
        # surface as a NULL-flag row.
        .filter("digit BETWEEN 1 AND 9")
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    total = hist.agg(F.sum("n_orders").alias("n_total"))
    return hist.crossJoin(F.broadcast(total)).selectExpr(
        "digit",
        "n_orders",
        "CAST(n_orders * 1000000 div n_total AS BIGINT) AS obs_ppm",
        f"CAST({_BENFORD_EXP} AS BIGINT) AS exp_ppm",
        f"CAST(n_orders * 1000000 div n_total - {_BENFORD_EXP}"
        " AS BIGINT) AS dev_ppm",
        f"abs(n_orders * 1000000 div n_total - {_BENFORD_EXP})"
        f" > {BENFORD_TOL_PPM} AS flagged",
    )


# --- Differential privacy: Laplace-noised counts ---------------------------
#
# k-anonymity/l-diversity (above) audit a RELEASE; the Laplace
# mechanism (Dwork et al. 2006) protects an AGGREGATE: a count query
# has sensitivity 1, so adding Laplace(1/eps) noise gives
# eps-differential privacy.  The engine-side shape is trivial (one
# groupBy plus a projection); what this query pins down is the exact
# inverse-CDF sampling arithmetic on both engines:
#
#     u ~ U(0,1);  noise = -(1/eps)·sign(u-1/2)·ln(1 - 2|u-1/2|)
#
# u here is a deterministic hash of the group key so the oracle can
# reproduce the draw bit-for-bit (micro-nat rounding absorbs the libm
# ulp) — a SEEDED mechanism, the testing convention; a production
# release draws fresh entropy per query and does NOT publish the true
# counts that ride along below as the referee columns.  |noise| is
# bounded by (1/eps)·ln((P+1)/2) ≈ 21.5/eps deterministically (u is
# never 0 or 1), recorded per row as `within_tail`.

DP_EPS_INV = 2  # 1/eps, eps = 0.5
DP_P = 2_147_483_647
DP_A, DP_B = 1_229_491_487, 1_597_334_677

# c_nationkey is int32 in the parquet — promote before the multiply.
_DP_U = f"(CAST((((CAST(c_nationkey AS BIGINT) % {DP_P}) * {DP_A} + {DP_B}) % {DP_P}) + 1" \
        f" AS DOUBLE) / (CAST({DP_P} AS BIGINT) + 1))"
_DP_NOISE = (
    "CAST(round("
    f"-{DP_EPS_INV} * sign({_DP_U} - 0.5)"
    f" * ln(1.0 - 2.0 * abs({_DP_U} - 0.5)) * 1000000.0, 0) AS BIGINT)"
)


@register(
    "dq_dp_noisy_counts",
    oracle=f"""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS true_count,
           CAST({_DP_NOISE} AS BIGINT) AS noise_micro,
           CAST(COUNT(*) * 1000000 + {_DP_NOISE} AS BIGINT)
               AS noisy_micro,
           abs({_DP_NOISE}) <= {DP_EPS_INV} * 22 * 1000000
               AS within_tail
    FROM customer GROUP BY c_nationkey
    """,
)
def dq_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer counts under the eps=0.5 Laplace mechanism
    (seeded draw; true counts ride along as the referee)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").cast("bigint").alias("true_count"))
        .selectExpr(
            "c_nationkey",
            "true_count",
            f"{_DP_NOISE} AS noise_micro",
            f"CAST(true_count * 1000000 + {_DP_NOISE} AS BIGINT)"
            " AS noisy_micro",
            f"abs({_DP_NOISE}) <= {DP_EPS_INV} * 22 * 1000000"
            " AS within_tail",
        )
    )


# --- Approximate functional-dependency audit -------------------------------
#
# The data-profiling question schema tools (Deequ, Metanome) answer
# before anyone writes a join: does column A determine column B, and if
# not, how badly is the dependency violated?  The standard measure is
# Kivinen-Mannila's g3: the minimum fraction of rows that must be
# removed for A -> B to hold exactly, computed per LHS group as
# (group size - dominant-RHS count).  A real profiler sweeps candidate
# pairs; this audit pins the algebra on three representative FDs — one
# that holds by construction (l_orderkey -> o_orderkey parity via
# lineitem's own key), one plausibly-but-not holding (l_partkey ->
# l_suppkey: parts have multiple suppliers), one behavioral
# (o_custkey -> o_orderpriority: customers use many priorities).
#
# Scale shape: groupBy (lhs, rhs) with map-side combine, then groupBy
# lhs (SUM / MAX / COUNT — no window, no argmax materialization), then
# a global 1-row fold.  Two key-hashed shuffles whose cardinality is
# the DISTINCT pair count, never raw rows twice.  ppm arithmetic stays
# in int64 up to ~9e12 rows.

_FD_SPECS = [
    ("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("l_orderkey->l_returnflag", "lineitem", "l_orderkey",
     "l_returnflag"),
]


def _fd_oracle_one(fd: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{fd}' AS fd, CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(SUM(n) - SUM(keep) AS BIGINT) AS rows_to_remove,
           CAST((SUM(n) - SUM(keep)) * 1000000 // SUM(n) AS BIGINT)
               AS g3_error_ppm,
           SUM(n) = SUM(keep) AS holds
    FROM (
        SELECT lhs, SUM(cnt) AS n, MAX(cnt) AS keep,
               COUNT(*) AS n_rhs
        FROM (
            SELECT {lhs} AS lhs, {rhs} AS rhs, COUNT(*) AS cnt
            FROM {table} GROUP BY 1, 2
        ) GROUP BY lhs
    )"""


def fd_audit(df: DataFrame, fd: str, lhs: str, rhs: str) -> DataFrame:
    """One-row g3 audit of the functional dependency lhs -> rhs."""
    pairs = df.groupBy(
        F.col(lhs).alias("lhs"), F.col(rhs).alias("rhs")
    ).agg(F.count("*").alias("cnt"))
    per_lhs = pairs.groupBy("lhs").agg(
        F.sum("cnt").alias("n"),
        F.max("cnt").alias("keep"),
        F.count("*").alias("n_rhs"),
    )
    return per_lhs.agg(
        F.lit(fd).alias("fd"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("n_lhs"),
        F.sum((F.col("n_rhs") > 1).cast("int"))
        .cast("bigint")
        .alias("n_violating_lhs"),
        (F.sum("n") - F.sum("keep")).cast("bigint").alias("rows_to_remove"),
        F.expr("CAST((SUM(n) - SUM(keep)) * 1000000 div SUM(n) AS BIGINT)")
        .alias("g3_error_ppm"),
        (F.sum("n") == F.sum("keep")).alias("holds"),
    ).select(
        "fd", "total_rows", "n_lhs", "n_violating_lhs",
        "rows_to_remove", "g3_error_ppm", "holds",
    )


@register(
    "dq_functional_dependency",
    oracle=" UNION ALL ".join(
        _fd_oracle_one(fd, t, l, r) for fd, t, l, r in _FD_SPECS
    ),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3-measure audit of three candidate FDs (one exact-by-schema,
    two behavioral): per-FD total rows, violating LHS count, minimum
    row removals, and ppm error — the profiling pass run before
    trusting a key for joins or dedup."""
    out = None
    for fd, table, lhs, rhs in _FD_SPECS:
        one = fd_audit(load_table(spark, sf_dir, table), fd, lhs, rhs)
        out = one if out is None else out.unionByName(one)
    return out


# --- Join-key skew audit ---------------------------------------------------
#
# The profiling pass behind every salting/AQE-skew decision (the
# operators/skew.py machinery assumes you KNOW the key is skewed): for
# each candidate join key, the share of rows carried by the heaviest
# key and the heaviest ten.  At 100 TB a key holding >0.1% of a fact
# table means one reducer gets >100 GB — this audit is how that is
# found BEFORE the join stalls, from one groupBy per key (map-side
# combined) plus a 10-row TakeOrdered heap, never a sort.
#
# Determinism at the top-10 boundary: ties in cnt make the CHOICE of
# rank-10 row engine-dependent, but every choice has the same cnt, so
# SUM(top-10 cnt) — the only thing reported — is tie-independent.

SKEW_FLAG_PPM = 1000  # heaviest key > 0.1% of rows -> flag

_SKEW_SPECS = [
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
]


def _skew_oracle_one(name: str, table: str, col: str) -> str:
    return f"""
    SELECT '{name}' AS key_col,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(cnt) * 1000000 // SUM(cnt) AS BIGINT) AS top1_ppm,
           CAST((SELECT SUM(cnt) FROM
                    (SELECT cnt FROM (SELECT {col} AS k, COUNT(*) AS cnt
                                      FROM {table} GROUP BY 1)
                     ORDER BY cnt DESC, k LIMIT 10))
                * 1000000 // SUM(cnt) AS BIGINT) AS top10_ppm,
           MAX(cnt) * 1000000 // SUM(cnt) > {SKEW_FLAG_PPM} AS skewed
    FROM (SELECT {col} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1)
    """


def join_key_skew(df: DataFrame, name: str, col: str) -> DataFrame:
    """One-row skew profile of a candidate join key."""
    from ..catalog import persist_scoped

    # the counts table feeds both the global fold and the top-10 heap —
    # a diamond; persist_scoped (never bare persist) bounds the cache.
    counts = persist_scoped(
        f"skew.counts.{name}",
        df.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("cnt")),
    )
    top10 = (
        counts.orderBy(F.desc("cnt"), F.asc("k"))
        .limit(10)
        .agg(F.sum("cnt").alias("t10"))
    )
    out = (
        counts.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("cnt").cast("bigint").alias("top1"),
        )
        .crossJoin(F.broadcast(top10))
        .selectExpr(
            f"'{name}' AS key_col",
            "n_rows",
            "n_keys",
            "CAST(top1 * 1000000 div n_rows AS BIGINT) AS top1_ppm",
            "CAST(t10 * 1000000 div n_rows AS BIGINT) AS top10_ppm",
            f"top1 * 1000000 div n_rows > {SKEW_FLAG_PPM} AS skewed",
        )
    )
    return out


@register(
    "dq_join_skew_audit",
    oracle=" UNION ALL ".join(
        _skew_oracle_one(n, t, c) for n, t, c in _SKEW_SPECS
    ),
)
def dq_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-join-key skew profile: rows, distinct keys,
    heaviest-key and heaviest-10 shares in ppm, and the salting flag
    (>0.1% on one key) — the measurement that justifies (or spares)
    the operators/skew.py two-phase treatment."""
    out = None
    for name, table, col in _SKEW_SPECS:
        one = join_key_skew(load_table(spark, sf_dir, table), name, col)
        out = one if out is None else out.unionByName(one)
    return out


# --- ANALYZE-style column statistics ---------------------------------------
#
# The `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` surface every
# cost-based optimizer feeds on: per-column row/null counts, exact NDV,
# and min/max.  One scan computes ALL columns' statistics (Spark plans
# the multi-COUNT(DISTINCT) via a single expand + two-level aggregate,
# DuckDB equivalently); the 1-row result broadcasts into five typed
# per-column rows.  Cross-engine min/max reprs are pinned per column
# type (ints as decimal strings, money as exact cents, dates as epoch
# days) — never a raw double's engine-formatted string.

_AN_COLS = [
    ("o_orderkey", "CAST({m}(o_orderkey) AS {S})", "o_orderkey"),
    ("o_custkey", "CAST({m}(o_custkey) AS {S})", "o_custkey"),
    ("o_orderstatus", "{m}(o_orderstatus)", "o_orderstatus"),
    ("o_totalprice_cents",
     "CAST({m}(CAST(floor(o_totalprice * 100) AS BIGINT)) AS {S})",
     "o_totalprice"),
    ("o_orderdate_day",
     "CAST({m}(epoch_us(CAST(o_orderdate AS TIMESTAMP)) {d} 86400000000)"
     " AS {S})",
     "o_orderdate"),
]


def _analyze_oracle() -> str:
    arms = []
    for name, mexpr, col in _AN_COLS:
        mn = mexpr.format(m="MIN", S="VARCHAR", d="//")
        mx = mexpr.format(m="MAX", S="VARCHAR", d="//")
        arms.append(f"""
        SELECT '{name}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
               {mn} AS min_repr, {mx} AS max_repr
        FROM orders""")
    return " UNION ALL ".join(arms)


@register("dq_analyze_stats", oracle=_analyze_oracle())
def dq_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer column statistics for orders: per-column rows, nulls,
    exact NDV, and type-pinned min/max representations — the ANALYZE
    pass a CBO consumes for join ordering and selectivity."""
    from ..catalog import persist_scoped

    o = load_table(spark, sf_dir, "orders")
    # ONE aggregate computes every column's statistics (Spark plans the
    # multi-COUNT(DISTINCT) via a single expand); the persisted 1-row
    # result then fans out into the five per-column output rows — the
    # first draft ran one aggregate PER column (5 table scans), which
    # is exactly the anti-pattern the module docstring warns about.
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for i, (_name, mexpr, col) in enumerate(_AN_COLS):
        mn = mexpr.format(m="MIN", S="STRING", d="div").replace(
            "epoch_us", "unix_micros"
        )
        mx = mexpr.format(m="MAX", S="STRING", d="div").replace(
            "epoch_us", "unix_micros"
        )
        aggs += [
            (F.count("*") - F.count(col)).cast("bigint").alias(f"nn_{i}"),
            F.countDistinct(col).cast("bigint").alias(f"ndv_{i}"),
            F.expr(mn).alias(f"mn_{i}"),
            F.expr(mx).alias(f"mx_{i}"),
        ]
    stats = persist_scoped("analyze.stats", o.agg(*aggs))
    out = None
    for i, (name, _mexpr, _col) in enumerate(_AN_COLS):
        one = stats.select(
            F.lit(name).alias("col_name"),
            "n_rows",
            F.col(f"nn_{i}").alias("n_nulls"),
            F.col(f"ndv_{i}").alias("ndv"),
            F.col(f"mn_{i}").alias("min_repr"),
            F.col(f"mx_{i}").alias("max_repr"),
        )
        out = one if out is None else out.unionByName(one)
    return out


# --- One-pass exact correlation matrix -------------------------------------
#
# The pairwise half of the ANALYZE story (dq_analyze_stats covers the
# per-column half): a CBO and every feature-engineering pipeline wants
# corr(x_i, x_j) for ALL column pairs, and the naive per-pair query
# rescans the table C(m,2) times.  One ungrouped aggregate computes
# every Σx_i, Σx_i², and Σx_i·x_j — m + m + C(m,2) integer carriers in
# a single scan with map-side partials — and the matrix assembles from
# the broadcast 1-row frame.  Exactness follows agg_corr_exact's
# policy: milli-unit ints keep every per-row product inside int64, the
# sums carry in decimal(38,0) (oracle HUGEINT), and the shipped
# carriers are the integral covariance/variance numerators scaled by
# n² — corr = cov/sqrt(vx·vy) is one float step for any consumer, so
# the engine-side contract stays bit-exact at every SF.

_CM_COLS = [
    ("qty", "CAST(floor(l_quantity * 1000) AS BIGINT)"),
    ("price", "CAST(floor(l_extendedprice * 1000) AS BIGINT)"),
    ("disc", "CAST(floor(l_discount * 1000) AS BIGINT)"),
    ("tax", "CAST(floor(l_tax * 1000) AS BIGINT)"),
]
_CM_PAIRS = [
    (i, j) for i in range(len(_CM_COLS)) for j in range(len(_CM_COLS)) if i < j
]


def _corr_matrix_oracle() -> str:
    sel = ", ".join(
        f"{expr} AS x{i}" for i, (_n, expr) in enumerate(_CM_COLS)
    )
    aggs = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for i in range(len(_CM_COLS)):
        aggs.append(f"CAST(SUM(x{i}) AS HUGEINT) AS s{i}")
        aggs.append(f"SUM(CAST(x{i} AS HUGEINT) * x{i}) AS q{i}")
    for i, j in _CM_PAIRS:
        aggs.append(f"SUM(CAST(x{i} AS HUGEINT) * x{j}) AS p{i}_{j}")
    arms = []
    for i, j in _CM_PAIRS:
        arms.append(f"""
        SELECT '{_CM_COLS[i][0]}' AS col_x, '{_CM_COLS[j][0]}' AS col_y,
               CAST(n AS BIGINT) AS n,
               CAST(n * p{i}_{j} - s{i} * s{j} AS VARCHAR) AS cov_num,
               CAST(n * q{i} - s{i} * s{i} AS VARCHAR) AS var_x_num,
               CAST(n * q{j} - s{j} * s{j} AS VARCHAR) AS var_y_num
        FROM s""")
    return (
        f"WITH v AS (SELECT {sel} FROM lineitem),\n"
        f"s AS (SELECT {', '.join(aggs)} FROM v)\n"
        + " UNION ALL ".join(arms)
    )


@register("dq_corr_matrix", oracle=_corr_matrix_oracle())
def dq_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson carriers for EVERY pair of four lineitem measures
    from ONE table scan: the single wide aggregate computes all sums,
    squares, and cross-products (map-side partial, 1-row result), and
    the six matrix entries assemble from the broadcast frame —
    rescanning per pair is what this op exists to avoid."""
    from ..catalog import persist_scoped

    li = load_table(spark, sf_dir, "lineitem")
    v = li.selectExpr(
        *[f"{expr} AS x{i}" for i, (_n, expr) in enumerate(_CM_COLS)]
    )
    aggs = [F.count("*").alias("n")]
    for i in range(len(_CM_COLS)):
        aggs.append(F.sum(f"x{i}").alias(f"s{i}"))
        aggs.append(
            F.sum(
                (F.col(f"x{i}") * F.col(f"x{i}")).cast("decimal(38,0)")
            ).alias(f"q{i}")
        )
    for i, j in _CM_PAIRS:
        aggs.append(
            F.sum(
                (F.col(f"x{i}") * F.col(f"x{j}")).cast("decimal(38,0)")
            ).alias(f"p{i}_{j}")
        )
    s = persist_scoped("corr_matrix.s", v.agg(*aggs))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    out = None
    for i, j in _CM_PAIRS:
        one = s.select(
            F.lit(_CM_COLS[i][0]).alias("col_x"),
            F.lit(_CM_COLS[j][0]).alias("col_y"),
            F.col("n").cast("bigint").alias("n"),
            (d("n") * d(f"p{i}_{j}") - d(f"s{i}") * d(f"s{j}"))
            .cast("string")
            .alias("cov_num"),
            (d("n") * d(f"q{i}") - d(f"s{i}") * d(f"s{i}"))
            .cast("string")
            .alias("var_x_num"),
            (d("n") * d(f"q{j}") - d(f"s{j}") * d(f"s{j}"))
            .cast("string")
            .alias("var_y_num"),
        )
        out = one if out is None else out.unionByName(one)
    return out


# --- Keyed pseudonymization with preserved joinability ---------------------
#
# The GDPR-pipeline primitive: replace a direct identifier with a
# deterministic keyed pseudonym so downstream analytics JOIN exactly
# as before while no raw identifier crosses the boundary.  Two
# requirements a 100 TB pipeline cannot compromise on, both certified
# here: (1) CONSISTENCY — the same salt+key yields the same pseudonym
# in every table, so join cardinalities are preserved bit-for-bit
# (the pytest replays the plaintext join and compares); (2) NO
# PASSTHROUGH — the output schema carries pseudonyms only.  md5 is the
# engine-portable keyed map (operators/scalars.py F8 note: Spark and
# DuckDB md5 agree; xxhash64 seeds do not); 64 pseudonym bits keep the
# birthday bound at ~n²/2⁶⁵ — at 10⁹ keys that is ~3%, so production
# would take all 128 bits, while the audit's distinct-count evidence
# column makes any collision VISIBLE rather than silent.  A salt
# rotation is a one-constant change that severs every old pseudonym —
# the revocation story.
PSEUDO_SALT = "r8-rotation-2026-08"
_PSEUDO = (
    "substr(md5(concat('" + PSEUDO_SALT + "-', CAST({k} AS STRING))), 1, 16)"
)


@register(
    "dq_pseudonymize_joinable",
    oracle=f"""
    WITH c AS (
        SELECT {_PSEUDO.format(k='c_custkey')} AS pid,
               c_mktsegment AS seg
        FROM customer
    ),
    o AS (
        SELECT {_PSEUDO.format(k='o_custkey')} AS pid,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT c.seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT c.pid) AS BIGINT) AS n_pseudonyms
    FROM o JOIN c ON c.pid = o.pid
    GROUP BY c.seg
    """,
)
def dq_pseudonymize_joinable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize c_custkey/o_custkey under one salted md5 map and
    run the segment-revenue join ON THE PSEUDONYMS — counts, sums, and
    the distinct-pseudonym evidence column must all reproduce the
    plaintext join's numbers (consistency), while neither side's
    output frame carries a raw key (no-passthrough, schema-asserted in
    the pytest)."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        f"{_PSEUDO.format(k='c_custkey')} AS pid",
        "c_mktsegment AS seg",
    )
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        f"{_PSEUDO.format(k='o_custkey')} AS pid",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    return (
        orders.join(cust, "pid")
        .groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.countDistinct("pid").cast("bigint").alias("n_pseudonyms"),
        )
    )
