"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles join-side skew automatically
(session.py), but a pathologically hot *group key* (one key holding
10% of 100 TB) still funnels into a single reducer under a plain
groupBy when map-side partial aggregation can't keep up (e.g.
high-cardinality aggregation state).  The classic fix is explicit
salting:

  phase 1: groupBy(key, salt) — the hot key fans out over N_SALTS
           reducers, each holding 1/N of its rows;
  phase 2: groupBy(key) over the partial results — at most N_SALTS
           rows per key.

Both phases are ordinary hash aggregations; with exact-decimal sums
(exprs.py) the re-aggregation is bit-identical to the single-phase
plan, which is what the DuckDB oracle certifies.  The salt is
`pmod(hash(unique_col), N)` — deterministic, uniform, and computed
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import dec, sql_davg, sql_dsum
from ..registry import register

N_SALTS = 32


def salted_agg(df: DataFrame, key: str, value: str, salt_src: str) -> DataFrame:
    """Two-phase count/sum/avg of `value` per `key`, salted on
    `salt_src` (any roughly-unique column)."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(N_SALTS)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"),
        F.count(value).alias("_nv"),
        F.sum(dec(value)).alias("_s"),
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("total_value"),
        (F.sum("_s").cast("double") / F.sum("_nv")).alias("avg_value"),
    )


@register(
    "agg_skew_salted",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the (5-key, hence maximally
    hot) event_type column; oracle is the plain single-phase GROUP BY —
    proving salting changes the physical distribution, never the
    result."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(ev, "event_type", "value", "event_id")


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join: the big (events) side gets a deterministic
    salt from a unique column; the small (customer) side replicates
    across all {N_SALTS} salts; the join keys on (key, salt), so a
    pathologically hot user_id spreads over {N_SALTS} reducers instead
    of one.  This is the explicit form of what AQE's skew-join split
    does adaptively — needed when skew mitigation must be guaranteed
    up front (AQE splits only after a stage materializes its skewed
    partition).  SHUFFLE_HASH hint keeps it a shuffle join (a
    broadcast would bypass the exercise); the oracle is the plain
    join, proving salting never changes results."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    b = ev.withColumn(
        "_salt", F.pmod(F.hash(F.col("event_id")), F.lit(N_SALTS))
    )
    s = c.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    return (
        b.join(
            s.hint("shuffle_hash"),
            (F.col("user_id") == F.col("c_custkey"))
            & (b["_salt"] == s["_salt"]),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("segment")
    )


# --- The audit -> treatment decision loop ----------------------------------
#
# `dq_join_skew_audit` (pipelines/quality.py) MEASURES per-key skew and
# the functions above APPLY the two-phase treatment, but a production
# optimizer needs the connecting rule: given a measured key profile and
# the other side's size, pick the physical join strategy.  This is the
# decision a CBO makes from ANALYZE statistics (dq_analyze_stats is the
# per-column half of the same story); encoding it as one audited
# function turns the two demos into the feedback loop a 100 TB engine
# actually runs — stats in, strategy out, strategy golden-tested
# against the three regimes it must separate.

BROADCAST_BYTES = 64 * 1024 * 1024  # session.py autoBroadcastJoinThreshold


def choose_join_strategy(
    stats,
    small_side_bytes: int | None = None,
    broadcast_threshold: int = BROADCAST_BYTES,
    aqe_skew_join: bool = False,
) -> str:
    """Pick 'broadcast' | 'salted' | 'plain' from a `join_key_skew`
    profile of the BIG side's join key (dict or Row with `top1_ppm`,
    and optionally `skewed`) plus an estimate of the small side's
    bytes.

    Rule, in precedence order:
    1. small side fits the broadcast threshold -> 'broadcast' — the
       big side never shuffles, so key skew is irrelevant;
    2. the audit flagged the key (heaviest key > SKEW_FLAG_PPM of
       rows) -> 'salted', UNLESS the caller asserts AQE skew-join is
       active with thresholds sized to its partitions
       (`aqe_skew_join=True`) -> 'plain';
    3. otherwise -> 'plain' — the ordinary shuffle join, where salting
       would only add a pointless explode of the small side.

    Why rule 2 defers to a tuned AQE (measured, scripts/skew_probe.py
    at 8× / SCALE.md §21): AQE's skew split fans out ONLY the straggler
    partitions and replicates only the matching small-side partitions,
    while pre-salting pays the full dim × N_SALTS explode and salts
    every big-side row — on the 20%-hot and 50%-hot fixtures the tuned
    AQE join ran ~3× faster than the salted one.  But that win is
    conditional on AQE actually engaging: its default 256 MB
    skewed-partition threshold ignores stragglers smaller than that,
    and it can never split AGGREGATION state (the salted_agg path
    above stays necessary regardless).  The parameter defaults to
    False — "guarantee the fan-out" — because the decision helper
    cannot verify the runtime thresholds from stats alone."""
    from ..pipelines.quality import SKEW_FLAG_PPM

    if small_side_bytes is not None and small_side_bytes <= broadcast_threshold:
        return "broadcast"
    skewed = (
        stats["skewed"]
        if "skewed" in stats
        else stats["top1_ppm"] > SKEW_FLAG_PPM
    )
    if skewed and aqe_skew_join:
        return "plain"
    return "salted" if skewed else "plain"


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for a plan (the same number the
    broadcast-threshold rule consumes inside Spark)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def audited_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    salt_src: str,
    small_side_bytes: int | None = None,
) -> tuple[DataFrame, str]:
    """Measure, decide, apply: profile the big side's join key with
    `join_key_skew`, choose the strategy, and return (joined_df,
    strategy).  The salted arm is the `join_skew_salted` pattern —
    deterministic salt on the big side, explode-replicated small side,
    (key, salt) equi-join — which changes only the physical
    distribution, never the result.  `small_side_bytes` overrides
    Catalyst's size estimate (the usual CBO stats-hint escape hatch —
    Catalyst under-estimates computed columns, e.g. wide generated
    strings, at their type's defaultSize)."""
    from ..pipelines.quality import join_key_skew

    stats = join_key_skew(big, big_key, big_key).collect()[0]
    if small_side_bytes is None:
        small_side_bytes = estimated_bytes(small)
    strategy = choose_join_strategy(stats, small_side_bytes)
    if strategy == "broadcast":
        joined = big.join(
            F.broadcast(small), big[big_key] == small[small_key]
        )
    elif strategy == "salted":
        b = big.withColumn(
            "_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(N_SALTS))
        )
        s = small.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
        )
        joined = b.join(
            s.hint("shuffle_hash"),
            (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        ).drop("_salt")
    else:
        joined = big.join(small, big[big_key] == small[small_key])
    return joined, strategy
