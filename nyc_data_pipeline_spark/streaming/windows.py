"""Event-time windowing with watermarks (T8/T9 — absent in the
reference, which only aggregates post-hoc in Postgres by wall-clock).

All three window shapes work identically on batch and streaming frames;
on streams the watermark bounds state: windows older than
(max event time - delay) are finalized and evicted, which is the memory
contract that survives unbounded 100 TB/day streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exprs import davg, dsum


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """T8: declare allowed lateness; rows later than the watermark are
    dropped from stateful aggregations (deterministic late-data policy
    vs the reference's none)."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(df: DataFrame, ts_col: str = "ts", width: str = "1 hour") -> DataFrame:
    """T9: non-overlapping event-time windows, per event_type."""
    return (
        df.groupBy(F.window(ts_col, width), "event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_avg(
    df: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """T9: overlapping windows (each event lands in width/slide
    windows)."""
    return (
        df.groupBy(F.window(ts_col, width, slide))
        .agg(F.count("*").alias("n"), davg("value").alias("avg_value"))
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias("window_start_us"),
            "n",
            "avg_value",
        )
    )


def stream_static_enrich(
    events: DataFrame, customers: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """J8: stream-static join — enrich each event with its customer's
    market segment, then tumbling-window aggregate per segment.

    The static side is broadcast, so on a stream every micro-batch
    joins map-side with zero shuffle and zero join state; this is the
    scale-correct shape for dimension enrichment (the streaming twin of
    the reference's per-row JDBC lookups it never had — it denormalized
    instead, reference database_handler.py:124-128).
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.join(F.broadcast(dim), "user_id", "inner")
        .groupBy(F.window(ts_col, width), "segment")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias("window_start_us"),
            "segment",
            "n",
            "total_value",
        )
    )


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "INTERVAL 1 HOUR"
) -> DataFrame:
    """J8 stream-stream join: purchases attributed to a prior click by
    the same user within `within`.

    On streams both sides carry watermarks and the time-bound predicate
    lets Spark evict join state once the watermark passes click_ts +
    within — state is bounded by (events in the window), not the stream
    length.  Identical plan semantics on batch frames, which is what
    the DuckDB oracle referees.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.expr(f"click_ts + {within}")),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_ts_us"),
    )


def session_counts(df: DataFrame, ts_col: str = "ts", gap: str = "30 minutes") -> DataFrame:
    """T9/T10: session windows — state merges as events arrive within
    `gap`; the streaming twin of operators/windows.py::sessionize_events.
    """
    return (
        df.groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end").cast("timestamp")).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )


def trending_topk(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    k: int = 3,
) -> DataFrame:
    """Trending detector: top-k event types per sliding window.

    Batch form of the standard streaming leaderboard.  In a live
    pipeline the windowed counts run under a watermark and the rank
    runs in foreachBatch over each emitted window (rank-over-agg is
    not expressible in a single append-mode stream) — that exact
    split is tested in tests/test_streaming.py.  The rank order
    (n desc, event_type asc) is total, so results are deterministic."""
    from pyspark.sql import Window as W

    counts = (
        df.groupBy(F.window(ts_col, width, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "event_type",
            "n",
        )
    )
    w = W.partitionBy("window_start_us").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
