"""Oracle-checked batch twins of the streaming operators.

Structured Streaming's core guarantee is that a streaming query is the
same Catalyst plan as its batch equivalent, executed incrementally.
These registrations run the *identical* windowing functions from
streaming/windows.py over the batch events table so DuckDB can referee
the semantics; tests/test_streaming.py then runs the same functions
under readStream and asserts stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import sql_davg, sql_dsum
from ..registry import register
from .windows import (
    click_purchase_join,
    session_counts,
    sliding_avg,
    stream_static_enrich,
    trending_topk,
    tumbling_counts,
)


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 tumbling windows (epoch-aligned, so Spark's window() and
    DuckDB's time_bucket agree on boundaries)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding_windows",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)
                    - k * INTERVAL '30 minutes') AS window_start_us,
           COUNT(*) AS n,
           {sql_davg('value')} AS avg_value
    FROM events, (VALUES (0), (1)) AS offsets(k)
    GROUP BY 1
    """,
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 sliding windows (1 h width / 30 min slide): every event lands
    in exactly width/slide = 2 windows; the oracle reproduces that by
    cross-joining each row with offsets {0,1} slides back."""
    return sliding_avg(load_table(spark, sf_dir, "events"))


@register(
    "stream_session_windows",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9/T10 session windows (30-min gap).  Spark's session_window end
    is last-event-ts + gap; the lag/cumsum oracle reproduces exactly
    that merge semantics."""
    return session_counts(load_table(spark, sf_dir, "events"))


@register(
    "join_stream_static",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', e.ts)) AS window_start_us,
           c.c_mktsegment AS segment,
           COUNT(*) AS n,
           {sql_dsum('e.value')} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def join_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 stream-static join: broadcast-dim enrichment + tumbling
    windows; tests/test_streaming.py runs the identical function with
    the events side under readStream."""
    return stream_static_enrich(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


@register(
    "join_stream_stream",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(c.ts) AS click_ts_us,
           epoch_us(p.ts) AS purchase_ts_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def join_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 stream-stream join, batch twin: purchase attribution to a
    prior click within 1h; tests/test_streaming.py runs the identical
    function with both sides under readStream + watermarks."""
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


_WIRE_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


@register(
    "parse_wire_batch",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value,
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def parse_wire_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 batch twin of the Kafka wire hop (reference
    spark_consumer.py:61-62): serialize each event to a JSON message
    IN-PLAN (to_json over a struct — exactly what the producer's
    per-row dict→JSON does, kafka_producer.py:51-65), then recover
    typed columns via the engine's `parse_wire_records`
    (from_json + `data.*` flatten) and parse the carried timestamp
    string.  A hash match against the raw table certifies the full
    serialize→parse chain is lossless, including microsecond
    timestamps (the wire carries strings; default millisecond formats
    would silently truncate).  Stateless projection → zero shuffles,
    embarrassingly parallel at any scale."""
    from pyspark.sql import types as T

    from .ingest import parse_wire_records

    wire_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts_str", T.StringType()),
        ]
    )
    ev = load_table(spark, sf_dir, "events")
    wire = ev.select(
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.date_format(
                    F.col("ts").cast("timestamp"), _WIRE_TS_FORMAT
                ).alias("ts_str"),
            )
        ).alias("value")
    )
    parsed = parse_wire_records(wire, wire_schema)
    return parsed.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(
            F.to_timestamp(F.col("ts_str"), _WIRE_TS_FORMAT)
        ).alias("ts_us"),
    )


@register(
    "stream_dedup_replay",
    oracle="""
    SELECT DISTINCT event_id, user_id
    FROM (
        SELECT event_id, user_id FROM events
        UNION ALL
        SELECT event_id, user_id FROM events WHERE event_id % 10 = 0
    )
    """,
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/T10: at-least-once replay (10% of events delivered twice)
    healed by key dedup — the batch shape of
    dropDuplicatesWithinWatermark and the fix for the reference's
    duplicate-accepting JDBC sink."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    replayed = ev.filter(F.col("event_id") % 10 == 0)
    return ev.unionByName(replayed).dropDuplicates(["event_id"])


@register(
    "stream_trending_topk",
    oracle="""
    WITH counts AS (
        SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)
                        - k * INTERVAL '30 minutes') AS window_start_us,
               event_type, COUNT(*) AS n
        FROM events, (VALUES (0), (1)) AS offsets(k)
        GROUP BY 1, 2
    )
    SELECT window_start_us, event_type, n, rank FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY window_start_us
                   ORDER BY n DESC, event_type) AS INTEGER) AS rank
        FROM counts
    ) WHERE rank <= 3
    """,
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 trending leaderboard: top-3 event types per 1 h window
    sliding every 30 min (windowed count + deterministic rank; the
    live split — watermarked counts, rank in foreachBatch — runs in
    tests/test_streaming.py)."""
    return trending_topk(load_table(spark, sf_dir, "events"))


@register(
    "stream_cdc_upsert",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, n_chars, 0 AS version, 'b' AS op FROM documents
    ),
    b1 AS (
        SELECT doc_id, 'recrawl1' AS lang, n_chars + 1 AS n_chars,
               1 AS version, 'u' AS op
        FROM documents WHERE doc_id % 3 = 0
    ),
    b2 AS (
        SELECT doc_id, lang, n_chars, 2 AS version, 'd' AS op
        FROM documents WHERE doc_id % 4 = 0
    ),
    b3 AS (
        SELECT doc_id, 'recrawl3' AS lang, n_chars + 3 AS n_chars,
               3 AS version, 'u' AS op
        FROM documents WHERE doc_id % 6 = 0
    ),
    merged AS (
        SELECT * FROM (
            SELECT * FROM base UNION ALL SELECT * FROM b1
            UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
        )
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY version DESC
        ) = 1
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(version AS INT) AS version
    FROM merged WHERE op <> 'd'
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC materialization: three change waves folded into
    the corpus ONE BATCH AT A TIME (state = merge(state, batch), the
    exact foreachBatch loop of the streaming pipeline — see
    tests/test_streaming.py::test_stream_cdc_upsert_equals_batch for
    the readStream form).  The oracle applies all waves in ONE merge:
    a hash match proves the fold law — applying versioned changes
    incrementally or at once yields the same table, which is what
    makes streaming CDC restartable/replayable (at-least-once wave
    redelivery collapses to the same fixpoint).  Wave 3 re-inserts
    some docs wave 2 deleted (doc_id % 12) — the resurrect case.

    The fold keeps TOMBSTONES in state (merge_fold_state) and drops
    them only in the final projection — a delete winner must keep
    shadowing its key so a stale lower-version update redelivered after
    it cannot resurrect the row (tests/test_pipelines.py pins exactly
    that replay order).

    Scale: each fold step is one window shuffle on the merge key over
    state + batch; with the state bucketed on doc_id only the (small)
    batch moves per wave."""
    from ..pipelines.cdc import finalize_merge, merge_fold_state

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = d.withColumn("version", F.lit(0)).withColumn("op", F.lit("b"))
    waves = [
        d.where(F.col("doc_id") % 3 == 0)
        .withColumn("lang", F.lit("recrawl1"))
        .withColumn("n_chars", F.col("n_chars") + 1)
        .withColumn("version", F.lit(1))
        .withColumn("op", F.lit("u")),
        d.where(F.col("doc_id") % 4 == 0)
        .withColumn("version", F.lit(2))
        .withColumn("op", F.lit("d")),
        d.where(F.col("doc_id") % 6 == 0)
        .withColumn("lang", F.lit("recrawl3"))
        .withColumn("n_chars", F.col("n_chars") + 3)
        .withColumn("version", F.lit(3))
        .withColumn("op", F.lit("u")),
    ]
    state = base
    for wave in waves:
        state = merge_fold_state(state, wave)
    return finalize_merge(state).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("version").cast("int").alias("version"),
    )
