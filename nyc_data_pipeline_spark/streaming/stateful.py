"""T10: custom stateful streaming — `applyInPandasWithState` — plus its
Arrow grouped-map batch twin.

The reference has no stateful operators at all (its only state is the
Kafka consumer offset, reference spark_consumer.py:130); per-user
analytics are recomputed post-hoc in Postgres.  This module holds the
engine's custom-state primitive: a per-user profile that accumulates
across micro-batches forever (running counts, first/last seen), i.e.
the thing event-time windows deliberately *cannot* express because it
never closes.

Scale contract:
- State is one fixed-size row per user key, partitioned by the
  groupBy hash across executors and checkpointed by the state store —
  growth is O(#distinct users), independent of stream length.
- All inputs are pre-projected JVM-side to integers (`unix_micros`,
  boolean flag), so the Arrow hop moves 3 narrow int columns, not raw
  events.
- Outputs are integer-only, making results bit-exact across engines
  and arrival orders (no float-sum order sensitivity).

The batch twin runs the same per-user reduction as a grouped-map
`applyInPandas` (one Arrow batch per user group) and is registered with
a DuckDB oracle; tests/test_streaming.py replays the events fixture
through `applyInPandasWithState` and asserts the final state equals the
batch twin — the streaming guarantee, demonstrated not assumed.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_table
from ..registry import register

OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, n_purchase BIGINT, "
    "first_ts_us BIGINT, last_ts_us BIGINT, span_us BIGINT"
)
STATE_SCHEMA = "n BIGINT, n_purchase BIGINT, first_us BIGINT, last_us BIGINT"


def project_user_events(events: DataFrame) -> DataFrame:
    """JVM-side pre-projection: narrow integer columns only cross Arrow."""
    return events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("event_type") == "purchase").cast("long").alias("is_purchase"),
    )


def _profile_row(user_id: Any, n: int, n_purchase: int, first_us: int, last_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "n_purchase": [n_purchase],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
            "span_us": [last_us - first_us],
        }
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin: grouped-map applyInPandas (one Arrow batch per user)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _profile_row(
            pdf["user_id"].iloc[0],
            len(pdf),
            int(pdf["is_purchase"].sum()),
            int(pdf["us"].min()),
            int(pdf["us"].max()),
        )

    return project_user_events(events).groupBy("user_id").applyInPandas(fn, OUT_SCHEMA)


def user_profile_stateful(stream: DataFrame) -> DataFrame:
    """Streaming: per-user state updated every micro-batch, never closed.

    Emits the updated profile row for each user seen in the trigger;
    downstream (memory/table sink in update mode) the latest row per
    user is the live profile.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, n_purchase, first_us, last_us = state.get
        else:
            n, n_purchase, first_us, last_us = 0, 0, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            n_purchase += int(pdf["is_purchase"].sum())
            lo, hi = int(pdf["us"].min()), int(pdf["us"].max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, n_purchase, first_us, last_us))
        yield _profile_row(key[0], n, n_purchase, first_us, last_us)

    return (
        project_user_events(stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )


TTL_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, status STRING"
TTL_STATE_SCHEMA = "n BIGINT, last_us BIGINT"
TTL_MS = 3_600_000  # evict a user 1h (event time) after their last event


def user_counts_with_ttl(stream: DataFrame) -> DataFrame:
    """Bounded-state per-key counting on an unbounded keyspace: each
    user's state carries an event-time TTL; when the watermark passes
    last_seen + TTL the state times out, emits a final ("evicted") row,
    and is removed from the store.  This is the pattern that keeps
    per-key state finite when the keyspace grows forever (the forever-
    profile in user_profile_stateful deliberately never evicts; this is
    its production complement).  Requires withWatermark upstream."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "status": ["evicted"]}
            )
            return
        n, last_us = (state.get if state.exists else (0, 0))
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            last_us = max(last_us, int(pdf["us"].max()))
        state.update((n, last_us))
        # Clamp above the current watermark: late-arriving data for an
        # almost-expired key would otherwise compute a timeout in the
        # past, which the state store rejects.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + TTL_MS, wm + 1))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "status": ["live"]}
        )

    # Keep the watermarked ts column through the projection — dropping
    # it would strip the watermark EventTimeTimeout requires.
    proj = stream.select(
        "user_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return proj.groupBy("user_id").applyInPandasWithState(
        update,
        TTL_OUT_SCHEMA,
        TTL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


@register(
    "stateful_user_profile",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           MIN(epoch_us(ts)) AS first_ts_us,
           MAX(epoch_us(ts)) AS last_ts_us,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
    FROM events
    GROUP BY user_id
    """,
)
def stateful_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 batch twin: per-user lifetime profile via Arrow grouped-map.
    (Built-in agg would beat this plan — the registration exists to
    certify the Arrow grouped-map path against the oracle; the
    streaming value is in user_profile_stateful.)"""
    return user_profile_batch(load_table(spark, sf_dir, "events"))


# --- streaming CUSUM drift (T10 companion of events_cusum_drift) -----------

CUSUM_OUT_SCHEMA = (
    "event_type STRING, event_id BIGINT, cusum_pos BIGINT, cusum_neg BIGINT"
)
CUSUM_STATE_SCHEMA = "run BIGINT, run_min BIGINT, run_max BIGINT"


def project_cusum_events(events: DataFrame) -> DataFrame:
    """JVM-side pre-projection for the CUSUM state op: 3 narrow int
    columns cross Arrow (the stateful-op input contract above)."""
    return events.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("y"),
    )


def cusum_stateful(stream: DataFrame, targets: dict[str, int]) -> DataFrame:
    """Streaming CUSUM: per-key (run, run_min, run_max) carried across
    micro-batches — the mergeable-state form of the batch closed-form
    windows (operators/analytics.events_cusum_drift), emitting per-row
    drift statistics as events arrive.

    `targets` pins the in-control mean per key from a reference period
    (the production calibration; the batch query's self-referential
    mean is its demo shortcut).  State is 3 ints per key forever —
    O(#keys), stream-length independent.  Within a batch rows fold in
    (us, event_id) order (vectorized cumsum/accumulate, no Python
    per-row loop); cross-batch correctness requires per-key ordered
    arrival, which the file-replay test provides via time-partitioned
    files + maxFilesPerTrigger=1 — the Kafka equivalent is per-key
    partition ordering."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        run, run_min, run_max = state.get if state.exists else (0, 0, 0)
        t = targets[key[0]]
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["us", "event_id"])
            s = run + np.cumsum(pdf["y"].to_numpy(dtype="int64") - t)
            rmin = np.minimum(np.minimum.accumulate(s), run_min)
            rmax = np.maximum(np.maximum.accumulate(s), run_max)
            yield pd.DataFrame(
                {
                    "event_type": key[0],
                    "event_id": pdf["event_id"].to_numpy(dtype="int64"),
                    "cusum_pos": s - rmin,
                    "cusum_neg": rmax - s,
                }
            )
            run = int(s[-1])
            run_min = int(rmin[-1])
            run_max = int(rmax[-1])
        state.update((run, run_min, run_max))

    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        CUSUM_OUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
