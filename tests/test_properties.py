"""Property-based checks (hypothesis) for the reference's enrichment
semantics: for arbitrary trip inputs, the Spark enrichment chain must
equal a direct Python model of reference spark_consumer.py:63-78 —
including the quirks (inclusive-left category boundaries, otherwise(0)
not null, open-interval 0<duration<300 filter).

All arithmetic in the model mirrors the Spark expression order on
doubles, so equality is exact, no tolerance.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from nyc_data_pipeline_spark.operators.enrichment import enrich_trips

EPOCH = dt.datetime(2015, 1, 1, 0, 0, 0)

finite = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False, width=64
)
trip = st.tuples(
    finite,  # distance
    finite,  # fare
    finite,  # tip
    st.integers(min_value=-400 * 60, max_value=400 * 60),  # duration seconds
    st.integers(min_value=0, max_value=86_399),  # pickup offset in day
)

SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType()),
        T.StructField("pickup_dt", T.TimestampType()),
        T.StructField("dropoff_dt", T.TimestampType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
    ]
)


def _model(dist: float, fare: float, tip: float, dur_s: int):
    """Pure-Python reference semantics; None = row filtered out."""
    dur_min = dur_s / 60.0
    if not (dist >= 0 and fare >= 0 and 0 < dur_min < 300):
        return None
    speed = dist / (dur_min / 60.0) if (dur_min > 0 and dist > 0) else 0.0
    if dist <= 2.0:
        cat = "short"
    elif dist <= 10.0:
        cat = "medium"
    else:
        cat = "long"
    tip_pct = tip / fare * 100.0 if fare > 0 else 0.0
    return (dur_min, speed, cat, tip_pct)


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.lists(trip, min_size=1, max_size=40))
def test_enrichment_matches_python_model(spark, trips):
    rows = []
    for i, (dist, fare, tip, dur_s, off_s) in enumerate(trips):
        pickup = EPOCH + dt.timedelta(seconds=off_s)
        rows.append((i, pickup, pickup + dt.timedelta(seconds=dur_s), dist, fare, tip))
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.row_id: (r.duration_min, r.speed_mph, r.trip_category, r.tip_pct)
        for r in enrich_trips(df).collect()
    }
    want = {
        i: m
        for i, (dist, fare, tip, dur_s, _off) in enumerate(trips)
        if (m := _model(dist, fare, tip, dur_s)) is not None
    }
    assert set(got) == set(want)
    for i in want:
        for g, w in zip(got[i], want[i]):
            if isinstance(w, float):
                assert g == w or (math.isnan(g) and math.isnan(w)), (i, got[i], want[i])
            else:
                assert g == w, (i, got[i], want[i])


# ---------------------------------------------------------------------------
# Cross-engine portable text hash: for arbitrary ASCII-ish text, Spark's
# tokenize+hash expression chain and DuckDB's must agree token-for-token
# (every dedup/similarity operator builds on this identity).
# ---------------------------------------------------------------------------

import string

import duckdb
import pandas as pd

from nyc_data_pipeline_spark.functions.text import (
    duck_token_hashes,
    duck_tokens,
    spark_token_hashes,
    spark_tokens,
)

_TEXT_ALPHABET = string.ascii_letters + string.digits + string.punctuation + " \t\n"


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.text(alphabet=_TEXT_ALPHABET, max_size=60), min_size=1, max_size=10
    )
)
def test_token_hash_cross_engine(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    got = {
        r.doc_id: (list(r.toks), list(r.hashes))
        for r in df.selectExpr(
            "doc_id",
            f"{spark_tokens('text')} AS toks",
            f"{spark_token_hashes(spark_tokens('text'))} AS hashes",
        ).collect()
    }
    con = duckdb.connect()
    try:
        con.register("docs", pdf)
        want = {
            doc_id: (list(toks), list(hashes))
            for doc_id, toks, hashes in con.execute(
                f"SELECT doc_id, {duck_tokens('text')}, "
                f"{duck_token_hashes(duck_tokens('text'))} FROM docs"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want
