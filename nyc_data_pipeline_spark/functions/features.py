"""Hashed feature export — the hashing trick for training pipelines.

The last step before a table leaves the warehouse for a trainer is
turning categoricals into fixed-width numeric features without a
vocabulary build: Weinberger et al.'s feature hashing maps each
("column=value") string to slot h(x) mod D with a sign bit from an
independent hash bit, so collisions cancel in expectation instead of
biasing.  No fitted state, no dictionary shuffle — which is why it is
THE encoder for 100 TB categorical data: one codegen'd scan, the
output is bounded at |rows|·|features|, and re-runs are reproducible
(the hash IS the vocabulary).

Emitted in long form (row key, slot, value) — the natural layout for
a sparse-matrix loader, and exactly representable for the oracle (a
dense array column would carry 64 mostly-zero cells per row).  The
char-fold hash is the repo's portable polynomial (functions/text.py),
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .text import HASH_MOD

FH_DIM = 64

_SP_STRHASH = (
    "aggregate(filter(split({s}, ''), c -> c != ''),"
    f" CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % {HASH_MOD})"
)
_DK_STRHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(string_split({s}, ''),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    f" (a, b) -> (a * 31 + b) % {HASH_MOD})"
)

_FEATS = [
    "'prio=' || o_orderpriority",
    "'status=' || o_orderstatus",
    "'month=' || CAST(month(o_orderdate) AS VARCHAR)",
]


def _slot_sign(h: str, idiv: str) -> tuple[str, str]:
    return f"({h}) % {FH_DIM}", f"1 - 2 * ((({h}) {idiv} {FH_DIM}) % 2)"


@register(
    "ml_feature_hashing",
    oracle=f"""
    WITH feats AS (
        SELECT o_orderkey, unnest([{", ".join(_FEATS)}]) AS f
        FROM orders
    ),
    hashed AS (
        SELECT o_orderkey, {_DK_STRHASH.format(s='f')} AS h FROM feats
    )
    SELECT o_orderkey,
           CAST({_slot_sign('h', '//')[0]} AS BIGINT) AS slot,
           CAST(SUM({_slot_sign('h', '//')[1]}) AS BIGINT) AS val
    FROM hashed GROUP BY o_orderkey, slot
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hashed_features(load_table(spark, sf_dir, "orders"))


def hashed_features(orders: DataFrame) -> DataFrame:
    """(o_orderkey, slot, val): signed hashed-feature bag, D=64.

    The char-fold hash is an interpreted higher-order expression —
    folding every row's feature strings was the whole cost of this
    operator (measured 3.2 s in one scan task at sf0.1).  But all
    three features draw from tiny domains (order priority x status x
    month-of-date ≈ 20 distinct strings at any table size), so the
    fold belongs on the DISTINCT feature values: build the (feature →
    slot, sign) dictionary with one aggregate, broadcast it back onto
    the exploded rows, and the per-row path is pure codegen (guide §8:
    make heavy decisions on a lightweight proxy).  Bit-identical to
    folding per row — the hash depends only on the string."""
    sp_feats = [f.replace("AS VARCHAR", "AS STRING") for f in _FEATS]
    slot, sign = _slot_sign("h", "div")
    feats = orders.selectExpr(
        "o_orderkey",
        f"explode(array({', '.join(sp_feats)})) AS f",
    )
    dic = (
        feats.select("f")
        .distinct()
        .selectExpr("f", f"{_SP_STRHASH.format(s='f')} AS h")
        .selectExpr(
            "f",
            f"CAST({slot} AS BIGINT) AS slot",
            f"CAST({sign} AS BIGINT) AS sgn",
        )
    )
    return (
        feats.join(F.broadcast(dic), "f")
        .groupBy("o_orderkey", "slot")
        .agg(F.sum("sgn").cast("bigint").alias("val"))
    )
