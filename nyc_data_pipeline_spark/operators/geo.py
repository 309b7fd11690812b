"""Geospatial grid binning — hotspot cells over point events.

The reference's producer keys messages by coordinates —
`hash(lon_lat) % 1000` (reference kafka_producer.py:85-95) — but its
consumer never analyzes space.  This module is the analytical
completion: quantize points to fixed-width grid cells (the integer
form of geohash/H3 level-k binning) and rank hotspot cells — the NYC
pickup-heatmap query every taxi dashboard runs.

Spark-first: binning is pure arithmetic (codegen'd, no UDF), the
hotspot rollup is one map-side-combined groupBy on the cell id, and
the top-k is TakeOrderedAndProject (per-partition heaps, no global
sort).  At 100 TB the cell id is also the natural partition/bucket
key — co-locating by cell turns neighborhood queries into partition
pruning, and adjacent-cell joins (the geo equivalent of the
bin-and-residual interval join: emit each point into its cell + 8
neighbors for radius probes) stay equi-joins.

Cross-engine care: longitude is negative in NYC.  On BIGINT operands
Spark's `div` and DuckDB's `//` both truncate toward zero (measured —
DuckDB floors only in folklore; on DOUBLE operands its `//` doesn't
even divide integrally, it's plain `/`, which is what bit
dq_psi_bins_drift).  Truncation toward zero still makes negative
coordinates share cell 0 with positives (-0.3 and +0.3 both truncate
to 0), so cells are computed on a +180°-shifted value — strictly
positive, where truncation IS flooring and every cell is a proper
half-open interval — then shifted back.

The fixture has no coordinate columns, so points are synthesized
deterministically from event_id by Knuth multiplicative mixing into a
~NYC bounding box — pure integer arithmetic both engines reproduce
exactly (a stand-in, same role as multimodal's digest fingerprint;
swap in real lat/lon columns and nothing else changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# ~NYC box in micro-degrees; Knuth multipliers for the synth mix.
LAT0, LON0 = 40_500_000, -74_300_000
SPAN = 1_000_000  # one degree of spread
MIX_LAT, MIX_LON = 2_654_435_761, 2_246_822_519
CELL = 10_000  # 0.01-degree cells (~1.1 km N-S)
SHIFT = 180_000_000  # +180 deg: makes any longitude positive pre-division
TOP_CELLS = 20

# (a·b) mod m == ((a mod m)·(b mod m)) mod m: pre-reducing both factors
# keeps the product under 10^12 for ANY event_id — the raw
# event_id * MIX form overflows int64 once ids pass ~3.5e9, which a
# 100 TB event table exceeds.
_LAT = f"({LAT0} + ((event_id % {SPAN}) * {MIX_LAT % SPAN}) % {SPAN})"
_LON = f"({LON0} + ((event_id % {SPAN}) * {MIX_LON % SPAN}) % {SPAN})"


def _cells_sql(div_op: str) -> str:
    """Shared cell arithmetic; `div_op` is 'div' (Spark) or '//'
    (DuckDB) — applied only to non-negative shifted BIGINTs, where
    truncation is flooring and both engines agree."""
    return f"""
    WITH pts AS (
        SELECT CAST(floor(value * 1000000) AS BIGINT) AS v,
               {_LAT} AS lat_micro,
               {_LON} AS lon_micro
        FROM events
    ),
    cells AS (
        SELECT (lat_micro + {SHIFT}) {div_op} {CELL}
                   - {SHIFT // CELL} AS cell_lat,
               (lon_micro + {SHIFT}) {div_op} {CELL}
                   - {SHIFT // CELL} AS cell_lon,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS sum_micro
        FROM pts GROUP BY 1, 2
    )
    SELECT CAST(cell_lat AS BIGINT) AS cell_lat,
           CAST(cell_lon AS BIGINT) AS cell_lon, n, sum_micro
    FROM cells
    ORDER BY n DESC, cell_lat, cell_lon
    LIMIT {TOP_CELLS}
    """


@register("geo_grid_hotspots", oracle=_cells_sql("//"))
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_CELLS} hottest 0.01-degree grid cells by event count
    (ties broken by cell id), with exact micro-unit value totals —
    the pickup-heatmap aggregate over the reference's lon_lat keying
    idea, on synthesized-but-deterministic coordinates.  Runs the
    shared SQL text via spark.sql over the registered views (§3.3
    read path); only the integer-division spelling differs."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_cells_sql("div"))


R_MICRO = 20_000  # 0.02-degree planar radius for the probe
_CLAT = f"(lat_micro + {SHIFT}) DIVOP {CELL} - {SHIFT // CELL}"
_CLON = f"(lon_micro + {SHIFT}) DIVOP {CELL} - {SHIFT // CELL}"


def _radius_sql(div_op: str) -> str:
    clat = _CLAT.replace("DIVOP", div_op)
    clon = _CLON.replace("DIVOP", div_op)
    return f"""
    WITH pts AS (
        SELECT {_LAT} AS lat_micro, {_LON} AS lon_micro
        FROM events
    ),
    binned AS (
        SELECT lat_micro, lon_micro,
               {clat} AS cell_lat, {clon} AS cell_lon
        FROM pts
    ),
    hot AS (
        SELECT cell_lat, cell_lon, COUNT(*) AS n
        FROM binned GROUP BY 1, 2
        ORDER BY n DESC, cell_lat, cell_lon LIMIT 1
    ),
    center AS (
        SELECT cell_lat, cell_lon,
               cell_lat * {CELL} + {CELL // 2} AS c_lat,
               cell_lon * {CELL} + {CELL // 2} AS c_lon
        FROM hot
    )
    SELECT center.cell_lat, center.cell_lon,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN
                   (b.lat_micro - c_lat) * (b.lat_micro - c_lat)
                 + (b.lon_micro - c_lon) * (b.lon_micro - c_lon)
                 <= {R_MICRO * R_MICRO} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within
    FROM binned b JOIN center
      ON b.cell_lat BETWEEN center.cell_lat - 2 AND center.cell_lat + 2
     AND b.cell_lon BETWEEN center.cell_lon - 2 AND center.cell_lon + 2
    GROUP BY center.cell_lat, center.cell_lon
    """


@register("geo_radius_probe", oracle=_radius_sql("//"))
def geo_radius_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query around the hottest cell: candidates come from the
    5x5 cell ring (cell width {CELL} µ° < radius {R_MICRO} µ°, so ±2
    rings cover the disc), the exact membership is the INTEGER squared
    planar distance residual — the bin-and-residual pattern in 2-D
    (no haversine float in the predicate; at city scale planar µ° is
    the standard approximation, and a production variant scales lon by
    cos(lat) the same integer way).  The 1-row center broadcasts; the
    point stream joins on the ring predicate (a residual-able
    broadcast filter) — the corpus never shuffles.  Counts candidates
    vs true members: the ring's selectivity IS the measured pruning
    power of the grid index."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_radius_sql("div"))


# --- Point-in-polygon (ray casting, integer-exact) -------------------------
#
# Geofencing: count events inside an arbitrary polygon (a borough, a
# delivery zone).  The even-odd ray-casting rule needs, per edge, "does
# the rightward horizontal ray from P cross segment (A, B)?":
#
#     (ay > py) != (by > py)   AND   px < ax + (bx−ax)·(py−ay)/(by−ay)
#
# The division disappears by cross-multiplying with (by−ay); its SIGN
# is a property of the FIXED polygon edge, so each edge's inequality
# direction is resolved at plan-construction time in Python and the
# emitted predicate is pure BIGINT compare-and-multiply (products
# ≤ 10¹² on micro-degree coordinates).  Zero libm, zero UDF — one
# codegen'd scan, then a 10-row groupBy.  At 100 TB: prefilter by the
# polygon's bounding-box grid cells (the module's CELL id is the
# partition key), then run this exact test on the survivors.
PIP_POLY = [
    (40_700_000, -74_100_000),
    (41_200_000, -74_200_000),
    (41_400_000, -73_800_000),
    (41_000_000, -73_400_000),
    (40_600_000, -73_600_000),
]


def _pip_crossing_terms() -> str:
    terms = []
    n = len(PIP_POLY)
    for i in range(n):
        (ay, ax), (by, bx) = PIP_POLY[i], PIP_POLY[(i + 1) % n]
        dy = by - ay
        assert dy != 0, "horizontal edges need the half-open tie rule"
        # px < ax + (bx-ax)(py-ay)/dy  ×dy→  flip the < when dy < 0
        op = "<" if dy > 0 else ">"
        terms.append(
            f"CASE WHEN ({ay} > lat_micro) != ({by} > lat_micro)"
            f" AND (lon_micro - {ax}) * CAST({dy} AS BIGINT)"
            f" {op} CAST({bx - ax} AS BIGINT) * (lat_micro - {ay})"
            " THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


def _pip_sql(div_op: str) -> str:  # div_op unused; kept for symmetry
    return f"""
    WITH pts AS (
        SELECT event_type, {_LAT} AS lat_micro, {_LON} AS lon_micro
        FROM events
    ),
    tagged AS (
        SELECT event_type,
               ({_pip_crossing_terms()}) % 2 = 1 AS inside
        FROM pts
    )
    SELECT event_type, inside, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM tagged GROUP BY event_type, inside
    """


@register("geo_point_in_polygon", oracle=_pip_sql("//"))
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events inside/outside the fixed 5-vertex fence, by event type —
    integer ray casting with per-edge sign-resolved predicates."""
    return point_in_polygon(load_table(spark, sf_dir, "events"))


def point_in_polygon(ev: DataFrame) -> DataFrame:
    return (
        ev.selectExpr(
            "event_type", f"{_LAT} AS lat_micro", f"{_LON} AS lon_micro"
        )
        .selectExpr(
            "event_type",
            f"(({_pip_crossing_terms()}) % 2) = 1 AS inside",
        )
        .groupBy("event_type", "inside")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
