"""Zone-map file skipping: manifest min/max stats prune data files
BEFORE the scan — the lakehouse metadata layer, built on plain parquet.

Delta/Iceberg's practical read-side win at 100 TB is not the format —
it is FILE SKIPPING: every data file carries per-column min/max stats
in the table metadata, and a predicate eliminates whole files without
opening them.  The jar-gated formats are descoped here
(pipelines/cdc.py:22-29), but the mechanism is buildable from first
principles, completing the story started by sources/timetravel.py
(manifest-pinned versions) and sources/scans.py (partitioned layouts):

- the WRITE side clusters the table on a sort column via the shared
  order-aligned range bucketing (plans/two_phase.py — the same
  phase-1 primitive the rank/skyline/ABC operators use), one file per
  bucket, and records per-FILE min/max of the cluster column (and any
  other audited columns) in a JSON manifest;
- the READ side evaluates the predicate against the MANIFEST, reads
  only files whose [min, max] interval overlaps, and applies the
  residual row filter to just those files.

Crucially the file paths are opaque bucket ids, NOT predicate-readable
partition values — the pruning power comes from the stats in the
metadata layer, exactly like a lakehouse data-skipping index and
unlike Hive-style partition-path pruning (which sources/scans.py
already covers).  The oracle proves the pruning LOGIC, not just the
data: it recomputes the bucket assignment rule, derives each file's
min/max from raw rows, and predicts `files_scanned`/`files_total`
independently — if the engine scanned a file it should have skipped
(or vice versa), the hash breaks.

Scale shape: the write is one range-bucketed shuffle (linear, the
two_phase discipline); the manifest is O(#files) driver-side KBs; a
pruned read costs only the overlapping files — at 100 TB with
date-clustered files, a one-month predicate reads ~1/84th of the
corpus and the planner never lists the rest.

Reference parity: extends database_handler.py:167-180 (B-tree indexes
on query columns — the reference's only scan-acceleration surface)
into the distributed-layout equivalent; SURVEY §2 S8 family.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.two_phase import range_buckets
from ..registry import register
from .scans import scratch_dir

ZM_FILES = 8
_US_PER_DAY = 86_400_000_000

# The demo predicate: an ~18-month slice of the 7-year order history —
# wide enough to span file boundaries, narrow enough that most files
# must be skipped.  Days since epoch, inclusive.
ZM_LO_DAY = 9131   # 1995-01-01
ZM_HI_DAY = 9677   # 1996-06-30


def write_zone_mapped(
    df: DataFrame, table_dir: str, day_col: str, stat_cols: list[str]
) -> dict:
    """Cluster `df` into ZM_FILES range buckets of `day_col` (one data
    file per bucket, written under an opaque zb=<id> path), and publish
    a manifest with per-file row counts and min/max stats for `day_col`
    plus every `stat_cols` entry.  Returns the manifest dict."""
    b = range_buckets(df, day_col, ZM_FILES).withColumnRenamed(
        "bucket", "zb"
    ).drop("lo", "hi")
    data_dir = os.path.join(table_dir, "data")
    (
        # hash-repartition on the bucket id so each bucket's rows land
        # in one task -> exactly one file per zb=<id> directory.
        b.repartition(F.col("zb"))
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(data_dir)
    )
    stats = (
        b.groupBy("zb")
        .agg(
            F.count("*").alias("n_rows"),
            *[
                agg(c).alias(f"{name}_{c}")
                for c in [day_col, *stat_cols]
                for name, agg in (("min", F.min), ("max", F.max))
            ],
        )
        .collect()
    )
    manifest = {
        "files": {
            str(r["zb"]): {
                "path": os.path.join(data_dir, f"zb={r['zb']}"),
                "n_rows": r["n_rows"],
                "stats": {
                    c: [r[f"min_{c}"], r[f"max_{c}"]]
                    for c in [day_col, *stat_cols]
                },
            }
            for r in stats
        },
        "cluster_col": day_col,
    }
    os.makedirs(table_dir, exist_ok=True)
    with open(os.path.join(table_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def read_pruned(
    spark: SparkSession, table_dir: str, col: str, lo, hi
) -> tuple[DataFrame | None, int, int]:
    """Manifest-driven pruned read: open ONLY the files whose [min,max]
    interval for `col` overlaps [lo, hi]; the caller applies the
    residual row predicate.  Returns (df_or_None, files_scanned,
    files_total)."""
    with open(os.path.join(table_dir, "manifest.json")) as f:
        manifest = json.load(f)
    files = manifest["files"]
    keep = [
        meta["path"]
        for _zb, meta in sorted(files.items())
        if meta["stats"][col][0] <= hi and meta["stats"][col][1] >= lo
    ]
    if not keep:
        return None, 0, len(files)
    df = spark.read.option(
        "basePath", os.path.join(table_dir, "data")
    ).parquet(*keep)
    return df, len(keep), len(files)


@register(
    "src_zone_map_pruning",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_US_PER_DAY}
                   AS day
        FROM orders
    ),
    rng AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM base),
    b AS (
        SELECT base.*,
               LEAST((day - rng.lo) * {ZM_FILES} // (rng.hi - rng.lo + 1),
                     {ZM_FILES - 1}) AS zb
        FROM base, rng
    ),
    file_stats AS (
        SELECT zb, MIN(day) AS f_lo, MAX(day) AS f_hi
        FROM b GROUP BY zb
    ),
    pruned AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM file_stats)
                   AS files_total
        FROM file_stats
        WHERE f_lo <= {ZM_HI_DAY} AND f_hi >= {ZM_LO_DAY}
    )
    SELECT CAST(b.zb AS BIGINT) AS zb,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(b.cents) AS BIGINT) AS sum_cents,
           p.files_scanned, p.files_total
    FROM b JOIN file_stats fs USING (zb), pruned p
    WHERE fs.f_lo <= {ZM_HI_DAY} AND fs.f_hi >= {ZM_LO_DAY}
      AND b.day BETWEEN {ZM_LO_DAY} AND {ZM_HI_DAY}
    GROUP BY b.zb, p.files_scanned, p.files_total
    """,
)
def src_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders date-clustered into {ZM_FILES} files with a
    min/max-stats manifest, then answer an 18-month revenue slice
    reading ONLY the files the manifest says can match.  Output: the
    per-file aggregate of matching rows plus the files_scanned /
    files_total evidence; the oracle re-derives the clustering rule and
    the per-file stats from raw rows, so both the layout and the
    pruning decision are hash-checked."""
    table_dir = scratch_dir("zonemap", sf_dir)
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("day"),
    )
    write_zone_mapped(base, table_dir, "day", ["cents"])
    df, n_scanned, n_total = read_pruned(
        spark, table_dir, "day", ZM_LO_DAY, ZM_HI_DAY
    )
    return (
        df.filter(F.col("day").between(ZM_LO_DAY, ZM_HI_DAY))
        .groupBy(F.col("zb").cast("bigint").alias("zb"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .withColumn("files_scanned", F.lit(n_scanned).cast("bigint"))
        .withColumn("files_total", F.lit(n_total).cast("bigint"))
    )


# --- Per-file Bloom filters: point-lookup file skipping --------------------
#
# Zone maps (above) prune RANGE predicates on the cluster column; an
# equality probe on a high-cardinality column that is NOT the sort key
# (the "find this order id" lookup) overlaps every file's min/max and
# zone maps prune nothing.  The lakehouse answer is a per-file BLOOM
# bitset in the metadata layer (Parquet bloom filters, Delta/Iceberg
# file stats): k hash bits per key, a probe opens only files whose
# bitset has ALL the probe's bits set.  False positives cost one extra
# file read; false negatives are impossible.
#
# The bitset arithmetic is plain modular hashing, so the DuckDB oracle
# can recompute every file's bloom bits from raw rows and predict the
# exact file-skip decision — including the false positives — making
# the skipping LOGIC hash-checked, not just the returned rows.
#
# SIZING is scale-adaptive, not a constant: bits = BLOOM_BITS_PER_KEY ×
# (rows ÷ files) — a fixed width saturates as the table grows and the
# filter silently admits everything (the r6 CMS width-sizing lesson; a
# 4096-bit draft of this op measured 8/8 files admitted at sf0.1).
# Both engines derive the width from the same COUNT(*), so the oracle
# stays exact at every SF.

BLOOM_BITS_PER_KEY = 16  # with 2 hashes: 1/8 fill, ~1.6% FP per probe
BLOOM_HASHES = [(1_804_289_383, 846_930_886), (1_681_692_777, 1_714_636_915)]
# Probe keys: three present at every SF (low orderkeys exist in the
# TPC-H-shaped fixtures) and three absent (far beyond any fixture's
# max orderkey).
BLOOM_PROBES = [1, 7, 32, 10**14 + 1, 10**14 + 2, 10**14 + 3]


def bloom_width(n_rows: int) -> int:
    """Deterministic width rule shared with the oracle:
    BLOOM_BITS_PER_KEY × (rows ÷ files + 1)."""
    return BLOOM_BITS_PER_KEY * (n_rows // ZM_FILES + 1)


def _bloom_pos_sql(key: str, a: int, b: int, bits) -> str:
    return f"(({key} % 2147483647) * {a} + {b}) % 2147483647 % {bits}"


def write_bloom_manifest(
    df: DataFrame, table_dir: str, key_col: str
) -> dict:
    """Extend the zone-mapped layout with per-file bloom bitsets on
    `key_col`: bucket exactly as write_zone_mapped's range clustering
    did, then record each file's set-bit list (sorted, deduplicated) in
    a bloom manifest."""
    b = range_buckets(df, "day", ZM_FILES).withColumnRenamed(
        "bucket", "zb"
    ).drop("lo", "hi")
    n_bits = bloom_width(df.count())
    pos_cols = [
        F.expr(_bloom_pos_sql(key_col, a, h, n_bits)).alias(f"p{j}")
        for j, (a, h) in enumerate(BLOOM_HASHES)
    ]
    bits = (
        b.select("zb", *pos_cols)
        .selectExpr(
            "zb",
            "explode(array(" + ", ".join(
                f"p{j}" for j in range(len(BLOOM_HASHES))
            ) + ")) AS pos",
        )
        .distinct()
        .groupBy("zb")
        .agg(F.sort_array(F.collect_set("pos")).alias("bits"))
        .collect()
    )
    manifest = {
        "bits": n_bits,
        "files": {str(r["zb"]): list(r["bits"]) for r in bits},
    }
    os.makedirs(table_dir, exist_ok=True)
    with open(os.path.join(table_dir, "bloom.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def bloom_probe_files(manifest: dict, key: int) -> list[str]:
    """File ids whose bloom bitset admits `key` (all hash bits set)."""
    P = 2_147_483_647
    want = [
        ((key % P) * a + b) % P % manifest["bits"]
        for a, b in BLOOM_HASHES
    ]
    return [
        zb
        for zb, bits in sorted(manifest["files"].items())
        if all(w in set(bits) for w in want)
    ]


def _bloom_oracle() -> str:
    probes = ", ".join(f"({k})" for k in BLOOM_PROBES)
    p0 = _bloom_pos_sql("o_orderkey", *BLOOM_HASHES[0], "bv.bits")
    p1 = _bloom_pos_sql("o_orderkey", *BLOOM_HASHES[1], "bv.bits")
    q0 = _bloom_pos_sql("p.probe", *BLOOM_HASHES[0], "bv.bits")
    q1 = _bloom_pos_sql("p.probe", *BLOOM_HASHES[1], "bv.bits")
    return f"""
    WITH base AS (
        SELECT o_orderkey,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_US_PER_DAY}
                   AS day
        FROM orders
    ),
    bv AS (
        SELECT {BLOOM_BITS_PER_KEY} * (COUNT(*) // {ZM_FILES} + 1)
                   AS bits
        FROM base
    ),
    rng AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM base),
    b AS (
        SELECT base.o_orderkey,
               LEAST((day - rng.lo) * {ZM_FILES} // (rng.hi - rng.lo + 1),
                     {ZM_FILES - 1}) AS zb
        FROM base, rng
    ),
    bits AS (
        SELECT DISTINCT zb, pos FROM (
            SELECT zb, {p0} AS pos FROM b, bv
            UNION ALL
            SELECT zb, {p1} FROM b, bv
        )
    ),
    probes(probe) AS (VALUES {probes}),
    admit AS (
        SELECT p.probe, f.zb
        FROM probes p, (SELECT DISTINCT zb FROM b) f, bv
        WHERE EXISTS (SELECT 1 FROM bits x
                      WHERE x.zb = f.zb AND x.pos = {q0})
          AND EXISTS (SELECT 1 FROM bits x
                      WHERE x.zb = f.zb AND x.pos = {q1})
    ),
    hits AS (
        SELECT p.probe, CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_rows
        FROM probes p LEFT JOIN b ON b.o_orderkey = p.probe
        GROUP BY p.probe
    )
    SELECT h.probe AS probe_key, h.n_rows,
           CAST(COALESCE(a.n_admitted, 0) AS BIGINT) AS files_admitted,
           CAST({ZM_FILES} AS BIGINT) AS files_total,
           h.n_rows > 0 AS found
    FROM hits h
    LEFT JOIN (SELECT probe, COUNT(*) AS n_admitted
               FROM admit GROUP BY probe) a
      ON a.probe = h.probe
    """


@register("src_bloom_file_skipping", oracle=_bloom_oracle())
def src_bloom_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup file skipping: build per-file bloom bitsets over the
    date-clustered orders layout, probe six order keys (three present,
    three absent), and for each report how many files the bloom admits
    vs the total, plus the actual row hits from reading ONLY admitted
    files.  Absent keys are typically answered from metadata alone
    (zero files opened, modulo bloom false positives — which the oracle
    predicts exactly)."""
    table_dir = scratch_dir("bloomskip", sf_dir)
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("day"),
    )
    # data files: same clustered write as the zone-map layout
    b = range_buckets(base, "day", ZM_FILES).withColumnRenamed(
        "bucket", "zb"
    ).drop("lo", "hi")
    data_dir = os.path.join(table_dir, "data")
    (
        b.repartition(F.col("zb"))
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(data_dir)
    )
    manifest = write_bloom_manifest(base, table_dir, "o_orderkey")

    out = None
    for key in BLOOM_PROBES:
        admitted = bloom_probe_files(manifest, key)
        if admitted:
            hits = (
                spark.read.option("basePath", data_dir)
                .parquet(*[os.path.join(data_dir, f"zb={z}") for z in admitted])
                .filter(F.col("o_orderkey") == key)
                .agg(F.count("*").cast("bigint").alias("n_rows"))
            )
        else:
            hits = spark.range(1).select(
                F.lit(0).cast("bigint").alias("n_rows")
            )
        one = hits.select(
            F.lit(key).cast("bigint").alias("probe_key"),
            "n_rows",
            F.lit(len(admitted)).cast("bigint").alias("files_admitted"),
            F.lit(ZM_FILES).cast("bigint").alias("files_total"),
            (F.col("n_rows") > 0).alias("found"),
        )
        out = one if out is None else out.unionByName(one)
    return out
