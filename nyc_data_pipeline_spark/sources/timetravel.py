"""Manifest-tracked table versions: snapshot isolation and time-travel
reads over plain parquet.

Delta/Iceberg `VERSION AS OF` is descoped in this sandbox (no table-
format jars — pipelines/cdc.py:22-29), but the MECHANISM underneath is
buildable from first principles and is worth having as a real surface:
data files are immutable; a commit writes NEW files plus a tiny
manifest that lists which files are live; old manifests keep working
because nothing they reference is ever mutated.  Readers pick a
version by picking a manifest — no locks, no copy of unchanged data.

This module implements the partition-granular form (Hive-ACID-shaped):
the table is hash-partitioned on its key, a new version rewrites ONLY
the partitions it touches, and the manifest maps each partition to the
version directory that owns it.  `src_time_travel` commits two
versions of an orders snapshot — v2 applies updates and deletes to the
single partition they land in — then reads BOTH versions back through
their manifests in one query and emits each version's row count and
exact cents total.  That the v1 numbers still reproduce after v2
committed IS snapshot isolation, and the driver hash checks it.

Scale shape: a commit costs one shuffle-free filtered write of the
touched partitions plus an O(#partitions) manifest (driver-side JSON,
KBs); readers scan only the files their manifest names, so time travel
adds zero read amplification.  At 100 TB the partition count grows but
the mechanism is unchanged — which is exactly why the table formats
scale; their manifests add file-level stats on top (the z-order /
min-max machinery lives in sources/scans.py).

Reference parity: extends the reference's warehouse sink
(database_handler.py ON CONFLICT upsert) with the versioned-read
surface the reference lacks; SURVEY §2 S8 family.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .scans import scratch_dir

TT_PARTS = 4  # partitions: o_orderkey % TT_PARTS
TT_DEL_MOD = 97  # v2 deletes bucket-0 rows with o_orderkey % 97 == 0
TT_UPLIFT_CENTS = 100  # v2 adds $1.00 to surviving bucket-0 rows


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-v{version}.json")


def write_version(df: DataFrame, table_dir: str, version: int,
                  parts: list[int], prev_manifest: dict | None) -> dict:
    """Commit `df`'s rows for the named partitions as version
    `version`: write ONLY those partitions' files under v{version}/,
    then publish a manifest mapping every partition to its owning
    version directory (untouched partitions inherit from the previous
    manifest).  Returns the new manifest dict."""
    vdir = os.path.join(table_dir, f"v{version}")
    (
        df.filter(F.col("pb").isin(parts))
        .write.mode("overwrite")
        .partitionBy("pb")
        .parquet(vdir)
    )
    manifest = dict(prev_manifest or {})
    for p in parts:
        manifest[str(p)] = os.path.join(vdir, f"pb={p}")
    os.makedirs(table_dir, exist_ok=True)
    with open(_manifest_path(table_dir, version), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time-travel read: union exactly the files the version's manifest
    names (each path carries its partition id back as a column)."""
    with open(_manifest_path(table_dir, version)) as f:
        manifest = json.load(f)
    parts = None
    for p, path in sorted(manifest.items()):
        piece = spark.read.parquet(path).withColumn("pb", F.lit(int(p)))
        parts = piece if parts is None else parts.unionByName(piece)
    return parts


@register(
    "src_time_travel",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % {TT_PARTS} AS pb
        FROM orders
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN pb = 0 THEN cents + {TT_UPLIFT_CENTS}
                    ELSE cents END AS cents,
               pb
        FROM base
        WHERE NOT (pb = 0 AND o_orderkey % {TT_DEL_MOD} = 0)
    )
    SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base
    UNION ALL
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM v2
    """,
)
def src_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit v1 (full snapshot) and v2 (updates + deletes confined to
    partition 0, which alone is rewritten), then read BOTH versions
    through their manifests: (version, n_rows, sum_cents).  v1's
    numbers reproducing after the v2 commit is snapshot isolation,
    hash-checked."""
    table_dir = scratch_dir("timetravel", sf_dir)
    base = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
        f"o_orderkey % {TT_PARTS} AS pb",
    )
    m1 = write_version(base, table_dir, 1, list(range(TT_PARTS)), None)
    v2_part0 = (
        base.filter(F.col("pb") == 0)
        .filter(~(F.col("o_orderkey") % TT_DEL_MOD == 0))
        .withColumn("cents", F.col("cents") + TT_UPLIFT_CENTS)
    )
    write_version(v2_part0, table_dir, 2, [0], m1)

    def summarize(version: int) -> DataFrame:
        return (
            read_version(spark, table_dir, version)
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("sum_cents"),
            )
            .select(F.lit(version).alias("version"), "n_rows", "sum_cents")
        )

    return summarize(1).unionByName(summarize(2))
