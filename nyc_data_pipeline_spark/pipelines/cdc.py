"""Incremental corpus maintenance: CDC-style upsert (merge keep-latest).

A living training corpus is not append-only: recrawls supersede old
versions of a page, takedowns remove docs, and new crawl slices add
docs.  The warehouse operation is MERGE: given the current corpus and
a change batch keyed by doc_id, keep exactly one row per key — the
highest-version one.  (The reference's equivalent is the Postgres
``ON CONFLICT (...) DO UPDATE`` upsert, database_handler.py:197-268,
row-at-a-time; this is the set-oriented form.)

Spark-first shape: union the corpus with the change batch, then keep
the max-version row per key with one window keyed on doc_id — a single
shuffle on the merge key.  At 100 TB:

- the window rides a bucketed-by-doc_id layout (see
  sources/scans.write_bucketed) so the merge never re-shuffles the
  corpus — only the (small) change batch moves;
- with a table format (Delta/Iceberg) the same logical plan is
  ``MERGE INTO`` and file-level skipping prunes untouched partitions;
  the pure-parquet fallback below rewrites only because the fixture is
  a single file;
- deletes are change rows with ``op = 'd'`` — filtered after the
  keep-latest window so a delete beats any earlier update at the same
  key and lower version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Deterministic synthetic change batch carved from the fixture itself:
# every 5th doc is re-crawled (update), every 13th is taken down
# (delete), and a shifted-id copy of every 7th doc is a brand-new
# insert.  Constants are part of the query contract (the oracle embeds
# the same ones).
UPD_MOD = 5
DEL_MOD = 13
INS_MOD = 7
INS_OFFSET = 10_000_000


def merge_keep_latest(base: DataFrame, changes: DataFrame, key: str = "doc_id") -> DataFrame:
    """MERGE: one row per key, highest (version, op-priority) wins;
    rows whose winner is a delete drop out entirely."""
    # Same-version tiebreak: takedown wins over update wins over base.
    prio = F.when(F.col("op") == "d", 2).when(F.col("op") == "u", 1).otherwise(0)
    w = Window.partitionBy(key).orderBy(F.desc("version"), prio.desc())
    merged = (
        base.unionByName(changes)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1 AND op <> 'd'")
        .drop("rn")
    )
    return merged


@register(
    "merge_upsert_latest",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, source, n_chars, 0 AS version, 'b' AS op
        FROM documents
    ),
    changes AS (
        SELECT doc_id, 'recrawl' AS lang, source,
               n_chars + 7 AS n_chars, 1 AS version, 'u' AS op
        FROM documents WHERE doc_id % {UPD_MOD} = 0
        UNION ALL
        SELECT doc_id, lang, source, n_chars, 1 AS version, 'd' AS op
        FROM documents WHERE doc_id % {DEL_MOD} = 0
        UNION ALL
        SELECT doc_id + {INS_OFFSET}, lang, source, n_chars,
               1 AS version, 'u' AS op
        FROM documents WHERE doc_id % {INS_MOD} = 0
    ),
    merged AS (
        SELECT *
        FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
        QUALIFY row_number() OVER (
            PARTITION BY doc_id
            ORDER BY version DESC,
                     CASE op WHEN 'd' THEN 2 WHEN 'u' THEN 1 ELSE 0 END DESC
        ) = 1
    )
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(version AS INT) AS version
    FROM merged WHERE op <> 'd'
    """,
)
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge over the documents corpus: updates supersede, deletes
    remove, inserts append — one window shuffle keyed on doc_id."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    base = d.withColumn("version", F.lit(0)).withColumn("op", F.lit("b"))
    upd = (
        d.where(F.col("doc_id") % UPD_MOD == 0)
        .withColumn("lang", F.lit("recrawl"))
        .withColumn("n_chars", F.col("n_chars") + 7)
        .withColumn("version", F.lit(1))
        .withColumn("op", F.lit("u"))
    )
    dele = (
        d.where(F.col("doc_id") % DEL_MOD == 0)
        .withColumn("version", F.lit(1))
        .withColumn("op", F.lit("d"))
    )
    ins = (
        d.where(F.col("doc_id") % INS_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + INS_OFFSET)
        .withColumn("version", F.lit(1))
        .withColumn("op", F.lit("u"))
    )
    merged = merge_keep_latest(base, upd.unionByName(dele).unionByName(ins))
    return merged.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("version").cast("int").alias("version"),
    )
