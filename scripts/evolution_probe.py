"""Schema-evolution cost probe (SCALE.md §32's numbers): a
rename/widen/drop/add on the MOR chain must cost O(1) — one JSON
write — at ANY corpus size, with ZERO data files touched.

Grows the documents corpus k× (key-shifted clones), times each
evolution op, and asserts the data-file inventory is byte-identical
before and after the whole evolution batch.  The post-evolution READ
is timed too: the id-resolved projection must not add a scan pass
(its cost tracks the corpus like any read, not the evolution count).

Usage: python scripts/evolution_probe.py [k ...]     (default: 1 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_data_pipeline_spark.catalog import load_table
from nyc_data_pipeline_spark.session import get_spark
from nyc_data_pipeline_spark.sources.scans import scratch_dir
from nyc_data_pipeline_spark.streaming.mor_cdc import (
    mor_cdc_add_column,
    mor_cdc_drop_column,
    mor_cdc_init,
    mor_cdc_read,
    mor_cdc_rename_column,
    mor_cdc_widen_column,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CLONE_SHIFT = 100_000_000


def _data_files(table_dir: str) -> dict[str, float]:
    out = {}
    for dp, _, fs in os.walk(table_dir):
        for f in fs:
            if not f.startswith("manifest-"):
                p = os.path.join(dp, f)
                out[p] = os.path.getmtime(p)
    return out


def main(ks: list[int]) -> None:
    spark = get_spark()
    d1 = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
    )
    out = []
    for k in ks:
        grown = d1
        for i in range(1, k):
            grown = grown.unionByName(
                d1.select(
                    (F.col("doc_id") + CLONE_SHIFT * i).alias("doc_id"),
                    "lang",
                    "n_chars",
                )
            )
        tbl = scratch_dir(f"evoprobe_{k}x", SF_DIR)
        shutil.rmtree(tbl, ignore_errors=True)
        mor_cdc_init(
            spark, grown.withColumn("version", F.lit(0)), tbl,
            "doc_id", n_files=8 * k,
        )
        before = _data_files(tbl)
        t0 = time.time()
        mor_cdc_rename_column(tbl, "n_chars", "chars")
        t_rename = time.time() - t0
        t0 = time.time()
        mor_cdc_widen_column(tbl, "chars", "bigint")
        t_widen = time.time() - t0
        t0 = time.time()
        mor_cdc_add_column(tbl, "grade", "bigint", default=1)
        t_add = time.time() - t0
        t0 = time.time()
        mor_cdc_drop_column(tbl, "lang")
        t_drop = time.time() - t0
        assert _data_files(tbl) == before, "evolution touched data files"
        t0 = time.time()
        n = mor_cdc_read(spark, tbl, 5).count()
        t_read = time.time() - t0
        assert n == grown.count()
        out.append(
            {
                "k": k,
                "corpus_docs": n,
                "rename_ms": round(t_rename * 1000, 1),
                "widen_ms": round(t_widen * 1000, 1),
                "add_ms": round(t_add * 1000, 1),
                "drop_ms": round(t_drop * 1000, 1),
                "evolved_read_sec": round(t_read, 2),
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"probe": "evolution", "sf_dir": SF_DIR, "rows": out}))


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [1, 64]
    main(ks)
