"""Manifest-level file-skipping probe (round 12): measure a key-range
read's cost as the table grows k× with the PREDICATE SPAN held fixed
(a dashboard slicing one tenant / one day / one shard id range reads
the same slice whatever the corpus is).

The claim under test (SCALE.md §29): with per-file klo/khi recorded at
commit time, `mor_cdc_read(key_range=...)` plans FileScans only over
the overlapping files, so the slice's cost tracks the SLICE while the
full merge tracks the CORPUS — at 100 TB the difference between a
metadata lookup and a table scan.  Bucket fan-out scales with the
table (the §25 sizing rule, now an online operation via the
re-bucketing compaction), so the probe also certifies the skipping
numbers survive partition-spec evolution: the table is grown by
key-shifted clones, compacted to k× the fan-out, then sliced.

Usage: python scripts/skipping_probe.py [k ...]    (default 1 8 64)
Prints one JSON line per k.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_data_pipeline_spark.session import get_spark
from nyc_data_pipeline_spark.streaming.mor_cdc import (
    mor_cdc_commit,
    mor_cdc_compact,
    mor_cdc_init,
    mor_cdc_read,
)

N0 = 4_000        # base keys at k=1
SLICE = 500       # fixed predicate span, whatever the corpus
BASE_FILES = 8


def probe(spark, k: int, root: str) -> dict:
    n = N0 * k
    tdir = os.path.join(root, f"skip_k{k}")
    base = spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") * 3).alias("payload"),
        F.lit(0).alias("version"),
    )
    mor_cdc_init(spark, base, tdir, "key", n_files=BASE_FILES)
    # one churn epoch over a fixed-width stripe, then a re-bucketing
    # compaction to k-scaled fan-out (the §25 sizing rule), then one
    # more epoch under the new spec — the steady production shape
    wave = spark.range(n // 2, n // 2 + SLICE).select(
        F.col("id").alias("key"),
        (F.col("id") * 3 + 1).alias("payload"),
        F.lit(1).alias("version"),
        F.lit("u").alias("op"),
    )
    mor_cdc_commit(spark, wave, tdir, 2)
    mor_cdc_compact(spark, tdir, 2, n_files=BASE_FILES * k)
    wave2 = spark.range(0, SLICE).select(
        F.col("id").alias("key"),
        (F.col("id") * 3 + 2).alias("payload"),
        F.lit(2).alias("version"),
        F.lit("u").alias("op"),
    )
    mor_cdc_commit(spark, wave2, tdir, 4)

    def timed(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    lo = 3 * n // 4
    rng = (lo, lo + SLICE - 1)
    pruned_df = mor_cdc_read(spark, tdir, 4, key_range=rng)
    full_df = mor_cdc_read(spark, tdir, 4)
    t_slice = timed(lambda: pruned_df.count())
    t_full = timed(lambda: full_df.count())
    return {
        "k": k,
        "rows": n,
        "fan_out": BASE_FILES * k,
        "files_slice": len(pruned_df.inputFiles()),
        "files_full": len(full_df.inputFiles()),
        "t_slice_s": t_slice,
        "t_full_s": t_full,
        "slice_rows": pruned_df.count(),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 8, 64]
    spark = get_spark(app_name="skipping-probe", cpus=16,
                      shuffle_partitions=32)
    import tempfile

    root = tempfile.mkdtemp(prefix="skip_probe_")
    for k in ks:
        print(json.dumps(probe(spark, k, root)))


if __name__ == "__main__":
    main()
