"""Full-catalog oracle sweep at an arbitrary scale factor.

Replays EVERY registered query against its DuckDB oracle via the same
row-count + schema + order-insensitive value-hash comparison the
driver's correctness gate uses (`testing.check_query`) — the
per-round closing gate run at sf0.1 (10× the driver's correctness
scale) before anchor promotion.  Iterates a SNAPSHOT of the registry:
check_query re-enters load_all() per call, and mutating an ordered
dict mid-iteration silently duplicates/skips entries (the bug this
script's first run caught; registry._reorder is now a no-op when
already ordered, and this snapshot keeps the sweep independent of
that invariant).

Usage: python scripts/full_sweep.py [sf_dir]      (default sf0.1)
Prints one line per query and a final TOTAL/FAILS line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_data_pipeline_spark.registry import QUERIES, load_all
from nyc_data_pipeline_spark.session import get_spark
from nyc_data_pipeline_spark.testing import check_query


def main(sf_dir: str) -> int:
    load_all()
    names = list(QUERIES)
    spark = get_spark(
        app_name="full-sweep",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=32,
    )
    t0 = time.time()
    fails: list[tuple[str, list[str]]] = []
    for i, name in enumerate(names):
        try:
            errs = check_query(spark, name, sf_dir)
        except Exception as ex:  # a crash is a failure, not an abort
            errs = [f"exception: {str(ex)[:200]}"]
        if errs:
            fails.append((name, errs[:2]))
            print(i, name, "FAIL", errs[:2], flush=True)
        else:
            print(i, name, "OK", flush=True)
        spark.catalog.clearCache()
    print(
        "TOTAL", len(names), "FAILS", fails,
        "secs", round(time.time() - t0),
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
