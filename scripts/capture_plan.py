"""Capture .explain("formatted") for registered queries (guide §7.2).

Runs each query once (collect) so AQE finalizes, then writes the
formatted plan — which after execution reflects the final adaptive
plan, including AQEShuffleRead and any runtime join-strategy rewrite —
to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/capture_plan.py TAG SUFFIX NAME [NAME...]
e.g.:  python scripts/capture_plan.py r15 after q3_shipping_priority
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_data_pipeline_spark.registry import QUERIES, load_all
from nyc_data_pipeline_spark.session import get_spark


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(app_name=f"plans-{tag}")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # finalize AQE so the explain shows the real plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
