"""Measure recall@5 of the IVF variants against the exact brute-force
referee, for both centroid choices (first-K seed vs one-Lloyd-iteration
k-means refinement).  Results are recorded in SCALE.md §7.

Usage: python scripts/ivf_recall.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from nyc_data_pipeline_spark import registry  # noqa: E402
from nyc_data_pipeline_spark.session import get_spark  # noqa: E402


def recall_at_k(truth: dict, approx: dict) -> float:
    hits = total = 0
    for q, neighbors in truth.items():
        total += len(neighbors)
        hits += len(neighbors & approx.get(q, set()))
    return hits / total if total else float("nan")


def neighbor_sets(pdf) -> dict:
    out: dict = {}
    for r in pdf.itertuples():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    registry.load_all()
    spark = get_spark()
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for sf in sf_dirs:
        truth = neighbor_sets(
            registry.QUERIES["sim_topk_bruteforce"](spark, sf).toPandas()
        )
        for name in ("sim_topk_ivf", "sim_topk_ivf_kmeans", "sim_topk_lsh"):
            approx = neighbor_sets(registry.QUERIES[name](spark, sf).toPandas())
            print(f"{sf}  {name:24s} recall@5 = {recall_at_k(truth, approx):.3f}")


if __name__ == "__main__":
    main()
