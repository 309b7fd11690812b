"""Scale probe: measure headline-operator scaling at k× the sf0.1 data.

Builds k key-shifted copies of the input tables (so duplicate-cluster
structure and per-key cardinality are preserved — a pure row-duplicate
union would change dedup/session semantics), runs representative
operators, and prints per-k wall times.  Evidence for SCALE.md §6:
near-linear = the plan survives scale-up; superlinear = a hidden
quadratic (exactly how the pair-emitting dedup was caught).

Usage: python scripts/scale_probe.py [k ...]   (default 1 4 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from nyc_data_pipeline_spark.catalog import load_table
from nyc_data_pipeline_spark.dedup.minhash import minhash_lsh_keep_one
from nyc_data_pipeline_spark.functions.text import spark_token_hashes, spark_tokens
from nyc_data_pipeline_spark.session import get_spark
from nyc_data_pipeline_spark.streaming.windows import session_counts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled(df: DataFrame, key: str, k: int, offset: int) -> DataFrame:
    out = df
    for i in range(1, k):
        out = out.unionByName(df.withColumn(key, F.col(key) + i * offset))
    return out


def probe(spark, k: int) -> dict[str, float]:
    times: dict[str, float] = {}

    def run(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 2)

    li = scaled(load_table(spark, SF_DIR, "lineitem"), "l_orderkey", k, 10**9)
    run(
        "q1_style_agg",
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")),
    )

    docs = scaled(load_table(spark, SF_DIR, "documents"), "doc_id", k, 10**9)
    sets = docs.selectExpr(
        "doc_id",
        f"array_distinct({spark_token_hashes(spark_tokens('text'))}) AS elems",
    )
    run("dedup_keep_one", minhash_lsh_keep_one(sets))

    ev = scaled(load_table(spark, SF_DIR, "events"), "user_id", k, 10**9)
    run("sessionize", session_counts(ev))

    return times


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-probe")
    for k in ks:
        print(f"k={k}", probe(spark, k), flush=True)


if __name__ == "__main__":
    main()
