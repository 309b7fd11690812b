"""Skew probe: `choose_join_strategy`'s salted arm vs AQE skew-join on
a hot-key fixture at k× scale (VERDICT r8 ask #5).

Builds a big side with one pathologically hot join key (HOT_FRAC of
all rows) over an otherwise-uniform key domain, a dim side too large
to broadcast, and times the same join+aggregate under:

  plain        AQE skew-join ON at its DEFAULT thresholds
               (256 MB skewed-partition threshold — at probe scale the
               straggler partition is far below it, so AQE does NOT
               split: this is what "rely on AQE" actually does here);
  aqe-tuned    AQE skew-join with thresholds lowered to probe scale
               (16 MB / 8 MB advisory) so the splitter engages — the
               best case for the AQE-only approach;
  salted       the explicit (key, salt) fan-out join the audit-driven
               `choose_join_strategy` picks when top1_ppm exceeds
               SKEW_FLAG_PPM (operators/skew.py) — decided BEFORE the
               shuffle materializes, from the same stats the audit
               already collects.

All three arms produce the identical aggregate (asserted).  Broadcast
is disabled throughout: the probe isolates the shuffle-join regime —
rule 1 of choose_join_strategy (small side fits -> broadcast) is
settled separately by the golden tests.

Usage: python scripts/skew_probe.py [k ...]      (default: 8)
Record results in SCALE.md §21.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_data_pipeline_spark.catalog import load_table
from nyc_data_pipeline_spark.operators.skew import N_SALTS, choose_join_strategy
from nyc_data_pipeline_spark.pipelines.quality import join_key_skew
from nyc_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_FRAC_MOD = int(os.environ.get("HOT_MOD", "5"))  # 1/mod of rows -> hot key
N_DIM_KEYS = 200_000


def fixture(spark, k: int):
    li = load_table(spark, SF_DIR, "lineitem")
    big = li
    for i in range(1, k):
        big = big.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + i * 10**9)
        )
    big = big.select(
        F.when(
            F.monotonically_increasing_id() % HOT_FRAC_MOD == 0, F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                          F.lit(N_DIM_KEYS)))
        .alias("jk"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_orderkey").alias("uniq"),
    )
    dim = spark.range(N_DIM_KEYS).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("payload-"), F.col("id")).alias("label"),
        (F.col("id") % 97).cast("double").alias("weight"),
    )
    return big, dim


def timed(label, df):
    t0 = time.perf_counter()
    rows = df.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("v") * F.col("weight")).alias("s"),
    ).collect()
    dt = time.perf_counter() - t0
    n, s = rows[0]["n"], rows[0]["s"]
    print(f"{label:>10}: {dt:7.2f} s   n={n} s={s:.2f}")
    return dt, (n, s)


def main(ks):
    spark = get_spark(
        app_name="skew-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        shuffle_partitions=32,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for k in ks:
        big, dim = fixture(spark, k)
        big = big.localCheckpoint(eager=True)  # freeze the fixture
        stats = join_key_skew(big, "probe", "jk").collect()[0]
        decision = choose_join_strategy(stats, small_side_bytes=None or 2**40)
        print(
            f"k={k}: big={big.count()} rows, top1_ppm={stats['top1_ppm']}"
            f" -> choose_join_strategy = {decision!r}"
        )

        results = {}

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        results["plain"] = timed("plain", big.join(dim, big["jk"] == dim["dk"]))

        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(16 * 1024 * 1024),
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(8 * 1024 * 1024),
        )
        results["aqe-tuned"] = timed(
            "aqe-tuned", big.join(dim, big["jk"] == dim["dk"])
        )
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

        b = big.withColumn(
            "_salt", F.pmod(F.hash(F.col("uniq")), F.lit(N_SALTS))
        )
        s = dim.select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.lit(N_SALTS - 1))
            ).alias("_salt"),
        )
        results["salted"] = timed(
            "salted",
            b.join(s, (b["jk"] == s["dk"]) & (b["_salt"] == s["_salt"])),
        )

        # float sum order differs per strategy; compare each arm to the
        # plain arm at 1 ppb RELATIVE error (ADVICE r9: dividing a sum
        # by its own magnitude reduced the check to sign-and-count).
        n_ref, s_ref = results["plain"][1]
        for arm, (_t, (n, s)) in results.items():
            assert n == n_ref, f"{arm}: row count {n} != {n_ref}"
            assert abs(s - s_ref) <= 1e-9 * max(abs(s_ref), 1.0), (
                f"{arm}: sum {s} != {s_ref}"
            )
        print(f"k={k} summary:", {m: round(t, 2) for m, (t, _) in results.items()})


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [8])
