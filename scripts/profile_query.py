"""Per-job wall-time profile of one registered query (guide §1).

Runs NAME once (collect, same action as bench.py) in a fresh session
with the Spark event log enabled, then parses the log and prints one
line per job — submission gap, run time, first-stage name — plus the
Python-side phase total, so compound queries (lifecycle builders,
index build + probe) show WHERE the seconds go: many small jobs =
driver/scheduling overhead, one fat job = a real stage to optimize.

Usage: python scripts/profile_query.py NAME [sf_dir] [--explain]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_data_pipeline_spark.registry import QUERIES, load_all
from nyc_data_pipeline_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    load_all()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # Warm-up identical to bench.py.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    fn = QUERIES[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.collect()
    t_collect = time.perf_counter() - t0
    # Second run, bench methodology (best of two).
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    t_second = time.perf_counter() - t0

    if "--explain" in sys.argv:
        print(fn(spark, sf_dir)._sc is None)  # never
    app_id = spark.sparkContext.applicationId
    spark.stop()

    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        # Spark 4 rolling layout: eventlog_v2_<appId>/events_*_<appId>
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            p for p in os.listdir(d) if p.startswith("events_")
        )
        lines = []
        for p in parts:
            with open(os.path.join(d, p)) as f:
                lines.extend(f)
    else:
        with open(log_path) as f:
            lines = list(f)
    jobs: dict[int, dict] = {}
    for line in lines:
        if True:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage Name"].split("\n")[0]
                        for s in ev.get("Stage Infos", [])
                    ],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    print(f"== {name}: build {t_build:.3f}s  run1 {t_collect:.3f}s  "
          f"run2 {t_second:.3f}s  jobs {len(jobs)}")
    prev_end = None
    total_run = total_gap = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        run = (j["end"] - j["start"]) / 1000.0
        gap = 0.0 if prev_end is None else max(0.0, (j["start"] - prev_end) / 1000.0)
        prev_end = j["end"]
        total_run += run
        total_gap += gap
        label = j["desc"] or (j["stages"][-1] if j["stages"] else "?")
        print(f"  job {jid:3d}  gap {gap:6.3f}s  run {run:6.3f}s  "
              f"tasks {j['ntasks']:4d}  {label[:90]}")
    print(f"  == sum(run) {total_run:.3f}s  sum(gap between jobs) {total_gap:.3f}s")


if __name__ == "__main__":
    main()
