"""Per-stage profile of one bench headline query.

Usage: python scripts/profile_query.py <query> [sf_dir]

Runs the query once exactly like bench.py (count() of the final frame)
with the UI status store on, then dumps every stage's name, wall,
executor cpu/run time, shuffle read/write bytes, input bytes and task
count — the empirical side of guide §1.1 (where is the time actually
going), stage by stage.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudbrush_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cloudbrush-profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "20000",
        "spark.ui.retainedJobs": "20000",
    })
    from scripts.capture_plans import resolve_queries
    qs = resolve_queries()
    # warm the JVM + parquet footers like bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    time.sleep(1.0)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10) as r:
        stages = json.load(r)
    stages.sort(key=lambda s: s.get("stageId", 0))
    print(f"== {name}: wall={wall:.2f}s rows={n} stages={len(stages)}")
    tot_cpu = 0.0
    for s in stages:
        cpu = s.get("executorCpuTime", 0) / 1e9
        run = s.get("executorRunTime", 0) / 1e3
        tot_cpu += cpu
        print(f"stage {s['stageId']:4d} [{s['status']:9s}] tasks={s.get('numCompleteTasks', 0):4d} "
              f"cpu={cpu:7.2f}s run={run:7.2f}s "
              f"shr={s.get('shuffleReadBytes', 0)/1e6:8.1f}MB shw={s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB "
              f"in={s.get('inputBytes', 0)/1e6:7.1f}MB out_rows={s.get('outputRecords', 0)} "
              f"| {s.get('name', '')[:90]}")
    print(f"== total cpu {tot_cpu:.1f}s; wall {wall:.2f}s")
    # job count (sequential-latency witness for stage-count-bound queries)
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs", timeout=10) as r:
        jobs = json.load(r)
    print(f"== jobs: {len(jobs)}")


if __name__ == "__main__":
    main()
