"""Per-query JOB census: how many sequential Spark jobs a query fires.

Usage: python scripts/job_census.py <query>[,query,...] [sf_dir]

At fixture scale the heavy composites are bound by sequential driver
round-trips (plan + schedule per job), not data — the r14 verdict's #1
finding.  This runs each named query exactly like bench.py (count() of
the final frame) and prints its job-count delta, wall, and the work
witness (executor cpu / shuffle MB), so a stage-fusion change has a
direct before/after number.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudbrush_spark.session import get_spark  # noqa: E402


def counters(base: str, app: str) -> tuple[int, float, float]:
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=succeeded",
            timeout=10) as r:
        njobs = len(json.load(r))
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10) as r:
        stages = json.load(r)
    cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    shr = sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6
    return njobs, cpu, shr


def settled(base: str, app: str) -> tuple[int, float, float]:
    prev = counters(base, app)
    for _ in range(8):
        time.sleep(0.15)
        cur = counters(base, app)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cloudbrush-jobcensus", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "20000",
        "spark.ui.retainedJobs": "20000",
    })
    from scripts.capture_plans import resolve_queries
    qs = resolve_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    prev = settled(base, app)
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        wall = time.time() - t0
        cur = settled(base, app)
        print(f"{name}: jobs={cur[0]-prev[0]} wall={wall:.2f}s "
              f"cpu={cur[1]-prev[1]:.1f}s shuffle={cur[2]-prev[2]:.1f}MB "
              f"rows={n}", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
