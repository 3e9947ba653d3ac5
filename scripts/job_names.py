"""Dump every job (id, name/description, stage count, duration) a query
fires — the drill-down companion of job_census.py.

Usage: python scripts/job_names.py <query> [sf_dir]
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
    spark = get_spark("cloudbrush-jobnames", extra_conf={
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
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs",
                                timeout=10) as r:
        skip = {j["jobId"] for j in json.load(r)}
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    time.sleep(1.0)
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs",
                                timeout=10) as r:
        jobs = json.load(r)
    jobs = [j for j in jobs if j["jobId"] not in skip]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"== {name}: wall={wall:.2f}s rows={n} jobs={len(jobs)}")
    for j in jobs:
        t = j.get("submissionTime", "")[11:19]
        print(f"job {j['jobId']:4d} {t} stages={len(j.get('stageIds', []))} "
              f"tasks={j.get('numTasks', 0):4d} | {j.get('name', '')[:110]}")


if __name__ == "__main__":
    main()
