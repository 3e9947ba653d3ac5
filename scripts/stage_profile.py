"""Per-stage profile of one registry query: run it in a fresh session with
the Spark UI enabled, then print the top stages by executor-run time with
their name, task count, input/shuffle volumes.

Usage:
  python scripts/stage_profile.py SF_DIR QUERY_NAME [TOP_N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cloudbrush_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    qs = entrymod.queries()
    fn = qs[name] if name in qs else getattr(entrymod, f"q_{name}")
    t0 = time.time()
    rows = fn(spark, sf_dir).count()
    sec = round(time.time() - t0, 3)
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)
    print(json.dumps({"query": name, "sf_dir": sf_dir, "sec": sec,
                      "rows": rows, "n_stages": len(stages)}))
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    total_run = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"total executorRunTime: {total_run/1000.0:.1f}s (core-seconds)")
    for s in stages[:top_n]:
        print(json.dumps({
            "stage": s["stageId"], "attempt": s["attemptId"],
            "runtime_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
            "tasks": s.get("numCompleteTasks"),
            "in_rec": s.get("inputRecords"),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            "name": (s.get("name") or "")[:80],
        }))


if __name__ == "__main__":
    main()
