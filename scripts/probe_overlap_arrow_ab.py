"""Interleaved A/B: overlap_graph with the JVM posting path vs the
numpy mapInArrow kernel (r14 verdict #5 — re-measure the §4 tradeoff
with warm reused workers and larger Arrow batches before deciding the
default).

Usage: python scripts/probe_overlap_arrow_ab.py [sf_dir] [maxRecordsPerBatch]

Runs WARMUP (one tiny Arrow stage — pays the one-time Python daemon
bootstrap outside the measured region, since in any long-lived session
or multi-query bench the kernel would run against warm workers), then
alternates JVM / Arrow builds of the full J1->J2->J3 composite, 3
rounds each, printing wall + executor cpu/run + shuffle deltas per run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudbrush_spark.session import get_spark  # noqa: E402


def totals(base, app):
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10) as r:
        st = json.load(r)
    return (sum(s.get("executorCpuTime", 0) for s in st) / 1e9,
            sum(s.get("executorRunTime", 0) for s in st) / 1e3,
            sum(s.get("shuffleReadBytes", 0) for s in st) / 1e6)


def settled(base, app):
    prev = totals(base, app)
    for _ in range(8):
        time.sleep(0.15)
        cur = totals(base, app)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    batch = sys.argv[2] if len(sys.argv) > 2 else "10000"
    spark = get_spark("overlap-arrow-ab", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "20000",
        "spark.ui.retainedJobs": "20000",
        "spark.sql.execution.arrow.maxRecordsPerBatch": batch,
    })
    from cloudbrush_spark import oracle_fixtures as gfx
    from cloudbrush_spark.operators import overlap
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    # one-time Python daemon bootstrap outside the measured region
    def _warm(it):
        for b in it:
            yield b
    spark.range(0, 32, 1, 32).mapInArrow(_warm, "id long").count()
    reads = gfx.overlap_reads(spark, sf_dir)
    print(f"# sf_dir={sf_dir} maxRecordsPerBatch={batch}")
    for rnd in range(3):
        for mode in (False, True):
            prev = settled(base, app)
            t0 = time.time()
            cand = overlap.match_prefix(reads, 24, use_arrow=mode)
            edges = overlap.symmetrize(overlap.verify_overlap(cand, reads))
            n = edges.count()
            wall = time.time() - t0
            cur = settled(base, app)
            print(json.dumps({
                "round": rnd, "arrow": mode, "wall_sec": round(wall, 2),
                "cpu_sec": round(cur[0] - prev[0], 1),
                "run_sec": round(cur[1] - prev[1], 1),
                "shuffle_mb": round(cur[2] - prev[2], 1), "rows": n}),
                flush=True)


if __name__ == "__main__":
    main()
