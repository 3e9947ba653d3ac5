"""One fresh-session probe leg: host-health + a single query at a single
fixture dir, then exit.

Exists because warm re-runs inside a shared probe session are NOT
independent measurements: a heavy leg (e.g. the x100 embedding_clusters
run) leaves the local JVM under GC/storage pressure and a subsequent
"warm x10" leg can read 3-4x slower than the same leg in a fresh session
(round-8 addenda: 47.4 s cold vs 183.5 s re-run).  Scaling exponents
should be computed from one fresh process per (query, scale) leg:

  CLOUDBRUSH_DRIVER_MEM=48g python scripts/probe_once.py .scale/x10 probe_emb_clusters
  CLOUDBRUSH_DRIVER_MEM=48g python scripts/probe_once.py .scale/x100 probe_emb_clusters

Prints one JSON line: {query, sf_dir, sec, rows, host_parallel_sec,
host_single_sec}.  ``host_parallel_sec`` is the comparability gate —
BASELINE.md's healthy band is ~1.6-1.8 on this VM; legs measured outside
it are host-drifted, not plan-changed.  An optional third arg repeats
the query N times in the SAME session (prints every rep) for warm-state
measurements where that is the point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    qs = entrymod.queries()
    fn = qs.get(name) or getattr(entrymod, f"q_{name}")
    spark = get_spark("cloudbrush-probe-once")
    par, single = host_parallel_probe(spark)
    # warm scan/codegen path once on a cheap count so rep 1 is not
    # paying JVM start-up inside the measured window
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    for rep in range(1, reps + 1):
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        print(json.dumps({
            "query": name, "sf_dir": sf_dir, "rep": rep,
            "sec": round(time.time() - t0, 3), "rows": n,
            "host_parallel_sec": round(par, 2),
            "host_single_sec": round(single, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
