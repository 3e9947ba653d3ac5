"""Machine-health probe: effective parallel CPU throughput.

Benchmark numbers are only comparable across runs when the host's
aggregate CPU is actually available: on shared VMs the hypervisor can
throttle many-core throughput while single-thread latency stays normal,
which inflates every shuffle-heavy query by the same factor and looks
exactly like an engine regression (observed round 6: a parallel
fixed-work probe that should run ~1x single-partition wall-clock took
6.6x — effective parallelism ~5 of 32 cores — while the md5
single-thread microbench was unaffected; overlap_graph "regressed"
12.4s -> 24s with zero code changes).

Run before recording BASELINE/BENCH numbers:

    python scripts/cpu_probe.py

ratio = parallel_wall / single_wall for 32x the work on 32 partitions.
Healthy: ratio ~1.0-2.0 (scheduler overhead).  >3 means the host is
throttled and bench numbers will NOT be comparable — re-run later.
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.session import get_spark  # noqa: E402

ROWS = 200_000
# size the parallel probe to the host so the healthy ratio stays ~1-2
# on any core count (32 fixed partitions on an 8-core host would run in
# 4 waves and report a healthy machine as throttled)
CPUS = os.cpu_count() or 4


def main() -> None:
    s = get_spark("cpu-probe")
    s.range(1).count()  # JVM warm
    t0 = time.time()
    s.range(0, CPUS * ROWS, 1, CPUS) \
        .select(F.sha2(F.col("id").cast("string"), 256).alias("h")) \
        .select(F.max("h")).collect()
    par = time.time() - t0
    t0 = time.time()
    s.range(0, ROWS, 1, 1) \
        .select(F.sha2(F.col("id").cast("string"), 256).alias("h")) \
        .select(F.max("h")).collect()
    single = time.time() - t0
    ratio = par / single
    verdict = "healthy" if ratio < 3 else "THROTTLED - defer benching"
    print(f"single={single:.2f}s parallel={par:.2f}s "
          f"ratio={ratio:.1f} ({verdict})")


if __name__ == "__main__":
    main()
