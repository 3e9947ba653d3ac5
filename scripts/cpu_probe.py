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

The PRIMARY gate is the absolute parallel wall (HEALTHY_PARALLEL_SEC —
fixed work per core, comparable across sessions); the parallel/single
ratio is a secondary cross-check only, because the single-thread
denominator burst-boosts on credit-scheduled hosts and inflates the
ratio while aggregate capacity is fine (BASELINE.md round-6 amended
policy).  The probe itself is shared with bench.py
(cloudbrush_spark.session.host_parallel_probe) so the recorded
host_parallel_ratio and this verdict can never desynchronize.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cloudbrush_spark.session import (  # noqa: E402
    HEALTHY_PARALLEL_RATIO,
    HEALTHY_PARALLEL_SEC,
    get_spark,
    host_parallel_probe,
)


def main() -> None:
    s = get_spark("cpu-probe")
    s.range(1).count()  # JVM warm
    par, single = host_parallel_probe(s)
    ratio = par / single
    # PRIMARY gate: the absolute parallel wall (fixed work per core, so
    # comparable across sessions).  The ratio alone is NOT a throttle
    # verdict — the single-thread denominator burst-boosts on
    # credit-scheduled hosts (observed 0.77s -> 0.22s late round 6),
    # inflating the ratio while aggregate capacity is fine (BASELINE.md
    # round-6 amended policy).
    verdict = ("healthy" if par < HEALTHY_PARALLEL_SEC
               else "THROTTLED - defer benching")
    print(f"single={single:.2f}s parallel={par:.2f}s "
          f"ratio={ratio:.1f} ({verdict}; gate: parallel < "
          f"{HEALTHY_PARALLEL_SEC}s)")
    if par < HEALTHY_PARALLEL_SEC and ratio >= HEALTHY_PARALLEL_RATIO:
        print("  note: ratio elevated but parallel leg healthy — "
              "single-thread burst boost, not a throttle; bench is "
              "comparable")


if __name__ == "__main__":
    main()
