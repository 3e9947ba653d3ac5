"""The bench's orthogonal host-health witness (r12): kernel counters
that no engine change can move, so the drift-vs-regression call in
BASELINE.md no longer rests on the Spark-based probe alone."""

import time

from cloudbrush_spark.session import host_witness, host_witness_delta


def test_host_witness_snapshot_shape():
    w = host_witness()
    # on the Linux hosts this repo targets, /proc/stat always parses
    assert "proc_stat_total_ticks" in w and "proc_stat_steal_ticks" in w
    assert all(isinstance(v, int) and v >= 0 for v in w.values())


def test_host_witness_delta_monotone_and_derived():
    a = host_witness()
    t0 = time.time()
    while time.time() - t0 < 0.3:  # burn ticks so totals advance
        sum(i * i for i in range(10000))
    b = host_witness()
    d = host_witness_delta(a, b)
    assert all(v >= 0 for k, v in d.items() if k.endswith("_delta"))
    # raw tick counters fold into the derived steal share
    assert "proc_stat_total_ticks_delta" not in d
    if "steal_pct" in d:
        assert 0.0 <= d["steal_pct"] <= 100.0
    # missing-key snapshots degrade gracefully
    assert host_witness_delta({}, b) == {}
