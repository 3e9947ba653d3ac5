"""Shuffle-volume probe: run ONE query in a fresh session with the Spark
UI enabled and report total shuffle read/write and spill bytes from the
UI REST API, per stage and summed.

This is the scale-evidence path for plans whose x100 TIMING leg cannot
run on a single node's disk (the probe machine has ~80 GB free;
overlap_graph at x100 spills more than that across its posting-join
shuffles, which on a real cluster is spread over hundreds of executors'
local disks).  If shuffle BYTES scale linearly in input (exponent ~1
between fixture decades), the plan's data movement — the thing that
breaks super-linear plans at 100 TB — is linear, and the timing
exponents measured on the decades that DO fit extend by composition.

Usage:
  python scripts/shuffle_probe.py SF_DIR QUERY_NAME

Prints one JSON line: {"query", "sf_dir", "sec", "rows",
"shuffle_write_bytes", "shuffle_read_bytes", "disk_spill_bytes",
"memory_spill_bytes", "peak_stage_shuffle_write"}.
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


def resolve(name):
    qs = entrymod.queries()
    if name in qs:
        return qs[name]
    return getattr(entrymod, f"q_{name}")


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    spark = get_spark("shuffle-probe", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    fn = resolve(name)
    t0 = time.time()
    rows = fn(spark, sf_dir).count()
    sec = round(time.time() - t0, 3)
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
    ds = sum(s.get("diskBytesSpilled", 0) for s in stages)
    ms = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    peak = max((s.get("shuffleWriteBytes", 0) for s in stages), default=0)
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "sec": sec, "rows": rows,
        "shuffle_write_bytes": sw, "shuffle_read_bytes": sr,
        "disk_spill_bytes": ds, "memory_spill_bytes": ms,
        "peak_stage_shuffle_write": peak, "n_stages": len(stages),
    }))


if __name__ == "__main__":
    main()
