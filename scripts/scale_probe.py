"""Scale-probe the heavy headline queries across two generated fixtures.

Runs each probed query at x1 (driver-sf0.1-equivalent) and x10 fixture
scale from gen_scale_fixture.py, and reports per-query wall time, output
rows, and the scaling exponent  e = log(t10/t1) / log(10)  — e ~= 1 is
linear, e > 1.3 flags a super-linear plan.  Output rows are reported too
because two queries (simhash_pairs, and any pair enumeration) have
intrinsically super-linear OUTPUT on this vocabulary-saturated corpus;
for those the honest metric is time-per-output-row, not time-per-input.

Usage:
  python scripts/gen_scale_fixture.py .scale/x1 1.0
  python scripts/gen_scale_fixture.py .scale/x10 10.0
  python scripts/scale_probe.py .scale/x1 .scale/x10 [query,query,...]

Prints one JSON line per query and a summary JSON at the end.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cloudbrush_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "sessionize",
    "g3_transitive_reduction",
    "ann_topk",
    "minhash_lsh_dedup",
    "dedup_clusters",
    "simhash_pairs",
    "overlap_graph",
    "curation_pipeline",
]


def resolve(name):
    qs = entrymod.queries()
    if name in qs:
        return qs[name]
    return getattr(entrymod, f"q_{name}")


def main() -> None:
    d1, d10 = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT
    spark = get_spark("cloudbrush-scale-probe")
    # warm JVM + scheduler once
    spark.read.parquet(os.path.join(d1, "documents.parquet")).count()
    results = {}
    for name in names:
        fn = resolve(name)
        row = {}
        for tag, sfdir in (("x1", d1), ("x10", d10)):
            t0 = time.time()
            n = fn(spark, sfdir).count()
            row[tag] = {"sec": round(time.time() - t0, 3), "rows": n}
        # x1 runs before x10, i.e. cold (codegen, scan setup), which
        # inflates t1 and biases the exponent LOW — a genuinely
        # super-linear plan could hide under the flag threshold.  Re-run
        # x1 warm and use the faster of the two; the residual fixed
        # per-job overhead still biases e low for small absolute times,
        # so read e as a lower bound when t1 is ~1s.
        t0 = time.time()
        fn(spark, d1).count()
        row["x1_warm_sec"] = round(time.time() - t0, 3)
        t1 = min(row["x1"]["sec"], row["x1_warm_sec"])
        e = math.log(row["x10"]["sec"] / t1) / math.log(10)
        row["exponent"] = round(e, 3)
        out_ratio = row["x10"]["rows"] / max(1, row["x1"]["rows"])
        row["rows_ratio"] = round(out_ratio, 2)
        results[name] = row
        print(json.dumps({"query": name, **row}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
