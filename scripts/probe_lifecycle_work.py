"""Index-lifecycle WORK probe (r14 verdict #6): per-op wall + executor
CPU + shuffle/input deltas for the r14 lifecycle ops — write, append,
delete/undelete, compact, maintain (split+merge as needed), probe —
so their cost claims are graded artifacts, not narrative.

Usage: python scripts/probe_lifecycle_work.py [fixture_dir] [out_json]

The fixture is a gen_scale_fixture.py output (x10 by convention, 20k
embeddings — one decade above driver sf0.1).  Work counters come from
the Spark status store like bench.py's witness; host health recorded
via host_parallel_probe so walls can be discounted on a degraded host.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.operators import similarity  # noqa: E402
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402


def totals(base, app):
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10) as r:
        st = json.load(r)
    return {
        "cpu_sec": sum(s.get("executorCpuTime", 0) for s in st) / 1e9,
        "shuffle_mb": sum(s.get("shuffleReadBytes", 0) for s in st) / 1e6,
        "input_mb": sum(s.get("inputBytes", 0) for s in st) / 1e6,
    }


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
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale/x10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        "probes/lifecycle_work_r15.json"
    spark = get_spark("lifecycle-work-probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "20000",
        "spark.ui.retainedJobs": "20000",
    })
    par, _ = host_parallel_probe(spark)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    half = n // 2
    path = os.path.join(tempfile.mkdtemp(prefix="lcw_"), "ivfq")
    ops: dict[str, dict] = {}
    prev = settled(base, app)

    def op(name, fn):
        nonlocal prev
        t0 = time.time()
        ret = fn()
        wall = round(time.time() - t0, 2)
        cur = settled(base, app)
        ops[name] = {"wall_sec": wall,
                     **{k: round(cur[k] - prev[k], 2) for k in cur}}
        prev = cur
        return ret

    op("write_index_half", lambda: similarity.write_ivf_index(
        emb.filter(F.col("vec_id") < half), path,
        n_centroids=None, sample=4096, seed=42, quantized=True))
    op("append_other_half", lambda: similarity.append_to_ivf_index(
        emb.filter(F.col("vec_id") >= half), path))
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0)
    op("probe_k5_warm", lambda: (
        similarity.cosine_topk_ivf_quantized(spark, path, q, k=5).count(),
        similarity.cosine_topk_ivf_quantized(spark, path, q, k=5).count()))
    victims = [int(r[0]) for r in
               emb.select("vec_id").limit(200).collect()][:100]
    ops_n = op("delete_100", lambda: similarity.delete_from_ivf_index(
        spark, path, victims))
    op("undelete_10", lambda: similarity.undelete_from_ivf_index(
        spark, path, victims[:10]))
    op("compact", lambda: similarity.compact_index(spark, path, files=16))
    op("maintain", lambda: similarity.maintain_index(spark, path))
    op("probe_after_lifecycle", lambda: similarity.cosine_topk_ivf_quantized(
        spark, path, q, k=5).count())
    out = {
        "probe": "lifecycle_work_r15", "fixture": fixture, "n_vectors": n,
        "deleted": ops_n, "host_parallel_sec": round(par, 2), "ops": ops,
        "work_note": "cpu_sec = executor on-CPU (host-steal-insensitive); "
                     "shuffle_mb = shuffle read; input_mb = bytes read",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
