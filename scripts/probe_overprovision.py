"""Measure merge_small_buckets' PAYOFF case (r14): an over-provisioned
index — K far above the sqrt(corpus) rule, most lists near-empty — pays
per-bucket fixed costs (directory listing, file open, footer decode) on
every probe and inflates the centroid-ranking work for no selectivity
win.  Merging back to the sqrt-n floor should cut probe wall with
recall held (near-empty lists carry little structure to mis-place).

This is the complement of probes/rebalance_x100.json, which measures
the COST case: folding real-but-small lists on a drifted fixture trades
recall (0.833 -> 0.799) — together the two probes set the guidance that
rebalance merges conservatively by default.

Usage: python scripts/probe_overprovision.py [FIXTURE] [OUT]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.operators import similarity  # noqa: E402
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402


def main():
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale/x10"
    out = sys.argv[2] if len(sys.argv) > 2 else "probes/overprovision_x10.json"
    spark = get_spark("overprov-probe")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    k_over = 10 * max(16, int(n ** 0.5))  # 10x the sqrt-n rule
    path = os.path.join(tempfile.mkdtemp(prefix="oidx_"), "ivfq")
    t0 = time.time()
    similarity.write_ivf_index(emb, path, n_centroids=k_over,
                               sample=min(n, 4 * k_over), seed=42,
                               quantized=True)
    write_sec = round(time.time() - t0, 1)
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0)
    truth = {}
    for r in similarity.cosine_topk_bruteforce(emb, q, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def measure():
        st = similarity.index_stats(spark, path)
        similarity.cosine_topk_ivf_quantized(spark, path, q, k=5).count()
        t0 = time.time()
        got = {}
        for r in similarity.cosine_topk_ivf_quantized(
                spark, path, q, k=5).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        wall = round(time.time() - t0, 2)
        hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
        recall = round(hits / sum(len(s) for s in truth.values()), 3)
        return {"n_centroids": st["n_centroids"],
                "buckets_used": st["buckets_used"],
                "bucket_rows_p50": st["bucket_rows_p50"],
                "probe_wall_sec": wall, "recall_at_5": recall}

    over = measure()
    t0 = time.time()
    s = similarity.merge_small_buckets(spark, path, small_threshold=4.0)
    merge_sec = round(time.time() - t0, 1)
    merged = measure()
    payload = {
        "probe": os.path.splitext(os.path.basename(out))[0],
        "fixture": fixture, "corpus": n, "k_overprovisioned": k_over,
        "index_write_sec": write_sec, "merge_sec": merge_sec,
        "merged_buckets": len(s["merged_buckets"]),
        "overprovisioned": over, "after_merge": merged,
        "host_parallel_sec": round(par, 2),
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
