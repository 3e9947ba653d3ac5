"""Measure the full drift-maintenance story (r14): split_fat_buckets
repairs skew but can leave K above the sqrt(corpus) IVF sizing rule
(the x100 drift fixture lands K=640 vs sqrt-n 447, and recall at the
auto-nprobe default dips because the probed fraction ~1/sqrt(K)
shrinks); merge_small_buckets folds the thin remnants back toward the
floor.  This probe builds the same drift shape as
scripts/probe_split_skew.py — base index trained on embedding clusters
0-4, clusters 5-9 appended — and measures skew / K / probe wall /
recall vs brute force at THREE states: drifted, after the split, after
the merge (i.e. after rebalance_index), plus each phase's own wall.

Usage: python scripts/probe_rebalance.py [FIXTURE] [OUT]
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
    out = sys.argv[2] if len(sys.argv) > 2 else "probes/rebalance_x10.json"
    spark = get_spark("rebalance-probe")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", "label",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    base = emb.filter(F.col("label") < 5).select("vec_id", "embedding")
    drift = emb.filter(F.col("label") >= 5).select("vec_id", "embedding")
    path = os.path.join(tempfile.mkdtemp(prefix="ridx_"), "ivfq")
    n_base = base.count()
    k0 = max(16, int(n_base ** 0.5))
    similarity.write_ivf_index(base, path, n_centroids=k0, sample=8 * k0,
                               seed=42, quantized=True)
    appended = similarity.append_to_ivf_index(drift, path)
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0).select("vec_id", "embedding")
    truth = {}
    for r in similarity.cosine_topk_bruteforce(
            emb.select("vec_id", "embedding"), q, k=5).collect():
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
        return {"bucket_skew": round(st["bucket_skew"], 2),
                "bucket_rows_max": st["bucket_rows_max"],
                "n_centroids": st["n_centroids"],
                "probe_wall_sec": wall, "recall_at_5": recall}

    drifted = measure()
    t0 = time.time()
    s_split = similarity.split_fat_buckets(spark, path, skew_threshold=3.0,
                                           seed=7)
    split_sec = round(time.time() - t0, 1)
    after_split = measure()
    t0 = time.time()
    s_merge = similarity.merge_small_buckets(spark, path,
                                             small_threshold=3.0)
    merge_sec = round(time.time() - t0, 1)
    after_merge = measure()
    payload = {
        "probe": os.path.splitext(os.path.basename(out))[0],
        "fixture": fixture, "corpus": n, "base_rows": n_base,
        "appended_rows": appended,
        "split_sec": split_sec, "merge_sec": merge_sec,
        "split_buckets": len(s_split["split_buckets"]),
        "merged_buckets": len(s_merge["merged_buckets"]),
        "drifted": drifted, "after_split": after_split,
        "after_merge": after_merge,
        "host_parallel_sec": round(par, 2),
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
