"""Measure the fat-bucket split lever (r14): an index whose appended
crawls drift from the training distribution piles rows into few buckets
(index_stats.bucket_skew climbs); split_fat_buckets re-clusters only
those buckets in place.  This probe builds the drift shape at fixture
scale — base index trained on HALF the embedding clusters, the other
half appended — and records skew, probed-bytes proxy (rows in probed
buckets), probe wall, and recall vs brute force BEFORE and AFTER the
split, plus the split's own wall.

The x10/x100 fixtures' embeddings have 10 Gaussian clusters with a
`label` column, which makes the drift construction exact: train on
labels 0-4, append labels 5-9.

Usage: python scripts/probe_split_skew.py [FIXTURE] [OUT]
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
    out = sys.argv[2] if len(sys.argv) > 2 else "probes/split_skew_x10.json"
    spark = get_spark("split-probe")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", "label",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    base = emb.filter(F.col("label") < 5).select("vec_id", "embedding")
    drift = emb.filter(F.col("label") >= 5).select("vec_id", "embedding")
    path = os.path.join(tempfile.mkdtemp(prefix="sidx_"), "ivfq")
    # sqrt-sizing against the BASE corpus only (what the operator would
    # have seen at index-build time)
    n_base = base.count()
    k0 = max(16, int(n_base ** 0.5))
    t0 = time.time()
    similarity.write_ivf_index(base, path, n_centroids=k0, sample=8 * k0,
                               seed=42, quantized=True)
    write_sec = round(time.time() - t0, 1)
    t0 = time.time()
    appended = similarity.append_to_ivf_index(drift, path)
    append_sec = round(time.time() - t0, 1)
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

    before = measure()
    t0 = time.time()
    summary = similarity.split_fat_buckets(spark, path, skew_threshold=3.0,
                                           seed=7)
    split_sec = round(time.time() - t0, 1)
    after = measure()
    payload = {
        "probe": os.path.splitext(os.path.basename(out))[0],
        "fixture": fixture, "corpus": n, "base_rows": n_base,
        "appended_rows": appended, "index_write_sec": write_sec,
        "append_sec": append_sec, "split_sec": split_sec,
        "split_buckets": len(summary["split_buckets"]),
        "before": before, "after": after,
        "host_parallel_sec": round(par, 2),
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
