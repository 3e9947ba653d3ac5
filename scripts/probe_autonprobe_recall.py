"""Recall sweep for the r13 auto-scaled nprobe: the composed IVF+int8
index probed at fixed nprobe=2 (the r12 default) vs auto_nprobe(K)
(sqrt-K, the r13 default) across 16 -> 447 -> 1024 centroids on one
corpus, measured as recall@10 against brute-force cosine truth for a
fixed 100-query batch.

This is the measurement the r12 verdict asked for: the clamp removal
made big-K indexes reachable while every recall contract still ran at
16 centroids, so the nprobe/K recall coupling (probed fraction =
nprobe/K) was documented but never observed.  Expected shape: fixed
nprobe=2 recall decays hard as K grows; auto-nprobe holds it roughly
flat at a probed fraction decaying only as 1/sqrt(K).

Usage: python scripts/probe_autonprobe_recall.py [FIXTURE] [OUT]
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
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "probes/ivfq_autonprobe_recall.json"
    spark = get_spark("autonprobe-recall")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    step = max(1, n // 100)
    q = emb.filter(F.col("vec_id") % step == 0).persist()
    nq = q.count()
    k = 10
    truth = {}
    for r in similarity.cosine_topk_bruteforce(emb, q, k=k).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = sum(len(s) for s in truth.values())

    def recall(path, nprobe):
        t0 = time.time()
        got = {}
        for r in similarity.cosine_topk_ivf_quantized(
                spark, path, q, k=k, nprobe=nprobe).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        wall = time.time() - t0
        hits = sum(len(truth[i] & got.get(i, set())) for i in truth)
        return round(hits / want, 4), round(wall, 2)

    variants = []
    for K in (16, 447, 1024):
        path = os.path.join(tempfile.mkdtemp(prefix="anp_"), f"ivfq{K}")
        t0 = time.time()
        similarity.write_ivf_index(emb, path, n_centroids=K,
                                   sample=max(4096, 8 * K), seed=42,
                                   quantized=True)
        wsec = round(time.time() - t0, 1)
        auto = similarity.auto_nprobe(K)
        r2, w2 = recall(path, 2)
        # warm rerun of the fixed-nprobe probe so the two variants
        # compare warm-to-warm
        r2, w2 = recall(path, 2)
        ra, wa = recall(path, auto)
        ra, wa = recall(path, auto)
        variants.append({
            "n_centroids": K, "index_write_sec": wsec,
            "recall_at_10_nprobe2": r2, "wall_nprobe2_sec": w2,
            "auto_nprobe": auto,
            "recall_at_10_auto": ra, "wall_auto_sec": wa,
            "probed_fraction_nprobe2": round(2 / K, 5),
            "probed_fraction_auto": round(auto / K, 5),
        })
        print(json.dumps(variants[-1]), flush=True)
    payload = {
        "probe": "ivfq_autonprobe_recall", "fixture": fixture,
        "corpus": n, "n_queries": nq, "k": k,
        "host_parallel_sec": round(par, 2), "variants": variants,
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
