"""Scan-bytes probe for the composed (r11) IVF+int8 index.

Writes the plain persisted IVF index (double vectors in centroid
partitions) and the quantized one (int8 codes in partitions, doubles in
a side table) from the same embeddings fixture, computes the probed
bucket set for a query batch, and reports the BYTES each probe's
selection scan faces:

  * partition lever  — probed-bucket bytes / all-bucket bytes
  * quantize lever   — probed CODE bytes / probed DOUBLE bytes
  * composed         — probed code bytes / full double-index bytes
    (= the two levers multiplied, up to per-bucket size variance)

Byte ratios are host-throttle-independent (unlike wall-clock), so this
probe is valid on any host.  Usage:
  python scripts/probe_ivfq_bytes.py [FIXTURE_DIR] [N_CENTROIDS] [NPROBE]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.operators import similarity  # noqa: E402
from cloudbrush_spark.session import get_spark  # noqa: E402


def du(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def main():
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale/x10"
    n_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("ivfq-bytes")
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", F.transform("embedding",
                                         lambda x: x.cast("double"))
                   .alias("embedding")))
    import tempfile
    d = tempfile.mkdtemp(prefix="cb_ivfq_bytes_")
    pp, pq = d + "/plain", d + "/quant"
    similarity.write_ivf_index(emb, pp, n_centroids=n_cent, seed=42)
    similarity.write_ivf_index(emb, pq, n_centroids=n_cent, seed=42,
                               quantized=True)
    cents = [list(r.centroid) for r in
             spark.read.parquet(pq + "/centroids").orderBy("bucket")
             .collect()]
    all_dbl = du(pp + "/vectors")
    all_code = du(pq + "/vectors")
    n_rows = emb.count()

    def regime(name, q):
        # _centroid_topn handles both forms: plan literals <=256
        # centroids, broadcast matmul above (r12)
        probes = q.select(
            F.explode(similarity._centroid_topn(
                F.col("embedding"), cents, nprobe)).alias("b")) \
            .distinct().collect()
        probed = sorted(r.b for r in probes)
        probed_dbl = sum(du(pp + f"/vectors/bucket={b}") for b in probed)
        probed_code = sum(du(pq + f"/vectors/bucket={b}") for b in probed)
        return {
            "regime": name, "n_queries": q.count(),
            "probed_buckets": len(probed), "total_buckets": n_cent,
            "probed_double_bytes": probed_dbl,
            "probed_code_bytes": probed_code,
            "partition_lever": round(all_dbl / max(1, probed_dbl), 2),
            "quantize_lever": round(probed_dbl / max(1, probed_code), 2),
            "composed_lever": round(all_dbl / max(1, probed_code), 2),
        }

    out = {
        "probe": "ivfq_scan_bytes",
        "fixture": f"{fixture} embeddings ({n_rows} x 64-dim)",
        "n_centroids": n_cent, "nprobe": nprobe,
        "double_index_bytes": all_dbl,
        "code_index_bytes": all_code,
        "regimes": [
            # point lookups: the shape partition pruning exists for
            regime("point_batch_5q", emb.filter(F.col("vec_id") % 4001 == 0)),
            # a broad 1% batch probes most buckets: quantize lever only
            regime("broad_batch_1pct", emb.filter(F.col("vec_id") % 97 == 0)),
        ],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
