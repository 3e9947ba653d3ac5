"""Measure the compaction lever (r13): a crawl-per-day index accretes up
to one parquet file per bucket per append, and fixed per-file
open/footer overhead comes to dominate the probe
(probes/ivfq_bytes_x10_1024c.json noted this at toy scale).
compact_index rewrites the accreted files back to ~one per bucket; this
probe quantifies what that buys on a realistic shape: a 447-centroid
quantized index over the x10 fixture (20k vectors), base-built from
half the corpus and fed the other half in 32 small appends, probed with
a fixed 200-query batch (warm, second run reported) before and after
compaction, with file counts and identical-results verification.

Usage: python scripts/probe_compact_index.py [FIXTURE] [OUT]
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


def _data_files(path):
    n = 0
    for root, _, files in os.walk(path):
        n += sum(1 for f in files
                 if not f.startswith(("_", ".")) and f.endswith(".parquet"))
    return n


def main():
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale/x10"
    out = sys.argv[2] if len(sys.argv) > 2 else "probes/compact_index_x10.json"
    spark = get_spark("compact-probe")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    half = n // 2
    path = os.path.join(tempfile.mkdtemp(prefix="cidx_"), "ivfq")
    t0 = time.time()
    similarity.write_ivf_index(emb.filter(F.col("vec_id") < half), path,
                               n_centroids=447, sample=4096, seed=42,
                               quantized=True)
    write_sec = round(time.time() - t0, 1)
    n_appends = 32
    batch = (n - half) // n_appends
    t0 = time.time()
    for i in range(n_appends):
        lo = half + i * batch
        hi = n if i == n_appends - 1 else lo + batch
        similarity.append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path)
    append_sec = round(time.time() - t0, 1)
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0)

    def probe():
        rows = sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
            for r in similarity.cosine_topk_ivf_quantized(
                spark, path, q, k=5).collect())
        return rows

    def timed_probe():
        probe()  # warm
        t0 = time.time()
        rows = probe()
        return round(time.time() - t0, 2), rows

    files_before = _data_files(path)
    wall_before, rows_before = timed_probe()
    t0 = time.time()
    removed = similarity.compact_index(spark, path, files=16)
    compact_sec = round(time.time() - t0, 1)
    files_after = _data_files(path)
    wall_after, rows_after = timed_probe()
    payload = {
        "probe": os.path.splitext(os.path.basename(out))[0],
        "fixture": fixture, "corpus": n,
        "n_centroids": 447, "n_appends": n_appends,
        "index_write_sec": write_sec, "appends_total_sec": append_sec,
        "files_before": files_before, "files_after": files_after,
        "files_reported_by_compact": removed,
        "compact_sec": compact_sec,
        "probe_wall_before_sec": wall_before,
        "probe_wall_after_sec": wall_after,
        "results_identical": rows_before == rows_after,
        "host_parallel_sec": round(par, 2),
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
