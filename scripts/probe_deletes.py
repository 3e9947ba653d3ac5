"""Measure the tombstone-delete lever (r14): probe-wall overhead of the
pending-tombstone anti-join at 0% / 1% / 10% deleted, and the purging
compaction's wall vs a plain one.  The question a 100 TB deploy asks:
what does takedown support cost the read path while tombstones pend,
and does the purge ride the existing compaction cadence?

Uses the x10 scale fixture's embeddings (20k vectors, sqrt-n centroids,
composed int8+IVF layout), a fixed 200-query batch at the auto-nprobe
default, three timed repetitions per state (min reported — the
anti-join is plan overhead, not data-dependent).

Usage: python scripts/probe_deletes.py [FIXTURE] [OUT]
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
    out = sys.argv[2] if len(sys.argv) > 2 else "probes/delete_overhead_x10.json"
    spark = get_spark("delete-probe")
    par, _ = host_parallel_probe(spark)
    emb = (spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    n = emb.count()
    k0 = max(16, int(n ** 0.5))
    path = os.path.join(tempfile.mkdtemp(prefix="didx_"), "ivfq")
    similarity.write_ivf_index(emb, path, n_centroids=k0, sample=8 * k0,
                               seed=42, quantized=True)
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0)

    def probe_wall():
        walls = []
        for _ in range(3):
            t0 = time.time()
            similarity.cosine_topk_ivf_quantized(spark, path, q, k=5) \
                .count()
            walls.append(time.time() - t0)
        return round(min(walls), 2)

    states = {}
    probe_wall()  # warm
    states["deleted_0pct"] = {"probe_wall_sec": probe_wall(),
                              "pending": 0}
    n_1 = similarity.delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") % 100 == 7)
        .select("vec_id"))
    states["deleted_1pct"] = {"probe_wall_sec": probe_wall(),
                              "pending": n_1}
    n_10 = similarity.delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") % 10 == 3)
        .select("vec_id"))
    st = similarity.index_stats(spark, path)
    states["deleted_10pct"] = {"probe_wall_sec": probe_wall(),
                               "pending": st["pending_deletes"]}
    t0 = time.time()
    similarity.compact_index(spark, path)
    purge_sec = round(time.time() - t0, 1)
    after = similarity.index_stats(spark, path)
    states["after_purge"] = {"probe_wall_sec": probe_wall(),
                             "pending": after["pending_deletes"],
                             "rows": after["rows"]}
    payload = {
        "probe": os.path.splitext(os.path.basename(out))[0],
        "fixture": fixture, "corpus": n, "n_centroids": k0,
        "purging_compact_sec": purge_sec,
        "states": states,
        "host_parallel_sec": round(par, 2),
    }
    with open(out, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
