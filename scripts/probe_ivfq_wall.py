"""Wall-clock decade probe for the composed IVF+int8 index: a FIXED
200-query batch against x10 and x100 corpora (index write excluded —
cached via the __spark_entry__ per-sf_dir root).  The fixed batch is
the honest index-probe shape: per-batch cost should grow with the
bytes per probed bucket (corpus/n_centroids), not with a query count
that scales alongside the corpus (that regime belongs to the all-pairs
operators).  Usage: python scripts/probe_ivfq_wall.py FIXTURE [REPS]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.operators import similarity  # noqa: E402
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402


def main():
    fixture = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("ivfq-wall")
    par, single = host_parallel_probe(spark)
    emb = entrymod._emb(spark, fixture)
    iq = entrymod._ann_index_root(fixture) + "/ivfq"
    if not entrymod._ivf_complete(iq):
        similarity.write_ivf_index(emb, iq, n_centroids=16, seed=42,
                                   quantized=True)
    n = emb.count()
    step = max(1, n // 200)
    q = emb.filter(F.col("vec_id") % step == 0)
    for rep in range(1, reps + 1):
        t0 = time.time()
        rows = similarity.cosine_topk_ivf_quantized(
            spark, iq, q, k=5, nprobe=2).count()
        print(json.dumps({
            "query": "ivfq_fixed200", "sf_dir": fixture, "rep": rep,
            "sec": round(time.time() - t0, 3), "rows": rows,
            "corpus": n, "host_parallel_sec": round(par, 2),
            "host_single_sec": round(single, 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
