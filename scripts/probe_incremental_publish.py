"""Incremental-PUBLISH probe: the round-10 follow-up to
``probe_incremental.py``.

The r9 incremental release's floor was the cross-document stages
INCLUDING PUBLISH — a 1%% delta still rewrote 100%% of the published
files.  This probe measures the publish carry-over on a CLUSTERED delta
(the realistic crawl shape: the trailing 1%% of the id space re-touched,
0.5%% new ids appended — a recrawl of recent documents plus fresh
pages), with id-range publish buckets (width = n/100, i.e. ~100
directories) so delta locality maps to directory locality:

  1. base release (bucketed, feature cache on)
  2. incremental release WITH  prev_release_path  (publish carries)
  3. incremental release WITHOUT prev_release_path (publish rewrites)
  4. corpora diffed row-for-row (must be 0 both directions)

  python scripts/probe_incremental_publish.py [SF_DIR]   # .scale/x10

Prints one JSON line with both walls, the rewritten/carried directory
counters, and the corpus diff.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.pipeline.release import (  # noqa: E402
    incremental_release, release)
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402
from cloudbrush_spark.sources import corpus as corpus_sink  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else ".scale/x10"
# fat factor: repeat each document's text N times.  The scale fixture's
# ~0.3 KB docs make publish IO almost free locally, so the carry-over's
# fixed cost (manifest digest diff + hardlinks) can exceed the saved
# write; real corpora run 10-100 KB/doc, where the publish write
# dominates the incremental wall (the gate is feature-cached) and the
# skipped directories are the lever.  fat=40 ≈ 12 KB docs.
fat = int(sys.argv[2]) if len(sys.argv) > 2 else 1
spark = get_spark("inc-pub-probe")
par, single = host_parallel_probe(spark)
docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
    .select("doc_id", "text", "source")
if fat > 1:
    docs = docs.withColumn("text", F.repeat(F.col("text"), fat))
n = docs.count()
hi = docs.agg(F.max("doc_id")).first()[0]
width = max(1, (hi + 1) // 100)

base_out = "/tmp/cb_incpub_base"
inc_out = "/tmp/cb_incpub_inc"
flat_out = "/tmp/cb_incpub_flat"
for d in (base_out, inc_out, flat_out):
    shutil.rmtree(d, ignore_errors=True)
kw = dict(max_tokens=100000, bucketed_publish=True,
          publish_bucket_width=width)

t0 = time.time()
release(spark, docs, base_out, cache_features=True, **kw)
t_base = time.time() - t0

# clustered crawl: trailing 1% of ids updated, 0.5% fresh ids appended
cut = hi - (hi + 1) // 100
crawl = docs.withColumn(
    "text",
    F.when(F.col("doc_id") > cut, F.concat("text", F.lit(" updated v2")))
     .otherwise(F.col("text")))
new = docs.filter(F.col("doc_id") % 200 == 7).select(
    (F.col("doc_id") + hi + 1).alias("doc_id"),
    F.concat("text", F.lit(" fresh crawl doc")).alias("text"), "source")
crawl = crawl.unionByName(new)
prev = spark.read.parquet(os.path.join(base_out, "features.parquet"))

ctr: dict = {}
t0 = time.time()
m_inc = incremental_release(spark, docs, crawl, inc_out,
                            prev_features=prev,
                            prev_release_path=base_out,
                            counters=ctr, **kw)
m_inc.count()
t_incpub = time.time() - t0

t0 = time.time()
m_flat = incremental_release(spark, docs, crawl, flat_out,
                             prev_features=prev, **kw)
m_flat.count()
t_flat = time.time() - t0

b1 = corpus_sink.read_corpus(spark, os.path.join(inc_out, "corpus"))
b2 = corpus_sink.read_corpus(spark, os.path.join(flat_out, "corpus"))
cols = sorted(set(b1.columns) & set(b2.columns))
diff = (b1.select(cols).exceptAll(b2.select(cols)).count()
        + b2.select(cols).exceptAll(b1.select(cols)).count())

print(json.dumps({
    "probe": "incremental_publish", "sf_dir": sf, "docs": n,
    "bucket_width": width,
    "base_sec": round(t_base, 1),
    "inc_with_carry_sec": round(t_incpub, 1),
    "inc_full_republish_sec": round(t_flat, 1),
    "publish_rewritten": ctr.get("publish_rewritten"),
    "publish_carried": ctr.get("publish_carried"),
    "corpus_diff_rows": diff,
    "host_parallel_sec": round(par, 2), "host_single_sec": round(single, 2),
}))
