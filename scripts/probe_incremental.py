"""Measure incremental_release vs a from-scratch release at fixture
scale (.scale/x10 by default): base release seeds the feature cache, a
1%-updated / 0.5%-inserted crawl releases incrementally, the same crawl
releases from scratch, and the two manifests are diffed (must be 0).
Numbers recorded in BASELINE.md round-9 addenda (16.0 s vs 49.9 s, 3.1x,
manifest_diff_rows=0 at host_parallel ~3).  Run from the repo root:

  python scripts/probe_incremental.py [SF_DIR]
"""
import sys, time, shutil, os
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from cloudbrush_spark.session import get_spark
from cloudbrush_spark.pipeline.release import release, incremental_release

spark = get_spark('inc-probe')
docs = spark.read.parquet((sys.argv[1] if len(sys.argv) > 1 else '.scale/x10') + '/documents.parquet').select('doc_id','text','source')
docs.count()  # warm
base_out, inc_out, full_out = '/tmp/cloudbrush_inc_base', '/tmp/cloudbrush_inc_inc', '/tmp/cloudbrush_inc_full'
for d in (base_out, inc_out, full_out): shutil.rmtree(d, ignore_errors=True)
kw = dict(max_tokens=100000)

t0=time.time()
release(spark, docs, base_out, cache_features=True, **kw)
t_base=time.time()-t0

# crawl: 1% text-updated, 0.5% inserted, rest resent unchanged
crawl = docs.withColumn('text',
    F.when(F.col('doc_id') % 100 == 0, F.concat('text', F.lit(' updated v2')))
     .otherwise(F.col('text')))
new = docs.filter(F.col('doc_id') % 200 == 7).select(
    (F.col('doc_id') + 10_000_000).alias('doc_id'),
    F.concat('text', F.lit(' fresh crawl doc')).alias('text'), 'source')
crawl = crawl.unionByName(new)
prev = spark.read.parquet(os.path.join(base_out, 'features.parquet'))

t0=time.time()
m_inc = incremental_release(spark, docs, crawl, inc_out, prev_features=prev, **kw)
n_inc = m_inc.count()
t_inc=time.time()-t0

t0=time.time()
m_full = release(spark, crawl, full_out, **kw)
n_full = m_full.count()
t_full=time.time()-t0

same = (m_inc.select('doc_id','copy','split','shard_id','offset','ws_tokens','quality')
        .exceptAll(m_full.select('doc_id','copy','split','shard_id','offset','ws_tokens','quality')).count())
print({'base_sec': round(t_base,1), 'incremental_sec': round(t_inc,1),
       'full_sec': round(t_full,1), 'rows_inc': n_inc, 'rows_full': n_full,
       'manifest_diff_rows': same})
