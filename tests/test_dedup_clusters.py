"""Connected-component cluster product (operators/dedup.dedup_clusters):
min-id representative semantics, singleton universe, and convergence on
a path graph far longer than the iteration budget (pointer jumping)."""

from pyspark.sql import functions as F

from cloudbrush_spark.operators import dedup


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_min_id_representative_and_sizes(spark):
    # components {1,2,3} (triangle), {7,9}, singleton 5 via items
    pairs = _pairs(spark, [(2, 1), (2, 3), (9, 7)])
    items = spark.range(1, 10).select(F.col("id").alias("doc_id"))
    out = {(r.cluster_rep, r.member, r.n)
           for r in dedup.dedup_clusters(pairs, items=items).collect()}
    exp = {(1, 1, 3), (1, 2, 3), (1, 3, 3), (7, 7, 2), (7, 9, 2)}
    exp |= {(i, i, 1) for i in (4, 5, 6, 8)}
    assert out == exp


def test_long_chain_converges_within_budget(spark):
    # path 0-1-2-...-119: diameter 119 >> the 50-round budget — hash-min
    # alone would exit unconverged (and pre-fix, silently return labels
    # naming no real representative); pointer jumping must close it in
    # O(log n) rounds
    n = 120
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    out = dedup.dedup_clusters(pairs).collect()
    assert len(out) == n
    assert all(r.cluster_rep == 0 and r.n == n for r in out)


def test_no_items_returns_paired_nodes_only(spark):
    pairs = _pairs(spark, [(4, 2)])
    out = {(r.cluster_rep, r.member, r.n)
           for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {(2, 2, 2), (2, 4, 2)}
