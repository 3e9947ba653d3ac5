"""Deterministic sampling/split assignment."""

from pyspark.sql import functions as F

from cloudbrush_spark.operators import sampling


def test_assign_split_disjoint_stable_and_proportional(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    out = sampling.assign_split(df, "doc_id", train=0.9, val=0.05)
    counts = {r.split: r.cnt for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.9) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    # stability: same assignment on re-computation and under repartition
    again = sampling.assign_split(df.repartition(17), "doc_id", train=0.9, val=0.05)
    diff = (out.withColumnRenamed("split", "s1")
            .join(again.withColumnRenamed("split", "s2"), "doc_id")
            .filter(F.col("s1") != F.col("s2")).count())
    assert diff == 0


def test_deterministic_sample_fraction(spark):
    df = spark.range(0, 50000).withColumnRenamed("id", "doc_id")
    n = sampling.deterministic_sample(df, "doc_id", 0.1).count()
    assert abs(n / 50000 - 0.1) < 0.01
    # different seeds draw different (but reproducible) subsets
    a = set(r.doc_id for r in sampling.deterministic_sample(df, "doc_id", 0.1, "s1").collect())
    b = set(r.doc_id for r in sampling.deterministic_sample(df, "doc_id", 0.1, "s2").collect())
    assert a != b
    a2 = set(r.doc_id for r in sampling.deterministic_sample(df, "doc_id", 0.1, "s1").collect())
    assert a == a2
