"""Bucketed co-located joins: the join over two tables bucketed on the
join key must plan with ZERO exchanges."""

from pyspark.sql import functions as F

from cloudbrush_spark import plans
from cloudbrush_spark.sources import bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    bucketed.write_bucketed(left, "t_bl", ["k"], 4)
    bucketed.write_bucketed(right, "t_br", ["k"], 4)
    j = bucketed.read_table(spark, "t_bl").join(
        bucketed.read_table(spark, "t_br"), "k")
    assert plans.shuffle_count(j) == 0          # co-located: no exchange
    assert j.count() == 10000
    row = j.filter(F.col("k") == 7).collect()[0]
    assert (row.a, row.b) == (14, 21)
    # contrast: the same sort-merge join over non-bucketed data shuffles
    # both sides (hint pins SMJ so the small fixture doesn't broadcast)
    plain = left.hint("merge").join(right.hint("merge"), "k")
    assert plans.shuffle_count(plain) >= 2
    spark.sql("DROP TABLE IF EXISTS t_bl")
    spark.sql("DROP TABLE IF EXISTS t_br")
