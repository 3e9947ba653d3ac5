"""Stats operator tests: two-phase N50, size distribution (the ADVICE
min-vs-max crossing bug case), genome-target N50, top-k."""

import pytest
from pyspark.sql import functions as F

from cloudbrush_spark.operators import stats


def _sizes(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "sz long")


def test_n50_known_values(spark):
    # sizes [9,5,4,2]: total 20, desc cum 9,14 -> crossing at 5, 2 items
    row = stats.n50(_sizes(spark, [9, 5, 4, 2]), "sz").collect()[0]
    assert (row.n50, row.n50_cnt, row.total) == (5, 2, 20)


def test_n50_duplicate_sizes_within_group(spark):
    # sizes [4,4,4,4]: total 16, half 8 -> 2 items of size 4
    row = stats.n50(_sizes(spark, [4, 4, 4, 4]), "sz").collect()[0]
    assert (row.n50, row.n50_cnt, row.total) == (4, 2, 16)


def test_n50_single_row(spark):
    row = stats.n50(_sizes(spark, [7]), "sz").collect()[0]
    assert (row.n50, row.n50_cnt, row.total) == (7, 1, 7)


def test_size_distribution_n50_is_crossing_size(spark):
    # the ADVICE bug case: sizes [9,5,4,2] must give n50=5 (not min-satisfying 2)
    df = _sizes(spark, [9, 5, 4, 2]).withColumn("cov", F.lit(2.0))
    out = {r.cutoff: r for r in
           stats.size_distribution(df, "sz", cov_col="cov",
                                   cutoffs=(2, 4)).collect()}
    c2, c4 = out[2], out[4]
    assert (c2.cnt, c2.total, c2.n50, c2.n50_cnt) == (4, 20, 5, 2)
    assert c2.mean == pytest.approx(5.0) and c2.mean_cov == pytest.approx(2.0)
    # cutoff 4: sizes [9,5,4], total 18, half 9 -> n50=9 with 1 item
    assert (c4.cnt, c4.total, c4.n50, c4.n50_cnt) == (3, 18, 9, 1)


def test_stats_report_genome_target_n50(spark):
    df = _sizes(spark, [9, 5, 4, 2])
    rep = stats.stats_report(df, "sz", cov_col=None, genome_size=30)
    row = rep["genome_n50"].collect()[0]
    # genome/2 = 15: desc cum 9,14,18 -> crossing at size 4 with 3 items
    assert (row.n50, row.n50_cnt, row.genome_size) == (4, 3, 30)
    top = [r.sz for r in rep["top"].collect()]
    assert top == [9, 5, 4, 2]


def test_n50_matches_size_distribution_on_random_data(spark):
    import random
    rng = random.Random(7)
    xs = [rng.randint(1, 5000) for _ in range(500)]
    df = _sizes(spark, xs)
    a = stats.n50(df, "sz").collect()[0]
    d = {r.cutoff: r for r in
         stats.size_distribution(df, "sz", cutoffs=(1,)).collect()}[1]
    assert (a.n50, a.n50_cnt, a.total) == (d.n50, d.n50_cnt, d.total)
    # python reference implementation
    ordered = sorted(xs, reverse=True)
    tot = sum(ordered)
    cum = 0
    for i, s in enumerate(ordered, 1):
        cum += s
        if 2 * cum >= tot:
            assert (a.n50, a.n50_cnt) == (s, i)
            break
