"""J4 AdjustMateEdge + A7 TagTrustedReads unit tests on a hand-built
mate-pair fixture (reference semantics:
src/Brush/AdjustMateEdge.java:120-306, src/Brush/TagTrustedReads.java:104-109)."""

from pyspark.sql import functions as F

from cloudbrush_spark.operators import mates


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows, "node_id string, seq string, cov double, pair_ends array<string>")


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, et string, dst string, ov int")


def test_matename_and_count_pair_end(spark):
    df = spark.createDataFrame(
        [(["x1_1", "x2_1", "zz"], ["x1_2", "q_9"])], "a array<string>, b array<string>")
    out = df.select(
        mates.matename(F.lit("ab_1")).alias("m1"),
        mates.matename(F.lit("ab_2")).alias("m2"),
        mates.matename(F.lit("ab")).alias("m3"),
        mates.count_pair_end(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert out.m1 == "ab_2" and out.m2 == "ab_1" and out.m3 is None
    assert out.c == 1  # only x1_1's mate x1_2 is in b; 'zz' has no matename


def _fixture(spark, length, ov):
    # X unique with two f-side neighbors (A supported via C, B unsupported)
    # and one r-side neighbor C.
    nodes = _nodes(spark, [
        ("X", "A" * length, 2.0, ["x1_1", "x2_1", "p5_1"]),
        ("A", "A" * (length // 10 if length > 1000 else length), 1.0, ["q1_1"]),
        ("B", "A" * (length // 10 if length > 1000 else length), 1.0, ["z1_1"]),
        ("C", "A" * (length // 10 if length > 1000 else length), 1.0, ["q1_2", "x1_2"]),
    ])
    edges = _edges(spark, [
        ("X", "ff", "A", ov), ("A", "rr", "X", ov),
        ("X", "ff", "B", ov), ("B", "rr", "X", ov),
        ("X", "rf", "C", ov), ("C", "rr", "X", ov),
    ])
    return nodes, edges


def test_adjust_mate_edges_keeps_max_support(spark):
    # spans are well above inslen + 2*sd -> pair-end info usable
    nodes, edges = _fixture(spark, 3000, 20)
    # ratio tuned so only X classifies unique
    removals = mates.adjust_mate_edges(nodes, edges, reads=20, ctg_sum=3900)
    got = {(r.src, r.et, r.dst) for r in removals.collect()}
    # f-side of X: A has support 1 (q1 pair spans A..C), B has 0 -> cut X->B
    # r-side of X: single edge -> kept
    assert got == {("X", "ff", "B")}


def test_adjust_mate_edges_insert_span_abort(spark):
    # all contigs short: any cross-side pair spans < inslen + 2*sd ->
    # pair-end info unusable, keep everything (AdjustMateEdge.java:183-192)
    nodes, edges = _fixture(spark, 100, 35)
    removals = mates.adjust_mate_edges(
        nodes, edges, reads=50, ctg_sum=400, inslen=200, inslen_sd=20)
    assert removals.count() == 0


def test_adjust_mate_edges_repeat_nodes_untouched(spark):
    # nobody classifies unique -> no removals
    nodes, edges = _fixture(spark, 3000, 20)
    removals = mates.adjust_mate_edges(nodes, edges, reads=1, ctg_sum=39000)
    assert removals.count() == 0


def test_tag_trusted_inverts_flag(spark):
    nodes = _nodes(spark, [("X", "ACGT", 1.0, []), ("Y", "ACGT", 1.0, [])])
    trusted = spark.createDataFrame([("X", True)], "node_id string, trusted boolean")
    out = {r.node_id: (r.trusted, r.unique)
           for r in mates.tag_trusted(nodes, trusted).collect()}
    assert out["X"] == (True, False)   # trusted -> not unique
    assert out["Y"] == (False, True)   # untagged -> unique (needs correction)
