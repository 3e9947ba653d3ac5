"""Graph rewrite operators on the FIXTURES.md F3 graph shapes."""

import pytest
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna
from cloudbrush_spark.operators import contraction, graph, overlap
from tests.conftest import make_edges, make_nodes


def sym(spark, rows):
    """Build a symmetric edge table from one-direction rows."""
    return overlap.symmetrize(make_edges(spark, rows))


def test_transitive_reduction_triangle(spark):
    # a(10bp) -> b(10bp) -> c, plus direct a -> c implied by the chain:
    # ov_ac = ov_ab + ov_bc - len_b = 8 + 8 - 10 = 6
    nodes = make_nodes(spark, [
        ("a", "ACGTACGTCC", 1.0), ("b", "GTACGTCCAT", 1.0), ("c", "ACGTCCATGG", 1.0)])
    edges = sym(spark, [
        ("a", "ff", "b", 8), ("b", "ff", "c", 8), ("a", "ff", "c", 6)])
    reduced = graph.transitive_reduction(nodes, edges)
    es = {(r.src, r.et, r.dst, r.ov) for r in reduced.collect()}
    assert ("a", "ff", "c", 6) not in es
    assert ("c", "rr", "a", 6) not in es  # reverse also gone
    assert ("a", "ff", "b", 8) in es and ("b", "ff", "c", 8) in es


def test_compressible_marks_chain_interior(spark):
    nodes = make_nodes(spark, [
        ("a", "ACGTACGTCC", 1.0), ("b", "GTACGTCCAT", 1.0), ("c", "ACGTCCATGG", 1.0)])
    edges = sym(spark, [("a", "ff", "b", 8), ("b", "ff", "c", 8)])
    links = graph.compressible(nodes, edges)
    ls = {(r.src, r.et, r.dst) for r in links.collect()}
    # every chain link is mutually unique here
    assert ("a", "ff", "b") in ls and ("b", "ff", "c") in ls


def test_contract_simple_chain(spark):
    genome = "ACGGTCATTACGGAGCTTAGCAAT"
    reads = [("r0", genome[0:12]), ("r1", genome[6:18]), ("r2", genome[12:24])]
    nodes = make_nodes(spark, [(i, s, 1.0) for i, s in reads])
    edges = overlap.build_overlap_graph(nodes, 5)
    edges = graph.transitive_reduction(nodes, edges)
    n2, e2, rounds = contraction.contract_chains(nodes, edges, seed=7)
    rows = n2.collect()
    assert len(rows) == 1
    merged = rows[0]
    assert merged.seq in (genome, dna.rc_py(genome))
    assert e2.count() == 0
    assert abs(merged.cov - 1.0) < 1e-9


def test_contract_preserves_total_sequence(spark):
    # invariant: merged length == sum(lens) - sum(consumed overlaps)
    genome = "TTACGGATCCATGCAAGGTCCTTAAGGCCTTAA"
    reads = [("x%d" % i, genome[i:i + 15]) for i in range(0, 18, 6)]
    nodes = make_nodes(spark, [(i, s, 2.0) for i, s in reads])
    edges = overlap.build_overlap_graph(nodes, 5)
    edges = graph.transitive_reduction(nodes, edges)
    n2, _, _ = contraction.contract_chains(nodes, edges, seed=11)
    total = sum(len(r.seq) for r in n2.collect())
    assert total == len(genome[0:15 + 12])  # span of the read set


def test_contract_rc_read_chain(spark):
    # middle read is reverse-complemented: orientation algebra must still
    # reconstruct the genome span
    genome = "ACGGTCATTACGGAGCTTAGCAAT"
    r0, r1, r2 = genome[0:12], genome[6:18], genome[12:24]
    nodes = make_nodes(spark, [
        ("r0", r0, 1.0), ("r1", dna.rc_py(r1), 1.0), ("r2", r2, 1.0)])
    edges = overlap.build_overlap_graph(nodes, 5)
    edges = graph.transitive_reduction(nodes, edges)
    n2, e2, _ = contraction.contract_chains(nodes, edges, seed=13)
    rows = n2.collect()
    assert len(rows) == 1
    assert rows[0].seq in (genome, dna.rc_py(genome))


def test_tips_removal(spark):
    # chain a-b-c with a short dead-end tip t hanging off b's f side
    nodes = make_nodes(spark, [
        ("a", "ACGTACGTCC", 5.0), ("b", "GTACGTCCAT", 5.0),
        ("c", "ACGTCCATGG", 5.0), ("t", "GTACGTCCAA", 1.0)])
    edges = sym(spark, [
        ("a", "ff", "b", 8), ("b", "ff", "c", 8), ("b", "ff", "t", 9)])
    doomed = graph.find_tips(nodes, edges, tiplength=100)
    ids = {r.node_id for r in doomed.collect()}
    # b's f side has edges to c (non-tip path continues) and t (tip):
    # mixed side -> tip clipped
    assert ids == {"t"}
    n2, e2 = graph.remove_nodes(nodes, edges, doomed)
    assert n2.count() == 3
    assert e2.filter((F.col("src") == "t") | (F.col("dst") == "t")).count() == 0


def test_self_loop_detection(spark):
    edges = make_edges(spark, [("a", "ff", "a", 5), ("a", "ff", "b", 6)])
    loops = graph.self_loops(edges)
    assert {(r.src, r.dst) for r in loops.collect()} == {("a", "a")}


def test_a_statistic_classes(spark):
    # long low-cov node -> unique; short high-cov -> repeat
    nodes = make_nodes(spark, [
        ("u", "A" * 500, 2.0), ("r", "A" * 60, 200.0)])
    got = {r.node_id: r.unique
           for r in graph.a_statistic(nodes, kmer_cov=30, readlen=36, k=21).collect()}
    assert got["u"] is True
    assert got["r"] is False


def test_edge_removal_removes_both_directions(spark):
    edges = sym(spark, [("a", "ff", "b", 8), ("b", "ff", "c", 8)])
    removals = make_edges(spark, [("a", "ff", "b", 8)])
    out = graph.remove_edges(edges, removals)
    es = {(r.src, r.et, r.dst) for r in out.collect()}
    assert ("a", "ff", "b") not in es and ("b", "rr", "a") not in es
    assert ("b", "ff", "c") in es and ("c", "rr", "b") in es


def test_serial_and_distributed_contraction_agree(spark):
    """G5/G6 randomized rounds and the G7/G8 serial driver finish must
    produce the same contigs (canonical sequences + coverage) on a
    branchy graph: a long chain with reverse-complemented members plus a
    fork that blocks compression at the junction."""
    import random
    rng = random.Random(13)
    genome = "".join(rng.choice("ACGT") for _ in range(220))
    reads = [("c%02d" % i, genome[i * 10:i * 10 + 30]) for i in range(18)]
    # orient half the reads rc to exercise the orientation algebra
    reads = [(n, dna.rc_py(s) if i % 3 == 1 else s) for i, (n, s) in enumerate(reads)]
    nodes = make_nodes(spark, [(n, s, float(1 + i % 2)) for i, (n, s) in enumerate(reads)])
    edges = overlap.build_overlap_graph(nodes, 7)
    edges = graph.transitive_reduction(nodes, edges)

    def canon(df):
        return sorted((min(r.seq, dna.rc_py(r.seq)), r.cov) for r in df.collect())

    n_ser, e_ser, _ = contraction.contract_chains(
        nodes, edges, seed=5, serial_threshold=10**6)     # pure serial
    n_dis, e_dis, _ = contraction.contract_chains(
        nodes, edges, seed=5, serial_threshold=0)          # pure distributed
    ser, dis = canon(n_ser), canon(n_dis)
    assert [s for s, _ in ser] == [s for s, _ in dis]
    # coverage is mildly merge-order-dependent (reference semantics:
    # PairMerge.java:149 weights by current merged length) -> tolerance
    for (_, cs), (_, cd) in zip(ser, dis):
        assert abs(cs - cd) < 0.05
    assert e_ser.count() == e_dis.count()
