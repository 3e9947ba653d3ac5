"""Unit tests for the cleanup operators that previously had no coverage:
FindBubbles/PopBubbles (C2/C3), CutChimericLinks/DefineConsensus (G1/G9),
RemoveLowCoverage (C4), overlap boundary cuts (C5d) — hand-built fixtures
asserting the pop/cut sets exactly (SURVEY §5b)."""

import pytest
from pyspark.sql import functions as F

from cloudbrush_spark.operators import bubbles, consensus, graph
from tests.conftest import make_edges, make_nodes


# --------------------------------------------------------------------------
# C2/C3 bubbles
# --------------------------------------------------------------------------

def _bubble_fixture(spark):
    nodes = make_nodes(spark, [
        ("S", "AAAATTTT", 2.0),
        ("E", "GGGGCCCC", 2.0),
        ("P1", "AAACGTACCC", 2.0),   # interior CGTA, higher coverage
        ("P2", "AAACGTTCCC", 1.0),   # interior CGTT, 1 edit away
    ])
    edges = make_edges(spark, [
        ("P1", "ff", "E", 3), ("P1", "rf", "S", 3),
        ("P2", "ff", "E", 3), ("P2", "rf", "S", 3),
        ("S", "ff", "P1", 3), ("S", "ff", "P2", 3),
        ("E", "rf", "P1", 3), ("E", "rf", "P2", 3),
    ])
    return nodes, edges


def test_find_bubbles_pops_lower_coverage_path(spark):
    nodes, edges = _bubble_fixture(spark)
    pops = bubbles.find_bubbles(nodes, edges, maxbubblelen=10, edit_rate=0.25)
    got = [(r.node_id, r.survivor_id, r.mass) for r in pops.collect()]
    # mass = cov 1.0 * INTERIOR len 4 (vmerlen = vstr.length(),
    # src/Brush/FindBubbles.java:426-428)
    assert got == [("P2", "P1", 4.0)]


def test_find_bubbles_respects_edit_rate(spark):
    nodes, edges = _bubble_fixture(spark)
    # 1 edit over interior length 4 = 0.25 > rate 0.05 -> no pop
    assert bubbles.find_bubbles(nodes, edges, 10, edit_rate=0.05).count() == 0


def test_find_bubbles_respects_maxbubblelen(spark):
    nodes, edges = _bubble_fixture(spark)
    # interior span is 4 > maxbubblelen 3 -> not a bubble candidate
    assert bubbles.find_bubbles(nodes, edges, 3, edit_rate=0.25).count() == 0


def test_pop_bubbles_transfers_mass_and_removes_node(spark):
    nodes, edges = _bubble_fixture(spark)
    pops = bubbles.find_bubbles(nodes, edges, 10, edit_rate=0.25)
    n2, e2 = bubbles.pop_bubbles(nodes, edges, pops)
    ids = {r.node_id for r in n2.collect()}
    assert ids == {"S", "E", "P1"}
    cov = {r.node_id: r.cov for r in n2.collect()}
    # 2.0 + interior-mass 4.0 / survivor len 10 (PopBubbles.java:199-204)
    assert cov["P1"] == pytest.approx(2.4)
    # every edge touching P2 is gone, P1's survive
    remaining = {(r.src, r.dst) for r in e2.collect()}
    assert all("P2" not in pair for pair in remaining)
    assert ("P1", "E") in remaining and ("S", "P1") in remaining


# --------------------------------------------------------------------------
# G1/G9 consensus
# --------------------------------------------------------------------------

def _chimera_fixture(spark):
    nodes = make_nodes(spark, [
        ("X", "AAAAAA", 1.0),
        ("A", "TTGGGG", 1.0), ("B", "TTGGGG", 1.0),
        ("C", "TTGGCC", 1.0),                         # diverges at ext pos 3-4
        ("Y", "CCCCCC", 1.0), ("Z", "TTAAAA", 1.0),   # single-edge side
    ])
    edges = make_edges(spark, [
        ("X", "ff", "A", 2), ("X", "ff", "B", 2), ("X", "ff", "C", 2),
        ("Y", "ff", "Z", 2),
    ])
    return nodes, edges


def test_cut_chimeric_links_cuts_consensus_mismatch(spark):
    nodes, edges = _chimera_fixture(spark)
    cuts = consensus.cut_chimeric_links(nodes, edges, majority=0.6, pwm_n=0.5)
    got = {(r.src, r.et, r.dst, r.ov) for r in cuts.collect()}
    # A/B extensions 'GGGG' dominate (2/3 >= 0.6) -> C's 'GGCC' mismatches;
    # Y's single-edge side is exempt (min_side_edges=2)
    assert got == {("X", "ff", "C", 2)}


def test_define_consensus_colors(spark):
    nodes, edges = _chimera_fixture(spark)
    colors = {(r.node_id, r.d): r.color
              for r in consensus.define_consensus(nodes, edges, pwm_n=0.5).collect()}
    assert colors[("X", "f")] == "B"    # 2-of-3 majority at every position
    assert colors[("Y", "f")] == "B"    # single extension is its own consensus


def test_define_consensus_white_when_no_majority(spark):
    nodes = make_nodes(spark, [
        ("X", "AAAAAA", 1.0),
        ("A", "TTGGGG", 1.0), ("B", "TTCCCC", 1.0),   # 1/2 < 0.6 everywhere
    ])
    edges = make_edges(spark, [("X", "ff", "A", 2), ("X", "ff", "B", 2)])
    colors = {(r.node_id, r.d): r.color
              for r in consensus.define_consensus(nodes, edges, pwm_n=0.1).collect()}
    assert colors[("X", "f")] == "W"


# --------------------------------------------------------------------------
# C4 low coverage
# --------------------------------------------------------------------------

def test_remove_low_coverage(spark):
    nodes = make_nodes(spark, [
        ("L", "ACGT" * 3, 1.0),      # short + low cov -> removed
        ("K", "ACGT" * 3, 5.0),      # short but covered -> kept
        ("M", "ACGT" * 50, 1.0),     # low cov but long -> kept
    ])
    edges = make_edges(spark, [
        ("L", "ff", "K", 4), ("K", "rr", "L", 4), ("K", "ff", "M", 4),
    ])
    n2, e2, doomed = graph.remove_low_coverage(nodes, edges, low_cov_thresh=1.0,
                                               max_len=72)
    assert {r.node_id for r in doomed.collect()} == {"L"}
    assert {r.node_id for r in n2.collect()} == {"K", "M"}
    assert {(r.src, r.dst) for r in e2.collect()} == {("K", "M")}


# --------------------------------------------------------------------------
# C5(d) boundary cuts (reference walk: CutRepeatBoundary.java:389-414)
# --------------------------------------------------------------------------

def test_boundary_cut_below_repeated_overlap(spark):
    edges = make_edges(spark, [
        ("X", "ff", "A", 10),
        ("X", "ff", "B", 8), ("X", "ff", "C", 8),    # boundary = 8 (support 2)
        ("X", "ff", "D", 5),
    ])
    cuts = {(r.src, r.dst, r.ov)
            for r in graph.overlap_boundary_cuts(edges).collect()}
    # boundary 8 < max 10 -> cut everything with ov <= 8, keep the best edge
    assert cuts == {("X", "B", 8), ("X", "C", 8), ("X", "D", 5)}


def test_boundary_no_cut_when_boundary_is_max(spark):
    # the two largest overlaps are EQUAL: boundary == max -> the strictly-
    # less guard suppresses the cut (the old cumulative-count form wrongly
    # cut the whole side here)
    edges = make_edges(spark, [
        ("X", "ff", "A", 10), ("X", "ff", "B", 10), ("X", "ff", "C", 5),
    ])
    assert graph.overlap_boundary_cuts(edges).count() == 0


def test_boundary_no_cut_without_repeated_overlap(spark):
    edges = make_edges(spark, [
        ("X", "ff", "A", 10), ("X", "ff", "B", 8), ("X", "ff", "C", 5),
    ])
    assert graph.overlap_boundary_cuts(edges).count() == 0


def test_count_braids_motif(spark):
    """G10: X's f-side fans out to two agreeing neighbors whose entry-side
    consensus also holds -> exactly one braid (CountBraid.java:298-373)."""
    nodes = make_nodes(spark, [
        ("X", "AAAAAA", 1.0), ("A", "TTGGGG", 1.0), ("B", "TTGGGG", 1.0),
    ])
    edges = make_edges(spark, [
        ("X", "ff", "A", 2), ("A", "rr", "X", 2),
        ("X", "ff", "B", 2), ("B", "rr", "X", 2),
    ])
    out = consensus.count_braids(nodes, edges, pwm_n=0.5).collect()[0]
    assert out.braids == 1


def test_count_braids_absent_when_consensus_fails(spark):
    nodes = make_nodes(spark, [
        ("X", "AAAAAA", 1.0), ("A", "TTGGGG", 1.0), ("B", "TTCCCC", 1.0),
    ])
    edges = make_edges(spark, [
        ("X", "ff", "A", 2), ("A", "rr", "X", 2),
        ("X", "ff", "B", 2), ("B", "rr", "X", 2),
    ])
    out = consensus.count_braids(nodes, edges, pwm_n=0.1).collect()[0]
    assert out.braids == 0
