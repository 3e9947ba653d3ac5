"""Golden end-to-end test: assemble the reference's bundled Ec10k dataset
(20,000 simulated 36 bp reads from the first 10 kb of E. coli K-12) with
the reference invocation parameters (k=21, readlen=36 —
/root/reference/README.md:27) and check stage counters + contig
invariants against the included reference genome
(/root/reference/data/Ecoli.10k.fa).

Expected shape (recorded in BASELINE.md): the 10 kb genome reconstructs
into a handful of contigs dominated by one multi-kb contig (N50 ~8 kb),
total bp ~1.05x the genome, with ~0.1% base error from merging through
uncorrected error reads (53.5% of the raw reads carry >= 1 error; the
reference defers correction to its CloudRS companion).  Invariants are
therefore window-identity and distribution-shaped, not exact contig sets
(randomized merge order, float coverage — SURVEY §7 milestone 5).
"""

import os

import pytest
from pyspark.sql import functions as F

SFA = "/root/reference/data/Ec10k.sim.sfa"
GENOME_FA = "/root/reference/data/Ecoli.10k.fa"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(SFA) and os.path.exists(GENOME_FA)),
    reason="golden dataset not present")


@pytest.fixture(scope="module")
def assembly(spark):
    from cloudbrush_spark.config import BrushParams
    from cloudbrush_spark.pipeline.assembler import Assembler
    from cloudbrush_spark.sources.fasta import read_sfa

    asm = Assembler(spark, BrushParams(k=21, readlen=36))
    nodes, edges = asm.assemble(read_sfa(spark, SFA))
    contigs = [r.seq for r in nodes.select("seq").collect()]
    return asm, contigs


def _genome():
    g = ""
    with open(GENOME_FA) as fh:
        for line in fh:
            if not line.startswith(">"):
                g += line.strip().upper()
    comp = str.maketrans("ACGT", "TGCA")
    return g, g.translate(comp)[::-1]


def test_stage_counters(assembly):
    asm, _ = assembly
    c = asm.counters
    assert c["nodes"] == 16507          # P1 dedup of 20,000 reads
    assert c["edges"] > 100_000         # J1-J3 overlap graph
    assert c["tips_removed"] > 0 and c["lowcov_removed"] > 0
    # disconnected tip-short islands are counted, never clipped
    # (src/Brush/TipsRemoval.java:84-89)
    assert c["tips_island"] >= 0
    assert 0 < c["final_nodes"] < 200   # near-complete reconstruction


def test_contigs_are_genome_faithful(assembly):
    """Every merged contig must be window-identical to the genome: >= 90%
    of its 50 bp windows appear exactly (fwd or rc).  The residue of
    read-length singletons is isolated error reads."""
    _, contigs = assembly
    fwd, rev = _genome()
    merged = [s for s in contigs if len(s) >= 50]
    assert merged, "no merged contigs at all"
    all_wins = all_hits = 0
    for s in merged:
        wins = [s[i:i + 50] for i in range(0, len(s) - 49, 50)] or [s[:50]]
        hits = sum(1 for w in wins if w in fwd or w in rev)
        all_wins += len(wins)
        all_hits += hits
        if s == max(merged, key=len):
            # the dominant contig itself must be >= 90% window-identical
            assert hits / len(wins) >= 0.9, f"main contig: {hits}/{len(wins)}"
    # 0.85, not 0.9: the reference's effective MAX_LOW_COV_LEN is
    # (thresh+1)*readlen - thresh*k = 51 (RemoveLowCoverage.java:63-66),
    # so 52-72 bp low-coverage error fragments legitimately survive the
    # uncorrected run; the corrected-run test below holds the strong bar
    assert all_hits / all_wins >= 0.85, f"overall: {all_hits}/{all_wins}"
    singletons = [s for s in contigs if len(s) < 50]
    assert len(singletons) < 50


def test_assembly_stats_invariants(assembly):
    _, contigs = assembly
    lens = sorted((len(s) for s in contigs), reverse=True)
    total = sum(lens)
    cum = 0
    n50 = 0
    for s in lens:
        cum += s
        if 2 * cum >= total:
            n50 = s
            break
    assert n50 > 1000                    # multi-kb reconstruction
    assert max(lens) >= 5000             # dominant contig spans the genome
    # conservation: ~genome-sized assembly, far below the raw read mass
    assert 10_000 * 0.9 < total < 10_000 * 2


@pytest.fixture(scope="module")
def corrected_assembly(spark):
    from cloudbrush_spark.config import BrushParams
    from cloudbrush_spark.pipeline.assembler import Assembler
    from cloudbrush_spark.sources.fasta import read_sfa

    asm = Assembler(spark, BrushParams(k=21, readlen=36,
                                       precorrect=True, precorrect_rounds=2))
    nodes, _ = asm.assemble(read_sfa(spark, SFA))
    contigs = [r.seq for r in nodes.select("seq").collect()]
    return asm, contigs


@pytest.fixture(scope="module")
def trusted_assembly(spark):
    from cloudbrush_spark.config import BrushParams
    from cloudbrush_spark.pipeline.assembler import Assembler
    from cloudbrush_spark.sources.fasta import read_sfa

    asm = Assembler(spark, BrushParams(k=21, readlen=36,
                                       precorrect=True, precorrect_rounds=2,
                                       trust_filter=True))
    nodes, _ = asm.assemble(read_sfa(spark, SFA))
    contigs = [r.seq for r in nodes.select("seq").collect()]
    return asm, contigs


def test_trusted_assembly_is_read_consensus_exact(trusted_assembly, spark):
    """The residual ~0.1% 'base error' of the corrected assembly is
    DATASET-INTRINSIC, not a pipeline defect: at every position where the
    dominant contigs differ from Ecoli.10k.fa, ZERO raw reads carry the
    FASTA base while ~20-50 reads unanimously carry the contig base — the
    bundled reads were simulated from a genome that diverges from the
    bundled FASTA at ~10 sites (verified round 6; more PreCorrect rounds,
    A6 trust gating and vote-ratio changes all leave these positions
    untouched because there is no read evidence to correct toward).

    The strong property the pipeline CAN promise is therefore
    consensus-exactness: every multi-kb contig base either matches the
    genome or is the unanimous raw-read consensus at that site, i.e. the
    assembly introduces zero errors of its own.  Junk error fragments are
    bounded to <150 bp total.
    """
    from cloudbrush_spark.sources.fasta import read_sfa
    _, contigs = trusted_assembly
    fwd, rev = _genome()
    comp = str.maketrans("ACGT", "TGCA")
    raw = [r.seq for r in
           read_sfa(spark, SFA).select("seq").collect()]

    def votes(pat):
        p2 = pat.translate(comp)[::-1]
        return sum(s.count(pat) + s.count(p2) for s in raw)

    big = [s for s in contigs if len(s) >= 1000]
    assert big, "no multi-kb contigs"
    checked = divergent = 0
    for s in big:
        # anchor-align via an exact 50-mer (both strands)
        if s[:50] not in fwd:
            s = s.translate(comp)[::-1]
        off = fwd.find(s[:50])
        assert off >= 0, "contig start is not an exact genome window"
        for i, base in enumerate(s):
            if off + i >= len(fwd):
                break
            checked += 1
            if base == fwd[off + i]:
                continue
            divergent += 1
            gctx = fwd[max(0, off + i - 10):off + i + 11]
            cctx = s[max(0, i - 10):i + 11]
            # the FASTA base has (near-)zero read support — at most a
            # lone error read regenerating it — while the contig base is
            # the overwhelming read consensus (contig context covers the
            # double-divergent sites where a single-swap variant would
            # miss)
            gv, cv = votes(gctx), votes(cctx)
            assert gv <= 1, f"assembly error at genome {off + i}: {gv} vs {cv}"
            assert cv >= 10 * max(1, gv), \
                f"unsupported contig base at {off + i}: {gv} vs {cv}"
    assert checked >= 0.97 * 10232, f"coverage loss: {checked} bp aligned"
    assert divergent <= 15, f"{divergent} divergent sites (expect ~10)"
    junk = sum(len(s) for s in contigs if 50 <= len(s) < 1000)
    assert junk < 150, f"error-fragment mass {junk} bp"


def test_precorrect_edge_seeds_near_complete_assembly(corrected_assembly):
    """A8 with edge-anchored seed families (2 rounds) corrects errors in
    ALL read positions, not just the center 12 of 36 — the assembly
    collapses from ~22 contigs / 1.06x redundancy to single digits at
    ~1.005x.  Pinned loosely (coin-order variation moves contig counts by
    1-2): <= 12 contigs, total bp within 1.02x of the 10,232 bp genome,
    N50 >= 8000."""
    asm, contigs = corrected_assembly
    lens = sorted((len(s) for s in contigs), reverse=True)
    total = sum(lens)
    run = 0
    n50 = 0
    for L in lens:
        run += L
        if run >= total / 2:
            n50 = L
            break
    assert asm.counters["precorrect_fixes"] > 5000
    assert len(lens) <= 12
    assert total <= 1.02 * 10232
    assert n50 >= 8000
