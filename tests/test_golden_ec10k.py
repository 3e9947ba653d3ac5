"""Golden end-to-end test: assemble the reference's bundled Ec10k dataset
(20,000 simulated 36 bp reads from the first 10 kb of E. coli K-12) with
the reference invocation parameters (k=21, readlen=36 —
/root/reference/README.md:27) and check stage counters + contig
invariants against the included reference genome
(/root/reference/data/Ecoli.10k.fa).

Exact contig-set equality with the reference is not the bar (randomized
merge order, float coverage — SURVEY §7 milestone 5); invariants are:
- stage counters fire (dedup, overlap join, cuts, tips, low-cov);
- assembled contigs are genuine: the overwhelming majority must be exact
  substrings of the source genome (fwd or rc);
- N50 exceeds the read length (assembly actually assembled);
- total contig bp stays within sane conservation bounds.
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
    assert 0 < c["final_nodes"] < 2500


def test_contigs_are_genome_substrings(assembly):
    _, contigs = assembly
    fwd, rev = _genome()
    exact = sum(1 for s in contigs if s in fwd or s in rev)
    # merged contigs must be genuine genome substrings; the non-matching
    # residue is isolated error reads surviving as 36 bp singletons
    assert exact / len(contigs) >= 0.85
    # merged contigs that carry an error base (paths through an error
    # read's dirty region): 53.5% of the raw reads contain errors
    # (~2%/base), so a thin tail is inherent without CloudRS correction
    bad_long = [s for s in contigs
                if len(s) > 40 and s not in fwd and s not in rev]
    assert len(bad_long) / len(contigs) < 0.08


def test_assembly_stats_invariants(assembly):
    _, contigs = assembly
    lens = sorted((len(s) for s in contigs), reverse=True)
    total = sum(lens)
    # N50 > readlen: real merging happened
    cum = 0
    n50 = 0
    for s in lens:
        cum += s
        if 2 * cum >= total:
            n50 = s
            break
    assert n50 > 36
    assert max(lens) >= 150             # at least one long merged contig
    # conservation: more than the genome, far less than the raw read mass
    assert 10_000 * 0.9 < total < 20_000 * 36
