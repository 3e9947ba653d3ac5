"""Mate-pair golden variant: deterministic, error-free paired reads
simulated from the bundled 10 kb E. coli genome slice, assembled with
``mate_adjust=True`` so the pairedgeAdjustment loop — A2 CountReads ->
J4 AdjustMateEdge -> G2 EdgeRemoval (src/Brush/BrushAssembler.java:705-775)
— runs END-TO-END on real pair_ends arrays (not just the unit fixtures).

Read layout: insert length 200, read length 36, one pair every 9 bp
(~8x coverage); /2 ends are reverse-complemented, ids follow the
reference's ``x_1``/``x_2`` mate convention (src/Brush/Node.java:283-296).
Clean reads => the graph contracts to essentially the full genome, every
node's pair_ends survives dedup+merge splicing, and J4's support counting
sees real mate mass.
"""

import os

import pytest
from pyspark.sql import functions as F

GENOME_FA = "/root/reference/data/Ecoli.10k.fa"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GENOME_FA), reason="golden genome not present")

READLEN = 36
INSLEN = 200
STEP = 9


def _genome() -> str:
    g = ""
    with open(GENOME_FA) as fh:
        for line in fh:
            if not line.startswith(">"):
                g += line.strip().upper()
    return g


def _paired_reads(genome: str) -> list[tuple[str, str]]:
    comp = str.maketrans("ACGT", "TGCA")
    rows = []
    for i, start in enumerate(range(0, len(genome) - INSLEN, STEP)):
        fwd = genome[start:start + READLEN]
        mate = genome[start + INSLEN - READLEN:start + INSLEN]
        rows.append((f"{i}_1", fwd))
        rows.append((f"{i}_2", mate.translate(comp)[::-1]))
    return rows


@pytest.fixture(scope="module")
def mate_assembly(spark):
    from cloudbrush_spark.config import BrushParams
    from cloudbrush_spark.pipeline.assembler import Assembler

    genome = _genome()
    reads = spark.createDataFrame(
        _paired_reads(genome), "read_id string, seq string")
    asm = Assembler(spark, BrushParams(
        k=21, readlen=READLEN, mate_adjust=True,
        inslen=INSLEN, inslen_sd=20))
    nodes, edges = asm.assemble(reads)
    contigs = [r.seq for r in nodes.select("seq").collect()]
    if "pair_ends" in nodes.columns:
        surviving_reads = (
            nodes.select(F.explode(F.coalesce(
                "pair_ends", F.array().cast("array<string>"))).alias("r"))
            .distinct().count())
    else:
        surviving_reads = -1
    return asm, contigs, genome, surviving_reads


def test_mate_loop_ran(mate_assembly):
    asm, _, _, _ = mate_assembly
    # the pairedgeAdjustment loop executed and recorded its counter
    # (0 cuts is legitimate on a clean repeat-free genome slice — the
    # reference's loop also exits on the first 0-cut round)
    assert "mate_edge_cuts" in asm.counters
    assert asm.counters["mate_edge_cuts"] >= 0


def test_clean_reads_reconstruct_genome(mate_assembly):
    asm, contigs, genome, _ = mate_assembly
    comp = str.maketrans("ACGT", "TGCA")
    rc = genome.translate(comp)[::-1]
    # error-free uniform reads: the dominant contig must be a large exact
    # genome substring (fwd or rc)
    big = max(contigs, key=len)
    assert len(big) >= 2000
    assert big in genome or big in rc
    assert asm.counters["final_nodes"] < 100


def test_pair_ends_survive_merging(mate_assembly):
    asm, contigs, genome, surviving_reads = mate_assembly
    # pair_ends member-read arrays must survive dedup + chain merging: on
    # clean reads, nearly every input read id is still present in some
    # final node's pair_ends (J4's support counting reads exactly these;
    # a splice bug here silently zeroes all mate support)
    n_reads = 2 * len(range(0, len(genome) - INSLEN, STEP))
    assert surviving_reads >= 0.9 * n_reads
