"""Source/sink tests: FASTQ parallel ingest (S1), SFA scan (S2),
FASTA/SFA sinks (K1/K2)."""

import glob
import os

from pyspark.sql import functions as F

from cloudbrush_spark.sources import fasta as src


def _write_fastq(path: str, n: int, prefix: str = "r") -> list[tuple[str, str]]:
    """FASTQ fixture whose quality lines deliberately start with '@' —
    the classic byte-level record-detection trap line numbers avoid."""
    recs = []
    with open(path, "w") as fh:
        for i in range(n):
            name = f"{prefix}{i}/1" if i % 2 == 0 else f"{prefix}{i}/2"
            seq = "ACGT" * (3 + i % 3)
            fh.write(f"@{name}\n{seq}\n+\n" + "@" * len(seq) + "\n")
            recs.append((name.replace("/1", "_1").replace("/2", "_2"), seq))
    return recs


def test_read_fastq_multi_partition(spark, tmp_path):
    p = str(tmp_path / "reads.fastq")
    expect = _write_fastq(p, 37)
    df = src.read_fastq(spark, p, min_partitions_per_file=5)
    got = {(r.read_id, r.seq) for r in df.collect()}
    assert got == set(expect)
    # parallel ingest: the underlying line scan splits a single file into
    # multiple input partitions (AQE may later coalesce the tiny shuffle)
    assert spark.sparkContext.textFile(p, minPartitions=5).getNumPartitions() > 1


def test_read_fastq_multiple_files_no_collision(spark, tmp_path):
    d = tmp_path / "fq"
    d.mkdir()
    e1 = _write_fastq(str(d / "a.fastq"), 8, prefix="a")
    e2 = _write_fastq(str(d / "b.fastq"), 8, prefix="b")
    df = src.read_fastq(spark, str(d))
    got = {(r.read_id, r.seq) for r in df.collect()}
    assert got == set(e1) | set(e2)


def test_read_sfa_roundtrip_with_expand_sink(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("n1", "ACGTACGT", 2.0), ("n2", "TTTTCCCC", 1.0)],
        "node_id string, seq string, cov double")
    out = str(tmp_path / "sfa_out")
    src.write_sfa_expanded(nodes, out)
    back = src.read_sfa(spark, out + "/*.txt")
    rows = {(r.read_id, r.seq) for r in back.collect()}
    # n1 re-emitted cov=2 times with renumbered ids, n2 once
    assert rows == {("1_n1", "ACGTACGT"), ("2_n1", "ACGTACGT"), ("1_n2", "TTTTCCCC")}


def test_write_fasta_format(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("c1", "A" * 130, 3.5)], "node_id string, seq string, cov double")
    out = str(tmp_path / "fa_out")
    src.write_fasta(nodes, out)
    text = ""
    for f in sorted(glob.glob(os.path.join(out, "part-*"))):
        with open(f) as fh:
            text += fh.read()
    lines = [ln for ln in text.splitlines() if ln]
    assert lines[0] == ">c1 len=130 cov=3.50"
    assert lines[1] == "A" * 60 and lines[2] == "A" * 60 and lines[3] == "A" * 10


def test_read_fastq_gzip(spark, tmp_path):
    """Compressed FASTQ ingests through the same line-index parser:
    sc.textFile decompresses .gz transparently (single split per file —
    gzip is not splittable, which is why the scale path prefers many
    files or uncompressed/zstd-seekable inputs)."""
    import gzip
    p = tmp_path / "reads.fastq.gz"
    with gzip.open(p, "wt") as fh:
        for i in range(5):
            fh.write(f"@g{i}/1\nACGTACGT\n+\n@IIIIIII\n")
    out = {r.read_id: r.seq
           for r in src.read_fastq(spark, str(p), mate_suffix=True).collect()}
    assert out == {f"g{i}_1": "ACGTACGT" for i in range(5)}


def test_read_sfa_gzip(spark, tmp_path):
    import gzip
    p = tmp_path / "reads.sfa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("a\tacgt\nb\tTTGG\n")
    out = {r.read_id: r.seq for r in src.read_sfa(spark, str(p)).collect()}
    assert out == {"a": "ACGT", "b": "TTGG"}
