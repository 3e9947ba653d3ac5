"""Sequence-file scans and sinks (SURVEY §2.1 S1/S2/K1/K2).

All readers produce DataFrames and keep parsing declarative:
- SFA (``id\tseq``): plain csv scan (reference parser
  src/Brush/GenNonContainedReads.java:62-79).
- FASTQ: 4-line records paired via a row-index window — the Spark
  re-expression of data/preprocessor.pl:40-51, which joins header+seq
  lines and normalizes read names.
- FASTA sink: ``>id len= cov=`` header + 60-char-wrapped sequence
  (src/Brush/Graph2Fasta.java:54-77); map-only, no shuffle.
- SFA sink re-emitting reads cov times (src/Brush/Graph2Sfa.java:66-76)
  via explode(sequence(...)) — no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

READ_SCHEMA = T.StructType([
    T.StructField("read_id", T.StringType(), False),
    T.StructField("seq", T.StringType(), False),
])


def read_sfa(spark: SparkSession, path: str) -> DataFrame:
    """S2: tab-separated ``read_id\tseq`` scan."""
    return (
        spark.read.csv(path, sep="\t", schema=READ_SCHEMA)
        .withColumn("seq", F.upper(F.col("seq")))
    )


def _list_files(spark: SparkSession, path: str) -> list[str]:
    """File listing via the binaryFile source (metadata only — the content
    column is never touched, so nothing is read)."""
    return [r.path for r in
            spark.read.format("binaryFile").load(path).select("path").collect()]


def read_fastq(spark: SparkSession, path: str, mate_suffix: bool = True,
               min_partitions_per_file: int | None = None) -> DataFrame:
    """S1: FASTQ -> (read_id, seq); record = 4 lines, line 0 header (@name),
    line 1 sequence (data/preprocessor.pl:40-51).

    Parallel ingest: each file is read as a *splittable* text RDD and line
    numbers are assigned with ``zipWithIndex`` (exact per-file order, one
    cheap counting job) — a single 1 TB FASTQ parses across thousands of
    input splits, never one task.  Line numbers, not '@' sniffing, decide
    record boundaries: quality lines may legally start with '@', so byte-
    level record detection is ambiguous and index arithmetic is not.

    Each file contributes one shuffle on its record index; files union
    into one DataFrame (the big-file case is the scale case — file count
    is operationally bounded).
    """
    sc = spark.sparkContext
    per_file = []
    for f in _list_files(spark, path):
        rdd = (sc.textFile(f, minPartitions=min_partitions_per_file or sc.defaultParallelism)
               .zipWithIndex()
               .map(lambda t, fname=f: (fname, t[1] // 4, int(t[1] % 4), t[0])))
        per_file.append(spark.createDataFrame(
            rdd, "file string, rec long, pos int, value string"))
    if not per_file:
        return spark.createDataFrame([], READ_SCHEMA)
    lines = per_file[0]
    for df in per_file[1:]:
        lines = lines.unionByName(df)
    recs = lines.filter(F.col("pos") <= 1).groupBy("file", "rec").agg(
        F.max(F.when(F.col("pos") == 0, F.col("value"))).alias("hdr"),
        F.max(F.when(F.col("pos") == 1, F.col("value"))).alias("seq"),
    )
    out = recs.select(
        F.regexp_replace(F.col("hdr"), r"^@", "").alias("read_id"),
        F.upper(F.col("seq")).alias("seq"),
    )
    if mate_suffix:
        # normalize "name/1" -> "name_1" like data/preprocessor.pl:33-38
        out = out.withColumn("read_id", F.regexp_replace("read_id", r"/([12])$", "_$1"))
    return out


def fasta_records(contigs: DataFrame, id_col: str = "node_id",
                  seq_col: str = "seq", cov_col: str = "cov",
                  wrap: int = 60) -> DataFrame:
    """K1 record expression: one ``value`` string per contig —
    ``>id len=N cov=C`` + wrap-char-wrapped sequence
    (src/Brush/Graph2Fasta.java:54-77).  Shared by write_fasta and the
    driver-oracle query (k1_fasta_format)."""
    wrapped = F.regexp_replace(
        F.col(seq_col), "(.{" + str(wrap) + "})", "$1\n"
    )
    rec = F.concat(
        F.lit(">"), F.col(id_col),
        F.lit(" len="), F.length(seq_col).cast("string"),
        F.lit(" cov="), F.format_number(F.col(cov_col), 2),
        F.lit("\n"), F.rtrim(wrapped),
    )
    return contigs.select(rec.alias("value"))


def write_fasta(contigs: DataFrame, path: str, id_col: str = "node_id",
                seq_col: str = "seq", cov_col: str = "cov", wrap: int = 60) -> None:
    """K1 Graph2Fasta sink: map-only text write of fasta_records
    (src/Brush/Graph2Fasta.java:54-77,108)."""
    fasta_records(contigs, id_col, seq_col, cov_col, wrap) \
        .write.mode("overwrite").text(path)


def write_sfa_expanded(nodes: DataFrame, path: str, id_col: str = "node_id",
                       seq_col: str = "seq", cov_col: str = "cov") -> None:
    """K2 Graph2Sfa: re-emit each node's sequence round(cov) times with
    renumbered ids (src/Brush/Graph2Sfa.java:66-76) — explode, not a loop."""
    out = (
        nodes.withColumn("i", F.explode(F.sequence(
            F.lit(1), F.greatest(F.round(F.col(cov_col)).cast("int"), F.lit(1)))))
        .select(
            F.concat_ws("_", F.col("i").cast("string"), F.col(id_col)).alias("read_id"),
            F.col(seq_col),
        )
    )
    out.select(F.concat_ws("\t", "read_id", seq_col).alias("value")) \
       .write.mode("overwrite").text(path)
