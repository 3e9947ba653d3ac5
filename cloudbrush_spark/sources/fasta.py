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

from pyspark.sql import DataFrame, SparkSession, Window
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


def read_fastq(spark: SparkSession, path: str, mate_suffix: bool = True) -> DataFrame:
    """S1: FASTQ -> (read_id, seq).

    zipWithIndex-equivalent via monotonically-increasing row ids is unsafe
    across files; instead pair lines per-file with a window on
    (file, line_no) from ``text`` + ``input_file_name``.  Record = 4 lines;
    line 0 header (@name), line 1 sequence.
    """
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_no", F.row_number().over(
            Window.partitionBy("file").orderBy(F.monotonically_increasing_id())) - 1)
    )
    headers = lines.filter(F.col("line_no") % 4 == 0).select(
        "file", (F.col("line_no") / 4).cast("long").alias("rec"),
        F.regexp_replace(F.col("value"), r"^@", "").alias("read_id"),
    )
    seqs = lines.filter(F.col("line_no") % 4 == 1).select(
        "file", (F.col("line_no") / 4).cast("long").alias("rec"),
        F.upper(F.col("value")).alias("seq"),
    )
    out = headers.join(seqs, ["file", "rec"]).select("read_id", "seq")
    if mate_suffix:
        # normalize "name/1" -> "name_1" like data/preprocessor.pl:33-38
        out = out.withColumn("read_id", F.regexp_replace("read_id", r"/([12])$", "_$1"))
    return out


def write_fasta(contigs: DataFrame, path: str, id_col: str = "node_id",
                seq_col: str = "seq", cov_col: str = "cov", wrap: int = 60) -> None:
    """K1 Graph2Fasta: ``>id len=N cov=C`` + wrapped sequence, one text file
    per partition (map-only; src/Brush/Graph2Fasta.java:54-77,108)."""
    wrapped = F.regexp_replace(
        F.col(seq_col), "(.{" + str(wrap) + "})", "$1\n"
    )
    rec = F.concat(
        F.lit(">"), F.col(id_col),
        F.lit(" len="), F.length(seq_col).cast("string"),
        F.lit(" cov="), F.format_number(F.col(cov_col), 2),
        F.lit("\n"), F.rtrim(wrapped),
    )
    contigs.select(rec.alias("value")).write.mode("overwrite").text(path)


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
