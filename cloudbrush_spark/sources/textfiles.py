"""Line-oriented text-file sources/sinks: JSONL and quoted CSV.

Training-data pipelines almost never receive parquet — crawl dumps and
vendor drops arrive as JSONL (one object per line) or CSV, and the
engine must ingest them with an EXPLICIT schema (schema inference is a
full extra pass over 100 TB and type-flaps between samples) and a
poisoned-row policy (a malformed line must not abort a 10^9-line load).

Reference parity note: these play the role the reference's text scanners
play for its formats (the FASTQ/SFA preprocessor family,
data/preprocessor.pl:33-51 and src/Brush/* text inputs) — byte-exact
round-trips through a line-oriented interchange format, checked by the
`source_roundtrips` driver row.

Scale notes:
- JSONL is line-splittable: Spark assigns file SPLITS, not files, so a
  single 1 TB JSONL file still fans out across executors.
- CSV with embedded newlines requires ``multiLine=true``, which makes
  each FILE a single parse unit (quote state can't be recovered
  mid-file).  Publish bounded file sizes (the corpus sink convention)
  and parallelism comes from file count; never one giant multiline CSV.
- Both readers run PERMISSIVE: damaged lines surface as NULLs in a
  ``_corrupt_record`` column (JSONL) or NULL fields (CSV) instead of
  failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, files: int = 4) -> None:
    """Write ``df`` as JSONL (one JSON object per line, UTF-8).  Spark's
    json sink escapes control characters and quotes per RFC 8259, so
    embedded newlines/tabs/quotes in string columns survive verbatim."""
    df.coalesce(files).write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str,
               keep_corrupt: bool = False) -> DataFrame:
    """Schema-on-read JSONL scan.  ``schema`` is an explicit DDL string —
    inference is deliberately not offered.  With ``keep_corrupt`` the
    PERMISSIVE corrupt-record column is appended so damaged lines can be
    routed to a quarantine sink instead of silently dropped."""
    ddl = schema + (f", {CORRUPT_COL} string" if keep_corrupt else "")
    reader = spark.read.schema(ddl).option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def write_csv_quoted(df: DataFrame, path: str, files: int = 4) -> None:
    """Write RFC-4180-style CSV: fields containing separator/quote/newline
    are double-quoted and embedded quotes are DOUBLED (escape = quote
    char), the convention every external CSV consumer understands."""
    (df.coalesce(files).write.mode("overwrite")
     .option("header", True).option("quote", '"').option("escape", '"')
     # the writer TRIMS field-edge whitespace by default — byte-exact
     # round-trips require turning that off (caught by the hypothesis
     # property test)
     .option("ignoreLeadingWhiteSpace", False)
     .option("ignoreTrailingWhiteSpace", False)
     .csv(path))


def read_csv_quoted(spark: SparkSession, path: str, schema: str,
                    multi_line: bool = True) -> DataFrame:
    """Explicit-schema RFC-4180 CSV scan.  ``multi_line`` enables embedded
    newlines inside quoted fields at the cost of per-file (not per-split)
    parsing — see the module scale note; pass False for newline-free data
    to keep splits."""
    return (spark.read.schema(schema)
            .option("header", True).option("quote", '"')
            .option("escape", '"').option("multiLine", multi_line)
            .option("mode", "PERMISSIVE")
            .csv(path))


def write_orc(df: DataFrame, path: str, files: int = 4) -> None:
    """Write ORC (zlib-striped columnar) — the Hive-ecosystem interchange
    format a warehouse drop often arrives in; the codec is pinned to
    zlib, ORC's universally-readable default, so the interchange
    contract doesn't drift with the Spark session default (snappy on
    3.x, zstd on 4.x).  Binary-safe: string columns round-trip
    byte-exact with no escape convention to get wrong, unlike the line
    formats above."""
    (df.coalesce(files).write.mode("overwrite")
     .option("compression", "zlib").orc(path))


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Explicit-schema ORC scan (same discipline as the other readers:
    never infer on 100 TB; a schema mismatch surfaces as NULL columns,
    not a job abort).  ORC is natively splittable by stripe, so a single
    large file still fans out across executors, and predicate pushdown /
    column pruning work like parquet's."""
    return spark.read.schema(schema).orc(path)
