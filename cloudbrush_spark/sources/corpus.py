"""Curated-corpus publish sink: the write side of the curation pipeline.

``pipeline/curation.curate`` emits a MANIFEST (id, split, features); this
module joins it back to the raw corpus and writes the final training set
as split-partitioned parquet — the layout a downstream trainer reads.

The reference's sink analogue is K1 Graph2Fasta (assembly results out,
src/Brush/Graph2Fasta.java:54-77); a document corpus instead needs:

- **Hive-style split partitioning** (``partitionBy(split)``) so a reader
  asking for one split prunes the others at the directory level — no
  file of the wrong split is even listed.
- **Bounded, balanced file counts.**  A blind ``partitionBy`` write emits
  one file per (task, split) — up to tasks x splits small files, the
  classic 100 TB small-file explosion.  Range-repartitioning on
  (split, hash(id) % files_per_split) into splits x files_per_split
  partitions before the write caps output at ``files_per_split`` files
  per split; the range partitioner SAMPLES the key distribution, so the
  partitions are sized by observed frequency rather than blind hashing
  (hash-repartition collides distinct (split, bucket) keys into shared
  tasks at the birthday rate, silently merging files and doubling their
  size).  Adjacent buckets may still share a task, so file sizes are
  approximately — not exactly — balanced; ``max_records_per_file`` is
  the hard overflow valve.  Callers size files_per_split =
  split_bytes / target_file_size.
- **Within-file ordering** (``sortWithinPartitions(id)``) so parquet
  min/max column stats on the id are tight and id-range scans prune at
  the row-group level.

The join manifest->corpus is an inner equi-join on the id: broadcast it
when the manifest is small after heavy curation; at full scale it is a
plain shuffle join AQE can split — pass ``broadcast_manifest=False``
(the default) and let stats decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def publish_corpus(docs: DataFrame, manifest: DataFrame, path: str,
                   id_col: str = "doc_id", split_col: str = "split",
                   files_per_split: int = 16,
                   n_splits: int = 3,
                   max_records_per_file: int = 5_000_000,
                   broadcast_manifest: bool = False,
                   compression: str = "zstd",
                   carry_cols: tuple[str, ...] = ()) -> None:
    """Join the curation manifest back to the raw corpus and write the
    published training set at ``path`` partitioned by split.

    If ``docs`` already carries a ``split_col`` column (a stale
    assignment from an earlier pipeline), it is dropped: the manifest's
    assignment is authoritative, and keeping both would make the join
    output ambiguous.

    ``carry_cols`` names extra manifest columns copied onto the published
    rows (e.g. the release pipeline's copy/shard_id/offset) — a manifest
    id may then map to SEVERAL published rows (one per up-sampled copy)."""
    if split_col in docs.columns:
        docs = docs.drop(split_col)
    m = manifest.select(id_col, split_col, *carry_cols)
    if broadcast_manifest:
        m = F.broadcast(m)
    out = docs.join(m, id_col)
    out = (
        out.repartitionByRange(
            n_splits * files_per_split,
            F.col(split_col),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_split)))
        # split_col leads the sort: partitionBy's required ordering (the
        # partition columns) is then already satisfied, so the file writer
        # does NOT inject its own re-sort — which would not preserve the
        # id order — and each written file stays id-sorted
        .sortWithinPartitions(split_col, id_col)
    )
    (out.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(split_col)
        .parquet(path))


def read_corpus(spark: SparkSession, path: str,
                split: str | None = None,
                split_col: str = "split") -> DataFrame:
    """Read a published corpus; ``split`` filters via partition pruning
    (directory-level — verify with .explain(): PartitionFilters, not
    PushedFilters)."""
    df = spark.read.parquet(path)
    if split is not None:
        df = df.filter(F.col(split_col) == split)
    return df


def compact_batches(spark: SparkSession, stream_dir: str, out_path: str,
                    files: int = 16, id_col: str = "doc_id",
                    compression: str = "zstd") -> int:
    """Compact a ``streaming.stream_publish`` output directory (many
    small ``batch=<id>/`` files accreted micro-batch by micro-batch)
    into ``files`` bounded, id-sorted parquet files — the periodic batch
    job that keeps a continuously-published corpus readable (the
    small-file explosion is THE operational failure mode of streaming
    sinks at 100 TB; compaction is how production pipelines cap it).

    Reads only COMMITTED batches — those whose ``_committed_<id>``
    marker exists — so a concurrently-running in-flight micro-batch is
    never half-read; the stream keeps appending while compaction runs.

    Returns the number of batches compacted.
    """
    import os
    import re

    committed = sorted(
        int(m.group(1)) for f in os.listdir(stream_dir)
        if (m := re.fullmatch(r"_committed_(\d+)", f)))
    if not committed:
        raise ValueError(f"no committed batches under {stream_dir}")
    paths = [os.path.join(stream_dir, f"batch={b}") for b in committed]
    df = spark.read.parquet(*paths)
    (df.repartition(files, F.col(id_col))
       .sortWithinPartitions(id_col)
       .write.mode("overwrite")
       .option("compression", compression)
       .parquet(out_path))
    return len(committed)
