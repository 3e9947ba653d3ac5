"""Scans and sinks: SFA/FASTQ readers, FASTA/SFA writers, binary listing."""

from cloudbrush_spark.sources import fasta  # noqa: F401
