"""Operator library: reference surface (SURVEY §2) + LLM-pipeline +
multimodal + join extensions."""

from cloudbrush_spark.operators import (  # noqa: F401
    bubbles,
    consensus,
    contraction,
    dedup,
    graph,
    joins,
    kmers,
    mates,
    multimodal,
    overlap,
    sessions,
    similarity,
    stats,
    textops,
)
