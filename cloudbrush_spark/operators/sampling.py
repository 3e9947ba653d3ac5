"""Deterministic, content-addressed sampling and split assignment.

Training-data pipelines need reproducible sampling that survives reruns,
repartitions and engine changes: bucket by a cryptographic hash of the
row's identity, not by ``rand()``.  md5 keeps the operators engine-portable
(identical assignment in any SQL engine — the property that makes them
oracle-checkable), and a seed string namespaces independent splits.

Scale shape: pure expressions (codegen), no shuffle at all — sampling and
split assignment are narrow transformations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, buckets: int = 100,
                seed: str = "split") -> Column:
    """Stable bucket in [0, buckets) from md5(seed | id)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    hv = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return (hv % buckets).cast("int")


def assign_split(df: DataFrame, id_col: str, train: float = 0.9,
                 val: float = 0.05, seed: str = "split") -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') by hash bucket —
    deterministic, disjoint, and stable under any reordering of the data."""
    b = hash_bucket(id_col, 1000, seed)
    t_hi = int(train * 1000)
    v_hi = t_hi + int(val * 1000)
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         seed: str = "sample") -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash — reproducible
    across runs and engines (unlike df.sample, which depends on
    partitioning)."""
    return df.filter(hash_bucket(id_col, 1_000_000, seed) < int(fraction * 1_000_000))
