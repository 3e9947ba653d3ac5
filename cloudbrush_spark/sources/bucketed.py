"""Bucketed-table storage for co-located joins.

At 100 TB the dominant recurring cost is re-shuffling fact tables for the
same join key query after query.  Writing both sides bucketed (and
sorted) by the join key makes the join a zero-exchange sort-merge over
aligned buckets — the Spark-native equivalent of co-partitioned storage.
Pinned by tests/test_bucketed.py: the bucketed join plans with NO
Exchange.

Use for: node/edge tables between assembly stages keyed by node id,
posting tables keyed by token/shingle, event tables keyed by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str], buckets: int,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a managed parquet table bucketed (and sorted) by
    ``keys`` — subsequent equi-joins/aggregations on those keys read
    pre-partitioned data and skip the exchange."""
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides along from the
    catalog; plain ``read.parquet`` on the files would lose it)."""
    return spark.table(table)
