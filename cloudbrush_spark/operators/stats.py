"""Distribution statistics (A1 Stats, A2 CountReads).

The reference computes contig-size distributions with a single hand-coded
reducer (src/Brush/Stats.java:179-411): per-cutoff conditional aggregates,
N50 by descending-size cumulative scan, top-10.  All of it is conditional
aggregation + one window — Catalyst supplies the partial/final split the
reference emulated with a combiner (src/Brush/Stats.java:131-165).

N50 definition (src/Brush/Stats.java:288-335): order items by size
descending; N50 is the size at which the running sum first reaches half the
total; N50Cnt is how many items that took.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The reference's 24 length cutoffs (src/Brush/Stats.java:179-184).
DEFAULT_CUTOFFS = (
    100, 250, 500, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000,
    10000, 15000, 20000, 30000, 40000, 50000, 75000, 100000, 125000,
    150000, 200000, 250000,
)


def n50(df: DataFrame, size_col: str) -> DataFrame:
    """Generic N50 over any size column: one row (n50, n50_cnt, total).

    Window cumulative sum ordered by size desc (ties broken arbitrarily but
    result is tie-insensitive); first row with cum >= total/2.
    """
    w = Window.orderBy(F.col(size_col).desc()).rowsBetween(Window.unboundedPreceding, 0)
    cum = df.select(
        F.col(size_col).cast("long").alias("sz"),
        F.sum(F.col(size_col).cast("long")).over(w).alias("cum"),
        F.row_number().over(Window.orderBy(F.col(size_col).desc())).alias("rn"),
    )
    total = df.agg(F.sum(F.col(size_col).cast("long"))).collect()[0][0] or 0
    hit = cum.filter(F.col("cum") * 2 >= total).orderBy("rn").limit(1)
    return hit.select(
        F.col("sz").alias("n50"),
        F.col("rn").cast("long").alias("n50_cnt"),
        F.lit(total).cast("long").alias("total"),
    )


def size_distribution(df: DataFrame, size_col: str, cov_col: str | None = None,
                      deg_col: Column | None = None,
                      cutoffs: tuple[int, ...] = DEFAULT_CUTOFFS) -> DataFrame:
    """A1 Stats per-cutoff table: for each cutoff c, stats over rows with
    size >= c (src/Brush/Stats.java:260-335).

    Implemented as one pass: explode each row into the cutoffs it clears
    (<= 24 rows each), then a single groupBy — identical result to 24
    separate filtered aggregates but one shuffle.
    Output: (cutoff, cnt, total, mean, n50, n50_cnt [, mean_cov]).
    """
    sz = F.col(size_col).cast("long")
    cleared = F.filter(
        F.array(*[F.lit(c) for c in cutoffs]), lambda c: c <= sz
    )
    exploded = df.withColumn("cutoff", F.explode(cleared))
    w_cum = (
        Window.partitionBy("cutoff").orderBy(F.col(size_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("cutoff")
    with_cum = exploded.select(
        "cutoff",
        sz.alias("sz"),
        (F.col(cov_col).cast("double") if cov_col else F.lit(1.0)).alias("cov"),
        F.sum(sz).over(w_cum).alias("cum"),
        F.row_number().over(Window.partitionBy("cutoff").orderBy(F.col(size_col).desc())).alias("rn"),
        F.sum(sz).over(w_tot).alias("tot"),
    )
    per_cut = with_cum.groupBy("cutoff").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("tot").alias("total"),
        (F.max("tot") / F.count(F.lit(1))).alias("mean"),
        F.avg("cov").alias("mean_cov"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("sz"))).alias("n50"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("rn"))).cast("long").alias("n50_cnt"),
    )
    return per_cut


def top_k(df: DataFrame, order_col: str, k: int = 10) -> DataFrame:
    """Top-k rows by a column (src/Brush/Stats.java:363-377) — Catalyst turns
    orderBy+limit into TakeOrderedAndProject (per-partition heap + merge),
    no global sort."""
    return df.orderBy(F.col(order_col).desc()).limit(k)


def global_counts(nodes: DataFrame, seq_col: str = "seq",
                  pair_col: str | None = "pair_ends") -> DataFrame:
    """A2 CountReads: total member reads + total contig bases
    (src/Brush/CountReads.java:63-73)."""
    reads = (
        F.sum(F.size(F.col(pair_col))) if pair_col and pair_col in nodes.columns
        else F.count(F.lit(1))
    )
    return nodes.agg(
        reads.cast("long").alias("reads"),
        F.sum(F.length(seq_col)).cast("long").alias("ctg_sum"),
    )
