"""Distribution statistics (A1 Stats, A2 CountReads).

The reference computes contig-size distributions with a single hand-coded
reducer (src/Brush/Stats.java:179-411): per-cutoff conditional aggregates,
N50 by descending-size cumulative scan, top-10.  All of it is conditional
aggregation + windows — Catalyst supplies the partial/final split the
reference emulated with a combiner (src/Brush/Stats.java:131-165).

N50 definition (src/Brush/Stats.java:288-335): order items by size
descending; N50 is the size at which the running sum first reaches half the
total; N50Cnt is how many items that took.

Scale design (100 TB): the N50 scan is never run over raw rows.  Phase 1
reduces the data to a per-distinct-size histogram (hash aggregate,
map-side partials, fully parallel); phase 2 runs the cumulative scan over
the histogram only.  For the global N50 the histogram cumulative sum is
itself two-phase (coarse size-bucket partials, then per-bucket windows),
so no stage ever moves more than the histogram through one task.  The
crossing row inside one size group is recovered arithmetically:
``k = ceil((total - 2*cum_before) / (2*size))`` items of that size are
needed to cross half the total.
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


def _size_histogram(df: DataFrame, size_col: str, cov_col: str | None = None,
                    with_cov: bool = False) -> DataFrame:
    """Phase 1: collapse rows to one row per distinct size.

    Output: (sz, cnt, mass=sz*cnt [, covm=sum(cov)]).  This is the only
    pass over the raw data — a plain hash aggregate with map-side
    partials.  ``covm`` is only emitted when asked for: an unused column
    makes multi-branch consumers' exchanges non-identical after pruning,
    defeating runtime exchange reuse.
    """
    sz = F.col(size_col).cast("long")
    aggs = [F.count(F.lit(1)).alias("cnt"), F.sum(sz).alias("mass")]
    if with_cov:
        cov = F.col(cov_col).cast("double") if cov_col else F.lit(1.0)
        aggs.append(F.sum(cov).alias("covm"))
    # null sizes dropped up front: the later bucket join would infer
    # isnotnull() into only ONE consumer branch, de-canonicalizing the
    # shared histogram exchange and defeating runtime exchange reuse
    return df.filter(sz.isNotNull()).groupBy(sz.alias("sz")).agg(*aggs)


def _with_cum_before(hist: DataFrame, bucket_shift: int = 10) -> DataFrame:
    """Phase 2: per-size exclusive descending cumulative sums over the
    histogram, without any single-task pass over the whole histogram.

    Sizes are grouped into coarse buckets (``sz >> bucket_shift``); bucket
    partial sums get a (tiny) global window, then per-bucket windows add the
    within-bucket share.  Adds: cum_mass_before, cum_cnt_before, tot.

    ``tot`` rides along from the bucket window instead of a third
    aggregation branch off ``hist`` — per-branch column pruning would make
    the histogram exchanges non-identical and defeat runtime exchange
    reuse, turning one raw-data scan into three.
    """
    h = hist.withColumn("bkt", F.shiftright(F.col("sz"), bucket_shift))
    btot = h.groupBy("bkt").agg(
        F.sum("mass").alias("bmass"), F.sum("cnt").alias("bcnt"))
    wb = (Window.orderBy(F.col("bkt").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    wall = (Window.orderBy(F.col("bkt").desc())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    # global windows over BUCKET AGGREGATES only: ~(max_size >> shift) rows.
    bcum = btot.select(
        "bkt",
        F.coalesce(F.sum("bmass").over(wb), F.lit(0)).alias("bmass_before"),
        F.coalesce(F.sum("bcnt").over(wb), F.lit(0)).alias("bcnt_before"),
        F.sum("bmass").over(wall).alias("tot"),
    )
    win = (Window.partitionBy("bkt").orderBy(F.col("sz").desc())
           .rowsBetween(Window.unboundedPreceding, -1))
    return (
        h.join(F.broadcast(bcum), "bkt")
        .withColumn("cum_mass_before",
                    F.col("bmass_before") + F.coalesce(F.sum("mass").over(win), F.lit(0)))
        .withColumn("cum_cnt_before",
                    F.col("bcnt_before") + F.coalesce(F.sum("cnt").over(win), F.lit(0)))
        .drop("bkt", "bmass_before", "bcnt_before")
    )


def _crossing_cols() -> tuple[Column, Column]:
    """(n50, n50_cnt) aggregate columns over cumulative-histogram rows.

    The crossing row is the max-sz row whose inclusive cumulative mass
    reaches half the total; both outputs come from THAT row (struct-max
    keyed on sz), with the within-group item count recovered as
    k = ceil((tot - 2*cum_before) / (2*sz))."""
    crossed = 2 * (F.col("cum_mass_before") + F.col("mass")) >= F.col("tot")
    num = F.col("tot") - 2 * F.col("cum_mass_before")
    den = 2 * F.col("sz")
    # integer ceil(num/den) without double rounding: (x - x % den) / den is exact
    x = num + den - F.lit(1)
    k = (x - (x % den)) / den
    cand = F.when(crossed, F.struct(
        F.col("sz").alias("sz"),
        (F.col("cum_cnt_before") + k).cast("long").alias("cnt"),
    ))
    return (
        F.max(cand).getField("sz").alias("n50"),
        F.max(cand).getField("cnt").alias("n50_cnt"),
    )


def n50(df: DataFrame, size_col: str) -> DataFrame:
    """Generic N50 over any size column: one row (n50, n50_cnt, total).

    Two-phase: size histogram (parallel) -> bucketed cumulative scan over
    the histogram -> arithmetic recovery of the crossing row.  No window
    ever sees more than the per-bucket histogram slice.

    The histogram feeds two consumers (per-size rows + bucket partials);
    a lazy localCheckpoint materializes it once so the raw data is
    scanned exactly once (exchange reuse alone does not collapse the
    diamond under AQE).
    """
    hist = _size_histogram(df, size_col).localCheckpoint(eager=False)
    cum = _with_cum_before(hist)
    n50_col, n50_cnt_col = _crossing_cols()
    return cum.agg(
        n50_col,
        n50_cnt_col,
        F.max("tot").alias("total"),
    )


def size_distribution(df: DataFrame, size_col: str, cov_col: str | None = None,
                      cutoffs: tuple[int, ...] = DEFAULT_CUTOFFS) -> DataFrame:
    """A1 Stats per-cutoff table: for each cutoff c, stats over rows with
    size >= c (src/Brush/Stats.java:260-335).

    One pass builds the size histogram; each histogram row then fans out to
    the <= 24 cutoffs it clears, and per-cutoff windows run over histogram
    rows only (distinct sizes, not raw rows — bounded and small even at
    100 TB).  Output: (cutoff, cnt, total, mean, mean_cov, n50, n50_cnt).
    """
    hist = _size_histogram(df, size_col, cov_col, with_cov=True)
    cleared = F.filter(
        F.array(*[F.lit(c).cast("long") for c in cutoffs]),
        lambda c: c <= F.col("sz"),
    )
    e = hist.withColumn("cutoff", F.explode(cleared))
    w_before = (Window.partitionBy("cutoff").orderBy(F.col("sz").desc())
                .rowsBetween(Window.unboundedPreceding, -1))
    w_tot = Window.partitionBy("cutoff")
    cum = e.select(
        "cutoff", "sz", "cnt", "mass",
        F.coalesce(F.sum("mass").over(w_before), F.lit(0)).alias("cum_mass_before"),
        F.coalesce(F.sum("cnt").over(w_before), F.lit(0)).alias("cum_cnt_before"),
        F.sum("mass").over(w_tot).alias("tot"),
        F.sum("cnt").over(w_tot).alias("tot_cnt"),
        F.sum("covm").over(w_tot).alias("tot_cov"),
    )
    n50_col, n50_cnt_col = _crossing_cols()
    return cum.groupBy("cutoff").agg(
        F.max("tot_cnt").alias("cnt"),
        F.max("tot").alias("total"),
        (F.max("tot") / F.max("tot_cnt")).alias("mean"),
        (F.max("tot_cov") / F.max("tot_cnt")).alias("mean_cov"),
        n50_col,
        n50_cnt_col,
    )


def top_k(df: DataFrame, order_col: str, k: int = 10) -> DataFrame:
    """Top-k rows by a column (src/Brush/Stats.java:363-377) — Catalyst turns
    orderBy+limit into TakeOrderedAndProject (per-partition heap + merge),
    no global sort."""
    return df.orderBy(F.col(order_col).desc()).limit(k)


def stats_report(contigs: DataFrame, size_col: str = "len",
                 cov_col: str | None = "cov",
                 genome_size: int | None = None,
                 cutoffs: tuple[int, ...] = DEFAULT_CUTOFFS,
                 top_n: int = 10) -> dict:
    """The full A1 Stats report (src/Brush/Stats.java:260-411): per-cutoff
    distribution table, top-N largest contigs, and — when a genome size
    target is given — the genome-target N50 (running descending sum crossed
    against genome_size/2 instead of assembly_total/2,
    src/Brush/Stats.java:380-411).

    Returns {"distribution": DataFrame, "top": DataFrame,
             "genome_n50": DataFrame | None}.
    """
    dist = size_distribution(contigs, size_col, cov_col, cutoffs)
    top = top_k(contigs, size_col, top_n)
    genome_n50 = None
    if genome_size is not None:
        hist = _size_histogram(contigs, size_col).localCheckpoint(eager=False)
        cum = _with_cum_before(hist).withColumn(
            "tot", F.lit(int(genome_size)).cast("long"))
        n50_col, n50_cnt_col = _crossing_cols()
        genome_n50 = cum.agg(n50_col, n50_cnt_col,
                             F.max("tot").alias("genome_size"))
    return {"distribution": dist, "top": top, "genome_n50": genome_n50}


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
