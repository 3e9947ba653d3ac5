"""Position-weight-matrix consensus operators (G1 CutChimericLinks,
G9 DefineConsensus, G10 CountBraid) and spaced-seed error correction
(A8 PreCorrect).

The reference computes PWM consensus inside reducers
(Node.Consensus, src/Brush/Node.java:1293-1377).  Here it is a *pure SQL*
positional aggregation: explode extension characters with posexplode,
weighted-majority per (node, side, position) via max_by, compare each
extension against the consensus with a join — no UDF, fully
whole-stage-codegen, and the group size is bounded by J1's per-key cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna

def D1():
    return F.substring("et", 1, 1)


def D2():
    return F.substring("et", 2, 1)


def _extensions(nodes: DataFrame, edges: DataFrame, max_ext: int) -> DataFrame:
    """Per edge: the neighbor's extension string beyond the overlap, as seen
    from (src, side d1), plus the neighbor's coverage as vote weight
    (DARKMSG payload, src/Brush/CutChimericLinks.java:97-109)."""
    nbr = nodes.select(F.col("node_id").alias("dst"),
                       F.col("seq").alias("nseq"), F.col("cov").alias("ncov"))
    oriented = F.when(D2() == "f", F.col("nseq")).otherwise(dna.rc(F.col("nseq")))
    return (
        edges.join(nbr, "dst")
        .select(
            "src", D1().alias("d"), "et", "dst", "ov",
            F.col("ncov").alias("w"),
            oriented.substr(F.col("ov") + 1, F.lit(max_ext)).alias("ext"),
        )
        .filter(F.length("ext") > 0)
    )


def pwm_consensus(nodes: DataFrame, edges: DataFrame, majority: float = 0.6,
                  pwm_n: float = 0.1, max_ext: int = 100) -> tuple[DataFrame, DataFrame]:
    """Returns (consensus, mismatches):

    consensus: (src, d, pos, cchar, total_w) — weighted-majority char per
    position ('N' when no base reaches ``majority`` of the column weight);
    mismatches: (src, d, et, dst, ov, mismatch_cnt) for every edge whose
    extension disagrees with the consensus at >= 1 non-N position
    (src/Brush/CutChimericLinks.java:306-375).
    """
    ext = _extensions(nodes, edges, max_ext)
    chars = ext.select(
        "src", "d", "et", "dst", "ov", "w",
        F.posexplode(F.split(F.col("ext"), "(?!^)")).alias("pos", "ch"),
    )
    col_w = chars.groupBy("src", "d", "pos", "ch").agg(F.sum("w").alias("cw"))
    col_tot = col_w.groupBy("src", "d", "pos").agg(
        F.sum("cw").alias("total_w"),
        F.max_by("ch", F.struct(F.col("cw"), F.col("ch"))).alias("top_ch"),
        F.max("cw").alias("top_w"),
    )
    consensus = col_tot.select(
        "src", "d", "pos",
        F.when(F.col("top_w") >= majority * F.col("total_w"), F.col("top_ch"))
        .otherwise(F.lit("N")).alias("cchar"),
        "total_w",
    )
    # a (node, side) whose consensus is mostly N is not trusted: N-ratio gate
    n_ratio = consensus.groupBy("src", "d").agg(
        (F.sum(F.when(F.col("cchar") == "N", 1).otherwise(0)) / F.count(F.lit(1))).alias("nr")
    )
    good_sides = n_ratio.filter(F.col("nr") <= pwm_n).select("src", "d")
    mismatches = (
        chars.join(consensus, ["src", "d", "pos"])
        .join(good_sides, ["src", "d"])
        .filter((F.col("cchar") != "N") & (F.col("ch") != F.col("cchar")))
        .groupBy("src", "d", "et", "dst", "ov")
        .agg(F.count(F.lit(1)).alias("mismatch_cnt"))
    )
    return consensus, mismatches


def cut_chimeric_links(nodes: DataFrame, edges: DataFrame, majority: float = 0.6,
                       pwm_n: float = 0.1, max_ext: int = 100,
                       min_side_edges: int = 2) -> DataFrame:
    """G1: removal edge set — edges whose extension mismatches the
    (>=2-edge) side consensus.  Apply with graph.remove_edges."""
    sided = edges.withColumn("d", D1())
    multi = (
        sided.groupBy("src", "d").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_side_edges).select("src", "d")
    )
    _, mism = pwm_consensus(nodes, edges, majority, pwm_n, max_ext)
    return (
        mism.join(multi, ["src", "d"])
        .select("src", "et", "dst", "ov")
    )


def define_consensus(nodes: DataFrame, edges: DataFrame, majority: float = 0.6,
                     pwm_n: float = 0.1, max_ext: int = 100) -> DataFrame:
    """G9: per (node, side) color — 'B' if a valid consensus of the side's
    extensions exists, else 'W' (src/Brush/DefineConsensus.java:288-341).
    Output: (node_id, d, color)."""
    consensus, _ = pwm_consensus(nodes, edges, majority, pwm_n, max_ext)
    per_side = consensus.groupBy(F.col("src").alias("node_id"), "d").agg(
        (F.sum(F.when(F.col("cchar") == "N", 1).otherwise(0)) / F.count(F.lit(1))).alias("nr")
    )
    return per_side.select(
        "node_id", "d",
        F.when(F.col("nr") <= pwm_n, F.lit("B")).otherwise(F.lit("W")).alias("color"),
    )


def count_braids(nodes: DataFrame, edges: DataFrame, **consensus_kw) -> DataFrame:
    """G10: diagnostic — count 'braid' motifs: a (node, side) with > 1
    neighbors, own consensus valid, and every neighbor's opposite-entry side
    also consensus-valid (src/Brush/CountBraid.java:298-373).
    Output single row (nodes, edges, braids)."""
    colors = define_consensus(nodes, edges, **consensus_kw)
    sided = edges.select("src", D1().alias("d"), "dst", D2().alias("d2"))
    nbr_color = colors.select(F.col("node_id").alias("dst"),
                              F.col("d").alias("nd"), F.col("color").alias("ncolor"))
    # neighbor's opposite side relative to entry: entering dst at d2 -> check dst side flip(d2)
    j = (
        sided
        .join(colors.withColumnRenamed("node_id", "src"), ["src", "d"])
        .join(nbr_color, (sided["dst"] == nbr_color["dst"])
              & (nbr_color["nd"] == F.when(F.col("d2") == "f", F.lit("r")).otherwise(F.lit("f"))),
              "left")
    )
    per_side = j.groupBy("src", "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("color").alias("color"),
        F.min(F.when(F.col("ncolor") == "B", 1).otherwise(0)).alias("all_nbrs_b"),
    )
    braids = per_side.filter(
        (F.col("n") > 1) & (F.col("color") == "B") & (F.col("all_nbrs_b") == 1)
    )
    return braids.agg(F.count(F.lit(1)).alias("braids"))


def precorrect(reads: DataFrame, id_col: str = "read_id", seq_col: str = "seq",
               cov_col: str | None = None, half: int = 12,
               minority_ratio: float = 0.25) -> DataFrame:
    """A8 PreCorrect: spaced-seed (12+1+12) positional voting; emits
    (read_id, pos, from_base, to_base) fixes where the masked-position base
    is in a < ``minority_ratio`` minority (src/Brush/PreCorrect.java:68-217)."""
    wlen = 2 * half + 1
    w = F.col(cov_col) if cov_col else F.lit(1.0)
    wins = reads.select(
        F.col(id_col), w.alias("w"),
        F.posexplode(F.expr(
            f"transform(sequence(1, greatest(length({seq_col}) - {wlen} + 1, 0)),"
            f" i -> substring({seq_col}, i, {wlen}))"
        )).alias("off", "win"),
    ).select(
        id_col, "w", "off",
        F.concat(F.substring("win", 1, half),
                 F.substring("win", half + 2, half)).alias("key"),
        F.substring("win", half + 1, 1).alias("mid"),
    )
    votes = wins.groupBy("key", "mid").agg(F.sum("w").alias("vw"))
    winner = votes.groupBy("key").agg(
        F.max("vw").alias("top_w"),
        F.max_by("mid", F.struct(F.col("vw"), F.col("mid"))).alias("top_mid"),
    )
    weak = (
        votes.join(winner, "key")
        .filter((F.col("vw") < minority_ratio * F.col("top_w"))
                & (F.col("mid") != F.col("top_mid")))
        .select("key", "mid", "top_mid")
    )
    return (
        wins.join(weak, ["key", "mid"])
        .select(
            F.col(id_col),
            (F.col("off") + half).alias("pos"),  # 0-based position of masked base
            F.col("mid").alias("from_base"),
            F.col("top_mid").alias("to_base"),
        )
    )
