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
    position ('N' when no base exceeds ``majority`` of the column weight);
    mismatches: (src, d, et, dst, ov, mismatch_cnt) for every edge whose
    extension disagrees with the consensus at >= 1 non-N position
    (src/Brush/CutChimericLinks.java:306-375).

    Faithful to Node.Consensus (src/Brush/Node.java:1293-1377):
    - the consensus is BOUNDED to the 2nd-longest extension's length —
      or the 3rd-longest when the two longest carry weight sum <= 2
      (weak evidence) and a 3rd exists (:1313-1320).  Positions covered
      by a single extension are never 100%-majority filler, so the
      N-ratio measures genuinely contested columns;
    - vote weights are the truncated integer coverage (:1332);
    - a base wins a column only with share STRICTLY above ``majority``
      (:1348-1361);
    - a side whose N-ratio over the bounded length exceeds ``pwm_n``
      yields no consensus (null -> no cuts, :1369-1371);
    - sides with < 2 extensions never cut (their single extension is its
      own consensus, :1373-1374).
    """
    ext = _extensions(nodes, edges, max_ext).withColumn(
        "iw", F.greatest(F.floor("w").cast("int"), F.lit(0)))
    # bounded consensus length per side (Node.Consensus:1313-1320)
    by_len = Window.partitionBy("src", "d").orderBy(
        F.length("ext").desc(), F.col("ext"), F.col("dst"))
    ranked = ext.withColumn("rnk", F.row_number().over(by_len))
    side_len = ranked.groupBy("src", "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rnk") == 2, F.length("ext"))).alias("len2"),
        F.max(F.when(F.col("rnk") == 3, F.length("ext"))).alias("len3"),
        F.sum(F.when(F.col("rnk") <= 2, F.col("w")).otherwise(F.lit(0.0))).alias("w12"),
    ).filter(F.col("n") >= 2).select(
        "src", "d",
        F.when((F.col("n") == 2) | (F.col("w12") > 2.0), F.col("len2"))
        .otherwise(F.coalesce(F.col("len3"), F.col("len2"))).alias("clen"),
    )
    # NOTE: split's (?!^) also matches at end-of-string, yielding a bogus
    # trailing "" element — the pos < length(ext) guard drops it (it would
    # otherwise cast phantom '' votes at each extension's end column)
    chars = ext.select(
        "src", "d", "et", "dst", "ov", "iw", F.length("ext").alias("elen"),
        F.posexplode(F.split(F.col("ext"), "(?!^)")).alias("pos", "ch"),
    ).filter(F.col("pos") < F.col("elen")).drop("elen") \
        .join(side_len, ["src", "d"]).filter(F.col("pos") < F.col("clen"))
    col_w = chars.groupBy("src", "d", "pos", "ch").agg(F.sum("iw").alias("cw"))
    col_tot = col_w.groupBy("src", "d", "pos").agg(
        F.sum("cw").alias("total_w"),
        F.max_by("ch", F.struct(F.col("cw"), F.col("ch"))).alias("top_ch"),
        F.max("cw").alias("top_w"),
    )
    consensus = col_tot.select(
        "src", "d", "pos",
        F.when(F.col("top_w") > majority * F.col("total_w"), F.col("top_ch"))
        .otherwise(F.lit("N")).alias("cchar"),
        "total_w",
    )
    # N-ratio over the bounded length: no consensus -> no cuts
    n_ratio = consensus.join(side_len, ["src", "d"]).groupBy("src", "d").agg(
        (F.sum(F.when(F.col("cchar") == "N", 1).otherwise(0))
         / F.max("clen")).alias("nr")
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
    A single-extension side is its own consensus -> 'B'
    (src/Brush/Node.java:1373-1374).  Output: (node_id, d, color)."""
    consensus, _ = pwm_consensus(nodes, edges, majority, pwm_n, max_ext)
    per_side = consensus.groupBy(F.col("src").alias("node_id"), "d").agg(
        (F.sum(F.when(F.col("cchar") == "N", 1).otherwise(0)) / F.count(F.lit(1))).alias("nr")
    )
    multi = per_side.select(
        "node_id", "d",
        F.when(F.col("nr") <= pwm_n, F.lit("B")).otherwise(F.lit("W")).alias("color"),
    )
    singles = (
        edges.select("src", D1().alias("d"))
        .groupBy("src", "d").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == 1)
        .select(F.col("src").alias("node_id"), "d", F.lit("B").alias("color"))
    )
    return multi.unionByName(singles)


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


def apply_corrections(reads: DataFrame, fixes: DataFrame,
                      id_col: str = "read_id", seq_col: str = "seq") -> DataFrame:
    """Apply (read_id, pos, to_base) fixes from ``precorrect`` to the read
    table — a join + a Catalyst ``aggregate`` fold over the per-read fix
    list (no UDF).  ``pos`` is 0-based.  Reads without fixes pass through.

    This is the CloudRS-style correction pass the reference README
    recommends before assembly (/root/reference/README.md:21-23); the
    voting itself is A8 PreCorrect (src/Brush/PreCorrect.java:139-217).
    """
    per_read = fixes.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("pos"), F.col("to_base"))).alias("fx"))
    fixed = (
        reads.join(per_read, id_col, "left")
        .withColumn(
            seq_col,
            F.when(F.col("fx").isNull(), F.col(seq_col)).otherwise(
                F.aggregate(
                    "fx", F.col(seq_col),
                    lambda acc, f: F.concat(
                        acc.substr(F.lit(1), f["pos"]),
                        f["to_base"],
                        acc.substr(f["pos"] + 2, F.length(acc))),
                )
            ),
        )
        .drop("fx")
    )
    return fixed


def precorrect(reads: DataFrame, id_col: str = "read_id", seq_col: str = "seq",
               cov_col: str | None = None, half: int = 12,
               minority_ratio: float = 0.25,
               edge_seeds: bool = True) -> DataFrame:
    """A8 PreCorrect: spaced-seed positional voting; emits
    (read_id, pos, from_base, to_base) fixes where the masked-position
    base is in a < ``minority_ratio`` minority
    (src/Brush/PreCorrect.java:68-217).

    The reference uses only the centered seed (``half`` context on each
    side), which can never correct the first/last ``half`` positions of a
    read — on 36 bp reads that leaves 2/3 of positions uncorrectable.
    ``edge_seeds=True`` adds two edge-anchored families with the SAME
    total context (one-sided: 2*half right of the masked base, and 2*half
    left of it), so every position with ``2*half`` flanking bases on
    either side gets a vote.  Conflicting fixes for one (read, pos)
    resolve by family priority center > left-edge > right-edge, then
    lexical to_base.
    """
    w = F.col(cov_col) if cov_col else F.lit(1.0)
    families = [(half, half, "C", 0)]
    if edge_seeds:
        families += [(0, 2 * half, "L", 1), (2 * half, 0, "R", 2)]

    wins = None
    for left, right, tag, prio in families:
        wlen = left + 1 + right
        fam = reads.select(
            F.col(id_col), w.alias("w"),
            F.posexplode(F.expr(
                f"transform(sequence(1, greatest(length({seq_col}) - {wlen} + 1, 0)),"
                f" i -> substring({seq_col}, i, {wlen}))"
            )).alias("off", "win"),
        ).select(
            id_col, "w",
            (F.col("off") + left).alias("pos"),  # 0-based masked position
            F.concat(F.lit(tag), F.substring("win", 1, left),
                     F.substring("win", left + 2, right)).alias("key"),
            F.substring("win", left + 1, 1).alias("mid"),
            F.lit(prio).alias("prio"),
        )
        wins = fam if wins is None else wins.unionByName(fam)

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
    fixes = wins.join(weak, ["key", "mid"]).select(
        F.col(id_col), "pos",
        F.col("mid").alias("from_base"),
        F.col("top_mid").alias("to_base"),
        "prio",
    )
    pick = Window.partitionBy(id_col, "pos").orderBy("prio", "to_base")
    return (
        fixes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(id_col, "pos", "from_base", "to_base")
    )
