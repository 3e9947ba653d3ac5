"""Iterative chain contraction (G5 PairMark / G6 PairMerge / G7-G8 serial
fallback) — randomized-matching path contraction on the bidirected graph.

Design (Spark-first, not a port): each round
  1. find mutually-unique chain links (G4 compressible);
  2. break symmetry with a *seeded deterministic* coin per node
     (hash(id, seed) — the reference used Math.random() seeds,
     src/Brush/PairMark.java:61-72; we pin for testability, SURVEY §7 risk 3);
  3. every male node merges into one adjacent female tail; a female can
     absorb at most one male per side (the mutual-unique condition makes
     that structural, mirroring src/Brush/PairMerge.java guards);
  4. sequences concatenate with overlap-aware, orientation-aware splicing;
     coverage becomes the length-weighted mean (src/Brush/PairMerge.java:132-149);
  5. third-party edges are re-pointed with an orientation map
     (replacelink, src/Brush/PairMark.java:277-283 — here two joins).

Expected halving per round -> O(log chain) rounds.  ``localCheckpoint``
every round truncates lineage (the #1 Spark iteration hazard, SURVEY §4).
The reference's collapse-to-one-reducer serial finish (G7/G8) existed to
amortize MR job startup; Spark rounds on a small residue are milliseconds,
so rounds-to-fixpoint is both simpler and faster — documented divergence.

Orientation algebra: merging link (a, d1 d2, b, ov) places a's content in
the merged node (kept id: b) with orientation-in-b-forward
``o_a = d1 if d2 == 'f' else flip(d1)``; a third-party edge touching a in
orientation x becomes the same edge touching b in orientation
``f if x == o_a else r``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna
from cloudbrush_spark.operators.graph import compressible

def D1():
    return F.substring("et", 1, 1)


def D2():
    return F.substring("et", 2, 1)


def _orient(seq, d):
    return F.when(d == "f", seq).otherwise(dna.rc(seq))


def _flip(d):
    return F.when(d == "f", F.lit("r")).otherwise(F.lit("f"))


def _pick_merges(links: DataFrame, seed: int) -> DataFrame:
    """One merge per male node into a female tail.

    Output: (a, d1, b, d2, ov, o_a) — a merges into b.
    """
    male_src = F.xxhash64(F.col("src"), F.lit(seed)) % 2 == 0
    male_dst = F.xxhash64(F.col("dst"), F.lit(seed)) % 2 == 0
    cand = links.filter(male_src & ~male_dst).select(
        F.col("src").alias("a"), D1().alias("d1"),
        F.col("dst").alias("b"), D2().alias("d2"), "ov",
    )
    pick = Window.partitionBy("a").orderBy("d1", "b")
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1).drop("rn")
        .withColumn("o_a", F.when(F.col("d2") == "f", F.col("d1"))
                    .otherwise(_flip(F.col("d1"))))
    )


def _merge_nodes(nodes: DataFrame, merges: DataFrame) -> DataFrame:
    """Build the next node table: females extended, males dropped."""
    a_seq = nodes.select(F.col("node_id").alias("a"), F.col("seq").alias("a_seq"),
                         F.col("cov").alias("a_cov"))
    m = merges.join(a_seq, "a")
    # partner with d2 == 'f' prepends (enters b's front); d2 == 'r' appends
    per_b = m.groupBy(F.col("b").alias("node_id")).agg(
        F.max(F.when(F.col("d2") == "f", F.struct(
            _orient(F.col("a_seq"), F.col("d1")).alias("oseq"),
            F.col("ov").alias("ov"), F.col("a_cov").alias("cov"),
            F.length("a_seq").alias("len")))).alias("L"),
        F.max(F.when(F.col("d2") == "r", F.struct(
            _orient(F.col("a_seq"), _flip(F.col("d1"))).alias("oseq"),
            F.col("ov").alias("ov"), F.col("a_cov").alias("cov"),
            F.length("a_seq").alias("len")))).alias("R"),
    )
    merged = (
        nodes.join(per_b, "node_id", "inner")
        .withColumn("s1", F.when(
            F.col("L").isNotNull(),
            F.concat(F.col("L.oseq"),
                     F.col("seq").substr(F.col("L.ov") + 1, F.length("seq"))),
        ).otherwise(F.col("seq")))
        .withColumn("s2", F.when(
            F.col("R").isNotNull(),
            F.concat(F.col("s1").substr(F.lit(1), F.length("s1") - F.col("R.ov")),
                     F.col("R.oseq")),
        ).otherwise(F.col("s1")))
        .withColumn("new_cov",
            (F.col("cov") * F.length("seq")
             + F.coalesce(F.col("L.cov") * F.col("L.len"), F.lit(0.0))
             + F.coalesce(F.col("R.cov") * F.col("R.len"), F.lit(0.0)))
            / (F.length("seq")
               + F.coalesce(F.col("L.len"), F.lit(0))
               + F.coalesce(F.col("R.len"), F.lit(0))))
        .select("node_id", F.col("s2").alias("seq"), F.col("new_cov").alias("cov"))
    )
    untouched = (
        nodes.join(merges.select(F.col("a").alias("node_id")), "node_id", "left_anti")
        .join(merges.select(F.col("b").alias("node_id")).distinct(), "node_id", "left_anti")
    )
    return untouched.unionByName(merged)


def _rewrite_edges(edges: DataFrame, merges: DataFrame) -> DataFrame:
    """Drop consumed link edges; re-point third-party edges of merged males."""
    link = merges.select("a", F.concat("d1", "d2").alias("et"), F.col("b").alias("dst_b"), "ov")
    consumed = link.select(F.col("a").alias("src"), "et", F.col("dst_b").alias("dst"), "ov")
    consumed_rev = link.select(
        F.col("dst_b").alias("src"), dna.flip_link("et").alias("et"),
        F.col("a").alias("dst"), "ov",
    )
    kept = edges.join(consumed.unionByName(consumed_rev).distinct(),
                      ["src", "et", "dst", "ov"], "left_anti")
    mapping = merges.select(F.col("a").alias("m_id"), F.col("b").alias("m_to"), "o_a")
    # rewrite src side
    s = (
        kept.join(mapping.withColumnRenamed("m_id", "src"), "src", "left")
        .withColumn("n_src", F.coalesce(F.col("m_to"), F.col("src")))
        .withColumn("n_d1", F.when(F.col("m_to").isNull(), D1())
                    .when(D1() == F.col("o_a"), F.lit("f")).otherwise(F.lit("r")))
        .select(F.col("n_src").alias("src"),
                F.concat("n_d1", D2()).alias("et"), "dst", "ov")
    )
    # rewrite dst side
    d = (
        s.join(mapping.withColumnRenamed("m_id", "dst"), "dst", "left")
        .withColumn("n_dst", F.coalesce(F.col("m_to"), F.col("dst")))
        .withColumn("n_d2", F.when(F.col("m_to").isNull(), D2())
                    .when(D2() == F.col("o_a"), F.lit("f")).otherwise(F.lit("r")))
        .select("src", F.concat(D1(), "n_d2").alias("et"),
                F.col("n_dst").alias("dst"), "ov")
    )
    return d.distinct()


def contract_chains(nodes: DataFrame, edges: DataFrame, seed: int = 42,
                    max_rounds: int = 64, checkpoint_every: int = 1,
                    verbose: bool = False) -> tuple[DataFrame, DataFrame, int]:
    """Contract all compressible chains to single nodes.

    Returns (nodes, edges, rounds_run).  Deterministic for a fixed seed.
    """
    rounds = 0
    for rnd in range(max_rounds):
        links = compressible(nodes, edges)
        merges = _pick_merges(links, seed + rnd)
        n_merges = merges.count()
        if n_merges == 0:
            # no male->female link this round; check if any links remain at all
            if links.count() == 0:
                break
            # all-same-coin pathology on a residual chain: next seed reshuffles
            rounds += 1
            continue
        nodes = _merge_nodes(nodes, merges)
        edges = _rewrite_edges(edges, merges)
        if (rnd + 1) % checkpoint_every == 0:
            nodes = nodes.localCheckpoint(eager=True)
            edges = edges.localCheckpoint(eager=True)
        rounds += 1
        if verbose:
            print(f"contract round {rnd}: {n_merges} merges")
    return nodes, edges, rounds
