"""Overlap-graph construction: the k-mer-seeded similarity self-join
(J1 MatchPrefix), exact-overlap verification theta-join (J2 VerifyOverlap)
and edge symmetrization (J3 GenReverseEdge).

Edge model (bidirected string graph, src/Brush/Node.java:78):
``edges(src, et, dst, ov)`` where ``et = d1 || d2`` and the edge asserts

    suffix(orient(src, d1), ov) == prefix(orient(dst, d2), ov)

with ``orient(x, 'f') = seq`` and ``orient(x, 'r') = rc(seq)``.  The
reverse edge is ``(dst, flip_link(et), src, ov)``.

Spark-first shape: inverted-index equi-join on the seed k-mer (NOT a
translation of the reference's reducer).  Candidates are generated from
prefix-postings x suffix-window-postings joined on the k-mer, then
verified with a substring-equality filter — the same candidates/verify
split as src/Brush/MatchPrefix.java:120-174 + src/Brush/VerifyOverlap.java:287-309.

100 TB scale levers, all load-bearing (SURVEY §7 risk 4):
- high-frequency k-mer blacklist applied BEFORE the join (broadcast
  anti-join; mirrors src/Brush/MatchPrefix.java:155-158) — removes the
  repeat-induced hot keys that would otherwise dominate the shuffle;
- homopolymer seed windows dropped (src/Brush/MatchPrefix.java:163,170);
- NON-OPTIONAL per-key cap: over-cap seed keys found by groupBy-count and
  dropped whole via broadcast anti-join (src/Brush/MatchPrefix.java:366-380)
  — bounds worst-case join fan-out without ever windowing on the hot key;
- AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna


def _oriented(seq_col, d_col):
    return F.when(d_col == "f", seq_col).otherwise(dna.rc(seq_col))


def _postings(nodes: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """(prefix_postings, suffix_postings) over both orientations."""
    both = nodes.select(
        "node_id",
        F.explode(F.array(
            F.struct(F.lit("f").alias("d"), F.col("seq").alias("oseq")),
            F.struct(F.lit("r").alias("d"), dna.rc(F.col("seq")).alias("oseq")),
        )).alias("o"),
    ).select("node_id", F.col("o.d").alias("d"), F.col("o.oseq").alias("oseq"))

    prefixes = both.select(
        F.substring("oseq", 1, k).alias("kmer"), "node_id", "d"
    )
    # interior windows: start positions 2..len-k+1 (1-based), ov = len - start + 1
    suffixes = both.select(
        "node_id", "d", F.length("oseq").alias("len"),
        F.posexplode(F.expr(
            f"transform(sequence(2, greatest(length(oseq) - {k} + 1, 1)), i -> substring(oseq, i, {k}))"
        )).alias("pos", "kmer"),
    ).select(
        "node_id", "d", "kmer", (F.col("len") - F.col("pos") - 1).alias("ov")
    ).filter(F.col("ov") >= k)
    return prefixes, suffixes


def _drop_noise_keys(postings: DataFrame, k: int, high_kmers: DataFrame | None) -> DataFrame:
    """Homopolymer + high-frequency seed removal (skew control)."""
    homopolymers = [c * k for c in "ACGT"]
    out = postings.filter(~F.col("kmer").isin(homopolymers))
    if high_kmers is not None:
        out = out.join(F.broadcast(high_kmers.select("kmer")), "kmer", "left_anti")
    return out


def match_prefix(nodes: DataFrame, k: int, high_kmers: DataFrame | None = None,
                 per_key_cap: int = 2000) -> DataFrame:
    """J1: candidate overlap edges (src, d1, dst, d2, ov), maximal ov per
    oriented pair.

    The skew guard is NON-OPTIONAL: whether or not a precomputed
    ``high_kmers`` blacklist is supplied, seed keys whose posting count
    exceeds ``per_key_cap`` are detected with a groupBy-count (map-side
    partials, skew-proof) and removed via broadcast anti-join — dropped
    whole.  Documented deviations from the reference reducer
    (src/Brush/MatchPrefix.java:366-380), both deliberate:

    - the reference keeps the TOP ``UP_KMER`` candidates per key by
      descending overlap instead of dropping the key; that per-key
      sorted top-K is exactly the window-over-the-hot-key this operator
      refuses (the hot key's whole posting list in one task).  With the
      P3 blacklist active the reference's own count cutoff removes such
      keys before this point anyway.
    - the reference's ``LOW_KMER`` minimum (skip keys with <= LowKmer
      candidate edges, default 1 — a pre-verify noise heuristic) is not
      applied: the exact J2 substring verification already rejects
      every spurious candidate, so the minimum only changes which TRUE
      single-candidate edges survive, and dropping true edges is the
      wrong default for a verified pipeline.
    """
    prefixes, suffixes = _postings(nodes, k)
    prefixes = _drop_noise_keys(prefixes, k, high_kmers)
    suffixes = _drop_noise_keys(suffixes, k, high_kmers)
    # Hash the seed key BEFORE anything shuffles: a 24-char UTF8 k-mer is
    # ~3x the bytes of a long and far slower to hash/compare in the
    # exchange, the aggregate and the join probe (measured: the hot-key
    # aggregate alone dropped ~10x CPU at sf0.1).  xxhash64 is
    # deterministic; on the JOIN side a collision can only create a FALSE
    # candidate, which the exact J2 substring verify then rejects — the
    # same candidates-then-verify contract the reference relies on.  On
    # the self-derived HOT-KEY side (high_kmers is None below) a collision
    # additionally merges two distinct k-mers' posting counts, which can
    # push an innocent key over per_key_cap and drop its TRUE edges whole
    # — a loss verification cannot repair.  That mode needs two k-mers
    # colliding in a 64-bit space AND their combined count crossing the
    # cap, ~2^-64-scale per key pair: an accepted, bounded risk (the P3
    # blacklist path hashes after thresholding and is unaffected).  The
    # string-level filters (homopolymer, P3 blacklist) above run at
    # posting-generation time, before the hash.
    prefixes = prefixes.select(
        F.xxhash64("kmer").alias("khash"), "node_id", "d")
    suffixes = suffixes.select(
        "node_id", "d", F.xxhash64("kmer").alias("khash"), "ov")
    if high_kmers is None:
        # No precomputed blacklist (P3) supplied: derive it from the posting
        # tables themselves.  Both tables are repartitioned on the hashed
        # seed key FIRST so the hot-key aggregate and the candidate join
        # consume the SAME exchange (ReuseExchange): the ~200x-exploded
        # posting generation and its shuffle run once, not once per
        # consumer — the guard's cost collapses to one extra read of an
        # exchange the join needs anyway.  The aggregate needs no second
        # shuffle (already hash-distributed on its grouping key), and the
        # broadcast anti-join between exchange and join preserves the
        # distribution.  Callers with a P3 blacklist (the assembler) skip
        # this: their threshold already bounds every surviving key.
        suffixes = suffixes.repartition(F.col("khash"))
        prefixes = prefixes.repartition(F.col("khash"))
        hot = (
            suffixes.groupBy("khash").count()
            .unionByName(prefixes.groupBy("khash").count())
            .groupBy("khash").agg(F.sum("count").alias("count"))
            .filter(F.col("count") > per_key_cap)
            .select("khash")
        )
        suffixes = suffixes.join(F.broadcast(hot), "khash", "left_anti")
        prefixes = prefixes.join(F.broadcast(hot), "khash", "left_anti")
    # Explicit shuffle-hash join: both posting tables are explode-multiplied,
    # and Catalyst's Generate estimate is the CHILD's size, so the planner
    # will happily broadcast a multi-GiB posting side if the stats look
    # small (observed: 5 GiB broadcast at sf0.1).  Postings are never
    # broadcastable at scale — pin the strategy; build on the sparser
    # prefix side (2 postings/read vs ~len-k/read).
    cand = (
        suffixes.alias("s")
        .join(prefixes.alias("p").hint("shuffle_hash"), "khash")
        .filter(F.col("s.node_id") != F.col("p.node_id"))
        .select(
            F.col("s.node_id").alias("src"),
            F.col("s.d").alias("d1"),
            F.col("p.node_id").alias("dst"),
            F.col("p.d").alias("d2"),
            F.col("s.ov").alias("ov"),
        )
    )
    # maximal overlap per oriented pair (src/Brush/VerifyOverlap.java:275-283)
    return cand.groupBy("src", "d1", "dst", "d2").agg(F.max("ov").alias("ov"))


def verify_overlap(candidates: DataFrame, nodes: DataFrame) -> DataFrame:
    """J2: keep candidates whose full overlap string matches exactly;
    output the edge table (src, et, dst, ov).

    Containment (ov >= min length) is excluded like the reference
    (src/Brush/VerifyOverlap.java:296-300).
    """
    a = nodes.select(F.col("node_id").alias("src"), F.col("seq").alias("sa"))
    b = nodes.select(F.col("node_id").alias("dst"), F.col("seq").alias("sb"))
    joined = candidates.join(a, "src").join(b, "dst")
    oa = _oriented(F.col("sa"), F.col("d1"))
    ob = _oriented(F.col("sb"), F.col("d2"))
    ok = (
        (F.col("ov") < F.length("sa")) & (F.col("ov") < F.length("sb"))
        & (oa.substr(F.length("sa") - F.col("ov") + 1, F.col("ov"))
           == ob.substr(F.lit(1), F.col("ov")))
    )
    return (
        joined.filter(ok)
        .select("src", F.concat("d1", "d2").alias("et"), "dst", "ov")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """J3: symmetric closure — emit each edge and its flip in ONE pass
    (explode of a 2-struct array), then dedup
    (src/Brush/GenReverseEdge.java:209-241).

    Deliberately not union(e, flip(e)): a union re-executes the upstream
    plan once per branch (Catalyst's exchange reuse does not fire across
    the differing projections), which doubled the whole J1->J2 pipeline
    in the overlap-graph composite."""
    both = edges.select(F.explode(F.array(
        F.struct("src", "et", "dst", "ov"),
        F.struct(
            F.col("dst").alias("src"),
            dna.flip_link("et").alias("et"),
            F.col("src").alias("dst"),
            F.col("ov").alias("ov"),
        ),
    )).alias("e"))
    return both.select("e.src", "e.et", "e.dst", "e.ov").distinct()


def build_overlap_graph(nodes: DataFrame, k: int,
                        high_kmers: DataFrame | None = None,
                        per_key_cap: int = 2000) -> DataFrame:
    """J1 -> J2 -> J3 composite (src/Brush/BrushAssembler.java:313-333)."""
    cand = match_prefix(nodes, k, high_kmers, per_key_cap)
    verified = verify_overlap(cand, nodes)
    return symmetrize(verified)
