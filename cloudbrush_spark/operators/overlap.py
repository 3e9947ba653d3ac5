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

r14 physical rework (measured at sf0.1, 150k reads, local[32]: old
two-pass shape 295 executor-CPU-s / 912 MB shuffled / ~17 s wall ->
new single-exchange JVM shape 130 CPU-s / 96 MB / ~10 s wall,
identical output — see OPTIMIZATION_r14.md):

- ONE posting-generation pass emits prefix AND suffix-window postings
  together (``ov = 0`` tags the prefix posting), instead of two
  independent explode pipelines whose exchanges column-pruning then
  specialized apart — the old plan generated + shuffled the ~200x
  window explosion twice and re-read it a third time for the hot-key
  count (guide §2.4: remove shuffles outright).
- The DEFAULT generation pass is a pure-JVM expression pipeline
  (posexplode over substring windows + xxhash64).  An Arrow
  ``mapInArrow`` kernel (numpy rolling polynomial hash over the flat
  Arrow string buffer, guide §4.2) is available via ``use_arrow=True``:
  it nearly halves JVM executor CPU (130 -> 75 CPU-s at sf0.1) but
  pays a fixed per-task Python-worker latency (fork + numpy/pyarrow
  import + first-batch warmup, measured ~7 s/task cold on a loaded
  host) that the short local tasks cannot amortize — wall 20-37 s vs
  10 s, so the JVM path is the default.  The kernel is the right
  choice only where tasks are long enough to amortize worker startup
  (many batches per task) AND executor CPU is the binding resource.
  The JVM path also handles non-ASCII sequence alphabets.
- Optional broadcast SEMI prefilter (``prefilter=True``): suffix
  windows whose seed k-mer matches NO read prefix can never produce a
  candidate, so the big side is pre-filtered against the distinct
  prefix-key set before the exchange (guide §3.2 Bloom/semi-join
  pre-filtering; 585 MB -> 74 MB shuffled at sf0.1).  The prefix-key
  set is 2 keys/read — broadcastable up to ~10^8 reads; pass
  ``prefilter=False`` beyond that (the single-exchange shape above
  still holds; only the exchange carries all windows again).
- The per-key cap guard is a streaming window count OVER THE JOIN'S OWN
  EXCHANGE (sorted once, counted in one pass), replacing the separate
  full-posting count aggregate + union-of-counts regroup + broadcast
  hot-list anti-join.  Same drop-whole-key semantics, zero extra
  shuffles, no 10^7-entry aggregate hash table.
- The candidate join is a SELF-join of the capped frame on the seed key
  with the prefix/suffix split expressed in the JOIN CONDITION
  (``p.ov = 0 AND s.ov > 0``), so both children are canonically
  identical and exchange reuse is structural, not an optimizer
  accident.  ``shuffle_hash`` pin as before: posting tables must never
  be broadcast (Generate-estimate regression, test_plans.py).

100 TB scale levers, all load-bearing (SURVEY §7 risk 4):
- high-frequency k-mer blacklist applied BEFORE the join (mirrors
  src/Brush/MatchPrefix.java:155-158) — removes the repeat-induced hot
  keys that would otherwise dominate the shuffle;
- homopolymer seed windows dropped (src/Brush/MatchPrefix.java:163,170);
- NON-OPTIONAL per-key cap (src/Brush/MatchPrefix.java:366-380): keys
  whose total posting count exceeds ``per_key_cap`` are dropped whole by
  the streaming window count — never a whole hot posting list in one
  hash-table build;
- AQE skew-join handles residual imbalance.

Key-hashing note: seed keys are hashed to 64-bit integers before the
exchange (a 24-char UTF8 k-mer is ~3x the bytes of a long and far
slower to hash/compare).  The JVM path uses xxhash64, the Arrow kernel
a polynomial rolling hash mod 2^64 — each path is self-consistent, and
the two accepted 2^-64-scale collision modes are unchanged from r13: a
JOIN-side collision only creates a false candidate that the exact J2
verify rejects; a CAP-side collision merges two keys' counts and can
drop an innocent key whole (documented, bounded).  With the Arrow path
the blacklist is matched by hash as well (same collision class); the
JVM path keeps the string-level blacklist anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna

# Polynomial rolling-hash multiplier for the Arrow kernel (odd, so x*B is
# a bijection mod 2^64); FNV-1a's 64-bit prime.
_POLY_B = 1099511628211

# Auto-prefilter gate: the broadcast distinct prefix-key set is 2 keys
# per read (16 B/key framed — ~160 MB at this bound, the top of the
# comfortable broadcast range).  ``match_prefix(prefilter=None)`` counts
# the reads (one cheap job) and disables the prefilter past the bound
# instead of relying on the caller to remember ``prefilter=False`` at
# scale (r14 verdict #3: every other bound in this package is
# count-gated automatically; this one was a manual footgun).
PREFILTER_KEYS_MAX = 10_000_000


def _oriented(seq_col, d_col):
    return F.when(d_col == "f", seq_col).otherwise(dna.rc(seq_col))


def _oriented_both(nodes: DataFrame) -> DataFrame:
    """(node_id, d, oseq) for both orientations; null sequences dropped
    (they generate no postings in any path)."""
    return nodes.filter(F.col("seq").isNotNull()).select(
        "node_id",
        F.explode(F.array(
            F.struct(F.lit("f").alias("d"), F.col("seq").alias("oseq")),
            F.struct(F.lit("r").alias("d"), dna.rc(F.col("seq")).alias("oseq")),
        )).alias("o"),
    ).select("node_id", F.col("o.d").alias("d"), F.col("o.oseq").alias("oseq"))


def _postings(nodes: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """(prefix_postings, suffix_postings) over both orientations — the
    string-kmer two-pass form; the JVM fallback path and the string-level
    noise-filter tests build on it."""
    both = _oriented_both(nodes)
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
    """Homopolymer + high-frequency seed removal (skew control) at the
    string level — the JVM fallback's filter."""
    homopolymers = [c * k for c in "ACGT"]
    out = postings.filter(~F.col("kmer").isin(homopolymers))
    if high_kmers is not None:
        out = out.join(F.broadcast(high_kmers.select("kmer")), "kmer", "left_anti")
    return out


def _poly_hash_bytes(data: bytes) -> int:
    """Driver-side twin of the kernel's rolling hash (whole-byte-string
    form, used for the homopolymer / blacklist exclusion constants).
    Returns the SIGNED 64-bit value (Spark LongType convention)."""
    acc = 0
    for b in data:
        acc = (acc * _POLY_B + b) & 0xFFFFFFFFFFFFFFFF
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def _roll_hash_batch(batch, k: int, np, prefix_only: bool = False):
    """All-window polynomial hashes for the batch's ``oseq`` column,
    vectorized over the FLAT Arrow string buffer (one contiguous byte
    run + offsets — guide §4.2's re-slicing property).

    Returns ``(hash[int64 view], ov[int32], row_idx)`` where ``ov = 0``
    tags the prefix window (start 1) and interior windows carry
    ``ov = len - start + 1`` (>= k by construction); rows shorter than k
    contribute their single short prefix window, hashed over the bytes
    they have (matching ``substring(oseq, 1, k)`` on a short string).
    """
    import pyarrow as pa
    arr = batch.column("oseq")
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover - RecordBatch cols are flat
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    if bufs[0] is not None and arr.null_count:
        raise ValueError("null oseq reached the posting kernel "
                         "(_oriented_both filters them)")
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off = np.frombuffer(bufs[1], dtype=np.int64,
                            count=len(arr) + 1, offset=arr.offset * 8)
    else:
        off = np.frombuffer(bufs[1], dtype=np.int32,
                            count=len(arr) + 1,
                            offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    if data.size and int(data.max()) > 127:
        raise ValueError(
            "non-ASCII sequence bytes: byte windows != char windows; "
            "call match_prefix(use_arrow=False) for this input")
    n = int(off[-1])
    H = np.zeros(max(n - k + 1, 0), dtype=np.uint64)
    if H.shape[0]:
        dd = data[:n].astype(np.uint64)
        for j in range(k):
            # byte at window offset j carries B^(k-1-j); powers are
            # reduced mod 2^64 in exact Python ints so the vectorized
            # multiply wraps silently (unsigned array ops don't warn)
            p = np.uint64(pow(_POLY_B, k - 1 - j, 1 << 64))
            H += dd[j:j + H.shape[0]] * p

    def _short(row: int, start_local: int) -> np.uint64:
        seg = data[off[row] + start_local:off[row + 1]]
        acc = 0
        for b in seg[:k]:
            acc = (acc * _POLY_B + int(b)) & 0xFFFFFFFFFFFFFFFF
        return np.uint64(acc)

    L = np.diff(off)
    if prefix_only:
        starts = off[:-1]
        h = np.empty(len(L), dtype=np.uint64)
        okm = (L >= k) & (starts <= (n - k))
        h[okm] = H[starts[okm]]
        for r in np.nonzero(~okm)[0]:
            h[r] = _short(int(r), 0)
        return h.view(np.int64), None, np.arange(len(L))
    nw = np.maximum(L - k + 1, 1).astype(np.int64)
    tot = int(nw.sum())
    row_idx = np.repeat(np.arange(len(L)), nw)
    ends = np.cumsum(nw)
    local_i = np.arange(tot, dtype=np.int64) - np.repeat(ends - nw, nw)
    gpos = off[row_idx] + local_i
    okm = (local_i + k <= L[row_idx]) & (gpos <= (n - k))
    h = np.empty(tot, dtype=np.uint64)
    h[okm] = H[gpos[okm]]
    for t in np.nonzero(~okm)[0]:
        h[t] = _short(int(row_idx[t]), int(local_i[t]))
    ov = np.where(local_i == 0, 0, L[row_idx] - local_i).astype(np.int32)
    return h.view(np.int64), ov, row_idx


def _arrow_postings(both: DataFrame, k: int, excl_hashes) -> DataFrame:
    """Single-pass posting generation (node_id, d, khash, ov) via the
    numpy rolling-hash kernel; ``excl_hashes`` (sorted int64 ndarray
    broadcast) drops homopolymer / blacklisted seed keys in-kernel."""
    id_type = dict(both.dtypes)["node_id"]
    schema = f"node_id {id_type}, d string, khash long, ov int"
    excl_bc = both.sparkSession.sparkContext.broadcast(excl_hashes)

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        excl = excl_bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            h, ov, row_idx = _roll_hash_batch(batch, k, np)
            keep = ~np.isin(h, excl)
            h, ov, row_idx = h[keep], ov[keep], row_idx[keep]
            idx = pa.array(row_idx)
            yield pa.record_batch(
                [batch.column("node_id").take(idx),
                 batch.column("d").take(idx),
                 pa.array(h), pa.array(ov)],
                names=["node_id", "d", "khash", "ov"])

    return both.select("node_id", "d", "oseq").mapInArrow(gen, schema)


def _arrow_prefix_keys(both: DataFrame, k: int, excl_hashes) -> DataFrame:
    """Distinct prefix-window hashes (the semi-prefilter's build side),
    via the same kernel in prefix-only mode — 2 keys/read, cheap."""
    excl_bc = both.sparkSession.sparkContext.broadcast(excl_hashes)

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        excl = excl_bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            h, _, _ = _roll_hash_batch(batch, k, np, prefix_only=True)
            h = h[~np.isin(h, excl)]
            yield pa.record_batch([pa.array(h)], names=["khash"])

    return both.select("oseq").mapInArrow(gen, "khash long").distinct()


def _arrow_available() -> bool:
    try:  # pragma: no cover - trivially environment-dependent
        import numpy  # noqa: F401
        import pyarrow  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False


def match_prefix(nodes: DataFrame, k: int, high_kmers: DataFrame | None = None,
                 per_key_cap: int = 2000, prefilter: bool | None = None,
                 use_arrow: bool = False) -> DataFrame:
    """J1: candidate overlap edges (src, d1, dst, d2, ov), maximal ov per
    oriented pair.

    The skew guard is NON-OPTIONAL when no precomputed ``high_kmers``
    blacklist is supplied: seed keys whose total posting count exceeds
    ``per_key_cap`` are dropped whole by a streaming window count over
    the join's own exchange.  Documented deviations from the reference
    reducer (src/Brush/MatchPrefix.java:366-380), both deliberate:

    - the reference keeps the TOP ``UP_KMER`` candidates per key by
      descending overlap instead of dropping the key; that per-key
      sorted top-K is exactly the hot-key pile-up this operator refuses.
      With the P3 blacklist active the reference's own count cutoff
      removes such keys before this point anyway.
    - the reference's ``LOW_KMER`` minimum (skip keys with <= LowKmer
      candidate edges, default 1 — a pre-verify noise heuristic) is not
      applied: the exact J2 substring verification already rejects
      every spurious candidate, so the minimum only changes which TRUE
      single-candidate edges survive, and dropping true edges is the
      wrong default for a verified pipeline.

    ``prefilter`` semi-joins the posting stream against the broadcast
    distinct prefix-key set before the exchange: suffix windows matching
    no read prefix cannot produce candidates, so dropping them is
    invisible in the output — including to the cap guard, whose drops
    are only observable on keys that join.  The prefix-key set is
    2/read, so the default ``None`` COUNT-GATES it automatically: one
    cheap count of ``nodes`` enables the prefilter only while
    ``2 * reads <= PREFILTER_KEYS_MAX`` (past it, multi-GB broadcasts
    don't fly and the identical single-exchange plan simply carries all
    windows — same output either side of the gate, pinned in
    tests/test_overlap.py).  Explicit ``True``/``False`` skip the count
    and force the mode.

    ``use_arrow=False`` (default) runs the pure-JVM expression path —
    fastest measured end-to-end at bench scale and the path for
    non-ASCII sequence alphabets.  ``use_arrow=True`` opts in to the
    numpy ``mapInArrow`` kernel: ~1.7x less executor CPU but a fixed
    per-task Python-worker latency; see the module docstring for the
    measured tradeoff.
    """
    if not use_arrow or not _arrow_available():
        use_arrow = False
    if prefilter is None:
        prefilter = nodes.count() * 2 <= PREFILTER_KEYS_MAX
    both = _oriented_both(nodes)
    if use_arrow:
        excl = [_poly_hash_bytes((c * k).encode()) for c in "ACGT"]
        if high_kmers is not None:
            # blacklist is broadcast-small by contract (P3 threshold);
            # hash it driver-side so the kernel excludes it in-stream
            excl += [_poly_hash_bytes(r[0].encode())
                     for r in high_kmers.select("kmer").collect()]
        import numpy as np
        excl_arr = np.sort(np.array(sorted(set(excl)), dtype=np.int64))
        un = _arrow_postings(both, k, excl_arr)
        pref_keys = (_arrow_prefix_keys(both, k, excl_arr)
                     if prefilter else None)
    else:
        prefixes, suffixes = _postings(nodes, k)
        prefixes = _drop_noise_keys(prefixes, k, high_kmers)
        suffixes = _drop_noise_keys(suffixes, k, high_kmers)
        un = (
            prefixes.select("node_id", "d", F.xxhash64("kmer").alias("khash"),
                            F.lit(0).alias("ov"))
            .unionByName(suffixes.select(
                "node_id", "d", F.xxhash64("kmer").alias("khash"),
                F.col("ov").cast("int").alias("ov")))
        )
        pref_keys = (prefixes.select(F.xxhash64("kmer").alias("khash"))
                     .distinct() if prefilter else None)
    if pref_keys is not None:
        un = un.join(F.broadcast(pref_keys), "khash", "semi")
    # ONE exchange on the hashed seed key feeds the cap guard AND both
    # sides of the candidate self-join (exchange reuse is structural:
    # the branches are the same frame).
    un_sh = un.repartition(F.col("khash"))
    if high_kmers is None:
        # Streaming window count over the join's own exchange (r14) —
        # zero extra shuffles vs the old count-aggregate + broadcast
        # anti-join.  EXTREME-scale caveat (r14 verdict #4, documented
        # deliberately): the window buffers one key's postings in one
        # task before dropping it, so a mega-hot seed key (possible only
        # when no P3 ``high_kmers`` blacklist is supplied) becomes a
        # single-task sort/spill straggler rather than a map-side
        # pre-aggregated count.  The spill is bounded and correct; at
        # 100 TB supply the P3 blacklist (this branch then never runs —
        # the reference's own pipeline always computes one) rather than
        # re-paying the two-pass count shape on every clean corpus.
        w = Window.partitionBy("khash")
        flt = un_sh.withColumn("tot", F.count(F.lit(1)).over(w)) \
            .filter(F.col("tot") <= per_key_cap).drop("tot")
    else:
        flt = un_sh
    # Self-join on the seed key with the prefix/suffix split in the JOIN
    # CONDITION (not pre-filtered branches): both children stay
    # canonically identical, so the exchange above is planned once.
    # Explicit shuffle-hash: posting tables are explode-multiplied and
    # Catalyst's Generate estimate is the CHILD's size, so the planner
    # would happily broadcast a multi-GiB posting side (observed: 5 GiB
    # at sf0.1).  Postings are never broadcastable at scale — pin the
    # strategy; build on the sparser prefix side (2 postings/read).
    s = flt.alias("s")
    p = flt.alias("p").hint("shuffle_hash")
    cand = (
        s.join(p, (F.col("s.khash") == F.col("p.khash"))
               & (F.col("p.ov") == 0) & (F.col("s.ov") > 0)
               & (F.col("s.node_id") != F.col("p.node_id")))
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
