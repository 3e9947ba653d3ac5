"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast nested-loop expressed as a
join on a constant, with the dot product as a JVM-side higher-order
function (``aggregate(zip_with(...))``), so no Python in the hot path.

Scale path (100 TB): random-hyperplane LSH bucketing — each vector lands in
2^planes sign-pattern buckets; candidates share a bucket, exact cosine
re-rank inside.  Probing multiple hash tables raises recall.  The bucket
join is a plain equi-join Catalyst shuffles on the bucket key; AQE splits
hot buckets.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(pairs: DataFrame, a_col: str = "va", b_col: str = "vb") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return pairs.withColumn(
        "cosine", _dot(a, b) / (_norm(a) * _norm(b))
    )


# Norms are per-VECTOR, not per-pair: computing them in the pair expression
# re-evaluates an O(dim) aggregate fan-out times per vector.  Each entry
# point below attaches the norm once in the per-side projection (one pass
# over each vector) and the pair expression divides by the two scalars.


def cosine_topk_bruteforce(vectors: DataFrame, queries: DataFrame, k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self).

    ``queries`` is broadcast (queries are the small side by assumption);
    the corpus streams once — the correct physical plan for 1 query batch
    vs a 100 TB corpus.  Output: (query_id, neighbor_id, rank, cosine).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       _norm(F.col(vec_col)).alias("qn"))
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                       _norm(F.col(vec_col)).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) /
                    (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def _sig_expr(vec_col: str, hp: list[list[float]]):
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(hp):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(w) for w in plane]))
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_bucket(vectors: DataFrame, dim: int, planes: int = 8, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               tables: int = 1) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-pattern of ``planes`` projections,
    one ``(tbl, bucket)`` row per vector per hash table.

    Hyperplanes are generated driver-side (seeded, tiny) and folded into the
    expression as literals — no UDF, no broadcast variable needed.  Multiple
    tables (independent seeds) are the standard recall lever: a near pair is
    found if it collides in ANY table, so recall = 1-(1-p)^tables at a
    ``tables``-times-larger (still bucket-bounded) candidate volume.
    """
    sigs = [
        F.struct(F.lit(t).alias("tbl"),
                 _sig_expr(vec_col, _hyperplanes(dim, planes, seed + 7919 * t))
                 .alias("bucket"))
        for t in range(tables)
    ]
    return vectors.select(
        F.col(id_col), F.col(vec_col),
        F.explode(F.array(*sigs)).alias("tb"),
    ).select(id_col, vec_col, F.col("tb.tbl").alias("tbl"),
             F.col("tb.bucket").alias("bucket"))


def cosine_topk_lsh(vectors: DataFrame, dim: int, k: int = 10, planes: int = 8,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding", tables: int = 1) -> DataFrame:
    """Approximate all-pairs top-k: candidates share an LSH bucket in any
    table; the distinct candidate-pair set is re-ranked with exact cosine.
    One shuffle on (tbl, bucket); pair dedup BEFORE the vector join keeps
    the rerank linear in distinct candidates, not tables x candidates."""
    b = lsh_bucket(vectors, dim, planes, seed, id_col, vec_col, tables)
    a = b.select(F.col(id_col).alias("query_id"), "tbl", "bucket")
    c = b.select(F.col(id_col).alias("neighbor_id"), "tbl", "bucket")
    cand = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = vectors.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                        _norm(F.col(vec_col)).alias("qn"))
    cv = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                        _norm(F.col(vec_col)).alias("cn"))
    scored = (
        cand.join(qv, "query_id").join(cv, "neighbor_id")
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) /
                    (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_centroids(vectors: DataFrame, n_centroids: int = 16, sample: int = 4096,
                  iters: int = 8, seed: int = 42,
                  vec_col: str = "embedding") -> list[list[float]]:
    """Coarse quantizer for IVF: Lloyd's k-means over a bounded driver-side
    sample (numpy).  The sample is the ONLY data that leaves the cluster;
    at 100 TB the centroids are trained once on a few thousand rows and
    folded into the plan as literals — no iterative Spark job.
    """
    import numpy as np
    rows = (vectors.select(vec_col)
            .sample(False, 1.0, seed)  # deterministic pass-through order
            .limit(sample).collect())
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cent]


def _centroid_scores(vec, centroids: list[list[float]]):
    """array<struct<s,i>> of -0.5||c||^2 + v.c (argmax == nearest by L2)."""
    scores = []
    for i, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(w) for w in c])
        c2 = sum(w * w for w in c)
        scores.append(F.struct((_dot(vec, lit_c) - 0.5 * c2).alias("s"),
                               F.lit(i).alias("i")))
    return F.array(*scores)


def cosine_topk_ivf(vectors: DataFrame, k: int = 10, n_centroids: int = 16,
                    nprobe: int = 2, seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF approximate all-pairs top-k: a driver-trained coarse quantizer
    partitions the corpus into inverted lists (one bucket per vector);
    each query probes its ``nprobe`` nearest centroids and reranks with
    exact cosine inside those lists.

    Scale shape: one shuffle on the centroid id (bounded, ~uniform by
    construction of k-means); probe fan-out = nprobe rows per query.
    Recall < 1 by construction (like the LSH variant); raise nprobe for
    recall, n_centroids for selectivity.
    """
    centroids = ivf_centroids(vectors, n_centroids, seed=seed, vec_col=vec_col)
    scores = _centroid_scores(F.col(vec_col), centroids)
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        F.reverse(F.array_sort(scores))[0]["i"].alias("bucket"),
    )
    probes = vectors.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        F.explode(F.transform(
            F.slice(F.reverse(F.array_sort(scores)), 1, nprobe),
            lambda s: s["i"],
        )).alias("bucket"),
    )
    scored = (
        probes.join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) /
                    (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(vectors: DataFrame, dim: int, threshold: float = 0.95,
                       planes: int = 6, seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding", tables: int = 1) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold),
    LSH-bucketed candidate generation (any-table collision) + exact verify.
    Every emitted pair passes the exact cosine filter, so the output is
    always a SUBSET of the brute-force pair set — only recall varies with
    ``planes``/``tables``."""
    b = lsh_bucket(vectors, dim, planes, seed, id_col, vec_col, tables)
    a = b.select(F.col(id_col).alias("a"), "tbl", "bucket")
    c = b.select(F.col(id_col).alias("b"), "tbl", "bucket")
    cand = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                        _norm(F.col(vec_col)).alias("na"))
    vb = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                        _norm(F.col(vec_col)).alias("nb"))
    return (
        cand.join(va, "a").join(vb, "b")
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) /
                    (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
