"""Ranked full-text retrieval: BM25 top-k over the documents table.

The search counterpart of the text-analysis family (``textops.py``) — a
training-data pipeline queries its corpus constantly ("find the docs
about X", "pull eval-adjacent documents", "inspect what the dedup kept
for this topic"), and BM25 is the standard lexical ranking function.

Scale shape (the part that matters at 100 TB): the corpus-side pass
filters each document's token array against the BROADCAST literal query
term set BEFORE any explode — the classic inverted-index posting
explosion (corpus tokens x 1 row each) never materializes; only
query-term HITS explode, so the shuffle is bounded by the hit volume,
not the corpus token count.  Document length and the corpus average come
from one aggregate over the same scan; per-term document frequencies are
a ≤|query| row aggregate broadcast back.  The final top-k is
``orderBy(...).limit(k)`` — Spark's TakeOrderedAndProject, a per-
partition partial top-k + driver merge of k-row heads, never a global
sort (plan-pinned in ``tests/test_textsearch.py``).

No reference analogue (the reference is an assembler); the operator
follows Robertson/Sparck Jones BM25 as published (k1/b defaults 1.2 /
0.75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudbrush_spark.functions import text


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive, so
    every document containing >= 1 query term is a scored candidate and
    the result has exactly ``min(k, candidates)`` rows);
    ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.
    Ties break by ascending id — the cut line is deterministic across
    retries.  Output: (id_col, rank, score), rank 1..min(k, candidates).
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    toks = text.tokens(text_col)
    base = docs.select(F.col(id_col), F.size(toks).alias("dl"),
                       F.filter(toks, lambda t: t.isin(*terms))
                       .alias("hits"))
    # corpus stats: one tiny aggregate, broadcast back
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    # only query-term hits explode — never the corpus token stream
    tf = (base.filter(F.size("hits") > 0)
          .select(id_col, "dl", F.explode("hits").alias("term"))
          .groupBy(id_col, "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_t = tf.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df"))
    idf = (df_t.crossJoin(F.broadcast(stats))
           .withColumn("idf", F.log(
               F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
               / (F.col("df") + 0.5)))
           .select("term", "idf"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part",
            F.col("idf") * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
        .groupBy(id_col).agg(F.sum("part").alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    # rank assignment runs AFTER the limit: the unpartitioned window only
    # ever sees <= k rows (the TakeOrderedAndProject result), so the
    # single-partition exchange is bounded by construction
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.select(id_col, F.row_number().over(w).alias("rank"), "score")
