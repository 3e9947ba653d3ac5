"""Join-shape operators beyond plain equi-joins: as-of join and
bounded range join.

The reference's only join machinery is shuffle equi-joins on text keys
(SURVEY §2.3 taxonomy note); these are the engine-extension joins a
time-series / training-data pipeline needs, built scale-first:

- **as-of join**: the classic union+ordered-window formulation — tag both
  sides, union, per-key window ordered by time, ``last(right, ignorenulls)``
  carries the most recent right-side row forward.  ONE shuffle on the key,
  per-key sort only; no range-condition join (which Spark would plan as a
  broadcast-nested-loop or an exploding theta-join).
- **range join**: equi-key + bucketed time: both sides bucket their
  timestamps to ``bucket`` width, candidates join on (key, bucket) with
  each left row probing its own and the previous bucket, then the exact
  range predicate filters.  Shuffle stays key+bucket-partitioned (skew-
  safe), and the fan-out is bounded by bucket width instead of the full
  key history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'; 'forward' gives the
    earliest right row with right_ts >= left_ts), matching on ``on``.

    Output: left columns + ``asof_ts`` + requested right columns
    (null when no match).  Equivalent to DuckDB/kdb ASOF JOIN.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_cols = right_cols or []
    l_tagged = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    if direction == "backward":
        # right rows sort BEFORE a left row at the same ts (<= semantics);
        # ties among right rows resolve to the max right ts deterministically
        w = (Window.partitionBy(on)
             .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(),
                      F.col("__rts").asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(on)
             .orderBy(F.col("__ts").desc(), F.col("__is_left").asc(),
                      F.col("__rts").desc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, 0))
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "__is_left", "__l",
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
          for c in right_cols],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        "__l.*", "asof_ts", *right_cols)
    return out


def range_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str, lower: int, upper: int,
               bucket: int | None = None) -> DataFrame:
    """Pairs (l, r) matching on ``on`` with
    ``lower <= right_ts - left_ts <= upper`` (integer time units).

    Bucketed: both sides shuffle on (key, time-bucket); each left row
    probes ceil((upper-lower)/bucket)+1 buckets via a small explode —
    bounded fan-out, no theta-join.  Output: left.*, right's ts as
    ``matched_ts``.
    """
    bucket = bucket or max(upper - lower, 1)
    n_probe = (upper - lower) // bucket + 2
    l_b = left.withColumn(
        "__probe",
        F.explode(F.array(*[
            (F.floor((F.col(left_ts) + lower) / bucket) + i).cast("long")
            for i in range(n_probe)
        ])),
    )
    r_b = right.select(
        F.col(on), F.col(right_ts).alias("matched_ts"),
        F.floor(F.col(right_ts) / bucket).cast("long").alias("__probe"),
    )
    return (
        l_b.join(r_b, [on, "__probe"])
        .filter((F.col("matched_ts") - F.col(left_ts) >= lower)
                & (F.col("matched_ts") - F.col(left_ts) <= upper))
        .drop("__probe")
        .distinct()
    )


def salted_equijoin(left: DataFrame, right: DataFrame, on: list[str] | str,
                    salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant shuffle equi-join: the LEFT (large, possibly
    hot-keyed) side gets a deterministic salt in [0, salt), the RIGHT
    side is replicated once per salt value, and the join key becomes
    (on, __salt) — a single hot key's rows spread across ``salt``
    reducers instead of landing on one.

    When to reach for this instead of the defaults: AQE's skew-join
    split already repairs sort-merge skew at runtime and ``broadcast()``
    removes the shuffle entirely for small dims — explicit salting is
    the portable fallback when neither applies (right side too big to
    broadcast, plan shapes AQE won't split, or a deterministic
    partitioning is required for a reused stage).  The price is an
    explicit ``salt``x replication of the right side's shuffle bytes.

    Semantics notes:
    - ``how`` is restricted to inner/left: each left row matches exactly
      the one right replica carrying its salt, so multiplicities are
      preserved; right/full would duplicate unmatched right replicas.
    - The salt is ``xxhash64`` over all left columns — deterministic
      across runs AND across task retries (a nondeterministic salt can
      lose/duplicate rows when a stage is recomputed mid-shuffle).
      Fully-identical left rows therefore share a salt; if the hot key's
      rows are exact duplicates, pre-aggregate them to (row, count)
      first — shipping a count always beats salting identical payloads.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equijoin supports inner/left, got {how!r}")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("input already has a __salt column")
    on_cols = [on] if isinstance(on, str) else list(on)
    l_s = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
               F.lit(salt)).cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int")
                                      for i in range(salt)])))
    return l_s.join(r_s, on_cols + ["__salt"], how).drop("__salt")


def merge_upsert(base: DataFrame, updates: DataFrame,
                 id_col: str = "doc_id",
                 cmp_cols: tuple[str, ...] = ("text",),
                 version_col: str = "version",
                 delete_missing: bool = False) -> DataFrame:
    """Snapshot MERGE (the MERGE INTO shape the reference never had,
    SURVEY §2.8): reconcile a corpus snapshot with an incoming one by
    key — the incremental-ingest step between crawls.

    Per key the action is:

    - ``insert`` — key only in ``updates`` (version 1);
    - ``update`` — key in both and any ``cmp_cols`` value differs
      (version = base version + 1);
    - ``keep``   — key in both, content identical (version unchanged);
    - ``delete`` — key only in ``base`` AND ``delete_missing`` (version
      unchanged; with ``delete_missing=False`` absent keys are ``keep``
      — an incremental crawl is a partial view, not a tombstone list).

    Content comparison digests each ``cmp_cols`` column SEPARATELY
    (``md5`` per column, NULL as a fixed-width non-hex sentinel) and
    concatenates the fixed-width results — so column boundaries can
    never shift, even when values contain separator-like control bytes
    (crawled text does): ``('a\\x01','b')`` vs ``('a','\\x01b')`` hash
    differently.  Digests are computed BEFORE the join so the shuffle
    carries 32*len(cmp_cols) chars instead of document bodies — at
    100 TB the full-outer join moves keys + hashes + versions, never
    text.  One shuffle on the key (both sides), no skew beyond the key
    distribution itself.

    Output: (id_col, action string, version long) — the decision
    manifest; callers join it back to whichever side holds the winning
    payload (``updates`` for insert/update, ``base`` otherwise)."""
    def digest(df: DataFrame):
        # md5 each column, then concat the fixed-width (32-char) digests:
        # unambiguous regardless of the values' bytes.  NULL becomes a
        # 32-char non-hex sentinel no md5 can produce.
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-" * 32))
            for c in cmp_cols
        ]
        return F.concat(*parts) if len(parts) > 1 else parts[0]

    b = base.select(
        F.col(id_col),
        digest(base).alias("__bh"),
        F.coalesce(F.col(version_col).cast("long"), F.lit(1)).alias("__bv")
        if version_col in base.columns else F.lit(1).alias("__bv"))
    u = updates.select(F.col(id_col), digest(updates).alias("__uh"))
    j = b.join(u, id_col, "full_outer")
    action = (
        F.when(F.col("__bh").isNull(), F.lit("insert"))
        .when(F.col("__uh").isNull(),
              F.lit("delete") if delete_missing else F.lit("keep"))
        .when(F.col("__bh") != F.col("__uh"), F.lit("update"))
        .otherwise(F.lit("keep")))
    version = (
        F.when(F.col("__bh").isNull(), F.lit(1))
        .when(F.col("__uh").isNotNull() & (F.col("__bh") != F.col("__uh")),
              F.col("__bv") + 1)
        .otherwise(F.col("__bv")))
    return j.select(
        F.col(id_col), action.alias("action"),
        version.cast("long").alias(version_col))
