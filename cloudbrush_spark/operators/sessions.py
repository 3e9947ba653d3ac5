"""Event-table operators: tumbling-window aggregation and gap-based
sessionization, in their *batch* form.

The streaming twins live in ``cloudbrush_spark.streaming`` (same
semantics via Structured Streaming watermarks / session_window); keeping a
batch form makes them duckdb-oracle-checkable and usable for backfills —
the standard lambda-free pattern: one definition, two runners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per (window, event_type) count + value sum. Batch equivalent of the
    streaming windowed aggregation."""
    bucket = (F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60)).cast("timestamp")
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("value_sum"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap from
    the previous event exceeds ``gap_minutes``.

    Boundary convention: a gap of EXACTLY ``gap_minutes`` stays in the
    SAME session (``>``), matching Structured Streaming's
    ``session_window`` (an event at precisely window-end MERGES — the
    window end is inclusive for the merge test) — so the streaming twin
    (streaming/windows.py) groups events identically, ties included.

    Classic lag + conditional cumsum over a per-user window.  One shuffle on
    user_id; at scale the window sort is per-user (bounded) not global.
    Output: (user_id, session_id, n_events, session_start, session_end).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = gap_minutes * 60
    with_new = events.withColumn(
        "new_sess",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap, 1
        ).otherwise(0),
    )
    with_sid = with_new.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def funnel(events: DataFrame, steps: list[str],
           horizon_minutes: int = 1440, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           max_events_per_user: int | None = None) -> DataFrame:
    """Ordered-sequence FUNNEL analysis — "users who did s1, then s2,
    ..., then sn, all within ``horizon_minutes`` of the first step":
    the product-analytics staple (conversion funnels) and the
    MATCH_RECOGNIZE-lite shape SQL engines bolt on.

    Semantics (deterministic, engine-portable): GREEDY FIRST-TOUCH —
    the anchor is the user's EARLIEST s1 event; each later step takes
    the earliest event of its type STRICTLY after the previous step and
    within ``anchor + horizon``.  Ties on the microsecond timestamp are
    value-identical under greedy-min, so the output never depends on
    event ids.

    Plan shape: one prefilter to the step types (everything else never
    leaves the scan), one hash aggregate per user collecting the
    (tus, type) pairs, and the greedy chain as a JVM ``aggregate`` fold
    over the sorted array — no Python, no per-step join cascade, ONE
    shuffle.  Per-user state is the matched-type event list (bounded by
    per-user activity — the same bound sessionize's per-user window
    sort already assumes).

    ``max_events_per_user`` (default off) is the BOT GUARD: a single
    pathological user's matched events would otherwise all land in one
    ``collect_list`` aggregation buffer, which — unlike a window sort —
    cannot spill, so one bot row can OOM its executor.  With the cap
    set, only each user's EARLIEST ``max_events_per_user`` events OF
    EACH STEP TYPE enter the collection (a per-(user, type) window
    rank, which spills instead of buffering; costs one extra shuffle),
    and the output gains an ``overflow_events`` column counting the
    events dropped per user (0 for everyone under the cap).  Documented
    approximation: a funnel whose true matched event lies beyond the
    per-type cap reports fewer completed steps — greedy-first-touch
    matches are overwhelmingly inside the earliest events of each type,
    and any affected user is flagged by ``overflow_events > 0``.

    Output: one row per DISTINCT user in ``events`` —
    (user_col, steps_completed, anchor_us, completed_us[,
    overflow_events]), sentinel -1 for no anchor / not completed."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)
    horizon_us = horizon_minutes * 60 * 1_000_000
    ev = events.select(
        F.col(user_col), F.unix_micros(F.col(ts_col)).alias("tus"),
        F.col(type_col).alias("et")).filter(F.col("et").isin(steps))
    overflow = None
    if max_events_per_user is not None:
        wcap = Window.partitionBy(user_col, "et").orderBy("tus")
        ranked = ev.withColumn("rnk", F.row_number().over(wcap))
        overflow = (ranked.filter(F.col("rnk") > max_events_per_user)
                    .groupBy(user_col)
                    .agg(F.count(F.lit(1)).alias("overflow_events")))
        ev = ranked.filter(F.col("rnk") <= max_events_per_user).drop("rnk")
    arr = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("tus", "et"))).alias("evs"))
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(F.lit(0).alias("step"),
                    F.lit(-1).cast("long").alias("last"),
                    F.lit(-1).cast("long").alias("anchor"))
    fold = F.aggregate(
        "evs", init,
        lambda acc, e: F.when(
            # try_element_at, not element_at: once the funnel completes,
            # step+1 == n+1 is out of bounds — ANSI element_at would
            # throw if the optimizer ever evaluated it before the
            # short-circuiting step<n conjunct; try_ returns NULL and
            # the comparison falls through to otherwise()
            (acc["step"] < n)
            & (e["et"] == F.try_element_at(step_arr, acc["step"] + 1))
            & ((acc["step"] == 0)
               | ((e["tus"] > acc["last"])
                  & (e["tus"] - acc["anchor"] <= horizon_us))),
            F.struct(
                (acc["step"] + 1).alias("step"), e["tus"].alias("last"),
                F.when(acc["step"] == 0, e["tus"]).otherwise(acc["anchor"])
                .alias("anchor"))
        ).otherwise(acc))
    folded = arr.select(
        user_col, fold["step"].alias("steps_completed"),
        fold["anchor"].alias("anchor_us"),
        F.when(fold["step"] == n, fold["last"]).otherwise(F.lit(-1))
        .cast("long").alias("completed_us"))
    universe = events.select(user_col).distinct()
    out = (universe.join(folded, user_col, "left")
           .na.fill({"steps_completed": 0, "anchor_us": -1,
                     "completed_us": -1}))
    if overflow is not None:
        out = (out.join(overflow, user_col, "left")
               .na.fill({"overflow_events": 0}))
    return out


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     period_days: int = 7) -> DataFrame:
    """Cohort retention matrix — "of the users who first appeared in
    period P, how many were active again in P+k": the other
    product-analytics staple beside :func:`funnel`.

    Cohort = the user's FIRST-activity period (integer
    ``floor(epoch_days / period_days)``, engine-portable — no calendar
    arithmetic); a (cohort, offset) cell counts DISTINCT users active
    ``offset`` periods after their cohort period.  Offset 0 is the
    cohort size itself, so ``retained/size`` is the retention rate.

    Plan shape: one per-user min (hash aggregate, map-side partials) to
    assign cohorts, one broadcastable join back (the per-user cohort
    frame is |users| rows — at 100 TB of events still only the user
    dimension), one distinct + count per (cohort, offset).  No windows,
    no skew beyond the user-activity distribution.

    Output: (cohort long, offset long, users long)."""
    ev = events.select(
        F.col(user_col),
        F.floor(F.unix_micros(F.col(ts_col))
                / F.lit(86_400_000_000 * period_days)).alias("p"))
    first = ev.groupBy(user_col).agg(F.min("p").alias("cohort"))
    return (ev.join(first, user_col)
            .select(user_col, "cohort", (F.col("p") - F.col("cohort"))
                    .alias("offset"))
            .distinct()
            .groupBy("cohort", "offset")
            .agg(F.count(F.lit(1)).alias("users")))


def json_props_agg(events: DataFrame, key: str = "k",
                   bucket_mod: int = 10) -> DataFrame:
    """Schema-on-read extraction over the semi-structured ``props`` JSON
    column, aggregated per (event_type, extracted-value bucket).

    The extraction is ``from_json`` with an EXPLICIT schema — a single
    codegen'd projection (Jackson parse inside the JVM, never row-level
    Python), so the parse fuses into the scan and the only shuffle is the
    final hash aggregate.  Malformed records and missing keys surface as
    NULLs (PERMISSIVE mode), which flow into a NULL bucket group instead
    of failing the job — at 100 TB of crawl-derived event logs some
    malformed props rows are a certainty, and a poisoned-row abort is the
    failure mode this avoids.  Output: (event_type, k_bucket, cnt, sum_k,
    max_k) with the extracted value exercised both row-level (the bucket
    key) and in aggregates.
    """
    k = F.from_json("props", f"{key} long").getField(key)
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % bucket_mod).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
