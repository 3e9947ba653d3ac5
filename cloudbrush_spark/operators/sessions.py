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
