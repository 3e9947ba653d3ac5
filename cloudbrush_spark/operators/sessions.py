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
