"""Structured Streaming twins of the batch event operators
(cloudbrush_spark.operators.sessions) plus a custom stateful operator.

One definition, two runners: the batch forms stay duckdb-oracle-checkable;
these run the same aggregations over unbounded input with watermarks
bounding state.
"""

from cloudbrush_spark.streaming.windows import (  # noqa: F401
    read_document_stream,
    read_event_stream,
    read_rollup,
    stream_boiler_scrub,
    stream_curate,
    stream_curation_gate,
    stream_dedup,
    stream_guard,
    stream_publish,
    stream_range_join,
    stream_rollup_maintain,
    stream_running_counts,
    stream_sessionize,
    stream_sessionize_stateful,
    stream_tumbling_window,
)
