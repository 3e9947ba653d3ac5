"""Plan inspection + checkpoint utilities for the iterative operators."""

from cloudbrush_spark.plans.explain import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    shuffle_count,
)
