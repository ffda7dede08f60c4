"""Structured Streaming analogs of the batch operators (SURVEY.md §2.10).

The reference's streaming surface is only a *pipeline trigger* (S9: file
readiness scan -> HTTP trigger); its daily "snapshot -> end-of-period state"
batch pattern (W1) generalizes naturally to event-time windows + watermark.
The window logic itself lives in ``operators.windows`` — identical code
serves batch and streaming DataFrames; this module adds the streaming
source, watermark, trigger, and sink plumbing.
"""

from .rollup import (
    stream_stream_purchase_join,
    run_available_now,
    stream_dedup,
    stream_events,
    stream_static_enriched_counts,
    stream_tumbling_counts,
    stream_weekly_rollup_to_parquet,
    stateful_user_totals,
    stateful_sessions,
)

__all__ = [
    "stream_dedup",
    "stream_events",
    "stream_static_enriched_counts",
    "stream_tumbling_counts",
    "stream_weekly_rollup_to_parquet",
    "run_available_now",
    "stateful_user_totals",
    "stateful_sessions",
]
