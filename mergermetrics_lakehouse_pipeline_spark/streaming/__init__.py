"""Structured Streaming layer (file-source streams, watermarked windows,
foreachBatch MERGE) — see jobs.py."""

from .jobs import (  # noqa: F401
    EVENTS_RAW_SCHEMA,
    foreach_batch_distinct_fold,
    foreach_batch_upsert,
    read_events_stream,
    run_available_now,
    streaming_attribution_join,
    streaming_dedup,
    streaming_hourly_ohlc,
    streaming_tumbling_counts,
)
