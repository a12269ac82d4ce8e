"""Structured Streaming pipelines (SURVEY.md §2.10, M5).

The reference has no streaming runtime — its streaming-shaped semantics are
daily incremental batch over date-stamped files (data-cleaner/cleaner.py:143,
data_populator/populator.py:22) plus in-run dedup (page.py:51,
listing.py:188). Here those semantics get their native Spark expression:
file-source ``readStream`` + ``Trigger.AvailableNow`` for incremental
catch-up runs, watermarked tumbling/session windows for time aggregation,
and ``dropDuplicatesWithinWatermark`` for bounded-state dedup.

Every streaming pipeline has a batch twin in the query registry
(events_hourly_rollup, events_sessionize), a pytest proving
stream-equals-batch on the same inputs, and — since round 3 — its own
oracle-checked registry query running a REAL AvailableNow job under the
hash gate: streaming_hourly_rollup (windowed agg), streaming_dedup_events
(watermark dedup against planted duplicates), and
streaming_view_click_attribution (bounded-state stream-stream interval
join).

``stateful`` adds the custom-operator path the built-ins cannot express:
``applyInPandasWithState`` sessionization with emit-once-on-close semantics
and event-time state timeout (registry: streaming_sessionize_stateful).
"""

from .pipelines import (
    available_now_to_parquet,
    dedup_events_stream,
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)
from .stateful import sessionize_stateful

__all__ = [
    "available_now_to_parquet",
    "dedup_events_stream",
    "hourly_rollup_stream",
    "read_events_stream",
    "sessionize_stateful",
    "sessionize_stream",
]
