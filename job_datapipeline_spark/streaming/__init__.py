"""Structured Streaming pipelines (SURVEY.md §2.10, M5).

The reference has no streaming runtime — its streaming-shaped semantics are
daily incremental batch over date-stamped files (data-cleaner/cleaner.py:143,
data_populator/populator.py:22) plus in-run dedup (page.py:51,
listing.py:188). Here those semantics get their native Spark expression:
file-source ``readStream`` + ``Trigger.AvailableNow`` for incremental
catch-up runs, watermarked tumbling/session windows for time aggregation,
and ``dropDuplicatesWithinWatermark`` for bounded-state dedup.

Every streaming pipeline has a batch twin in the query registry
(events_hourly_rollup, events_sessionize) and a pytest proving
stream-equals-batch on the same inputs.

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
