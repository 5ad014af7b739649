"""Structured Streaming layer (SURVEY Phase 3, §2.8)."""

from icebergproject_spark.streaming.runner import (
    file_stream_source,
    run_available_now,
    foreach_batch_multi_sink,
    windowed_count_stream,
    dynamic_topic_routing,
)

__all__ = [
    "file_stream_source",
    "run_available_now",
    "foreach_batch_multi_sink",
    "windowed_count_stream",
    "dynamic_topic_routing",
]
