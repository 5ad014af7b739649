"""Structured Streaming layer (SURVEY Phase 3, §2.8)."""

from icebergproject_spark.streaming.runner import (
    dbapi_batch_sink,
    dedup_stream,
    dynamic_topic_routing,
    file_stream_source,
    foreach_batch_multi_sink,
    near_dup_filter_batch,
    rocksdb_state_conf,
    run_available_now,
    stream_stream_join,
    windowed_count_stream,
)

__all__ = [
    "dbapi_batch_sink",
    "dedup_stream",
    "dynamic_topic_routing",
    "file_stream_source",
    "foreach_batch_multi_sink",
    "near_dup_filter_batch",
    "rocksdb_state_conf",
    "run_available_now",
    "stream_stream_join",
    "windowed_count_stream",
]
