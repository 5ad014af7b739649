"""Source adapters (SURVEY §2.1 S1–S3).

The reference declares Kafka topics as JSON dynamic tables and polls MySQL
for routing config; this harness has neither broker nor database, so the
adapters here define the *decode layer* (envelope schemas + frame→column
parsing) that is identical whichever transport feeds it, plus file-based
stand-ins for tests and local runs.
"""

from icebergproject_spark.sources.envelopes import (
    CDC_ENVELOPE_SCHEMA,
    LOG_ENVELOPE_SCHEMA,
    decode_json_frames,
    decode_json_frames_with_dlq,
    kafka_json_source,
    read_config_table,
)

__all__ = [
    "CDC_ENVELOPE_SCHEMA",
    "LOG_ENVELOPE_SCHEMA",
    "decode_json_frames",
    "decode_json_frames_with_dlq",
    "kafka_json_source",
    "read_config_table",
]
