"""Structured Streaming tests (availableNow over file sources — the
deterministic replay of the reference's continuous Kafka pipelines)."""

from __future__ import annotations

import pyspark.sql.functions as F

from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
from icebergproject_spark.streaming import (
    dynamic_topic_routing,
    file_stream_source,
    foreach_batch_multi_sink,
    run_available_now,
    windowed_count_stream,
)


def _write_fixture(spark, path):
    df = spark.createDataFrame(
        [("browselog", "u1", "2022-06-15 06:23:42"),
         ("browselog", "u2", "2022-06-15 06:23:51"),
         ("otherlog", "u3", "2022-06-15 06:23:43")],
        ["logtype", "user_id", "ts_str"],
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))
    df.write.mode("overwrite").parquet(path)
    return df.schema


def test_stream_filter_to_lakehouse(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = _write_fixture(spark, src)
    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="icebergdb")
    stream = file_stream_source(spark, src, schema)
    browse = stream.filter(F.col("logtype") == "browselog")

    run_available_now(
        browse,
        str(tmp_path / "ckpt"),
        lambda batch, _id: catalog.table("ODS_BROWSELOG").append(batch),
    )
    out = catalog.table("ODS_BROWSELOG").read()
    assert out.count() == 2
    assert {r.user_id for r in out.collect()} == {"u1", "u2"}


def test_stream_multi_sink_fanout(spark, tmp_path):
    """K7: one micro-batch feeds two sinks (≙ Iceberg + Kafka side output)."""
    src = str(tmp_path / "src")
    schema = _write_fixture(spark, src)
    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="icebergdb")
    stream = file_stream_source(spark, src, schema)

    sink = foreach_batch_multi_sink([
        lambda b: catalog.table("SINK_A").append(b),
        lambda b: catalog.table("SINK_B").append(b.filter(F.col("logtype") == "browselog")),
    ])
    run_available_now(stream, str(tmp_path / "ckpt"), sink)
    assert catalog.table("SINK_A").read().count() == 3
    assert catalog.table("SINK_B").read().count() == 2


def test_streaming_windowed_count(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = _write_fixture(spark, src)
    stream = file_stream_source(spark, src, schema)
    counts = windowed_count_stream(
        stream.filter(F.col("logtype") == "browselog"),
        "ts", ["logtype"], "10 seconds", watermark="1 minute",
    )
    collected = []
    run_available_now(
        counts, str(tmp_path / "ckpt"),
        lambda b, _id: collected.extend(b.collect()),
    )
    got = {(r.window_start, r.product_cnt) for r in collected}
    # 06:23:42 → [:40,:50), 06:23:51 → [:50,:00)
    assert ("2022-06-15 06:23:40", 1) in got
    assert ("2022-06-15 06:23:50", 1) in got


def test_dynamic_topic_routing_shape(spark):
    df = spark.createDataFrame(
        [("KAFKA-DWD-BROWSELOG-TOPIC", "u1", "42")],
        ["kafka_dwd_topic", "user_id", "obtain_points"],
    )
    out = dynamic_topic_routing(df, "kafka_dwd_topic", ["user_id", "obtain_points"])
    assert out.columns == ["topic", "value"]  # Kafka sink per-record routing (K3)
    r = out.collect()[0]
    assert r.topic == "KAFKA-DWD-BROWSELOG-TOPIC"
    assert '"user_id":"u1"' in r.value
