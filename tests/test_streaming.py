"""Structured Streaming tests (availableNow over file sources — the
deterministic replay of the reference's continuous Kafka pipelines)."""

from __future__ import annotations

import pyspark.sql.functions as F

from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
from icebergproject_spark.plans.dim import upsert_dims
from icebergproject_spark.streaming import (
    dedup_stream,
    dynamic_topic_routing,
    file_stream_source,
    foreach_batch_multi_sink,
    run_available_now,
    stream_stream_join,
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


def test_kafka_wire_format_golden(spark):
    """VERDICT r3 ask #7 — the Kafka K2/K3 wire contract, byte-exact:
    (a) the frame schema is EXACTLY what Spark's Kafka sink serializes
    (key binary, value binary, topic string, headers array<struct<key
    string, value binary>>); (b) golden bytes for a fixed record;
    (c) consume-side decode (the S1 path) round-trips the envelope
    byte-identically. A real-broker port is then a config change."""
    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, decode_json_frames
    from icebergproject_spark.streaming.runner import kafka_frames

    rows = [
        ("db1", "user_points", "insert", "1655251200", "77", "true",
         {"user_id": "u1", "points": "42"}),
        ("db1", "user_points", "update", "1655251201", "78", "true",
         {"user_id": "u2", "points": "7"}),
    ]
    df = spark.createDataFrame(
        rows,
        "database string, table string, type string, ts string, "
        "xid string, commit string, data map<string,string>",
    )
    frames = kafka_frames(
        df,
        value_cols=["database", "table", "type", "ts", "xid", "commit", "data"],
        key_col="table",
        topic="KAFKA-ODS-TOPIC",
        headers=[("src", "database")],
    )
    # (a) exact sink schema
    assert (
        frames.schema.simpleString()
        == "struct<key:binary,value:binary,topic:string,"
        "headers:array<struct<key:string,value:binary>>>"
    )
    got = frames.collect()
    # (b) golden bytes (to_json renders struct-field order, no spaces)
    assert {bytes(r.value) for r in got} == {
        b'{"database":"db1","table":"user_points","type":"insert",'
        b'"ts":"1655251200","xid":"77","commit":"true",'
        b'"data":{"user_id":"u1","points":"42"}}',
        b'{"database":"db1","table":"user_points","type":"update",'
        b'"ts":"1655251201","xid":"78","commit":"true",'
        b'"data":{"user_id":"u2","points":"7"}}',
    }
    for r in got:
        assert bytes(r.key) == b"user_points"
        assert r.topic == "KAFKA-ODS-TOPIC"
        assert [(h.key, bytes(h.value)) for h in r.headers] == [("src", b"db1")]
    # (c) consume-side round-trip through the S1 decode path
    back = decode_json_frames(
        frames.select("key", "value"), CDC_ENVELOPE_SCHEMA
    )
    decoded = {r2["ts"]: r2 for r2 in back.collect()}
    for database, table, typ, ts, xid, commit, data in rows:
        d = decoded[ts]
        assert (d["database"], d["table"], d["type"], d["xid"], d["commit"]) == (
            database, table, typ, xid, commit
        )
        assert dict(d["data"]) == data


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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once replays collapse: duplicate event ids within the
    watermark horizon are dropped across micro-batches."""
    import os
    import time

    src = str(tmp_path / "dd_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["event_id", "user_id"]).withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("event_id"))
        )
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", [(1, "u1"), (2, "u2")], 1_700_000_060)
    write_file("f2", [(2, "u2"), (3, "u3")], 1_700_000_120)  # 2 is a replay

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = dedup_stream(stream, ["event_id"], "ts", watermark="1 hour")
    results = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r.event_id for r in results) == [1, 2, 3]


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Click ⋈ purchase attribution: purchases join clicks of the same
    user within 30 s; a purchase outside the bound does not match."""
    base = 1_700_000_000
    clicks_rows = [("u1", base), ("u2", base)]
    buys_rows = [("u1", base + 10), ("u2", base + 120)]  # u2 outside bound

    def stream_of(rows, ts_name, path):
        df = spark.createDataFrame(rows, ["user_id", "epoch"]).withColumn(
            ts_name, F.timestamp_seconds(F.col("epoch"))
        ).drop("epoch")
        df.write.mode("overwrite").parquet(path)
        return spark.readStream.schema(df.schema).parquet(path)

    clicks = stream_of(clicks_rows, "click_ts", str(tmp_path / "clicks"))
    buys = stream_of(buys_rows, "buy_ts", str(tmp_path / "buys")).withColumnRenamed(
        "user_id", "buyer_id"
    )
    joined = stream_stream_join(
        clicks, buys.withColumnRenamed("buyer_id", "user_id"),
        key="user_id", left_ts="click_ts", right_ts="buy_ts",
        watermark="1 minute", within="30 seconds",
    )
    results = []
    q = (
        joined.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    matched = {r[0] for r in results}
    assert matched == {"u1"}


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carries the open session
    across micro-batches; a gap-crossing event closes and emits it."""
    import os
    import time

    from icebergproject_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    base = 1_700_000_000

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "epoch"]).withColumn(
            "ts", F.timestamp_seconds(F.col("epoch"))
        )
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # batch 1: u1 two events 10s apart; u2 one event
    write_file("f1", [("u1", base), ("u1", base + 10), ("u2", base)], 1_700_000_060)
    # batch 2 (later mtime): u1 event past the 30s gap → closes session 1;
    # u2 event within gap → extends, stays open (not emitted)
    write_file("f2", [("u1", base + 100), ("u2", base + 20)], 1_700_000_120)

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = sessionize_stream(stream, "user_id", "ts", gap_seconds=30)

    results = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    closed = {(r.key, r.session_start, r.session_end, r.n_events) for r in results}
    # exactly u1's first session was closed by the gap in batch 2
    assert closed == {("u1", base, base + 10, 2)}


def test_streaming_cdc_merge_upsert(spark, tmp_path):
    """K6 as a stream: CDC micro-batches foreachBatch-MERGEd into a
    lakehouse dim — the second batch's update overwrites the first batch's
    row (last-writer-wins) instead of appending. maxFilesPerTrigger=1
    forces two micro-batches; mtimes pin their order."""
    import json
    import os
    import time as time_mod

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source

    src = tmp_path / "cdc"
    src.mkdir()
    b1 = [
        {"database": "lakehousedb", "table": "mc_member_info", "type": "insert",
         "ts": "1", "xid": "1", "commit": "true",
         "data": {"user_id": "u1", "member_level": "bronze"}},
        {"database": "lakehousedb", "table": "mc_member_info", "type": "insert",
         "ts": "2", "xid": "2", "commit": "true",
         "data": {"user_id": "u2", "member_level": "silver"}},
    ]
    b2 = [
        {"database": "lakehousedb", "table": "mc_member_info", "type": "update",
         "ts": "3", "xid": "3", "commit": "true",
         "data": {"user_id": "u1", "member_level": "gold"}},
        {"database": "lakehousedb", "table": "mc_member_info", "type": "delete",
         "ts": "4", "xid": "4", "commit": "true",
         "data": {"user_id": "u2", "member_level": "gone"}},
    ]
    for i, frames in enumerate([b1, b2]):
        p = src / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(f) for f in frames) + "\n")
        os.utime(p, (time_mod.time() + i * 10, time_mod.time() + i * 10))

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="testdb")
    config = [{"tbl_name": "mc_member_info", "tbl_db": "lakehousedb",
               "pk_col": "user_id", "cols": "user_id,member_level",
               "sink_tbl_name": "DIM_MEMBER_INFO"}]

    stream = kafka_json_source(
        spark, CDC_ENVELOPE_SCHEMA, path=str(src), max_files_per_trigger=1
    )

    def sink(batch, _):
        upsert_dims(catalog, batch, config)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = {r.user_id: r.member_level
           for r in catalog.table("DIM_MEMBER_INFO").read().collect()}
    # u1 updated in batch 2 (last writer wins); u2's delete ignored (T8)
    assert out == {"u1": "gold", "u2": "silver"}


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """T1/T2: re-starting a stream on the same checkpoint must not
    re-process already-committed micro-batches — only NEW files are read
    on resume, so the sink sees each record exactly once."""
    import json

    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source

    src = tmp_path / "in"
    src.mkdir()
    out: list[str] = []

    def run_once() -> None:
        stream = kafka_json_source(spark, CDC_ENVELOPE_SCHEMA, path=str(src))

        def sink(batch, _):
            out.extend(r.xid for r in batch.collect())

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def frame(xid: str) -> str:
        return json.dumps(
            {"database": "lakehousedb", "table": "t", "type": "insert",
             "ts": "1", "xid": xid, "commit": "true", "data": {"k": "v"}}
        )

    (src / "a.jsonl").write_text(frame("1") + "\n" + frame("2") + "\n")
    run_once()
    assert sorted(out) == ["1", "2"]
    (src / "b.jsonl").write_text(frame("3") + "\n")
    run_once()  # resume: file a.jsonl already committed, only b is new
    assert sorted(out) == ["1", "2", "3"]


def test_streaming_update_mode_aggregate(spark, tmp_path):
    """A1's streaming form: the reference consumes its points aggregate as
    a retract stream (ProcessUserPoints.scala:44, toRetractStream) — in
    Spark that's outputMode('update'): each micro-batch emits only the
    groups whose aggregate changed, superseding the prior value."""
    import os
    import time as time_mod

    src = str(tmp_path / "agg_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "points"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", [("u1", 10), ("u2", 5)], time_mod.time() - 60)
    write_file("f2", [("u1", 7)], time_mod.time())  # u1 total becomes 17

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    agg = stream.groupBy("user_id").agg(F.sum("points").alias("total_points"))

    batches: list[dict] = []
    q = (
        agg.writeStream.foreachBatch(
            lambda b, _: batches.append({r.user_id: r.total_points for r in b.collect()})
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "agg_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert batches[0] == {"u1": 10, "u2": 5}
    # update mode: only u1 re-emitted, with the superseding total
    assert batches[1] == {"u1": 17}


def test_streaming_incremental_aggregate_maintenance(spark, tmp_path):
    """Serving-table pattern: each micro-batch MERGEs its partial sums
    additively into a lakehouse DM table, which always holds running
    totals — the streaming form of the reference's points aggregate
    without ever re-scanning history."""
    import os
    import time as time_mod

    src = str(tmp_path / "pts_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "points"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", [("u1", 10), ("u2", 5)], time_mod.time() - 60)
    write_file("f2", [("u1", 7), ("u3", 2)], time_mod.time())

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="dm")
    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )

    def sink(batch, _):
        partial = batch.groupBy("user_id").agg(F.sum("points").alias("total_points"))
        catalog.table("DM_USER_POINTS").merge_additive(partial, ["user_id"])

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    totals = {r.user_id: r.total_points
              for r in catalog.table("DM_USER_POINTS").read().collect()}
    assert totals == {"u1": 17, "u2": 5, "u3": 2}


def test_streaming_near_dup_ingestion(spark, tmp_path):
    """Streaming near-dup filter with lakehouse-backed signature state:
    batch 1 admits two distinct docs; batch 2's near-copy of doc 1 is
    rejected against the PERSISTED signatures while its novel doc is
    admitted; an in-batch duplicate pair keeps one survivor."""
    import os
    import time as time_mod

    from icebergproject_spark.streaming import near_dup_filter_batch

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel = "one two three four five six seven eight nine ten"
    other = "red orange yellow green blue indigo violet umber ochre teal"

    src = str(tmp_path / "nd_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", [(1, base), (2, other)], time_mod.time() - 60)
    # 3 ≈ doc 1 (one word changed); 4 novel; 5 exact copy of 4 (in-batch dup)
    write_file(
        "f2",
        [(3, base.replace("kappa", "lambda")), (4, novel), (5, novel)],
        time_mod.time(),
    )

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="dd")
    sig_table = catalog.table("DOC_SIGNATURES")
    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    admitted = []

    def sink(batch, _):
        admitted.extend(
            r.doc_id for r in near_dup_filter_batch(batch, sig_table).collect()
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(admitted) == [1, 2, 4]  # 3 near-dups 1; 5 in-batch dups 4


def test_near_dup_filter_batch_replay_safe(spark, tmp_path):
    """A foreachBatch micro-batch replayed AFTER its signature append
    succeeded (crash before checkpoint commit) must not collide with its
    own persisted signatures: with ``batch_id`` passed, the replay admits
    the same survivors and the signature write is a no-op, so no data is
    silently dropped and no duplicate signature rows accumulate."""
    from icebergproject_spark.streaming import near_dup_filter_batch

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="rr")
    sig_table = catalog.table("DOC_SIGNATURES")
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "red orange yellow green blue indigo violet umber ochre teal"),
        ],
        ["doc_id", "text"],
    )

    first = near_dup_filter_batch(batch, sig_table, batch_id="q-0")
    assert sorted(r.doc_id for r in first.collect()) == [1, 2]
    n_sigs = sig_table.read().count()

    # crash-replay of the SAME epoch: same survivors, no new signatures
    replay = near_dup_filter_batch(batch, sig_table, batch_id="q-0")
    assert sorted(r.doc_id for r in replay.collect()) == [1, 2]
    assert sig_table.read().count() == n_sigs

    # a genuinely new epoch still dedups against history
    nxt = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta eta theta iota lambda")],
        ["doc_id", "text"],
    )
    assert near_dup_filter_batch(nxt, sig_table, batch_id="q-1").count() == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """T4: an event older than the watermark horizon arriving in a later
    micro-batch is DROPPED from the windowed aggregate (bounded state ⇒
    late data has a deadline — the documented superset of the reference,
    which has no late-data story)."""
    import os
    import time as time_mod

    base = 1_700_000_000
    src = str(tmp_path / "wm_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "epoch"]).withColumn(
            "ts", F.timestamp_seconds(F.col("epoch"))
        )
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # batch 0 advances event time far ahead; the watermark it implies is
    # applied from the NEXT batch on (Spark updates watermarks at batch
    # boundaries), so batch 1 is a spacer and batch 2 delivers the
    # 2h-late event that must be dropped
    write_file("f1", [("u1", base), ("u1", base + 7200)], time_mod.time() - 120)
    write_file("f2", [("u2", base + 7300)], time_mod.time() - 60)
    write_file("f3", [("u1", base + 5)], time_mod.time())  # very late

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    results = []
    q = (
        agg.writeStream.foreachBatch(
            lambda b, _: results.extend((r.w.start, r.n) for r in b.collect())
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "wm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from datetime import datetime, timezone

    first_window = datetime.fromtimestamp(base - base % 60, tz=timezone.utc).replace(
        tzinfo=None
    )
    counts = {}
    for start, n in results:
        counts[start] = n  # later batches supersede (update mode)
    # the late event would have bumped the first window to 2 — it stays 1
    assert counts[first_window] == 1


def test_streaming_idempotent_lakehouse_sink(spark, tmp_path):
    """K1 exactly-once end-to-end: the lakehouse sink keyed by batch id
    survives a full query RESTART from the same source — the second run
    re-delivers nothing (checkpoint) and even a manual replay of batch 0
    is a no-op (batch-id dedup)."""
    import json

    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source

    src = tmp_path / "in"
    src.mkdir()
    frames = [
        {"database": "d", "table": "t", "type": "insert", "ts": "1",
         "xid": str(i), "commit": "true", "data": {"k": str(i)}}
        for i in range(4)
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(f) for f in frames) + "\n")

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="d")
    t = catalog.table("EXACTLY_ONCE")

    def run():
        stream = kafka_json_source(spark, CDC_ENVELOPE_SCHEMA, path=str(src))
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: t.idempotent_append(b, f"q-{bid}")
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert t.read().count() == 4
    run()  # restart: checkpoint says batch 0 done; nothing re-appended
    assert t.read().count() == 4
    # simulate an at-least-once replay of the same batch id
    replay = t.read().limit(4)
    assert t.idempotent_append(replay, "q-0") is None
    assert t.read().count() == 4


def test_progress_collector_captures_batches(spark, tmp_path):
    """Observability: the listener records input rows per micro-batch."""
    import json
    import time as time_mod

    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source
    from icebergproject_spark.streaming.monitor import attach_progress_collector

    src = tmp_path / "in"
    src.mkdir()
    frames = [
        {"database": "d", "table": "t", "type": "insert", "ts": "1",
         "xid": str(i), "commit": "true", "data": {}}
        for i in range(3)
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(f) for f in frames) + "\n")

    collector = attach_progress_collector(spark)
    try:
        stream = kafka_json_source(spark, CDC_ENVELOPE_SCHEMA, path=str(src))
        q = (
            stream.writeStream.foreachBatch(lambda b, _: b.count())
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        for _ in range(40):
            if collector.records:
                break
            time_mod.sleep(0.25)
    finally:
        spark.streams.removeListener(collector)

    assert any(r["num_input_rows"] == 3 for r in collector.records)
    assert all(r["batch_id"] is not None for r in collector.records)


def test_jdbc_sink_roundtrip_sqlite(spark, tmp_path):
    """K4/K5 parity: stream micro-batches through the DB-API batch sink
    into sqlite3 and read every row back — the end-to-end the reference
    runs against ClickHouse/MySQL (MyClickhouseUtil.scala:17-34)."""
    import sqlite3

    from icebergproject_spark.streaming import dbapi_batch_sink

    src = str(tmp_path / "jdbc_src")
    rows = [(i, f"user{i % 7}", i * 10) for i in range(1, 251)]
    spark.createDataFrame(rows, ["id", "name", "points"]).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    db = str(tmp_path / "sink.db")
    sink = dbapi_batch_sink(
        connect=lambda: sqlite3.connect(db),
        table="user_points",
        chunk_size=64,
        create_ddl="CREATE TABLE IF NOT EXISTS user_points "
        "(id INTEGER, name TEXT, points INTEGER)",
    )
    run_available_now(
        file_stream_source(spark, src, schema),
        checkpoint_dir=str(tmp_path / "ck_jdbc"),
        sink_fn=sink,
        output_mode="append",
    )

    with sqlite3.connect(db) as conn:
        got = sorted(conn.execute("SELECT id, name, points FROM user_points"))
    assert got == sorted(rows)


def test_jdbc_sink_roundtrip_duckdb(spark, tmp_path):
    """Same contract against DuckDB (the in-env ClickHouse analog) —
    including a second batch appending on top of the first (at-least-once
    accumulation across micro-batches)."""
    import duckdb

    from icebergproject_spark.streaming import dbapi_batch_sink

    db = str(tmp_path / "sink.duckdb")
    sink = dbapi_batch_sink(
        connect=lambda: duckdb.connect(db),
        table="dm_points",
        columns=["id", "points"],
        create_ddl="CREATE TABLE IF NOT EXISTS dm_points (id BIGINT, points BIGINT)",
    )
    b1 = spark.createDataFrame([(1, 10), (2, 20)], ["id", "points"])
    b2 = spark.createDataFrame([(3, 30)], ["id", "points"])
    sink(b1, 0)
    sink(b2, 1)
    with duckdb.connect(db) as conn:
        got = sorted(conn.execute("SELECT id, points FROM dm_points").fetchall())
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_rocksdb_state_store_e2e(spark, tmp_path):
    """Windowed streaming aggregation with the RocksDB state store
    provider (the 100 TB state path — heap-backed state OOMs first):
    the provider is set on the session, the query runs, and the counts
    equal the heap-provider baseline."""
    from icebergproject_spark.streaming import rocksdb_state_conf

    src = str(tmp_path / "rdb_src")
    schema = _write_fixture(spark, src)

    before = {
        k: spark.conf.get(k, None) for k in rocksdb_state_conf(str(tmp_path / "rdb"))
    }
    for k, v in rocksdb_state_conf(str(tmp_path / "rdb")).items():
        spark.conf.set(k, v)
    try:
        counts = windowed_count_stream(
            file_stream_source(spark, src, schema).filter(
                F.col("logtype") == "browselog"
            ),
            "ts", ["logtype"], "10 seconds", watermark="1 minute",
        )
        collected = []
        run_available_now(
            counts, str(tmp_path / "rdb_ckpt"),
            lambda b, _id: collected.extend(b.collect()),
        )
        got = {(r.window_start, r.product_cnt) for r in collected}
        assert ("2022-06-15 06:23:40", 1) in got
        assert ("2022-06-15 06:23:50", 1) in got
        # the provider actually engaged: RocksDB working dir exists under
        # the checkpoint's state store path
        import glob

        assert glob.glob(str(tmp_path / "rdb_ckpt") + "/state/**", recursive=True)
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stream_stream_left_join_emits_unmatched_after_expiry(spark, tmp_path):
    """LEFT stream-stream join: a click with no purchase inside the time
    bound is held in state, then emitted null-extended once the watermark
    passes its horizon (state TTL) — it is not silently dropped."""
    import os
    import time as time_mod

    base = 1_700_000_000

    def write_file(root, name, rows, ts_name, mtime):
        df = spark.createDataFrame(rows, ["user_id", "epoch"]).withColumn(
            ts_name, F.timestamp_seconds(F.col("epoch"))
        ).drop("epoch")
        path = f"{root}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for r, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(r, f), (mtime, mtime))
        return df.schema

    clicks_root = str(tmp_path / "clicks")
    buys_root = str(tmp_path / "buys")
    os.makedirs(clicks_root)
    os.makedirs(buys_root)
    now = time_mod.time()
    # batch 1: two clicks, one matching buy (u1); u2's buy never comes
    cs = write_file(clicks_root, "f1", [("u1", base), ("u2", base)], "click_ts", now - 60)
    bs = write_file(buys_root, "f1", [("u1", base + 10)], "buy_ts", now - 60)
    # later batches: flush events far past the horizon so the watermark
    # advances and expires u2's state (availableNow only emits expired
    # state in a batch that runs AFTER the watermark moved)
    write_file(clicks_root, "f2", [("zz", base + 3600)], "click_ts", now - 30)
    write_file(buys_root, "f2", [("zz2", base + 3600)], "buy_ts", now - 30)
    write_file(clicks_root, "f3", [("zz3", base + 7200)], "click_ts", now)
    write_file(buys_root, "f3", [("zz4", base + 7200)], "buy_ts", now)

    clicks = (
        spark.readStream.schema(cs).option("maxFilesPerTrigger", "1").parquet(f"{clicks_root}/*")
    )
    buys = (
        spark.readStream.schema(bs).option("maxFilesPerTrigger", "1")
        .parquet(f"{buys_root}/*")
    )
    joined = stream_stream_join(
        clicks, buys, key="user_id", left_ts="click_ts", right_ts="buy_ts",
        watermark="1 minute", within="30 seconds", how="left",
    )
    results = []
    q = (
        joined.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_left_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_user = {}
    for r in results:
        if r.user_id in ("u1", "u2"):
            by_user[r.user_id] = r.buy_ts
    assert by_user.get("u1") is not None      # matched inside the bound
    assert "u2" in by_user and by_user["u2"] is None  # expired → null-extended


def test_sessionizer_idle_timeout_evicts_state(spark, tmp_path):
    """idle_timeout=True: a key that stops sending events has its open
    session FLUSHED by the processing-time timeout (and its state
    dropped) instead of lingering forever — the state-TTL contract for
    continuous deployments."""
    import os
    import time as time_mod

    from icebergproject_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "ttl_src")
    os.makedirs(src)
    base = 1_700_000_000
    df = spark.createDataFrame(
        [("u1", base), ("u1", base + 1)], ["user_id", "epoch"]
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f1")

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    sessions = sessionize_stream(stream, "user_id", "ts", gap_seconds=2,
                                 idle_timeout=True)
    results = []
    q = (
        sessions.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time_mod.time() + 60
        while time_mod.time() < deadline and not results:
            time_mod.sleep(0.5)
    finally:
        q.stop()
    assert len(results) == 1
    r = results[0]
    assert (r.key, r.session_start, r.session_end, r.n_events) == ("u1", base, base + 1, 2)


def test_stream_static_dim_refresh_between_batches(spark, tmp_path):
    """T6 parity (broadcast state refresh): the STATIC side of a
    stream-static join is re-resolved every micro-batch, so a dimension
    row upserted between batches enriches later batches — the Spark
    equivalent of the reference pushing new routing rules into broadcast
    state mid-stream."""
    import os
    import time as time_mod

    src = str(tmp_path / "dimref_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "v"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for r, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(r, f), (mtime, mtime))
        return df.schema

    schema = write_file("f1", [("u1", 1)], time_mod.time() - 60)
    write_file("f2", [("u2", 2)], time_mod.time())

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="dr")
    dim = catalog.table("USER_DIM")
    dim.append(spark.createDataFrame([("u1", "gold")], ["user_id", "tier"]))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    enriched = []

    def sink(batch, batch_id):
        # static side resolved NOW — reads the dim's current snapshot
        out = batch.join(dim.read(), "user_id", "left").collect()
        enriched.extend(out)
        if batch_id == 0:
            # between batches: a new dim row arrives (CDC upsert)
            dim.merge(
                spark.createDataFrame([("u2", "silver")], ["user_id", "tier"]),
                key_cols=["user_id"],
            )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "dimref_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tiers = {r.user_id: r.tier for r in enriched}
    assert tiers == {"u1": "gold", "u2": "silver"}  # u2 saw the refreshed dim


def test_transform_with_state_dedup_ttl(spark, tmp_path):
    """Spark 4 StatefulProcessor path: streaming exact dedup keyed on
    content digest — the first bearer of a digest survives, replays and
    later duplicates are dropped across micro-batches (TTL disabled here;
    bounded-state TTL is a config knob on the same state)."""
    import os
    import time

    from icebergproject_spark.streaming.stateful import HAS_TWS, dedup_stream_ttl

    if not HAS_TWS:
        import pytest

        pytest.skip("transformWithStateInPandas not available")

    src = str(tmp_path / "tws_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # batch 1: two distinct docs (ids 10, 11) plus an in-batch dup (12)
    write_file(
        "f1",
        [(10, "alpha beta gamma"), (11, "delta epsilon zeta"), (12, "alpha beta gamma")],
        1_700_000_060,
    )
    # batch 2: replay of doc 10's content under a new id, plus a new doc
    write_file("f2", [(20, "alpha beta gamma"), (21, "eta theta iota")], 1_700_000_120)

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = dedup_stream_ttl(stream, ttl_ms=None)
    results = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # survivors: min-id per digest, duplicates in-batch and cross-batch dropped
    assert sorted(r.doc_id for r in results) == [10, 11, 21]


def test_seen_digest_processor_logic():
    """The StatefulProcessor's semantics, driven directly with a fake
    state handle (the transformWithState wiring itself needs protobuf,
    absent in-env — see HAS_TWS): first bearer wins with min-id within
    the batch; an existing state suppresses all output."""
    import pandas as pd

    from icebergproject_spark.streaming.stateful import SeenDigestProcessor

    class FakeState:
        def __init__(self):
            self.value = None

        def exists(self):
            return self.value is not None

        def get(self):
            return self.value

        def update(self, v):
            self.value = v

    p = SeenDigestProcessor(ttl_ms=None)
    p._seen = FakeState()

    out = list(
        p.handleInputRows(
            ("d1",), iter([pd.DataFrame({"doc_id": [12, 10]})]), None
        )
    )
    assert len(out) == 1 and out[0]["doc_id"][0] == 10  # min id survives
    assert p._seen.value == (10,)

    # digest already seen: later batches emit nothing
    again = list(
        p.handleInputRows(("d1",), iter([pd.DataFrame({"doc_id": [20]})]), None)
    )
    assert again == []


def test_wap_batch_sink_gates_commits(spark, tmp_path):
    """Streaming write-audit-publish: good micro-batches publish to
    main, a batch failing the audit never becomes visible and lands in
    quarantine instead."""
    import os
    import time

    from icebergproject_spark.streaming.runner import wap_batch_sink

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="wapdb")
    table = catalog.table("DWS_GATED")
    src = str(tmp_path / "wap_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["id", "v"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", [("1", "ok"), ("2", "ok")], 1_700_000_060)
    write_file("f2", [("3", "BAD"), ("4", "ok")], 1_700_000_120)

    rejected = []

    def audit(staged_df):
        # expectation: no BAD values anywhere in the would-be state
        return staged_df.filter(F.col("v") == "BAD").count() == 0

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            wap_batch_sink(
                table,
                audit,
                on_reject=lambda b, bid, snap: rejected.append(
                    (bid, sorted(r.id for r in b.collect()))
                ),
            )
        )
        .option("checkpointLocation", str(tmp_path / "wap_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(r.id for r in table.read().collect()) == ["1", "2"]
    assert len(rejected) == 1 and rejected[0][1] == ["3", "4"]
    # rejected branch dropped: no stray refs, orphan GC can reclaim
    assert table._refs()["branches"] == {}


def test_native_session_window_stream(spark, tmp_path):
    """Built-in session_window under Structured Streaming: events within
    the gap merge into one session per key; a gap splits sessions."""
    import os
    import time

    from icebergproject_spark.streaming.runner import session_count_stream

    src = str(tmp_path / "sw_src")
    os.makedirs(src)
    base = 1_700_000_000

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["user_id", "off"]).select(
            "user_id", F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts")
        )
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # u1: events at 0s,10s (one session), then 120s (new session: gap 60s)
    write_file("f1", [("u1", 0), ("u1", 10), ("u2", 5)], 1_700_000_060)
    write_file("f2", [("u1", 120), ("u2", 15)], 1_700_000_120)

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = session_count_stream(stream, "ts", ["user_id"], gap="60 seconds",
                               watermark="0 seconds")
    results = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.session_start, r.n_events) for r in results}
    # u1 first session: 2 events over [0s, 10s+gap); u2: 2 events (5s,15s
    # merge — 10s apart < gap). u1's 120s session stays OPEN (no later
    # watermark passes it in availableNow replay) — append mode emits
    # only watermark-closed sessions.
    assert (("u1", base, 2) in got) or any(
        u == "u1" and n == 2 for u, s, n in got
    )
    assert any(u == "u2" and n == 2 for u, s, n in got)


def test_medallion_chained_through_table_feeds(spark, tmp_path):
    """ODS → DWS chained through LAKEHOUSE TABLES instead of Kafka
    topics: the upstream stage appends to ODS, the downstream consumer
    drains the ODS append feed from its saved offset, enriches, and
    appends to DWS — incremental (only new rows move), resumable (offset
    survives between drains), no re-delivery."""
    from icebergproject_spark.streaming.runner import drain_table_feed

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="chain")
    ods, dws = catalog.table("ODS_EVENTS"), catalog.table("DWS_EVENTS")
    dim = spark.createDataFrame([("u1", "gold"), ("u2", "base")], ["uid", "tier"])

    def enrich_to_dws(batch, sid):
        if batch.count():
            dws.idempotent_append(batch.join(F.broadcast(dim), "uid", "left"),
                                  batch_id=f"ods-{sid}")

    ods.append(spark.createDataFrame([("u1", 5)], ["uid", "v"]))
    off = drain_table_feed(ods, enrich_to_dws)
    assert dws.read().count() == 1

    ods.append(spark.createDataFrame([("u2", 7), ("u3", 9)], ["uid", "v"]))
    off = drain_table_feed(ods, enrich_to_dws, from_snapshot_id=off)
    rows = {r.uid: (r.v, r.tier) for r in dws.read().collect()}
    assert rows == {"u1": (5, "gold"), "u2": (7, "base"), "u3": (9, None)}

    # re-draining from the same offset is a no-op end to end: the feed
    # yields nothing new, so no duplicate DWS rows
    drain_table_feed(ods, enrich_to_dws, from_snapshot_id=off)
    assert dws.read().count() == 3


def test_streaming_cdc_deletes_via_equality_files(spark, tmp_path):
    """Streaming twin of the batch CDC equality-delete test: a
    foreachBatch sink routing `tp=delete` records through
    upsert_dims_with_deletes applies them as equality-delete files
    per micro-batch — the shape the reference drops at
    dim/DimDataToHBase.scala:67."""
    import json
    import os
    import time as time_mod

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.plans.dim import upsert_dims_with_deletes
    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source

    src = tmp_path / "topic"
    src.mkdir()
    b1 = [
        {"database": "lakehousedb", "table": "mc_member_info", "type": "insert",
         "ts": "1", "xid": "1", "commit": "true",
         "data": {"user_id": "u1", "member_level": "bronze"}},
        {"database": "lakehousedb", "table": "mc_member_info", "type": "insert",
         "ts": "2", "xid": "2", "commit": "true",
         "data": {"user_id": "u2", "member_level": "silver"}},
    ]
    b2 = [
        {"database": "lakehousedb", "table": "mc_member_info", "type": "delete",
         "ts": "3", "xid": "3", "commit": "true",
         "data": {"user_id": "u2", "member_level": "silver"}},
        {"database": "lakehousedb", "table": "mc_member_info", "type": "insert",
         "ts": "4", "xid": "4", "commit": "true",
         "data": {"user_id": "u3", "member_level": "gold"}},
    ]
    for i, frames in enumerate([b1, b2]):
        p = src / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(f) for f in frames) + "\n")
        os.utime(p, (time_mod.time() + i * 10, time_mod.time() + i * 10))

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="testdb")
    config = [{"tbl_name": "mc_member_info", "tbl_db": "lakehousedb",
               "pk_col": "user_id", "cols": "user_id,member_level",
               "sink_tbl_name": "DIM_MEMBER_INFO"}]
    stream = kafka_json_source(
        spark, CDC_ENVELOPE_SCHEMA, path=str(src), max_files_per_trigger=1
    )

    def sink(batch, _):
        upsert_dims_with_deletes(catalog, batch, config)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    t = catalog.table("DIM_MEMBER_INFO")
    out = {r.user_id: r.member_level for r in t.read().collect()}
    # u2's delete APPLIED (vs the reference's drop); u3 inserted after
    assert out == {"u1": "bronze", "u3": "gold"}
    # delete arrived as an equality-delete file, and compaction folds it
    assert any(s.get("eq_delete_dirs") for s in t._snapshots())
    t.compact()
    assert t.current_snapshot()["eq_delete_dirs"] == []
    assert {r.user_id: r.member_level for r in t.read().collect()} == out


def test_streaming_hll_registers_via_merge_max(spark, tmp_path):
    """Streaming cardinality monitoring: each micro-batch computes its
    HLL register partials and merge_max-es them into a lakehouse
    serving table.  Because max is the sketch's exact merge (union of
    value sets == element-wise register max), the table's final state
    is BIT-IDENTICAL to the registers of the full stream — and
    re-merging a batch is a no-op (max is absorbing), so at-least-once
    replay cannot inflate the estimate, unlike an additive state."""
    import os
    import time as time_mod

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.text import hll_registers

    src = str(tmp_path / "hll_src")
    os.makedirs(src)

    def write_file(name, ids, mtime):
        df = spark.createDataFrame(
            [(i, "g") for i in ids], ["event_id", "event_type"]
        )
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("b1", range(0, 400), time_mod.time() - 60)
    write_file("b2", range(300, 700), time_mod.time())  # overlap on purpose

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="mon")
    schema = spark.read.parquet(f"{src}/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )

    def sink(batch, _):
        catalog.table("HLL_STATE").merge_max(
            hll_registers(batch), ["g", "bucket"]
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    t = catalog.table("HLL_STATE")
    got = {(r.g, r.bucket): r.reg for r in t.read().collect()}
    full = spark.createDataFrame(
        [(i, "g") for i in range(0, 700)], ["event_id", "event_type"]
    )
    want = {(r.g, r.bucket): r.reg for r in hll_registers(full).collect()}
    assert got == want

    # replay a batch: absorbing merge leaves the state untouched
    snap_before = t.current_snapshot()["snapshot_id"]
    t.merge_max(
        hll_registers(spark.read.parquet(f"{src}/b1")), ["g", "bucket"]
    )
    assert {(r.g, r.bucket): r.reg for r in t.read().collect()} == want
    assert t.current_snapshot()["snapshot_id"] != snap_before  # committed, same state


def test_streaming_hdr_sketch_via_merge_additive(spark, tmp_path):
    """Streaming quantile monitoring: each micro-batch computes its HDR
    bucket-count partials and merge_additive-s them into a lakehouse
    serving table.  ADD is the sketch's exact merge over row-disjoint
    batches (counts are multiplicities), so the table's final state is
    BIT-IDENTICAL to the sketch of the full stream; exactly-once comes
    from the streaming checkpoint (each file one micro-batch), the
    complement of merge_max's absorbing-replay story — lo/hi stay OUT
    of the merged state (derived from the bucket id, not additive)."""
    import os
    import time as time_mod

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.operators.aggregates import hdr_sketch

    src = str(tmp_path / "hdr_src")
    os.makedirs(src)

    def write_file(name, vals, mtime):
        df = spark.createDataFrame([(v, "g") for v in vals], ["v", "grp"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # value overlap on purpose: additive merge counts multiplicity
    write_file("b1", [(i * 13) % 3000 + 1 for i in range(400)],
               time_mod.time() - 60)
    write_file("b2", [(i * 13) % 3000 + 1 for i in range(200, 600)],
               time_mod.time())

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="mon")
    schema = spark.read.parquet(f"{src}/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )

    def sink(batch, _):
        partial = hdr_sketch(batch, "v", ["grp"]).select(
            "grp", "bucket", "cnt"
        )
        catalog.table("HDR_STATE").merge_additive(
            partial, ["grp", "bucket"]
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.grp, r.bucket): r.cnt
        for r in catalog.table("HDR_STATE").read().collect()
    }
    full_vals = [(i * 13) % 3000 + 1 for i in range(400)] + [
        (i * 13) % 3000 + 1 for i in range(200, 600)
    ]
    full = spark.createDataFrame([(v, "g") for v in full_vals], ["v", "grp"])
    want = {
        (r.grp, r.bucket): r.cnt
        for r in hdr_sketch(full, "v", ["grp"]).collect()
    }
    assert got == want


def test_streaming_drift_monitor_batch(spark, tmp_path):
    """Streaming drift alerting: stable micro-batches build the
    baseline; a mean-shifted batch trips the z-test; a REPLAYED batch
    (same batch_id) re-emits identical alerts and leaves the state
    unchanged (append is idempotent, baseline excludes own id)."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.streaming.runner import drift_monitor_batch

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="drift"
    )
    state = catalog.table("DRIFT_STATE")

    def mk(vals):
        return spark.createDataFrame(
            [("g", float(v)) for v in vals], "grp string, value double"
        )

    stable = [10.0 + (i % 5) * 0.1 for i in range(50)]

    # batch 1: no baseline yet -> never drifts
    a1 = drift_monitor_batch(
        mk(stable), state, "value", ["grp"], batch_id="q-1"
    ).collect()
    assert len(a1) == 1 and not a1[0].drifted and a1[0].z_score is None

    # batch 2: same distribution -> no drift
    a2 = drift_monitor_batch(
        mk(stable), state, "value", ["grp"], batch_id="q-2"
    ).collect()
    assert not a2[0].drifted and abs(a2[0].z_score) < 3

    # batch 3: mean shifted 10 -> 14 -> drift fires hard
    a3 = drift_monitor_batch(
        mk([14.0 + (i % 5) * 0.1 for i in range(50)]),
        state, "value", ["grp"], batch_id="q-3",
    ).collect()
    assert a3[0].drifted and a3[0].z_score > 3

    # replay batch 3: identical alert, state not double-counted
    n_before = state.read().count()
    a3r = drift_monitor_batch(
        mk([14.0 + (i % 5) * 0.1 for i in range(50)]),
        state, "value", ["grp"], batch_id="q-3",
    ).collect()
    assert [tuple(r) for r in a3r] == [tuple(r) for r in a3]
    assert state.read().count() == n_before

    # batch 4 after the shift landed in state: baseline now mixes the
    # two regimes; a stable batch may or may not drift — just assert the
    # monitor keeps running and the state has one partial row per batch
    drift_monitor_batch(
        mk(stable), state, "value", ["grp"], batch_id="q-4"
    ).collect()
    assert state.read().select("batch_id").distinct().count() == 4


def test_streaming_ks_drift_monitor_batch(spark, tmp_path):
    """Streaming KS distribution-shift alerting (VERDICT r8 ask #6):
    stable micro-batches build the histogram baseline; a batch with the
    same MEAN but a different SHAPE trips the KS test (the case the
    z-test monitor is blind to); a REPLAYED batch (same batch_id)
    re-emits identical alerts and leaves the state unchanged."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.streaming.runner import ks_drift_monitor_batch

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="ksdrift"
    )
    state = catalog.table("KS_STATE")

    def mk(vals):
        return spark.createDataFrame(
            [("g", float(v)) for v in vals], "grp string, value double"
        )

    # uniform over [9.8, 10.2]: mean 10, spread ±0.2
    stable = [9.8 + (i % 5) * 0.1 for i in range(100)]

    # batch 1: no baseline yet -> never drifts, D is NULL
    a1 = ks_drift_monitor_batch(
        mk(stable), state, "value", ["grp"], batch_id="k-1"
    ).collect()
    assert len(a1) == 1 and not a1[0].drifted and a1[0].ks_d_milli is None

    # batch 2: same distribution -> tiny D, no drift
    a2 = ks_drift_monitor_batch(
        mk(stable), state, "value", ["grp"], batch_id="k-2"
    ).collect()
    assert not a2[0].drifted and a2[0].ks_d_milli == 0

    # batch 3: SAME mean (10.0), different shape — all mass at the two
    # extremes.  Mean-based monitors see nothing; KS sees D = 0.6
    bimodal = [9.8 if i % 2 == 0 else 10.2 for i in range(100)]
    a3 = ks_drift_monitor_batch(
        mk(bimodal), state, "value", ["grp"], batch_id="k-3"
    ).collect()
    assert a3[0].drifted and a3[0].ks_d_milli >= 300

    # replay batch 3: identical alert row, state not double-counted
    n_before = state.read().count()
    a3r = ks_drift_monitor_batch(
        mk(bimodal), state, "value", ["grp"], batch_id="k-3"
    ).collect()
    assert [tuple(r) for r in a3r] == [tuple(r) for r in a3]
    assert state.read().count() == n_before

    # state is per (group, grid value, batch) histogram counts: batch 1
    # and 2 contribute 5 support points each, batch 3 two
    assert state.read().select("batch_id").distinct().count() == 3
    assert state.read().count() == 5 + 5 + 2


def test_streaming_ks_drift_monitor_e2e_foreachbatch(spark, tmp_path):
    """The KS monitor wired through a REAL stream: a file-source
    readStream drained with availableNow through foreachBatch, each
    micro-batch tested against the accumulated histogram baseline —
    and a CHECKPOINT RESTART replay of the same input leaves the state
    unchanged (idempotent_append keyed on batch_id)."""
    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.streaming.runner import (
        ks_drift_monitor_batch,
        run_available_now,
    )

    src = str(tmp_path / "src")
    stable = [("g", 9.8 + (i % 5) * 0.1) for i in range(100)]
    spark.createDataFrame(stable, "grp string, value double").write.mode(
        "overwrite"
    ).parquet(src)

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="kse2e"
    )
    state = catalog.table("KS_E2E_STATE")
    alerts: list = []

    def sink(batch, batch_id):
        out = ks_drift_monitor_batch(
            batch, state, "value", ["grp"], batch_id=f"b-{batch_id}"
        )
        alerts.extend(out.collect())

    schema = "grp string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    run_available_now(stream, str(tmp_path / "ckpt"), sink, "ks-e2e")
    assert len(alerts) == 1 and not alerts[0].drifted  # first batch: no baseline
    n_state = state.read().count()

    # restart from the SAME checkpoint with no new input: availableNow
    # replays nothing, state and alerts stay put
    stream2 = spark.readStream.schema(schema).parquet(src)
    run_available_now(stream2, str(tmp_path / "ckpt"), sink, "ks-e2e-rs")
    assert len(alerts) == 1
    assert state.read().count() == n_state

    # a new bimodal file (same mean, different shape) arrives; a fresh
    # drain picks it up as the next micro-batch and KS fires
    bimodal = [("g", 9.8 if i % 2 == 0 else 10.2) for i in range(100)]
    spark.createDataFrame(bimodal, "grp string, value double").write.mode(
        "append"
    ).parquet(src)
    stream3 = spark.readStream.schema(schema).parquet(src)
    run_available_now(stream3, str(tmp_path / "ckpt"), sink, "ks-e2e-2")
    assert len(alerts) == 2
    assert alerts[1].drifted and alerts[1].ks_d_milli >= 300


def test_streaming_ann_graph_maintenance_e2e(spark, tmp_path):
    """The full loop VERDICT r9 ask #4 points at, as a STREAM: embedding
    micro-batches arrive (file source, maxFilesPerTrigger=1 forces three
    ordered batches), a foreachBatch sink appends each to a lakehouse
    table AND maintains the stored ANN 5-NN graph incrementally
    (ann_knn_graph_incremental against the pre-append base + the prior
    batch's stored graph).  After the drain, the stored graph equals a
    full rebuild over the table's final state — streaming maintenance
    never diverges from recompute."""
    import os
    import time as time_mod

    import numpy as np

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.normal(size=8).round(3)])
            for i in range(48)]
    src = tmp_path / "emb_stream"
    src.mkdir()
    schema = "vec_id long, embedding array<double>"
    for b in range(3):
        rows = [v for v in vecs if v[0] % 3 == b]
        p = str(src / f"b{b}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        stamp = time_mod.time() + b * 10
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (stamp, stamp))
        os.utime(p, (stamp, stamp))

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="testdb"
    )
    t = catalog.table("EMBEDDINGS")
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    state = {"version": -1}

    def sink(batch, batch_id):
        batch = batch.localCheckpoint(eager=True)  # pin the batch rows
        if state["version"] < 0:
            # cold start: the table has no snapshots yet (read() raises)
            base = batch.sparkSession.createDataFrame([], batch.schema)
            prev = None  # operator rebuilds from the empty base
        else:
            base = t.read()
            prev = batch.sparkSession.read.parquet(
                str(graph_dir / f"v{state['version']}")
            )
        g = ann_knn_graph_incremental(
            base, batch, dim=8, k=3, planes=3, prev_graph=prev
        )
        g.write.mode("overwrite").parquet(
            str(graph_dir / f"v{state['version'] + 1}")
        )
        state["version"] += 1
        t.append(batch)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert state["version"] == 2  # three micro-batches, in order
    assert t.read().count() == 48
    maintained = spark.read.parquet(str(graph_dir / "v2"))
    full = ann_knn_graph(t.read(), dim=8, k=3, planes=3)
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    assert sorted(map(key, maintained.collect())) == sorted(
        map(key, full.collect())
    )


def test_streaming_dedup_cluster_maintenance_e2e(spark, tmp_path):
    """The dedup tier's streaming loop (round-11 sibling of the ANN
    maintenance e2e; round 12 moved it to the bucketed storage path,
    round 13 to the ZERO-FULL-SCAN CCStore — VERDICT r12 ask #4):
    document micro-batches (file source, 3 ordered batches) are appended
    to a lakehouse DOCS table; each batch's band signatures are appended
    to a stored BANDS table (the incremental_near_dups contract — a
    batch pays |batch|×bands rows, never a corpus re-band); the
    batch-touching candidate edges (incremental_lsh_candidates against
    the PRE-append bands) maintain the node-bucketed assignment +
    spill-index store via connected_components_incremental_stored
    (apply=True) — EVERY stored read partition-pruned, the MERGE one
    atomic equality-delete upsert — with the level-up backfill policy
    (cc_store_backfill_decision) routing each batch.  After the drain
    the stored assignment is bit-equal to a cold full re-cluster over
    the docs table's final state — streaming dedup maintenance never
    diverges from recompute.

    Replay safety, both crash windows, WITHOUT an external fence and
    WITHOUT in-memory sink state (ADVICE r11: routing cold-start on an
    in-memory counter re-enters the cold branch after a driver restart;
    here EVERY routing decision reads stored state — the bands table's
    emptiness — and every write is idempotent: the cold-start assignment
    lands through upsert_by_key, so a replayed batch 0 merges onto its
    own prior attempt instead of double-appending).  A batch replayed
    BEFORE its bands landed recomputes an idempotent payload (the
    operator's replay contract); one replayed AFTER full commit
    short-circuits on the bands table's batch marker
    (LakehouseTable.has_batch).  The test replays the last batch through
    both windows and pins the state unchanged; the driver-RESTART
    cold-start window gets its own test below."""
    import os
    import time as time_mod

    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.dedup import (
        banded_signatures,
        cc_assignment_store,
        cc_assignment_store_reseed,
        cc_store_backfill_decision,
        connected_components,
        connected_components_incremental_stored,
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    src = tmp_path / "doc_stream"
    src.mkdir()
    schema = "doc_id long, text string"
    for b in range(3):
        rows = [(r.doc_id, r.text) for r in docs if r.doc_id % 3 == b]
        p = str(src / f"b{b}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        stamp = time_mod.time() + b * 10
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (stamp, stamp))
        os.utime(p, (stamp, stamp))

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="testdb"
    )
    docs_tbl = catalog.table("DOCS")
    bands_tbl = catalog.table("DOC_BANDS")  # (id, band, band_sig)
    # zero-full-scan layout: node-bucketed assignment + spill index
    store = cc_assignment_store(
        spark, str(tmp_path / "wh"), "testdb", "DOC_CLUSTERS", n_buckets=8
    )
    seen = []  # observability only — NEVER routes a decision

    def sink(batch, batch_id):
        bid = f"dedup-{batch_id}"
        if bands_tbl.has_batch(bid):
            return  # replay after full commit: the marker short-circuits
        batch = batch.localCheckpoint(eager=True)
        bb = banded_signatures(batch).localCheckpoint(eager=True)
        # every routing decision reads STORED state (no in-memory
        # counters — ADVICE r11); the 3 test batches are each ~1/3 of
        # the corpus, so factor 2.0 keeps them in the MAINTAIN regime
        # (the backfill/reseed regime has its own pin below)
        decision = cc_store_backfill_decision(
            store, batch.count(), backfill_factor=2.0
        )
        if bands_tbl.current_snapshot() is None or decision != "maintain":
            # cold start (or replay of a crashed cold start, where the
            # assignment landed but bands didn't): (re)seed from the
            # docs-so-far ∪ batch — overwrite-based, so a replay
            # converges instead of double-appending
            corpus = (
                docs_tbl.read().select("doc_id", "text").union(batch)
                if docs_tbl.current_snapshot() is not None
                else batch
            ).dropDuplicates(["doc_id"])
            cc_assignment_store_reseed(
                store,
                connected_components(
                    minhash_lsh_candidates(corpus),
                    nodes=corpus.select("doc_id"),
                    node_col="doc_id",
                ),
            )
        else:
            edges = incremental_lsh_candidates(bb, bands_tbl.read())
            connected_components_incremental_stored(
                store,
                edges,
                new_nodes=batch.select(F.col("doc_id").alias("node")),
                apply=True,
                batch_id=f"{bid}-assign",
            )
        docs_tbl.idempotent_append(batch, bid)
        # bands LAST: its batch marker is the commit token — a crash
        # anywhere earlier replays into idempotent writes (docs skips on
        # its own marker, the cold-start upsert merges onto itself, the
        # maintenance payload recomputes empty against the already-
        # merged store); once bands lands, the guard above skips
        bands_tbl.idempotent_append(bb, bid)
        seen.append(batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert seen == [0, 1, 2]
    final_docs = docs_tbl.read()
    assert final_docs.count() == len(docs)
    maintained = {
        r.node: r.cluster_id for r in store.assign.read().collect()
    }
    cold = {
        r.node: r.cluster_id
        for r in connected_components(
            minhash_lsh_candidates(final_docs),
            nodes=final_docs.select("doc_id"),
            node_col="doc_id",
        ).collect()
    }
    assert maintained == cold
    # the spill-index invariant holds after the drain: every cross-
    # bucket membership has an index row (extra rows are allowed)
    need = {
        (c, n % 8)
        for n, c in maintained.items()
        if n % 8 != c % 8
    }
    have = {
        (r.cluster_id, r.node_bucket)
        for r in (
            store.index.read().collect()
            if store.index.current_snapshot() is not None
            else []
        )
    }
    assert need <= have

    # replay window 1 — after full commit: the has_batch token
    # short-circuits (seen untouched proves the early return)
    last = spark.createDataFrame(
        [(r.doc_id, r.text) for r in docs if r.doc_id % 3 == 2], schema
    )
    sink(last, 2)
    assert seen == [0, 1, 2]
    # replay window 2 — crash before the bands token landed: the retry
    # re-runs the pruned MERGE path against the already-merged store.
    # Re-deriving edges from the post-commit bands is a SUPERSET of
    # what that retry would see (the operator's replay contract covers
    # both): the payload must drain to nothing and the applied upsert
    # must be a no-op either way
    from icebergproject_spark.llm.dedup import (
        banded_signatures as _bs,
        incremental_lsh_candidates as _ilc,
    )

    ups = connected_components_incremental_stored(
        store,
        _ilc(_bs(last), bands_tbl.read()),
        new_nodes=last.select(F.col("doc_id").alias("node")),
        apply=True,
    )
    assert ups.count() == 0
    replayed = {r.node: r.cluster_id for r in store.assign.read().collect()}
    assert replayed == cold
    assert docs_tbl.read().count() == len(docs)


def test_streaming_dedup_cold_start_survives_driver_restart(spark, tmp_path):
    """The exact hole ADVICE r11 flagged, pinned: batch 0 commits its
    assignment but CRASHES before the bands marker lands, then the
    driver RESTARTS (all in-memory sink state gone) and Structured
    Streaming replays batch 0.  Because routing reads the bands table
    (still empty) and the cold-start write is an overwrite-based
    reseed of the CCStore, the replay converges to a single copy;
    batch 1 then routes through the maintenance path and the final
    state equals a cold re-cluster.  With counter-based routing +
    plain append this replay double-appended batch 0 and clustered
    batch 1 alone."""
    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.dedup import (
        banded_signatures,
        cc_assignment_store,
        cc_assignment_store_reseed,
        cc_store_backfill_decision,
        connected_components,
        connected_components_incremental_stored,
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .collect()
    )
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(r.doc_id, r.text) for r in docs if r.doc_id % 2 == 0], schema
    )
    b1 = spark.createDataFrame(
        [(r.doc_id, r.text) for r in docs if r.doc_id % 2 == 1], schema
    )
    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="testdb"
    )
    docs_tbl = catalog.table("DOCS")
    bands_tbl = catalog.table("DOC_BANDS")
    store = cc_assignment_store(
        spark, str(tmp_path / "wh"), "testdb", "DOC_CLUSTERS", n_buckets=8
    )

    def sink(batch, batch_id, crash_before_bands=False):
        bid = f"dedup-{batch_id}"
        if bands_tbl.has_batch(bid):
            return
        batch = batch.localCheckpoint(eager=True)
        bb = banded_signatures(batch).localCheckpoint(eager=True)
        decision = cc_store_backfill_decision(
            store, batch.count(), backfill_factor=2.0
        )
        if bands_tbl.current_snapshot() is None or decision != "maintain":
            corpus = (
                docs_tbl.read().select("doc_id", "text").union(batch)
                if docs_tbl.current_snapshot() is not None
                else batch
            ).dropDuplicates(["doc_id"])
            cc_assignment_store_reseed(
                store,
                connected_components(
                    minhash_lsh_candidates(corpus),
                    nodes=corpus.select("doc_id"),
                    node_col="doc_id",
                ),
            )
        else:
            edges = incremental_lsh_candidates(bb, bands_tbl.read())
            connected_components_incremental_stored(
                store,
                edges,
                new_nodes=batch.select(F.col("doc_id").alias("node")),
                apply=True,
                batch_id=f"{bid}-assign",
            )
        if crash_before_bands:
            return  # simulated crash: docs + bands never land
        docs_tbl.idempotent_append(batch, bid)
        bands_tbl.idempotent_append(bb, bid)

    # attempt 1 commits the cold-start assignment, then the driver dies
    sink(b0, 0, crash_before_bands=True)
    n0 = b0.count()
    assert store.assign.read().count() == n0
    # restart: no in-memory state survives; the stream replays batch 0
    sink(b0, 0)
    assert store.assign.read().count() == n0  # reseeded, not doubled
    sink(b1, 1)  # routes through MAINTENANCE (bands now non-empty)
    final_docs = docs_tbl.read()
    assert final_docs.count() == len(docs)
    maintained = {r.node: r.cluster_id for r in store.assign.read().collect()}
    cold = {
        r.node: r.cluster_id
        for r in connected_components(
            minhash_lsh_candidates(final_docs),
            nodes=final_docs.select("doc_id"),
            node_col="doc_id",
        ).collect()
    }
    assert maintained == cold


def test_streaming_dedup_backfill_reseeds_ccstore(spark, tmp_path):
    """VERDICT r12 ask #4, second half: the LEVEL-UP backfill policy at
    a synthetic backfill.  cc_store_backfill_decision routes on the
    assignment's snapshot-summary row estimate (O(1), never a scan):
    'seed' on an empty store, 'maintain' for a nightly-sized batch,
    'reseed' when the batch rivals the corpus.  The reseed itself
    (cc_assignment_store_reseed) must leave the store equal to a cold
    re-cluster, keep the spill-index invariant, converge under replay
    (overwrite-based), and drop stale index rows from the pre-backfill
    clustering."""
    import pyspark.sql.functions as F  # noqa: F401

    from icebergproject_spark.llm.dedup import (
        cc_assignment_store,
        cc_assignment_store_reseed,
        cc_store_backfill_decision,
        connected_components,
        minhash_lsh_candidates,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
        .localCheckpoint(eager=True)
    )
    base = docs.where("doc_id % 5 <> 0")
    store = cc_assignment_store(
        spark,
        str(tmp_path / "wh"),
        "testdb",
        "CLUSTERS",
        assign=connected_components(
            minhash_lsh_candidates(base),
            nodes=base.select("doc_id"),
            node_col="doc_id",
        ),
        n_buckets=8,
    )
    n_base = base.count()
    # the decision ladder, against the STORED estimate
    stats: dict = {}
    assert cc_store_backfill_decision(store, 10, stats=stats) == "maintain"
    assert stats["stored_rows_est"] == n_base
    assert cc_store_backfill_decision(store, n_base) == "reseed"
    assert (
        cc_store_backfill_decision(store, (n_base // 2) + 1) == "reseed"
    )  # boundary: batch == factor × stored
    empty_store = cc_assignment_store(
        spark, str(tmp_path / "wh"), "testdb", "EMPTY", n_buckets=8
    )
    assert cc_store_backfill_decision(empty_store, 10) == "seed"

    # the backfill lands: full re-cluster over base ∪ backfill
    cold = connected_components(
        minhash_lsh_candidates(docs),
        nodes=docs.select("doc_id"),
        node_col="doc_id",
    ).localCheckpoint(eager=True)
    cc_assignment_store_reseed(store, cold)
    want = {r.node: r.cluster_id for r in cold.collect()}
    got = {r.node: r.cluster_id for r in store.assign.read().collect()}
    assert got == want
    # spill-index invariant: every cross-bucket membership indexed
    need = {(c, n % 8) for n, c in want.items() if n % 8 != c % 8}
    have = {
        (r.cluster_id, r.node_bucket) for r in store.index.read().collect()
    }
    assert need <= have
    # and EXACT after the cleanup commit: stale pre-backfill rows gone
    assert have == need
    # replay converges (overwrite-based): same state, same index
    cc_assignment_store_reseed(store, cold)
    assert {
        r.node: r.cluster_id for r in store.assign.read().collect()
    } == want
    assert {
        (r.cluster_id, r.node_bucket) for r in store.index.read().collect()
    } == need


def test_streaming_ann_pagerank_chained_e2e(spark, tmp_path):
    """VERDICT r10 ask #3 — the reference's streaming spine composed
    through BOTH incremental tiers in ONE foreachBatch: each embedding
    micro-batch (file source, 3 ordered batches) is appended to a
    lakehouse table, the stored ANN 5-NN graph is maintained
    incrementally, the maintained EDGE DELTA (added ∪ removed — the
    replace-style diff) feeds pagerank_micro_delta with static_state
    derived from the stored post-batch graph and emit='updates', and
    the per-level rank upserts are MERGEd into a stored history table.
    After the drain, the stored rank history is BIT-EQUAL per level to
    a cold pagerank_micro_history over the final graph — the streaming
    loop never diverges from recompute through either tier."""
    import os
    import time as time_mod

    import numpy as np
    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.graph import (
        pagerank_micro_delta,
        pagerank_micro_history,
    )
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    K_ITERS, SCALE = 3, 10**9
    rng = np.random.default_rng(23)
    vecs = [(i, [float(x) for x in rng.normal(size=8).round(3)])
            for i in range(48)]
    src = tmp_path / "emb_stream"
    src.mkdir()
    schema = "vec_id long, embedding array<double>"
    for b in range(3):
        rows = [v for v in vecs if v[0] % 3 == b]
        p = str(src / f"b{b}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        stamp = time_mod.time() + b * 10
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (stamp, stamp))
        os.utime(p, (stamp, stamp))

    catalog = LakehouseCatalog(
        spark, warehouse=str(tmp_path / "wh"), db="testdb"
    )
    t = catalog.table("EMBEDDINGS")
    hist_tbl = catalog.table("RANK_HISTORY")  # (iter, node, rank_micro)
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    state = {"version": -1}

    def edges_of(g):
        return g.select(
            F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
        ).distinct()

    def sink(batch, batch_id):
        batch = batch.localCheckpoint(eager=True)
        ss = batch.sparkSession
        if state["version"] < 0:
            base, prev = ss.createDataFrame([], batch.schema), None
        else:
            base = t.read()
            prev = ss.read.parquet(str(graph_dir / f"v{state['version']}"))
        g = ann_knn_graph_incremental(
            base, batch, dim=8, k=3, planes=3, prev_graph=prev
        )
        g.write.mode("overwrite").parquet(
            str(graph_dir / f"v{state['version'] + 1}")
        )
        g_new = ss.read.parquet(str(graph_dir / f"v{state['version'] + 1}"))
        new_e = edges_of(g_new)
        if state["version"] < 0:
            # cold start: full history over the first graph
            hist = pagerank_micro_history(new_e, K_ITERS, scale=SCALE)
            for i, h in enumerate(hist):
                hist_tbl.append(h.withColumn("iter", F.lit(i).cast("int")))
        else:
            old_e = edges_of(
                ss.read.parquet(str(graph_dir / f"v{state['version']}"))
            )
            # replace-style delta: the maintenance step REPLACES affected
            # queries' top-k, so edges disappear as well as appear
            delta = new_e.subtract(old_e).union(old_e.subtract(new_e))
            # static_state from the STORED post-batch graph (production
            # maintains ed/nodes incrementally; one groupBy over the
            # stored edges here)
            deg = new_e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
            nodes = (
                new_e.select(F.col("src").alias("node"))
                .union(new_e.select(F.col("dst").alias("node")))
                .distinct()
            )
            stored = {"ed": new_e.join(deg, "src"), "nodes": nodes}
            hist = [
                hist_tbl.read()
                .where(F.col("iter") == i)
                .select("node", "rank_micro")
                for i in range(K_ITERS + 1)
            ]
            ups = pagerank_micro_delta(
                new_e, delta, hist, scale=SCALE,
                static_state=stored, emit="updates",
            )
            # MERGE payload: per-level rank upserts + level-0 rows for
            # brand-new nodes (constant `scale` seed)
            new0 = (
                nodes.join(hist[0].select("node"), "node", "left_anti")
                .select(
                    "node",
                    F.lit(SCALE).cast("long").alias("rank_micro"),
                    F.lit(0).cast("int").alias("iter"),
                )
            )
            payload = new0
            for i in range(1, K_ITERS + 1):
                payload = payload.unionByName(
                    ups[i - 1].withColumn("iter", F.lit(i).cast("int"))
                )
            hist_tbl.merge(payload, key_cols=["iter", "node"])
        state["version"] += 1
        t.append(batch)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert state["version"] == 2
    assert t.read().count() == 48

    # tier 1: the stored graph equals a full rebuild over the final table
    maintained = spark.read.parquet(str(graph_dir / "v2"))
    full_g = ann_knn_graph(t.read(), dim=8, k=3, planes=3)
    gkey = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    assert sorted(map(gkey, maintained.collect())) == sorted(
        map(gkey, full_g.collect())
    )

    # tier 2: the MERGE-maintained rank history equals a COLD recompute
    # over the final graph, bit-equal at every level
    cold = pagerank_micro_history(edges_of(full_g), K_ITERS, scale=SCALE)
    stored_hist = hist_tbl.read()
    for i in range(K_ITERS + 1):
        got = {
            (r.node, r.rank_micro)
            for r in stored_hist.where(F.col("iter") == i).collect()
        }
        want = {(r.node, r.rank_micro) for r in cold[i].collect()}
        assert got == want, f"level {i} diverged"


def test_streaming_bm25_index_ingestion(spark, tmp_path):
    """The BM25 index as a streaming sink: a file stream of doc batches
    maintains the three index tables through foreachBatch with the
    query's (query_id, epoch) replay token; after the drain, serving
    from the maintained index equals a from-scratch bm25_topk over
    everything ingested, and a replayed epoch (crash before checkpoint
    commit) leaves every table's snapshot count unchanged."""
    import os
    import time as time_mod

    import icebergproject_spark.queries  # noqa: F401  (registry first)
    from icebergproject_spark.llm.index import BM25IndexStore
    from icebergproject_spark.llm.text import bm25_topk

    src = str(tmp_path / "bm_src")
    os.makedirs(src)
    rows1 = [(i, f"alpha w{i} beta w{i % 5}") for i in range(0, 30)]
    rows2 = [(i, f"gamma w{i} alpha w{i % 7}") for i in range(30, 50)]

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        path = f"{src}/{name}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write_file("f1", rows1, time_mod.time() - 60)
    write_file("f2", rows2, time_mod.time())

    store = BM25IndexStore(
        spark, str(tmp_path / "wh"), "idx", "bm25", n_buckets=4
    )
    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    seen_epochs = []

    def sink(batch, epoch_id):
        seen_epochs.append(epoch_id)
        store.append_batch(batch, batch_id=f"bm25q-{epoch_id}")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen_epochs) == 2  # one micro-batch per file

    queries = [(0, "alpha w3"), (1, "gamma w35")]
    docs = spark.createDataFrame(rows1 + rows2, ["doc_id", "text"])
    want = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert sorted(map(tuple, store.query_topk(queries, k=5).collect())) == want

    # crash-replay of the last epoch: every commit is a no-op
    snaps = [
        len(t._snapshots())
        for t in (store.postings, store.termstats, store.corpus)
    ]
    last = spark.read.parquet(f"{src}/f2")
    store.append_batch(last, batch_id=f"bm25q-{seen_epochs[-1]}")
    assert snaps == [
        len(t._snapshots())
        for t in (store.postings, store.termstats, store.corpus)
    ]
