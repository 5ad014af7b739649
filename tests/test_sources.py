"""Source adapter tests: envelope decode (S1/S2) and config read (S3)."""

from __future__ import annotations

import json

from icebergproject_spark.sources import (
    CDC_ENVELOPE_SCHEMA,
    LOG_ENVELOPE_SCHEMA,
    decode_json_frames,
    kafka_json_source,
    read_config_table,
)


def test_decode_cdc_frames(spark):
    payload = {
        "database": "lakehousedb",
        "table": "mc_user_login",
        "type": "insert",
        "ts": "1655264622000",
        "xid": "9021",
        "commit": "true",
        "data": {"id": "1", "user_id": "uid1001"},
    }
    frames = spark.createDataFrame(
        [("k1", json.dumps(payload)), ("k2", "not json at all")],
        ["key", "value"],
    )
    out = decode_json_frames(frames, CDC_ENVELOPE_SCHEMA).collect()
    good = next(r for r in out if r.database == "lakehousedb")
    assert good.table == "mc_user_login"
    assert good.data["user_id"] == "uid1001"
    # malformed JSON null-propagates instead of failing the job
    bad = next(r for r in out if r.database is None)
    assert bad.table is None


def test_file_stream_stand_in(spark, tmp_path):
    lines = [
        json.dumps({"logtype": "browselog", "data": {"userId": "u1"}}),
        json.dumps({"logtype": "other", "data": {}}),
    ]
    src = tmp_path / "frames"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")
    stream = kafka_json_source(spark, LOG_ENVELOPE_SCHEMA, path=str(src))
    assert stream.isStreaming
    got = []
    q = (
        stream.writeStream.foreachBatch(lambda b, _: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {r.logtype for r in got} == {"browselog", "other"}
    assert next(r for r in got if r.logtype == "browselog").data["userId"] == "u1"


def test_read_config_table_literal(spark):
    cfg = read_config_table(
        spark,
        [("mc_member_info", "lakehousedb", "id", "id,user_id,phone", "DIM_MEMBER_INFO")],
    )
    row = cfg.collect()[0]
    assert row.tbl_name == "mc_member_info"
    assert row.phoenix_tbl_name == "DIM_MEMBER_INFO"


def test_decode_with_dlq_splits_bad_frames(spark):
    from icebergproject_spark.sources import (
        CDC_ENVELOPE_SCHEMA,
        decode_json_frames_with_dlq,
    )

    frames = spark.createDataFrame(
        [
            ('{"database":"lakehousedb","table":"t","type":"insert",'
             '"ts":"1","xid":"1","commit":"true","data":{"k":"v"}}',),
            ("this is not json",),
            ('{"database":"d2"}',),  # valid object, missing fields → good
        ],
        ["value"],
    )
    good, bad = decode_json_frames_with_dlq(frames, CDC_ENVELOPE_SCHEMA)
    good_rows = good.collect()
    assert {r.database for r in good_rows} == {"lakehousedb", "d2"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0].raw_value == "this is not json"


def test_csv_jsonl_adapters_roundtrip(spark, sf_dir, tmp_path):
    """Format adapters: the same relation read back from CSV and JSON
    lines with explicit schemas must match the parquet original exactly —
    no inference (schema drift at 100 TB is an outage, not a convenience)."""
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )
    csv_path, json_path = str(tmp_path / "o_csv"), str(tmp_path / "o_json")
    orders.write.mode("overwrite").option("header", True).csv(csv_path)
    orders.write.mode("overwrite").json(json_path)

    from_csv = (
        spark.read.schema(orders.schema).option("header", True).csv(csv_path)
    )
    from_json = spark.read.schema(orders.schema).json(json_path)

    assert from_csv.schema == orders.schema
    assert from_json.schema == orders.schema
    want = {tuple(r) for r in orders.collect()}
    assert {tuple(r) for r in from_csv.collect()} == want
    assert {tuple(r) for r in from_json.collect()} == want
