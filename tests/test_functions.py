"""Scalar-function unit tests (SURVEY §2.7 edge cases: null→epoch defaults,
millis-vs-seconds, valueless map keys, $-composite keys)."""

from __future__ import annotations

import pyspark.sql.functions as F

from icebergproject_spark.functions import (
    composite_key,
    date_part_of,
    epoch_millis_to_date,
    epoch_millis_to_datetime,
    is_empty,
    json_field,
    merge_json_attrs,
    routing_envelope,
    split_composite_key,
    str_to_map_expr,
)


def one(df):
    return df.collect()[0]


def test_epoch_millis_to_datetime(spark):
    df = spark.createDataFrame(
        [("1646741000000",), (None,), ("not-a-number",), ("0",)], ["tm"]
    )
    out = df.select(epoch_millis_to_datetime("tm").alias("x")).collect()
    # reference: DateUtil.getDateYYYYMMDDHHMMSS (utils/DateUtil.scala:22-30)
    assert out[0].x == "2022-03-08 12:03:20"
    assert out[1].x == "1970-01-01 00:00:00"  # null → epoch default
    assert out[2].x == "1970-01-01 00:00:00"  # unparseable → epoch default
    assert out[3].x == "1970-01-01 00:00:00"


def test_epoch_millis_to_date(spark):
    df = spark.createDataFrame([("1646741000000",), (None,)], ["tm"])
    out = df.select(epoch_millis_to_date("tm").alias("x")).collect()
    assert out[0].x == "2022-03-08"
    assert out[1].x == "1970-01-01"


def test_millis_not_seconds(spark):
    # from_unixtime-style seconds interpretation would give year ~54000
    df = spark.createDataFrame([("1646741000000",)], ["tm"])
    assert one(df.select(epoch_millis_to_datetime("tm").alias("x"))).x.startswith("2022")


def test_is_empty(spark):
    df = spark.createDataFrame([("",), (None,), ("x",)], ["s"])
    out = df.select(is_empty("s").alias("e")).collect()
    assert [r.e for r in out] == [True, True, False]


def test_composite_key_roundtrip(spark):
    df = spark.createDataFrame([("autoparts", "repair", "oilfilter")], ["a", "b", "c"])
    keyed = df.select(composite_key("a", "b", "c").alias("k"))
    assert one(keyed).k == "autoparts$repair$oilfilter"
    back = keyed.select(*[c.alias(n) for c, n in zip(split_composite_key("k", 3), "abc")])
    assert one(back).asDict() == {"a": "autoparts", "b": "repair", "c": "oilfilter"}


def test_str_to_map_valueless_keys(spark):
    # the reference's tolerant parser keeps empty-valued keys
    # (ProduceKafkaLogDataToODS.scala:91-100; FIXTURES.md sample)
    raw = "{logTime=1655274222161, frontProductUrl=, userId=uid813665}"
    df = spark.createDataFrame([(raw,)], ["s"])
    m = one(df.select(str_to_map_expr("s").alias("m"))).m
    assert m["logTime"] == "1655274222161"
    assert m["frontProductUrl"] in ("", None)
    assert m["userId"] == "uid813665"


def test_date_part_of(spark):
    df = spark.createDataFrame([("2022-03-08 12:03:20",)], ["t"])
    assert one(df.select(date_part_of("t").alias("d"))).d == "2022-03-08"


def test_json_field_and_merge(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}', '{"c": "y"}')], ["base", "attrs"]
    )
    assert one(df.select(json_field("base", "b").alias("v"))).v == "x"
    merged = one(df.select(merge_json_attrs("base", "attrs").alias("m"))).m
    assert '"a"' in merged and '"c"' in merged and merged.count("{") == 1


def test_merge_json_attrs_null_safe(spark):
    df = spark.createDataFrame([('{"a": 1}', None)], "base string, attrs string")
    assert one(df.select(merge_json_attrs("base", "attrs").alias("m"))).m == '{"a": 1}'


def test_routing_envelope(spark):
    df = spark.createDataFrame([("1", "u1")], ["id", "user_id"])
    env = one(df.select(routing_envelope("ODS_BROWSELOG", "KAFKA-DWD-BROWSELOG-TOPIC", ["id", "user_id"]).alias("e"))).e
    assert '"iceberg_ods_tbl_name":"ODS_BROWSELOG"' in env
    assert '"kafka_dwd_topic":"KAFKA-DWD-BROWSELOG-TOPIC"' in env
    assert '\\"user_id\\":\\"u1\\"' in env  # nested data payload


def test_row_to_json_flattens_map(spark):
    from icebergproject_spark.functions.jsonx import row_to_json

    df = spark.createDataFrame(
        [("db1", "t1", {"id": "9", "x": "y"})], ["database", "table", "data"]
    )
    j = one(df.select(row_to_json(df, ["database", "table"], "data").alias("j"))).j
    assert j.count("{") == 1  # flat object
    assert '"id":"9"' in j and '"database":"db1"' in j
