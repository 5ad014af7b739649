"""JSON scalar functions (SURVEY §2.7 F8–F11).

The reference builds/merges JSON envelopes per record with fastjson
(utils/CommonUtil.scala). In Spark these are ``to_json(struct(...))`` /
``from_json`` / ``get_json_object`` column expressions — no row-at-a-time
code.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def json_field(c: Column | str, field: str) -> Column:
    """F10: JSON.parseObject(value).getString(field)
    (dim/DimDataToHBase.scala:46,59; dwd/ProcessODSDataToDWD.scala:86)."""
    return F.get_json_object(_as_col(c), f"$.{field}")


def row_to_json(df: DataFrame, envelope_cols: list[str], data_map_col: str | None = None) -> Column:
    """F8: CDC row → JSON envelope, flattening the ``data`` map into the top
    level, null-safe (CommonUtil.rowToJson, utils/CommonUtil.scala:10-42).

    With a map column we can't statically enumerate keys, so emit
    ``{envelope..., **data}`` by json-merging the envelope struct with the
    map serialization.
    """
    env = F.to_json(F.struct(*[_as_col(c) for c in envelope_cols]))
    if data_map_col is None:
        return env
    data_json = F.to_json(_as_col(data_map_col))
    # splice '{env}' + '{data}' → '{env, data}' (both non-empty JSON objects)
    return F.when(
        _as_col(data_map_col).isNull() | (F.size(_as_col(data_map_col)) == 0), env
    ).otherwise(
        F.concat(
            F.regexp_replace(env, "\\}$", ","),
            F.regexp_replace(data_json, "^\\{", ""),
        )
    )


def merge_json_attrs(base_json: Column | str, attrs_json: Column | str) -> Column:
    """F9: copy all key/values of one JSON object into another
    (CommonUtil.AddAttributeToJson, utils/CommonUtil.scala:48-51).

    In the engine proper this disappears into a join + column union; kept
    as an expression for envelope-level parity.
    """
    base, attrs = _as_col(base_json), _as_col(attrs_json)
    merged = F.concat(
        F.regexp_replace(base, "\\}$", ","), F.regexp_replace(attrs, "^\\{", "")
    )
    return F.when(attrs.isNull() | (attrs == "{}"), base).otherwise(
        F.when(base.isNull() | (base == "{}"), attrs).otherwise(merged)
    )


def routing_envelope(table_name: str, topic: str, data_cols: list[str]) -> Column:
    """F11: per-record routing wrapper
    ``{iceberg_ods_tbl_name, kafka_dwd_topic, data}``
    (ods/ProduceKafkaLogDataToODS.scala:103-106,
    ods/ProduceKafkaDBDataToODS.scala:199-203)."""
    return F.to_json(
        F.struct(
            F.lit(table_name).alias("iceberg_ods_tbl_name"),
            F.lit(topic).alias("kafka_dwd_topic"),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("data"),
        )
    )
