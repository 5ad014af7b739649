"""Scalar function library (SURVEY §2.7 F1–F13).

Every function is a Spark *column expression* (JVM-side, codegen-friendly)
— never a Python UDF. They reproduce the reference's utils semantics,
including the quirky null defaults and string-encoded maps.
"""

from icebergproject_spark.functions.dates import (
    current_date_yyyymmdd,
    date_part_of,
    epoch_millis_to_date,
    epoch_millis_to_datetime,
)
from icebergproject_spark.functions.strings import (
    composite_key,
    is_empty,
    split_composite_key,
    str_to_map_expr,
)
from icebergproject_spark.functions.jsonx import (
    json_field,
    merge_json_attrs,
    routing_envelope,
    row_to_json,
)

__all__ = [
    "current_date_yyyymmdd",
    "epoch_millis_to_datetime",
    "epoch_millis_to_date",
    "date_part_of",
    "is_empty",
    "composite_key",
    "split_composite_key",
    "str_to_map_expr",
    "row_to_json",
    "merge_json_attrs",
    "json_field",
    "routing_envelope",
]
