"""DWD layer — cleanse (SURVEY §3, dwd/ProcessODSDataToDWD.scala).

The reference's DWD job normalizes epoch-millis string timestamps to
formatted date strings (ProcessODSDataToDWD.scala:81-113, via
DateUtil.getDateYYYYMMDDHHMMSS with the 1970 default) and fans records out
to per-table Iceberg sinks + per-record dynamic Kafka topics (K3).

The cleanse itself is column expressions (F2/F3); fan-out lives in
streaming/runner.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from icebergproject_spark.functions.dates import epoch_millis_to_datetime
from icebergproject_spark.operators.routing import reject_nulls


def cleanse_user_login(ods: DataFrame) -> DataFrame:
    """DWD_USER_LOGIN: normalize login/logout epoch-millis strings →
    'yyyy-MM-dd HH:mm:ss' (null → '1970-01-01 00:00:00',
    ProcessODSDataToDWD.scala:89-91)."""
    return ods.select(
        "id",
        "user_id",
        "ip",
        epoch_millis_to_datetime("login_tm").alias("login_tm"),
        epoch_millis_to_datetime("logout_tm").alias("logout_tm"),
    )


def cleanse_browselog(ods: DataFrame) -> DataFrame:
    """DWD_BROWSELOG: normalize log_time; drop rows without routing keys
    (P4, ProcessODSDataToDWD.scala:79-81)."""
    cleaned = reject_nulls(ods, ["user_id", "browse_product_code"])
    return cleaned.select(
        epoch_millis_to_datetime("log_time").alias("log_time"),
        "user_id",
        "user_ip",
        "front_product_url",
        "browse_product_url",
        "browse_product_tpcode",
        "browse_product_code",
        "obtain_points",
    )
