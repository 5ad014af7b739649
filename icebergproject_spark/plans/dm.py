"""DM layer — serving-side marts (SURVEY §3, dm/*.scala).

Reference jobs:
  - ``dm/ProcessUserLoginInfoToDM.scala`` — wide login topic → project
    (dt, province, city, user_id, login_tm, gmt_create), drop null
    provinces, insert to ClickHouse (:53-100).
  - ``dm/ProcessBrowseLogInfoToDM.scala`` — wide browse topic → 10-second
    tumbling count per (first_cat, second_cat, product) → ClickHouse
    (:71-96).

Spark-first: projection + null filter; event-time window aggregate (A2).
The JDBC/ClickHouse sink is any ``df.write.jdbc`` / lakehouse append —
sinks live with the caller, the mart logic is here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from icebergproject_spark.functions.dates import current_date_yyyymmdd
from icebergproject_spark.operators.aggregates import tumbling_window_count
from icebergproject_spark.operators.routing import reject_nulls


def dm_user_login_info(wide: DataFrame) -> DataFrame:
    """dm_user_login_info: dt, province, city, user_id, login_tm, gmt_create
    (ProcessUserLoginInfoToDM.scala:53-83); null provinces dropped (:60-62);
    dt = wall-clock today (:92, F1)."""
    return reject_nulls(wide, ["province"]).select(
        current_date_yyyymmdd().alias("dt"),
        "province", "city", "user_id", "login_tm", "gmt_create",
    )


def dm_product_visit(wide: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """dm_product_visit_info: 10-second tumbling count per category/product
    (A2, ProcessBrowseLogInfoToDM.scala:71-96). Event-time variant of the
    reference's processing-time window; output shape matches
    ProductVisitInfo (current_dt, window_start, window_end, first_cat,
    second_cat, product, product_cnt)."""
    counted = tumbling_window_count(
        wide,
        ts_col,
        ["first_category_name", "second_category_name", "product_name"],
        "10 seconds",
        count_col="product_cnt",
    )
    return counted.select(
        F.col("window_date").alias("current_dt"),
        "window_start", "window_end",
        F.col("first_category_name").alias("first_cat"),
        F.col("second_category_name").alias("second_cat"),
        F.col("product_name").alias("product"),
        "product_cnt",
    )
