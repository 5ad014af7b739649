"""Medallion pipeline (SURVEY §3, Phase 2).

The reference's five layers as pure DataFrame→DataFrame stages, composed
in ``medallion.py``. The same functions run under batch and Structured
Streaming (they are source-agnostic transformations, like the reference's
SQL over Kafka-backed dynamic tables).
"""

from icebergproject_spark.plans.ods import (
    parse_cdc_stream,
    parse_log_stream,
    route_cdc,
    ods_browselog,
    ods_user_login,
)
from icebergproject_spark.plans.dwd import cleanse_user_login, cleanse_browselog
from icebergproject_spark.plans.dim import upsert_dims
from icebergproject_spark.plans.dws import user_login_wide, browse_wide
from icebergproject_spark.plans.dm import dm_user_login_info, dm_product_visit

__all__ = [
    "parse_cdc_stream",
    "parse_log_stream",
    "route_cdc",
    "ods_browselog",
    "ods_user_login",
    "cleanse_user_login",
    "cleanse_browselog",
    "upsert_dims",
    "user_login_wide",
    "browse_wide",
    "dm_user_login_info",
    "dm_product_visit",
]
