"""ODS layer (SURVEY §3.1–3.2).

Reference jobs:
  - ``ods/ProduceKafkaDBDataToODS.scala`` — CDC envelope from Kafka
    (database, table, type, ts, xid, commit, data map), filter to the
    business database, broadcast-join against the dim routing config,
    split dim vs fact, project typed ODS rows.
  - ``ods/ProduceKafkaLogDataToODS.scala`` — app-log envelope (logtype,
    data map), filter logtype='browselog', project ODS_BROWSELOG columns.

Spark-first: map-payload projections (P1), discriminator filters (P2/P3),
broadcast routing join (J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from icebergproject_spark.operators.projections import extract_map_payload
from icebergproject_spark.operators.routing import broadcast_route, discriminator_filter

# browse-log payload keys → ODS_BROWSELOG columns
# (ods/ProduceKafkaLogDataToODS.scala:63-76)
BROWSELOG_FIELDS = {
    "logTime": "log_time",
    "userId": "user_id",
    "userIp": "user_ip",
    "frontProductUrl": "front_product_url",
    "browseProductUrl": "browse_product_url",
    "browseProductTpCode": "browse_product_tpcode",
    "browseProductCode": "browse_product_code",
    "obtainPoints": "obtain_points",
}

# login CDC payload keys → ODS_USER_LOGIN columns
# (ods/ProduceKafkaDBDataToODS.scala:144-150)
USER_LOGIN_FIELDS = {
    "id": "id",
    "user_id": "user_id",
    "ip": "ip",
    "login_tm": "login_tm",
    "logout_tm": "logout_tm",
}


def parse_log_stream(raw: DataFrame) -> DataFrame:
    """Log envelope (logtype, data map) — keep browse logs only (P2)."""
    return discriminator_filter(raw, "logtype", "browselog")


def parse_cdc_stream(raw: DataFrame, business_db: str = "lakehousedb") -> DataFrame:
    """CDC envelope — keep the business database only (P3,
    ProduceKafkaDBDataToODS.scala:170-172)."""
    return discriminator_filter(raw, "database", business_db)


def route_cdc(cdc: DataFrame, config: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J1: split CDC stream into (dim_records, fact_records) using the
    broadcast routing config keyed ``"$db:$table"``
    (ProduceKafkaDBDataToODS.scala:186-205)."""
    return broadcast_route(cdc, config, ["database", "table"], "config_key")


def ods_browselog(log_stream: DataFrame) -> DataFrame:
    """ODS_BROWSELOG: project the 8 typed columns out of the data map (P1)."""
    return extract_map_payload(parse_log_stream(log_stream), "data", BROWSELOG_FIELDS)


def ods_user_login(cdc_facts: DataFrame) -> DataFrame:
    """ODS_USER_LOGIN: login rows from the CDC fact stream (P1+P2,
    ProduceKafkaDBDataToODS.scala:141-151)."""
    logins = discriminator_filter(cdc_facts, "table", "mc_user_login")
    return extract_map_payload(logins, "data", USER_LOGIN_FIELDS)
