"""DWS layer — wide-table enrichment (SURVEY §3.3).

Reference jobs (per-record Redis/Phoenix lookups, here set-oriented joins):
  - ``dws/ProcessUserlogInToDWS.scala`` — login × member_info ×
    member_address → 13-col DWS_USER_LOGIN wide row (:230-248).
  - ``dws/ProduceBrowseLogToDWS.scala`` — browse × product_info ×
    category-hierarchy → 9-col DWS_BROWSE_INFO wide row (:208-218), with
    log_time reduced to its date part (:209).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from icebergproject_spark.functions.dates import date_part_of
from icebergproject_spark.operators.enrichment import enrich_left
from icebergproject_spark.operators.hierarchy import flatten_two_level


def user_login_wide(
    login: DataFrame, member_info: DataFrame, member_address: DataFrame
) -> DataFrame:
    """DWS_USER_LOGIN (13 cols, ProcessUserlogInToDWS.scala:230-248):
    user_id, ip, gmt_create, login_tm, logout_tm, member_level, province,
    city, area, address, member_points, balance, member_growth_score."""
    wide = enrich_left(
        login,
        member_info,
        on="user_id",
        attrs=["gmt_create", "member_level", "member_points", "balance", "member_growth_score"],
    )
    wide = enrich_left(
        wide, member_address, on="user_id", attrs=["province", "city", "area", "address"]
    )
    return wide.select(
        "user_id", "ip", "gmt_create", "login_tm", "logout_tm", "member_level",
        "province", "city", "area", "address", "member_points", "balance",
        "member_growth_score",
    )


def browse_wide(
    browse: DataFrame,
    product_info: DataFrame,
    category: DataFrame,
    keep_full_time: bool = False,
) -> DataFrame:
    """DWS_BROWSE_INFO (9 cols, ProduceBrowseLogToDWS.scala:208-218).

    Category hierarchy resolved once via self-join (J4,
    ProduceBrowseLogToDWS.scala:169-178) instead of per-record lookups.

    ``keep_full_time=True`` is the wide-TOPIC variant: the reference's DM
    window job consumes wide rows whose log_time is still the full
    timestamp (ProduceBrowseLogToDWS.scala:256-261 side output); only the
    Iceberg DWS write reduces it to the date part (:209).
    """
    cats = flatten_two_level(
        category, "id", "p_id", "name",
        out_id="cat_id",
        out_child_name="second_category_name",
        out_parent_name="first_category_name",
    )
    wide = enrich_left(
        browse, product_info,
        fact_key="browse_product_code", dim_key="product_id",
        attrs=["product_name"],
    )
    wide = enrich_left(
        wide, cats, fact_key="browse_product_tpcode", dim_key="cat_id",
        attrs=["first_category_name", "second_category_name"],
    )
    from pyspark.sql import functions as F

    time_col = F.col("log_time") if keep_full_time else date_part_of("log_time")
    return wide.select(
        time_col.alias("log_time"),
        "user_id", "user_ip", "product_name", "front_product_url",
        "browse_product_url", "first_category_name", "second_category_name",
        "obtain_points",
    )
