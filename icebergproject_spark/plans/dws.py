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


def refresh_wide_incremental(
    wide_table,
    facts: DataFrame,
    build_wide,
    changed_keys: DataFrame,
    dim_key: str,
    row_keys: list[str] | None = None,
) -> dict:
    """Incremental view maintenance for a DWS wide table after a dim
    change: re-derive wide rows ONLY for the affected join keys and MERGE
    them over the stored table.

    ``build_wide(facts_subset) -> DataFrame`` is the same wide-row
    builder used for the full load — IVM reuses the view definition, it
    does not fork it. ``changed_keys`` is the dim delta's key set (one
    column named ``dim_key``). ``row_keys`` is the wide-row identity the
    MERGE matches on (defaults to [dim_key]; pass the fact PK when a key
    has many wide rows, otherwise the merge would collapse them).

    Scale math: a dim update touching k keys re-joins only the fact rows
    with those keys (semi-join pushdown into the fact scan) instead of
    recomputing facts ⋈ dims over the full corpus — the difference
    between O(|Δ| · fanout) and O(|facts|) per refresh. The reference has
    no story for this at all: its wide rows are enriched once at stream
    time and silently go stale when a dim row later changes
    (dws/ProcessUserlogInToDWS.scala caches dim lookups for 24 h).
    """
    affected_facts = facts.join(
        changed_keys.select(dim_key).distinct(), dim_key, "left_semi"
    )
    fresh = build_wide(affected_facts)
    return wide_table.merge(fresh, row_keys or [dim_key])
