"""Routing operators (SURVEY §2.3 P2–P4, §2.4 J1).

J1 re-expresses the reference's broadcast-state routing
(ods/ProduceKafkaDBDataToODS.scala:160-217): a fact stream connected to a
broadcast MySQL config stream, probed per record on key ``"$db:$table"`` —
hit ⇒ dimension record (side output), miss ⇒ fact record (main output).

Spark-first: one **broadcast left-outer hash join** against the (tiny)
config DataFrame, then two filters on match/no-match. Catalyst broadcasts
the build side to every executor — the same data movement as Flink
broadcast state, with no state API and no per-record code. At 100 TB of
fact stream this stays a map-side join: zero shuffle of the big side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def discriminator_filter(df: DataFrame, col: str, value: str) -> DataFrame:
    """P2/P3: route a multiplexed stream by discriminator equality
    (WHERE `table`='mc_user_login' — ProduceKafkaDBDataToODS.scala:150;
    WHERE logtype='browselog' — ProduceKafkaLogDataToODS.scala:75)."""
    return df.filter(F.col(col) == value)


def reject_nulls(df: DataFrame, cols: list[str]) -> DataFrame:
    """P4: drop rows with null routing/grouping fields
    (dwd/ProcessODSDataToDWD.scala:79-81,
    dm/ProcessUserLoginInfoToDM.scala:60-62)."""
    return df.na.drop(subset=cols)


def broadcast_route(
    facts: DataFrame,
    config: DataFrame,
    fact_key: list[str],
    config_key: str,
    key_sep: str = ":",
) -> tuple[DataFrame, DataFrame]:
    """J1: broadcast config join + matched/unmatched split.

    Returns ``(dim_stream, fact_stream)``:
      - ``dim_stream``  — facts whose ``concat_ws(sep, *fact_key)`` matched a
        config row, enriched with all config columns (the reference attaches
        pk_col/cols/phoenix_tbl_name before sending to the DIM topic,
        ProduceKafkaDBDataToODS.scala:188-196);
      - ``fact_stream`` — unmatched facts, config columns dropped
        (ProduceKafkaDBDataToODS.scala:197-205).
    """
    key = F.concat_ws(key_sep, *[F.col(c) for c in fact_key])
    joined = facts.withColumn("__route_key", key).join(
        F.broadcast(config), F.col("__route_key") == F.col(config_key), "left_outer"
    )
    matched = joined.filter(F.col(config_key).isNotNull()).drop("__route_key")
    unmatched = (
        joined.filter(F.col(config_key).isNull())
        .select(*[facts[c] for c in facts.columns])
    )
    return matched, unmatched
