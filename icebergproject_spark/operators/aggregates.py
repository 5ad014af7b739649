"""Aggregation operators (SURVEY §2.5 A1, A2).

A1 — the reference's offline points aggregate:
``SELECT log_time AS dt, user_id, product_name,
sum(cast(obtain_points AS int)) AS total_points FROM DWS_BROWSE_INFO
GROUP BY log_time, user_id, product_name``
(offlineanls/ProcessUserPoints.scala:35-44).

A2 — the DM tumbling-window count: keyBy(first$second$product), 10-second
tumbling window, emit count (dm/ProcessBrowseLogInfoToDM.scala:71-96). The
reference uses processing time; we standardize on event time (deterministic
and testable — SURVEY §2.5 note), grouping by the three key columns
directly instead of concat+split (F6 both directions collapses away).

Scale: both are hash aggregates with map-side partial aggregation —
Spark's HashAggregate emits partial sums/counts before the shuffle, so the
shuffle carries one row per (partition × group), not per input row. At
100 TB with low-cardinality keys this is the optimal plan; skewed keys are
handled by AQE skew mitigation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def group_sum_points(
    df: DataFrame,
    group_cols: list[str],
    points_col: str = "obtain_points",
    out_col: str = "total_points",
) -> DataFrame:
    """A1: group-by SUM with string→int cast (F12)."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(points_col).cast("int")).alias(out_col)
    )


def tumbling_window_count(
    df: DataFrame,
    ts_col: str | Column,
    key_cols: list[str],
    window_length: str = "10 seconds",
    count_col: str = "product_cnt",
) -> DataFrame:
    """A2: per-key tumbling-window count.

    Output matches the reference's ProductVisitInfo shape
    (dm/ProcessBrowseLogInfoToDM.scala:77-96, utils/Beans.scala:21):
    window_date ('yyyy-MM-dd' of window start), window_start, window_end
    ('yyyy-MM-dd HH:mm:ss' strings), the key columns, and the count.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    w = F.window(ts, window_length)
    return (
        df.groupBy(w.alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias(count_col))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_date"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            *key_cols,
            F.col(count_col),
        )
    )
