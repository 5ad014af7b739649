"""Temporal operators: as-of join and gap sessionization.

Neither exists in the reference (SURVEY §2.4 notes their absence) nor as a
single Spark primitive — they are the classic "custom operator as a
composition of built-ins" case (build-plan guidance: composition first,
pandas UDF only if semantics demand it; here they don't).

**as-of join** — for each left row, the latest right row with the same key
and ``right_ts <= left_ts``. Implemented as union + partitioned window
``last(..., ignorenulls)`` ordered by (ts, right-before-left, tiebreak):

  - one shuffle on the key (the union sorts within partitions);
  - no per-row subqueries, no skew-prone range cross join;
  - at 100 TB this is the textbook distributed as-of plan (both sides
    co-partitioned by key, linear scan within partition).

**sessionization** — gap-based session ids per key: a session break is a
gap > threshold from the previous event; session id = running count of
breaks. Two window functions over one shuffle, no state API.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: attach the most recent ``right_vals`` at or before
    each left row's timestamp. Left rows keep all their columns; misses
    (no earlier right row) yield nulls.

    ``tiebreak`` orders right rows sharing (key, ts) — the greatest wins,
    keeping results deterministic.
    """
    lcols = left.columns
    tagged_l = left.withColumn("__is_right", F.lit(0)).withColumn(
        "__ts", F.col(left_ts)
    )
    tagged_r = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_vals],
        )
        .withColumn("__is_right", F.lit(1))
    )
    # align schemas for the union
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None))
    for c in right_vals:
        if c not in tagged_l.columns:
            tagged_l = tagged_l.withColumn(c, F.lit(None))
    if tiebreak and tiebreak not in tagged_l.columns:
        tagged_l = tagged_l.withColumn(tiebreak, F.lit(None))
    unioned = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))

    # right rows at the same ts sort BEFORE left rows (asof is <=)
    order = [F.col("__ts").asc(), F.col("__is_right").desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__is_right",
        *[
            F.last(F.when(F.col("__is_right") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_vals
        ],
    )
    return (
        carried.filter(F.col("__is_right") == 0)
        .select(
            *lcols,
            *[F.col(f"__asof_{c}").alias(c) for c in right_vals],
        )
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids (1-based per key, ordered by time).

    A new session starts when the gap from the previous event exceeds
    ``gap`` (SQL interval literal). Output = input + session_col.
    """
    w_order = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w_order)
    gap_secs = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    # interval → seconds once, driver-side
    num, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    limit = int(num) * mult
    is_break = F.when(prev_ts.isNull() | (gap_secs > limit), 1).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_break).over(w_cum))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "7 days",
) -> DataFrame:
    """Interval containment join WITHOUT an equi key: each point row pairs
    with every interval row whose [start, end] contains it.

    Spark plans a bare ``BETWEEN`` join as a nested-loop cross product —
    O(points × intervals). This bucketizes time instead: intervals
    explode to the coarse buckets they overlap, points map to exactly one
    bucket, and the join becomes an equi-join on bucket id followed by
    the exact range filter. Cost: shuffle(points + intervals×avg_spans)
    — linear, partition-parallel, and the bucket width trades replication
    (long intervals → more copies) against selectivity (wide buckets →
    more false candidates filtered post-join).

    Output: all point columns + all interval columns.
    """
    num, unit = bucket.split()
    width = int(num) * {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit]
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts)) / width)
    i_lo = F.floor(F.unix_timestamp(F.col(start_ts)) / width)
    i_hi = F.floor(F.unix_timestamp(F.col(end_ts)) / width)

    pb = points.withColumn("__bucket", p_bucket)
    ib = intervals.withColumn(
        "__bucket", F.explode(F.sequence(i_lo, i_hi))
    )
    joined = pb.join(ib, "__bucket").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bucket")


def interpolate_gaps(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation over a dense per-group daily spine — the
    densify-and-fill step for irregular time series (sensor feeds,
    sparse activity metrics) before any windowed statistic.

    ``df`` holds OBSERVED (group, day, value) rows (day = DATE, one row
    per group-day).  The spine spans each group's [min(day), max(day)]
    via ``sequence()`` (no driver-side calendar); missing days get

        v = (v_prev·(d_next − d) + v_next·(d − d_prev)) / (d_next − d_prev)

    between the nearest observed neighbors — found with
    ``last/first(..., ignorenulls)`` over per-group ordered windows (two
    window passes over one shuffle; per-group series are short relative
    to partition counts at any scale, the user_daily_gapfill argument).
    Spine endpoints are observed by construction, so interior gaps
    always have both neighbors.  Day differences are exact integers;
    the single LERP division is one double expression rounded to 1e-6 —
    engine-exact on identical inputs.

    Returns (group, day, value, interpolated) — ``value`` rounded to
    1e-6, ``interpolated`` true on filled rows.
    """
    span = df.groupBy(group_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    spine = span.select(
        group_col, F.explode(F.sequence("__d0", "__d1")).alias(day_col)
    )
    obs = spine.join(df, [group_col, day_col], "left")
    w_prev = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    vc, dc = F.col(value_col), F.col(day_col)
    enriched = obs.select(
        group_col,
        day_col,
        value_col,
        F.last(vc, ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(F.when(vc.isNotNull(), dc), ignorenulls=True)
        .over(w_prev)
        .alias("__pd"),
        F.first(vc, ignorenulls=True).over(w_next).alias("__nv"),
        F.first(F.when(vc.isNotNull(), dc), ignorenulls=True)
        .over(w_next)
        .alias("__nd"),
    )
    lerp = (
        F.col("__pv") * F.datediff(F.col("__nd"), dc)
        + F.col("__nv") * F.datediff(dc, F.col("__pd"))
    ) / F.datediff(F.col("__nd"), F.col("__pd"))
    return enriched.select(
        group_col,
        day_col,
        F.round(F.coalesce(vc, lerp), 6).alias(value_col),
        vc.isNull().alias("interpolated"),
    )
