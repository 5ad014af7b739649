"""Date/time scalar functions (SURVEY §2.7 F1–F3, F5).

Reference semantics (utils/DateUtil.scala):
  - timestamps travel as *epoch-millis strings*;
  - formatting targets ``yyyy-MM-dd HH:mm:ss`` / ``yyyy-MM-dd`` strings;
  - null / unparseable input falls back to the epoch default
    (``1970-01-01 00:00:00`` / ``1970-01-01``) — DateUtil.scala:22-30,33-41.

All pure column expressions; note ``from_unixtime`` takes *seconds* — the
reference's inputs are millis, hence ``timestamp_millis`` here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EPOCH_DATETIME = "1970-01-01 00:00:00"
EPOCH_DATE = "1970-01-01"


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def current_date_yyyymmdd() -> Column:
    """F1: wall-clock today as 'yyyy-MM-dd' (DateUtil.getCurrentDateYYYYMMDD,
    DateUtil.scala:16-20; used as the ClickHouse dt column,
    dm/ProcessUserLoginInfoToDM.scala:92)."""
    return F.date_format(F.current_date(), "yyyy-MM-dd")


def epoch_millis_to_datetime(c: Column | str) -> Column:
    """F2: epoch-millis string → 'yyyy-MM-dd HH:mm:ss'; null/bad → epoch
    default (DateUtil.getDateYYYYMMDDHHMMSS, DateUtil.scala:22-30)."""
    millis = _as_col(c).try_cast("long")  # non-numeric → null (ANSI-safe)
    return F.coalesce(
        F.date_format(F.timestamp_millis(millis), "yyyy-MM-dd HH:mm:ss"),
        F.lit(EPOCH_DATETIME),
    )


def epoch_millis_to_date(c: Column | str) -> Column:
    """F3: epoch-millis string → 'yyyy-MM-dd'; null/bad → '1970-01-01'
    (DateUtil.getDateYYYYMMDD, DateUtil.scala:33-41)."""
    millis = _as_col(c).try_cast("long")
    return F.coalesce(
        F.date_format(F.timestamp_millis(millis), "yyyy-MM-dd"),
        F.lit(EPOCH_DATE),
    )


def date_part_of(c: Column | str) -> Column:
    """F5: date part of a 'yyyy-MM-dd HH:mm:ss' string via split-on-space
    (log_time.split(" ")(0), dws/ProduceBrowseLogToDWS.scala:209)."""
    return F.substring_index(_as_col(c), " ", 1)
