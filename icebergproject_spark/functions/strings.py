"""String scalar functions (SURVEY §2.7 F4–F7).

Includes the reference's string-encoded-map parser: payloads like
``{logTime=1655274222161, frontProductUrl=, userId=uid813665}`` must parse
tolerating *valueless keys* (``frontProductUrl=`` → empty string) —
ods/ProduceKafkaLogDataToODS.scala:91-100 / utils/CommonUtil.scala:29-39.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def is_empty(c: Column | str) -> Column:
    """F4: null-or-empty-string test (MyStringUtil.isEmpty,
    utils/MyStringUtil.scala:6-8)."""
    col = _as_col(c)
    return col.isNull() | (col == F.lit(""))


def composite_key(*cols: Column | str, sep: str = "$") -> Column:
    """F6: 'first$second$product' composite grouping key
    (dm/ProcessBrowseLogInfoToDM.scala:71-73)."""
    return F.concat_ws(sep, *[_as_col(c) for c in cols])


def split_composite_key(c: Column | str, n: int, sep: str = "\\$") -> list[Column]:
    """F6 inverse: key.split("\\$") back into n columns
    (dm/ProcessBrowseLogInfoToDM.scala:82-89)."""
    col = _as_col(c)
    return [F.split(col, sep).getItem(i) for i in range(n)]


def str_to_map_expr(c: Column | str) -> Column:
    """F7: '{k1=v1, k2=, k3=v3}' → map<string,string>.

    Strip the braces, split entries on ', ', entries on the first '='.
    Valueless keys (``k2=``) map to empty string, matching the reference's
    tolerant parser (ProduceKafkaLogDataToODS.scala:91-100).
    """
    col = _as_col(c)
    stripped = F.regexp_replace(F.regexp_replace(col, "^\\{", ""), "\\}$", "")
    return F.str_to_map(stripped, F.lit(", "), F.lit("="))
