"""Projection operators (SURVEY §2.3 P1, P5–P7).

P1 is the reference's core ingest move: ``SELECT data['logTime'] AS
log_time, ...`` pulling typed columns out of a ``map<string,string>`` CDC /
log payload (ods/ProduceKafkaLogDataToODS.scala:65-75,
ods/ProduceKafkaDBDataToODS.scala:144-150).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def extract_map_payload(
    df: DataFrame,
    map_col: str,
    fields: dict[str, str],
    keep: list[str] | None = None,
) -> DataFrame:
    """P1: project map entries to named columns.

    ``fields`` maps payload key → output column name, e.g.
    ``{"logTime": "log_time", "userId": "user_id"}``. Missing keys yield
    null, matching SQL map access semantics. ``keep`` lists pass-through
    top-level columns.
    """
    cols = [F.col(c) for c in (keep or [])]
    cols += [
        F.element_at(F.col(map_col), key).alias(out) for key, out in fields.items()
    ]
    return df.select(*cols)


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P6/P7: narrow rename projection (snake↔camel for table writes,
    dws/ProductBrowseLogToDWS.scala:52-66). Only listed columns survive —
    column pruning reaches the scan."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])
