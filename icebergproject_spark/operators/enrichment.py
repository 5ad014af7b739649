"""Dimension-enrichment joins (SURVEY §2.4 J2/J3, J5).

The reference enriches each stream record with per-record RPCs: Redis
cache get → on miss a Phoenix point SELECT → Redis setex 24h
(dws/ProcessUserlogInToDWS.scala:107-225,
dws/ProduceBrowseLogToDWS.scala:100-226, utils/MyRedisUtil.scala:23-42).

Spark-first, the whole cache tier disappears: a **left equi-join** against
the dimension DataFrame. For small dims Catalyst picks a broadcast hash
join (per-executor hash map ≙ the Redis cache, rebuilt per batch ≙ TTL
refresh, J5). For dims too big to broadcast at 100 TB scale, the join
shuffles both sides on the key — or avoids the shuffle entirely when both
sides are bucketed/storage-partitioned on the key.

Missing dim keys yield null attributes — the reference's explicit behavior
(left-join semantics, ProcessUserlogInToDWS.scala:160-201).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich_left(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str] | None = None,
    fact_key: str | None = None,
    dim_key: str | None = None,
    attrs: list[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2/J3: left join facts with a dimension, keeping fact rows.

    Either ``on`` (same-named key) or ``fact_key``/``dim_key`` (different
    names, e.g. browse_product_code = product_id,
    ProduceBrowseLogToDWS.scala:132-135). ``attrs`` selects which dim
    columns to attach (default: all but the key).
    """
    if attrs is not None:
        keep = ([dim_key] if dim_key else []) + attrs
        keep = [c for c in dict.fromkeys(keep) if on is None or c not in (on if isinstance(on, list) else [on])]
        if on is not None:
            keys = on if isinstance(on, list) else [on]
            dim = dim.select(*keys, *[c for c in attrs if c not in keys])
        else:
            dim = dim.select(*keep)
    side = F.broadcast(dim) if broadcast_dim else dim
    if on is not None:
        return facts.join(side, on, "left")
    cond = facts[fact_key] == dim[dim_key]
    return facts.join(side, cond, "left").drop(dim[dim_key])
