"""Relational operators (SURVEY §2.3–§2.6).

Each operator is a pure DataFrame→DataFrame function built from Spark
built-ins, so Catalyst sees the whole plan (pushdown, pruning, broadcast
selection, whole-stage codegen all apply).
"""

from icebergproject_spark.operators.projections import (
    extract_map_payload,
    project_rename,
)
from icebergproject_spark.operators.routing import (
    broadcast_route,
    discriminator_filter,
    reject_nulls,
)
from icebergproject_spark.operators.enrichment import enrich_left
from icebergproject_spark.operators.hierarchy import flatten_two_level
from icebergproject_spark.operators.aggregates import (
    group_sum_points,
    tumbling_window_count,
)

__all__ = [
    "extract_map_payload",
    "project_rename",
    "discriminator_filter",
    "reject_nulls",
    "broadcast_route",
    "enrich_left",
    "flatten_two_level",
    "group_sum_points",
    "tumbling_window_count",
]
