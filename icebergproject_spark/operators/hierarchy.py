"""Hierarchy flatten (SURVEY §2.4 J4).

The reference resolves a two-level product-category hierarchy per record:
``DIM_PRODUCT_CATEGORY a JOIN DIM_PRODUCT_CATEGORY b ON a.p_id = b.id
WHERE a.id = '<tpcode>'`` (dws/ProduceBrowseLogToDWS.scala:169-178) — an
inner equi self-join child→parent producing (second_category, first_category).

Spark-first: one aliased self-join evaluated once for the whole dimension
(not per record), then joined to facts. Both joins broadcast when the
dimension is small.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def flatten_two_level(
    dim: DataFrame,
    id_col: str,
    parent_col: str,
    name_col: str,
    out_id: str = "id",
    out_child_name: str = "second_level_name",
    out_parent_name: str = "first_level_name",
) -> DataFrame:
    """Child⋈parent self-join → (child id, child name, parent name)."""
    child = dim.alias("a")
    parent = dim.alias("b")
    return (
        child.join(parent, F.col(f"a.{parent_col}") == F.col(f"b.{id_col}"), "inner")
        .select(
            F.col(f"a.{id_col}").alias(out_id),
            F.col(f"a.{name_col}").alias(out_child_name),
            F.col(f"b.{name_col}").alias(out_parent_name),
        )
    )
