"""Data profiling + constraint checking — the ANALYZE / data-quality layer.

Two pieces every engine grows at scale:

- **column_profile** — per-column stats (count, nulls, NDV, min/max) in
  ONE aggregate pass (no per-column jobs): all stats for all columns are
  expressions in a single groupBy-less agg, so the table is scanned once.
  NDV here is exact ``countDistinct`` (oracle-checkable); at 100 TB flip
  ``approx=True`` for HyperLogLog++ (one pass, constant memory, no extra
  shuffle per column).
- **check_constraints** — declarative expectations (not-null, unique key,
  referential integrity, value range) evaluated set-based; returns one
  row per rule with its violation count. RI is a broadcast/shuffle
  anti-join, uniqueness a groupBy-count — the shapes that replace
  row-by-row validators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def column_profile(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """One-pass per-column profile. Output: one row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            ndv(c).alias(f"{c}__ndv"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    profiles = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(profiles).alias("p")).select("p.*")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate expectation rules; one output row per rule:
    (rule, n_violations).

    Rule kinds:
      {"rule": name, "kind": "not_null", "col": c}
      {"rule": name, "kind": "unique", "cols": [c, ...]}
      {"rule": name, "kind": "in_range", "col": c, "lo": x, "hi": y}
      {"rule": name, "kind": "foreign_key", "col": c, "ref": DataFrame,
       "ref_col": rc}
    """
    spark = df.sparkSession
    out = []
    for r in rules:
        kind = r["kind"]
        if kind == "not_null":
            n = df.filter(F.col(r["col"]).isNull()).count()
        elif kind == "unique":
            n = (
                df.groupBy(*r["cols"])
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
                .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v"))
                .collect()[0][0]
            )
        elif kind == "in_range":
            n = df.filter(
                (F.col(r["col"]) < r["lo"]) | (F.col(r["col"]) > r["hi"])
            ).count()
        elif kind == "foreign_key":
            n = (
                df.select(F.col(r["col"]).alias("__fk"))
                .filter(F.col("__fk").isNotNull())
                .join(
                    r["ref"].select(F.col(r["ref_col"]).alias("__fk")).distinct(),
                    "__fk",
                    "left_anti",
                )
                .count()
            )
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        out.append((r["rule"], int(n)))
    return spark.createDataFrame(out, ["rule", "n_violations"])
