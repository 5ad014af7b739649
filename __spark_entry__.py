"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (A1 user-points aggregate,
ProcessUserPoints.scala:35-44 parity) on sf0.001.
``queries()`` / ``oracle_sql()`` — the full registry from
``icebergproject_spark.queries`` (SURVEY §2 operator inventory + LLM
data-pipeline extensions), DuckDB-oracle-checked at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icebergproject_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # the driver may pass a session without our session-factory confs;
    # events.parquet needs nanosAsLong (see tables.normalize_events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["user_points"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return REGISTRY[name].fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
