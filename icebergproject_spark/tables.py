"""Typed loaders for the harness parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``<sf_dir>/``.

``events.parquet``'s ``ts`` encoding has varied across harness
generations — TIMESTAMP(NANOS) (Spark reads it as a long under
``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS,
isAdjustedToUTC=false) (Spark reads ``timestamp_ntz``).
``normalize_events`` maps every encoding to a plain session-TZ
``ts: timestamp`` so downstream operators and the DuckDB oracle (which
reads both as naive wall-clock) always agree; the session TZ is pinned
UTC (session.build_session), so the NTZ→TZ cast is value-preserving.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_events(df)
    return df


def normalize_events(df: DataFrame) -> DataFrame:
    """Any harness ``ts`` encoding → session-TZ timestamp (keeps name ``ts``)."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":  # TIMESTAMP(NANOS) under nanosAsLong: ns-epoch long
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    elif t == "timestamp_ntz":  # TIMESTAMP(MICROS) naive: same wall clock in UTC
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for n, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
