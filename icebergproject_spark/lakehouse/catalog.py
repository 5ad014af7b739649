"""Iceberg catalog registration (SURVEY §2.1 S4).

The reference registers a Hadoop-type Iceberg catalog in every job:
``CREATE CATALOG hadoop_iceberg WITH ('type'='iceberg',
'catalog-type'='hadoop', 'warehouse'='hdfs://...')``
(ods/ProduceKafkaDBDataToODS.scala:53-60). Spark's equivalent is pure
configuration — no DDL:

    spark.sql.catalog.hadoop_iceberg = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.hadoop_iceberg.type = hadoop
    spark.sql.catalog.hadoop_iceberg.warehouse = <path>

In this harness the Iceberg runtime jar is not installed, so
``iceberg_available()`` is False and the lakehouse layer uses the parquet
fallback (tableformat.py). On a real cluster, add
``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`` to
``spark.jars.packages`` and everything upgrades in place.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

CATALOG_NAME = "hadoop_iceberg"
DEFAULT_WAREHOUSE = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/root/repo/.warehouse")


@lru_cache(maxsize=1)
def iceberg_available() -> bool:
    """True iff an iceberg-spark-runtime jar is on the Spark classpath."""
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        if glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar")):
            return True
    except Exception:
        pass
    extra = os.environ.get("SPARK_GRAFT_EXTRA_JARS", "")
    return "iceberg-spark-runtime" in extra


def iceberg_conf(warehouse: str = DEFAULT_WAREHOUSE) -> dict[str, str]:
    """SparkSession config registering the Iceberg catalog (S4)."""
    return {
        f"spark.sql.catalog.{CATALOG_NAME}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{CATALOG_NAME}.type": "hadoop",
        f"spark.sql.catalog.{CATALOG_NAME}.warehouse": warehouse,
        # Iceberg's recommended extensions for MERGE/CALL procedures.
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }
