"""Lakehouse table-format layer.

Real Iceberg (Spark's Iceberg connector) when the runtime jar is on the
classpath; otherwise a parquet+manifest fallback that preserves the
*semantics* the reference relies on: append, upsert (MERGE), snapshot
history / time travel, compaction, snapshot expiry
(offlineanls/CombinDataAndRemoveOldSnap.scala:32-53).
"""

from icebergproject_spark.lakehouse.catalog import iceberg_available, iceberg_conf
from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog

__all__ = ["iceberg_available", "iceberg_conf", "LakehouseCatalog"]
