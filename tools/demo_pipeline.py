"""Runnable end-to-end demo: the reference's medallion pipeline over the
harness testdata, batch mode, writing every layer to a local lakehouse
warehouse and printing per-layer row counts plus a DM sample.

The stand-in mapping (FIXTURES.md §7): events ≙ the browse/login stream,
customer ⋈ nation ≙ member dims, part ≙ product dim. The same stage
functions run under Structured Streaming (see
tests/test_pipeline.py::test_streaming_full_medallion_browse).

Usage: python tools/demo_pipeline.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
from icebergproject_spark.queries import REGISTRY
from icebergproject_spark.session import build_session
from icebergproject_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="lakehouse_")
    spark = build_session("demo-pipeline")
    catalog = LakehouseCatalog(spark, warehouse=wh, db="icebergdb")

    layers = {
        # ODS: typed projections off the raw streams
        "ODS_BROWSELOG": REGISTRY["ods_browselog"].fn(spark, sf_dir),
        # DWD: cleansed/normalized records
        "DWD_EVENTS": REGISTRY["dwd_cleanse"].fn(spark, sf_dir),
        # DWS: wide enriched rows
        "DWS_USER_LOGIN": REGISTRY["user_login_wide"].fn(spark, sf_dir),
        "DWS_BROWSE_INFO": REGISTRY["browse_wide"].fn(spark, sf_dir),
        # DM: serving aggregates
        "DM_USER_POINTS": REGISTRY["user_points"].fn(spark, sf_dir),
        "DM_PRODUCT_VISIT": REGISTRY["product_visit_10s"].fn(spark, sf_dir),
    }
    print(f"warehouse: {wh}")
    for name, df in layers.items():
        catalog.table(name).append(df)
        n = catalog.table(name).read().count()
        print(f"  {name:16s} {n:8d} rows")

    print("\nDM_USER_POINTS sample:")
    catalog.table("DM_USER_POINTS").read().orderBy(
        F.col("total_points").desc()
    ).show(5, truncate=False)

    # lakehouse maintenance pass (M1/M2): compact + expire, then time travel
    t = catalog.table("DM_USER_POINTS")
    snap_before = t.current_snapshot()["snapshot_id"]
    t.append(layers["DM_USER_POINTS"].limit(1))
    t.compact()
    print("snapshots:", [s["snapshot_id"] for s in t._snapshots()])
    print("time-travel to first snapshot rows:",
          t.read(snapshot_id=snap_before).count())
    spark.stop()


if __name__ == "__main__":
    main()
