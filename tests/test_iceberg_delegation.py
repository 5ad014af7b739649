"""Real-Iceberg delegation round-trip (VERDICT r8 ask #8, stretch).

The lakehouse layer's delegation branch (`lakehouse/catalog.py:
iceberg_conf` + `session.py`) registers a Hadoop-type Iceberg catalog
whenever an iceberg-spark-runtime jar is on the classpath — the exact
catalog the reference registers in every job
(ods/ProduceKafkaDBDataToODS.scala:53-60).  This container ships no
such jar and installs are prohibited, so this test SKIPS here — but it
is one flag away from running on any real machine:

    # option A: let Spark fetch it (needs network)
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 ...
    # option B: drop the jar next to pyspark's bundled jars
    cp iceberg-spark-runtime-4.0_2.13-1.10.0.jar "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
    # option C: point the harness at it
    export SPARK_GRAFT_EXTRA_JARS=/path/to/iceberg-spark-runtime-4.0_2.13-1.10.0.jar

`iceberg_available()` gates on the classpath, not a pytest marker, so
the skip clears automatically once the jar is present.

What the test verifies when live: CREATE TABLE .. USING iceberg through
the registered catalog, two appends, MERGE INTO (upsert semantics — the
reference's Phoenix-upsert analog, K6), snapshot listing via the
metadata tables, and time travel (VERSION AS OF) back to the pre-merge
snapshot — i.e. the same append/merge/time-travel contract
`tableformat.py` implements in pure Python, executed by the real
runtime.
"""

from __future__ import annotations

import pytest

from icebergproject_spark.lakehouse.catalog import (
    CATALOG_NAME,
    iceberg_available,
)

pytestmark = pytest.mark.skipif(
    not iceberg_available(),
    reason=(
        "iceberg-spark-runtime jar not on the classpath — see this "
        "module's docstring for the one-flag fetch instructions"
    ),
)


def test_real_iceberg_append_merge_time_travel(spark, tmp_path):
    # catalog plugins are lazily instantiated on first reference, so the
    # registration is runtime-settable on the shared session; MERGE on
    # Iceberg needs no session extensions on Spark 3.4+/4.x (native DSv2
    # row-level plans)
    spark.conf.set(
        f"spark.sql.catalog.{CATALOG_NAME}",
        "org.apache.iceberg.spark.SparkCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{CATALOG_NAME}.type", "hadoop")
    spark.conf.set(
        f"spark.sql.catalog.{CATALOG_NAME}.warehouse", str(tmp_path / "wh")
    )
    t = f"{CATALOG_NAME}.icebergdb.delegation_rt"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"CREATE TABLE {t} (id BIGINT, v STRING) USING iceberg")

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    ).writeTo(t).append()
    pre_merge = spark.sql(
        f"SELECT snapshot_id FROM {t}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]

    spark.createDataFrame(
        [(2, "B"), (3, "c")], "id bigint, v string"
    ).createOrReplaceTempView("updates")
    spark.sql(
        f"""MERGE INTO {t} tgt USING updates src ON tgt.id = src.id
            WHEN MATCHED THEN UPDATE SET tgt.v = src.v
            WHEN NOT MATCHED THEN INSERT *"""
    )
    assert {(r.id, r.v) for r in spark.sql(f"SELECT * FROM {t}").collect()} == {
        (1, "a"), (2, "B"), (3, "c"),
    }

    # time travel back to the pre-merge snapshot
    back = spark.sql(f"SELECT * FROM {t} VERSION AS OF {pre_merge}")
    assert {(r.id, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}

    # snapshot log grew by exactly one commit for the merge
    n_snaps = spark.sql(f"SELECT COUNT(*) FROM {t}.snapshots").collect()[0][0]
    assert n_snaps == 2
