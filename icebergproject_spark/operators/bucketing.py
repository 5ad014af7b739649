"""Bucketed (co-located) joins — the shuffle-elimination primitive.

The reference never joins two big tables (its dims are point-lookups,
SURVEY §2.4); at 100 TB a fact⋈fact join's shuffle IS the bottleneck —
every row of both sides crosses the network once per join. Bucketing
pre-partitions each table by the join key at WRITE time (hash(key) %
num_buckets → one file group per bucket), so a later join on that key
reads matching buckets side-by-side: zero Exchange in the plan, repeated
joins amortize the one-time write cost.

Spark specifics encoded here:
- bucketed writes go through ``saveAsTable`` (the bucket metadata lives in
  the catalog, not the parquet footers);
- BOTH sides must be bucketed by the same key into the same bucket count
  (or a divisor — AQE can coalesce buckets) for the shuffle to disappear;
- ``spark.sql.sources.bucketing.enabled`` is on by default; sort-merge
  join still sorts within buckets unless the write also ``sortBy``s.

Iceberg equivalent: partition transform ``bucket(N, key)`` + Spark's
storage-partitioned join (spark.sql.sources.v2.bucketing.enabled) — same
idea, engine-independent layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``sortBy(bucket_col)`` makes each bucket file pre-sorted so sort-merge
    joins skip their Sort stage too — the join degenerates to a zipper
    merge over co-located, co-sorted files.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With both sides bucketed by ``key`` into the same bucket count the
    optimizer proves the partitioning requirement is already met — the
    physical plan has NO Exchange (verified by
    tests/test_operators.py::test_bucketed_join_has_no_shuffle).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
