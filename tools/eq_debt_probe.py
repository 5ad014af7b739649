"""Equality-delete read-debt probe (VERDICT r12 ask #6).

Each `upsert_by_key` adds ONE equality-delete file; every subsequent
read pays one broadcast anti-join per accumulated file.  This probe
measures that curve on the bucketed CC assignment layout — read latency
at 1/4/16/64 accumulated upserts (full read and partition-pruned read),
the one-time fold cost (`convert_equality_deletes`, then `compact`),
and the post-fold read — so the auto-fold threshold
(`maybe_fold_eq_debt`) is a measured knee, not a guess.

Usage: python tools/eq_debt_probe.py [--rows 256000] [--buckets 64]
       [--payload 1000] [--runs 3]
Prints one JSON line per debt checkpoint plus a summary table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergproject_spark.session import build_session  # noqa: E402


def _arg(name: str, default: int) -> int:
    argv = sys.argv[1:]
    return int(argv[argv.index(name) + 1]) if name in argv else default


def _median_read_sec(tbl, runs: int, partition_values=None) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        tbl.read(partition_values=partition_values).write.format(
            "noop"
        ).mode("overwrite").save()
        samples.append(time.time() - t0)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    rows = _arg("--rows", 256_000)
    buckets = _arg("--buckets", 64)
    payload = _arg("--payload", 1_000)
    runs = _arg("--runs", 3)
    checkpoints = [0, 1, 4, 16, 64]

    spark = build_session("eq_debt_probe")
    spark.sparkContext.setLogLevel("FATAL")
    wh = tempfile.mkdtemp(prefix="eq_debt_probe_")
    try:
        from icebergproject_spark.lakehouse.tableformat import LakehouseTable

        tbl = LakehouseTable(spark, wh, "probe", "assign")
        tbl.set_partitioning("cluster_id", f"mod{buckets}")
        seed = spark.range(rows).select(
            F.col("id").alias("node"), F.col("id").alias("cluster_id")
        )
        tbl.append(seed.repartition(F.pmod("cluster_id", F.lit(buckets))))

        out = []
        for debt in range(checkpoints[-1] + 1):
            if debt in checkpoints:
                full = _median_read_sec(tbl, runs)
                pruned = _median_read_sec(
                    tbl, runs, partition_values=[debt % buckets]
                )
                rec = {
                    "debt_files": debt,
                    "read_full_sec": full,
                    "read_pruned_sec": pruned,
                }
                out.append(rec)
                print(json.dumps(rec), flush=True)
            if debt == checkpoints[-1]:
                break
            # one maintenance-shaped upsert: `payload` nodes move to a
            # fresh cluster label (stable keys, changing values)
            ups = spark.range(payload).select(
                (F.col("id") * 97 + debt).cast("long").alias("node"),
                F.lit(debt).cast("long").alias("cluster_id"),
            )
            tbl.upsert_by_key(ups, ["node"])

        t0 = time.time()
        tbl.convert_equality_deletes()
        convert_sec = round(time.time() - t0, 3)
        post_convert = _median_read_sec(tbl, runs)
        t0 = time.time()
        tbl.compact(target_partitions=buckets)
        compact_sec = round(time.time() - t0, 3)
        post_compact = _median_read_sec(tbl, runs)
        post_compact_pruned = _median_read_sec(
            tbl, runs, partition_values=[1]
        )
        summary = {
            "rows": rows,
            "buckets": buckets,
            "payload": payload,
            "runs": runs,
            "curve": out,
            "convert_sec_at_64": convert_sec,
            "read_full_post_convert_sec": post_convert,
            "compact_sec": compact_sec,
            "read_full_post_compact_sec": post_compact,
            "read_pruned_post_compact_sec": post_compact_pruned,
        }
        print(json.dumps(summary), flush=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
