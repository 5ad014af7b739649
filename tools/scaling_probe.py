"""Scaling probe: replicate the sf0.1 tables N× (ids shifted to stay
unique) into a temp dir and time representative heavy queries at 1× and
N×. Sub-linear wall-clock growth ⇒ the plans have parallel headroom
(fixed per-stage overhead dominates at small scale); super-linear growth
flags an operator whose cost curve would break at 100 TB.

Usage: python tools/scaling_probe.py [N] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergproject_spark.queries import REGISTRY
from icebergproject_spark.session import build_session
from icebergproject_spark.tables import TABLE_NAMES

BASE = "/root/testdata/sf0.1"
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_exact",
    "similarity_ivf",
    "pricing_summary",
    "user_sessions",
    "top_terms",
    "user_points",
]
ID_SHIFT = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
}


def replicate(spark, n: int, out_dir: str) -> None:
    for t in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in ID_SHIFT:
            key = ID_SHIFT[t]
            parts = [
                src.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
                for i in range(n)
            ]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionAll(p)
        else:
            df = src  # dims stay dim-sized — replication would break FKs
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def best_of_2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/tmp/sfprobe_{n}x"
    spark = build_session("scaling-probe")
    replicate(spark, n, out_dir)
    print(f"{'query':24s} {'1x':>8s} {n:>6d}x  ratio")
    for name in names:
        t1 = best_of_2(
            lambda: REGISTRY[name].fn(spark, BASE)
            .write.format("noop").mode("overwrite").save()
        )
        tn = best_of_2(
            lambda: REGISTRY[name].fn(spark, out_dir)
            .write.format("noop").mode("overwrite").save()
        )
        print(f"{name:24s} {t1:7.2f}s {tn:6.2f}s  {tn / t1:5.2f}")
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
