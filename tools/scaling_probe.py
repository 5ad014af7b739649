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


def best_of_2(fn, sc=None, tag: str | None = None) -> float:
    """Two runs, best wall-clock.  Only the SECOND run carries the job-
    group tag, so per-stage shuffle attribution counts each exchange
    once (the warm run also avoids attributing scan-cache warmup)."""
    best = float("inf")
    for i in range(2):
        if sc is not None and tag is not None:
            sc.setJobGroup(tag if i == 1 else f"warmup:{tag}", tag)
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def parse_event_log(log_dir: str) -> dict[str, list[dict]]:
    """Per-stage shuffle attribution from the Spark event log: map each
    job-group tag (we tag one per (query, scale) run) to its completed
    stages' shuffle write/read bytes and record counts.  This is the
    'where does the growth come from' view: wall-clock ratios say THAT a
    query grew, stage shuffle volumes say WHICH exchange grew."""
    import glob as _glob
    import json as _json

    stage_to_group: dict[int, str] = {}
    stages: dict[str, list[dict]] = {}
    for path in _glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = _json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if group:
                        for sid in ev.get("Stage IDs", []):
                            stage_to_group[sid] = group
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    info = ev["Stage Info"]
                    group = stage_to_group.get(info["Stage ID"])
                    if not group:
                        continue
                    acc = {
                        a["Name"]: a.get("Value", 0)
                        for a in info.get("Accumulables", [])
                        if str(a.get("Name", "")).startswith("internal.metrics.")
                    }
                    stages.setdefault(group, []).append(
                        {
                            "stage": info["Stage ID"],
                            "name": info.get("Stage Name", "")[:40],
                            "tasks": info.get("Number of Tasks"),
                            "shuffle_write_mb": acc.get(
                                "internal.metrics.shuffle.write.bytesWritten", 0
                            )
                            / 1e6,
                            "shuffle_read_mb": (
                                acc.get(
                                    "internal.metrics.shuffle.read.localBytesRead", 0
                                )
                                + acc.get(
                                    "internal.metrics.shuffle.read.remoteBytesRead", 0
                                )
                            )
                            / 1e6,
                            "records_written": acc.get(
                                "internal.metrics.shuffle.write.recordsWritten", 0
                            ),
                        }
                    )
    return stages


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/tmp/sfprobe_{n}x"
    log_dir = f"/tmp/sfprobe_eventlog_{n}x"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = build_session(
        "scaling-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            # plain single-file JSON-lines log (Spark 4 defaults to a
            # rolling zstd directory, which the stdlib can't read back)
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    replicate(spark, n, out_dir)
    sc = spark.sparkContext
    print(f"{'query':24s} {'1x':>8s} {n:>6d}x  ratio")
    for name in names:
        t1 = best_of_2(
            lambda: REGISTRY[name].fn(spark, BASE)
            .write.format("noop").mode("overwrite").save(),
            sc, f"{name}@1x",
        )
        tn = best_of_2(
            lambda: REGISTRY[name].fn(spark, out_dir)
            .write.format("noop").mode("overwrite").save(),
            sc, f"{name}@{n}x",
        )
        sc.setJobGroup("idle", "idle")
        print(f"{name:24s} {t1:7.2f}s {tn:6.2f}s  {tn / t1:5.2f}", flush=True)
    spark.stop()
    time.sleep(1)  # event log flush
    stages = parse_event_log(log_dir)
    for name in names:
        print(f"\n-- {name}: per-stage shuffle (1x vs {n}x, stages with traffic)")
        for tag in (f"{name}@1x", f"{name}@{n}x"):
            total_w = sum(s["shuffle_write_mb"] for s in stages.get(tag, []))
            print(f"  {tag}: total shuffle write {total_w:9.2f} MB")
            for s in sorted(
                stages.get(tag, []),
                key=lambda s: -s["shuffle_write_mb"],
            )[:6]:
                if s["shuffle_write_mb"] < 0.01 and s["shuffle_read_mb"] < 0.01:
                    continue
                print(
                    f"    stage {s['stage']:4d} w={s['shuffle_write_mb']:9.2f}MB "
                    f"r={s['shuffle_read_mb']:9.2f}MB "
                    f"recs={s['records_written']:>10d} {s['name']}"
                )
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
