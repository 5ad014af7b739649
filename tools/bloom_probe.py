"""Dir-level Bloom-filter point-lookup probe (round 13).

`set_bloom_filters` stamps per-column Bloom filters into each data
dir's `_stats.json` so `read(where="k = <lit>")` can skip directories
at PLANNING time.  This probe measures what that buys on the exact
workload min/max bounds cannot help with — a point lookup on a key
column whose values are hash-distributed across every directory (ids,
digests: every CDC/upsert table looks like this):

  - build: N_DIRS appended dirs x ROWS_PER_DIR rows, keys interleaved
    so every dir's [min, max] spans the whole key range;
  - measure: median point-lookup latency (present key + absent key)
    with blooms ON vs a control table with blooms OFF, plus the
    write-side overhead the bloom build adds per append and the
    planning-time cost of the bloom consult itself.

Usage: python tools/bloom_probe.py [--dirs 32] [--rows 20000] [--runs 5]
Prints one JSON line per arm plus a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog  # noqa: E402
from icebergproject_spark.session import build_session  # noqa: E402


def _arg(name: str, default: int) -> int:
    argv = sys.argv[1:]
    return int(argv[argv.index(name) + 1]) if name in argv else default


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _lookup_sec(tbl, key: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        n = tbl.read(where=f"id = '{key}'").count()
        samples.append(time.time() - t0)
        assert n in (0, 1)
    return _median(samples)


def main() -> None:
    n_dirs = _arg("--dirs", 32)
    rows_per_dir = _arg("--rows", 20000)
    runs = _arg("--runs", 5)
    spark = build_session("bloom_probe", master="local[8]", shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="bloom_probe_")
    try:
        # untimed warm-up: the FIRST appends in a session pay JVM/codegen
        # warm-up that an A/B must not attribute to either arm (measured:
        # first-arm inflation of ~5 s over 16 appends)
        warm = LakehouseCatalog(spark, warehouse=os.path.join(base, "warm"), db="p")
        wt = warm.table("W")
        wt.set_bloom_filters(["id"])
        for j in range(2):
            wt.append(spark.createDataFrame([(f"w{j}", j)], "id string, j int"))
        wt.read(where="id = 'w0'").count()
        out = {}
        for arm in ("control", "bloom"):
            cat = LakehouseCatalog(spark, warehouse=os.path.join(base, arm), db="p")
            t = cat.table("T")
            if arm == "bloom":
                t.set_bloom_filters(["id"])
            t_w0 = time.time()
            for j in range(n_dirs):
                rows = [
                    (f"k{i:07d}", j)
                    for i in range(j, n_dirs * rows_per_dir, n_dirs)
                ]
                t.append(spark.createDataFrame(rows, "id string, j int"))
            write_sec = time.time() - t_w0
            present = _lookup_sec(t, f"k{(n_dirs * rows_per_dir) // 2:07d}", runs)
            absent = _lookup_sec(t, "k_no_such", runs)
            conj = [("id", "=", f"k{(n_dirs * rows_per_dir) // 2:07d}")]
            t0 = time.time()
            hc: dict = {}
            kept = [
                d
                for d in t.current_snapshot()["data_dirs"]
                if t._dir_may_match(d, conj, _hash_cache=hc)
            ]
            plan_sec = time.time() - t0
            out[arm] = {
                "write_total_sec": round(write_sec, 3),
                "point_lookup_present_sec": round(present, 4),
                "point_lookup_absent_sec": round(absent, 4),
                "dirs_kept_present": len(kept) if arm == "bloom" else n_dirs,
                "planning_consult_sec": round(plan_sec, 4),
            }
            print(json.dumps({"arm": arm, **out[arm]}), flush=True)
        summary = {
            "n_dirs": n_dirs,
            "rows_per_dir": rows_per_dir,
            "speedup_present": round(
                out["control"]["point_lookup_present_sec"]
                / out["bloom"]["point_lookup_present_sec"],
                2,
            ),
            "speedup_absent": round(
                out["control"]["point_lookup_absent_sec"]
                / out["bloom"]["point_lookup_absent_sec"],
                2,
            ),
            "write_overhead_pct": round(
                100.0
                * (out["bloom"]["write_total_sec"] - out["control"]["write_total_sec"])
                / out["control"]["write_total_sec"],
                1,
            ),
        }
        print(json.dumps({"summary": summary}), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
