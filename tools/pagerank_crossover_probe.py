"""Delta-PageRank wall-clock crossover probe (VERDICT r9 ask #3).

SCALE.md's r9 section measured that `pagerank_micro_delta` does 14×
less ROW WORK than a full recompute at |V|=2,000 but still LOSES on
wall-clock (per-stage scheduling overhead dominates at toy sizes).
This probe finds the real crossover: replicate the sf0.1 ANN 5-NN
graph N× (ids offset per copy — the SCALE.md replication harness
applied to the edge list), store the 5-level rank history as parquet
(the production stored state), land a delta = the edges incident to
ONE node of copy 0, then time

  - FULL:    pagerank_micro(edges_full) — stateless recompute of the
             final rank vector;
  - MERGED:  pagerank_micro_delta(full, delta, h) with the default
             contract — rebuilds the degree-annotated edge list +
             node set per call (O(E) setup) and materializes the fully
             merged history (O(|V|) per level).  This is what the
             hash-checked heads run: correct, but its wall is setup-
             bound, not frontier-bound;
  - UPSERT:  pagerank_micro_delta(..., static_state=stored,
             emit="updates") — the PRODUCTION batch shape: the degree-
             annotated edge list and node set come from storage (they
             are maintained incrementally at O(delta)/append), and the
             batch emits only the per-level changed-rank rows (the
             upsert payload a MERGE applies to the stored history).

The delta's K-hop ball is a property of the DELTA, not of |V|, so the
UPSERT arm's row work is ~constant while full recompute grows with N —
the crossover is where its curve crosses FULL's.  Results → SCALE.md.

Usage: python tools/pagerank_crossover_probe.py [N ...]   (default 1 16 64)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergproject_spark.llm.graph import (
    pagerank_micro,
    pagerank_micro_delta,
    pagerank_micro_history,
)
from icebergproject_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/pr_crossover"
SEED_NODE = 0  # the delta is this node's incident edges (copy 0)
OFFSET = 10**7
RUNS = 3
ITERS = 5


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = build_session("pr-crossover")
    spark.sparkContext.setLogLevel("FATAL")
    shutil.rmtree(WORK, ignore_errors=True)

    # base directed edge list: the registered ANN 5-NN graph at sf0.1
    import icebergproject_spark.queries  # noqa: F401 (registry init)
    from icebergproject_spark.queries_r9 import _ann_edges

    e = _ann_edges(spark, SF_DIR)
    und = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    und.write.mode("overwrite").parquet(f"{WORK}/edges_1x")

    print(f"{'N':>4} {'|V|':>9} {'|E|':>9} {'full_s':>8} {'merged_s':>9} "
          f"{'upsert_s':>9} {'f/u':>6}  frontier")
    for n in ns:
        one = spark.read.parquet(f"{WORK}/edges_1x")
        full = one
        for i in range(1, n):
            full = full.union(
                one.select(
                    (F.col("src") + i * OFFSET).alias("src"),
                    (F.col("dst") + i * OFFSET).alias("dst"),
                )
            )
        path = f"{WORK}/rep_{n}x"
        full.write.mode("overwrite").parquet(path)
        full = spark.read.parquet(path)
        is_delta = (F.col("src") == SEED_NODE) | (F.col("dst") == SEED_NODE)
        base_e, delta_e = full.filter(~is_delta), full.filter(is_delta)

        # stored state: the prior run's history + the degree-annotated
        # post-delta edge list and node set, persisted like production
        # (both maintained incrementally at O(delta) per append batch)
        hist = pagerank_micro_history(base_e, iterations=ITERS)
        hpaths = []
        for i, h in enumerate(hist):
            hp = f"{WORK}/hist_{n}x_{i}"
            h.write.mode("overwrite").parquet(hp)
            hpaths.append(hp)
        hist_stored = [spark.read.parquet(p) for p in hpaths]
        deg = full.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        full.join(deg, "src").write.mode("overwrite").parquet(
            f"{WORK}/ed_{n}x"
        )
        full.select(F.col("src").alias("node")).union(
            full.select(F.col("dst").alias("node"))
        ).distinct().write.mode("overwrite").parquet(f"{WORK}/nodes_{n}x")
        stored = {
            "ed": spark.read.parquet(f"{WORK}/ed_{n}x"),
            "nodes": spark.read.parquet(f"{WORK}/nodes_{n}x"),
        }

        nv = stored["nodes"].count()
        ne = full.count()

        t_full = []
        for _ in range(RUNS):
            t0 = time.time()
            pagerank_micro(full, iterations=ITERS).write.format(
                "noop"
            ).mode("overwrite").save()
            t_full.append(time.time() - t0)
        t_merged = []
        for _ in range(RUNS):
            t0 = time.time()
            pagerank_micro_delta(full, delta_e, hist_stored)[-1].write.format(
                "noop"
            ).mode("overwrite").save()
            t_merged.append(time.time() - t0)
        t_upsert = []
        for _ in range(RUNS):
            t0 = time.time()
            ups = pagerank_micro_delta(
                full, delta_e, hist_stored,
                static_state=stored, emit="updates",
            )
            for u in ups:  # every level's upsert payload lands
                u.write.format("noop").mode("overwrite").save()
            t_upsert.append(time.time() - t0)
        stats: dict = {}
        pagerank_micro_delta(full, delta_e, hist_stored, stats=stats)[
            -1
        ].write.format("noop").mode("overwrite").save()
        tf = sorted(t_full)[len(t_full) // 2]
        tm = sorted(t_merged)[len(t_merged) // 2]
        tu = sorted(t_upsert)[len(t_upsert) // 2]
        print(f"{n:>4} {nv:>9} {ne:>9} {tf:>8.2f} {tm:>9.2f} {tu:>9.2f} "
              f"{tf / tu:>6.2f}  {stats['frontier_sizes']}")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
