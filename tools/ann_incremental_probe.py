"""Incremental-ANN-maintenance crossover probe (companion to
tools/pagerank_crossover_probe.py, closing the same question for the
ANN tier): as the corpus replicates N×, does maintaining the k-NN graph
under a BOUNDED append beat a full rebuild, and by how much?

Production shape measured here:
  - corpus_N = sf0.1 embeddings replicated N× (ids offset per copy);
  - planes follow the dial (+2 per 4× rows: N=1→4, 4→6, 16→8), applied
    to BOTH arms so the comparison is fair at every scale;
  - the append batch is BOUNDED (200 vectors, copy 0 only) — the
    nightly-crawl shape where the delta does not grow with the corpus;
  - the prior graph is STORED (parquet, built outside the timed path —
    the same stored-state lesson as the delta-PageRank probe);
  - FULL   = ann_knn_graph(corpus_N)                      (rebuild)
  - MAINT  = ann_knn_graph_incremental(base, batch, prev) (touched
             buckets only; untouched queries keep stored edges)

Results land in SCALE.md §r10.

Usage: python tools/ann_incremental_probe.py [N ...]   (default 1 4 16)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergproject_spark.llm.similarity import (
    ann_knn_graph,
    ann_knn_graph_incremental,
)
from icebergproject_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ann_inc_probe"
OFFSET = 10**7
RUNS = 3
DIM, K = 64, 5


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session("ann-inc-probe")
    spark.sparkContext.setLogLevel("FATAL")
    shutil.rmtree(WORK, ignore_errors=True)

    one = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    print(f"{'N':>4} {'n':>8} {'planes':>6} {'full_s':>8} {'maint_s':>8} "
          f"{'ratio':>6}  locality")
    for n in ns:
        planes = 4 + 2 * round(math.log(n, 4))
        corpus = one
        for i in range(1, n):
            corpus = corpus.union(
                one.select(
                    (F.col("vec_id") + i * OFFSET).alias("vec_id"),
                    "embedding",
                )
            )
        path = f"{WORK}/corpus_{n}x"
        corpus.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        is_batch = (F.col("vec_id") < OFFSET) & (
            F.col("vec_id") % 10 == 3
        )  # bounded: copy 0 only
        base, batch = corpus.filter(~is_batch), corpus.filter(is_batch)

        prev_path = f"{WORK}/prev_{n}x"
        ann_knn_graph(base, dim=DIM, k=K, planes=planes).write.mode(
            "overwrite"
        ).parquet(prev_path)
        prev = spark.read.parquet(prev_path)
        nrow = corpus.count()

        t_full = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph(corpus, dim=DIM, k=K, planes=planes).write.format(
                "noop"
            ).mode("overwrite").save()
            t_full.append(time.time() - t0)
        t_maint = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph_incremental(
                base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev
            ).write.format("noop").mode("overwrite").save()
            t_maint.append(time.time() - t0)
        stats: dict = {}
        ann_knn_graph_incremental(
            base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev,
            stats=stats,
        ).write.format("noop").mode("overwrite").save()
        tf = sorted(t_full)[len(t_full) // 2]
        tm = sorted(t_maint)[len(t_maint) // 2]
        print(f"{n:>4} {nrow:>8} {planes:>6} {tf:>8.2f} {tm:>8.2f} "
              f"{tf / tm:>6.2f}  {stats}")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
