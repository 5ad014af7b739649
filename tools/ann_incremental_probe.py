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

import gc

from icebergproject_spark.llm.similarity import (
    ann_knn_graph,
    ann_knn_graph_incremental,
)
from icebergproject_spark.session import build_session


def _release(spark) -> None:
    """bench.py's block-release hygiene: lazy localCheckpoint blocks
    accumulate until the Python refs are collected, and the 64×
    replication's 128k×64-dim arrays otherwise skew later arms by
    ±50% (measured) via GC pressure."""
    gc.collect()
    spark.sparkContext._jvm.System.gc()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ann_inc_probe"
OFFSET = 10**7
RUNS = 3
DIM, K = 64, 5
# batch = copy-0 vectors with vec_id % BATCH_MOD == 3; 10 → 200 vectors
# at sf0.1 (a batch that floods a 2^4–2^8 bucket space — the stress
# case), 100 → 20 vectors (the bounded nightly-append shape)
BATCH_MOD = int(os.environ.get("ANN_INC_BATCH_MOD", "10"))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session("ann-inc-probe")
    spark.sparkContext.setLogLevel("FATAL")
    shutil.rmtree(WORK, ignore_errors=True)

    one = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    print(f"{'N':>4} {'n':>8} {'planes':>6} {'full_s':>8} {'maint_s':>8} "
          f"{'stored_s':>8} {'upsert_s':>8} {'pruned_s':>8} {'f/u':>6} "
          f"{'f/p':>6}  locality")
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
            F.col("vec_id") % BATCH_MOD == 3
        )  # bounded: copy 0 only
        base, batch = corpus.filter(~is_batch), corpus.filter(is_batch)

        prev_path = f"{WORK}/prev_{n}x"
        ann_knn_graph(base, dim=DIM, k=K, planes=planes).write.mode(
            "overwrite"
        ).parquet(prev_path)
        prev = spark.read.parquet(prev_path)
        # stored PREPPED+bucketed base (production appends prep(batch) to
        # it at O(batch)/batch; buckets of existing vectors never change)
        from icebergproject_spark.llm.similarity import (
            int_sign_bucket,
            l2_norm,
            lsh_weights,
        )

        Wn = lsh_weights(planes, DIM)
        qz = F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 10000).cast("long"),
        )
        base.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("__v"),
            l2_norm(F.col("embedding").cast("array<double>")).alias("__n"),
            qz.alias("__q"),
            int_sign_bucket(qz, Wn).alias("__bucket"),
        ).write.mode("overwrite").parquet(f"{WORK}/prepped_{n}x")
        prepped = spark.read.parquet(f"{WORK}/prepped_{n}x")
        nrow = corpus.count()

        t_full = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph(corpus, dim=DIM, k=K, planes=planes).write.format(
                "noop"
            ).mode("overwrite").save()
            t_full.append(time.time() - t0)
            _release(spark)
        t_maint = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph_incremental(
                base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev
            ).write.format("noop").mode("overwrite").save()
            t_maint.append(time.time() - t0)
            _release(spark)
        t_stored = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph_incremental(
                base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev,
                base_prepped=prepped,
            ).write.format("noop").mode("overwrite").save()
            t_stored.append(time.time() - t0)
            _release(spark)
        t_upsert = []
        for _ in range(RUNS):
            t0 = time.time()
            ann_knn_graph_incremental(
                base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev,
                base_prepped=prepped, emit="updates",
            ).write.format("noop").mode("overwrite").save()
            t_upsert.append(time.time() - t0)
            _release(spark)
        # r11 arm: the stored prepped corpus as a __bucket-identity-
        # partitioned LAKEHOUSE table; the timed path collects the
        # batch's bucket ids (O(batch) driver state) and reads ONLY the
        # touched partitions — the planning-time pruning that removes
        # the r10 residual (one serial scan of the stored relation)
        from icebergproject_spark.lakehouse.tableformat import LakehouseTable

        tblw = f"{WORK}/lake_{n}x"
        shutil.rmtree(tblw, ignore_errors=True)
        tbl = LakehouseTable(spark, tblw, "probe", "prepped")
        tbl.set_partitioning("__bucket", "identity")
        # co-locate each bucket into one task before the partitioned
        # write: otherwise every shuffle task spills a sliver into every
        # bucket dir (measured 25k files for 1024 buckets at 64×) and
        # driver-side file discovery dominates the pruned read
        tbl.append(
            prepped.select("id", "__v", "__n", "__bucket").repartition(
                F.col("__bucket")
            )
        )
        p_batch = batch.select(
            int_sign_bucket(qz, Wn).alias("__bucket")
        )
        t_pruned = []
        for _ in range(RUNS):
            t0 = time.time()
            touched_ids = sorted(
                r[0] for r in p_batch.distinct().collect()
            )
            pruned_base = tbl.read(partition_values=touched_ids)
            ann_knn_graph_incremental(
                base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev,
                base_prepped=pruned_base, emit="updates",
            ).write.format("noop").mode("overwrite").save()
            t_pruned.append(time.time() - t0)
            _release(spark)
        stats: dict = {}
        ann_knn_graph_incremental(
            base, batch, dim=DIM, k=K, planes=planes, prev_graph=prev,
            stats=stats,
        ).write.format("noop").mode("overwrite").save()
        tf = sorted(t_full)[len(t_full) // 2]
        tm = sorted(t_maint)[len(t_maint) // 2]
        ts = sorted(t_stored)[len(t_stored) // 2]
        tu = sorted(t_upsert)[len(t_upsert) // 2]
        tp = sorted(t_pruned)[len(t_pruned) // 2]
        print(f"{n:>4} {nrow:>8} {planes:>6} {tf:>8.2f} {tm:>8.2f} "
              f"{ts:>8.2f} {tu:>8.2f} {tp:>8.2f} {tf / tu:>6.2f} "
              f"{tf / tp:>6.2f}  {stats}")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
