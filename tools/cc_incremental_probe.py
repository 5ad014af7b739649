"""Incremental connected-components crossover probe (companion to
tools/ann_incremental_probe.py and tools/pagerank_crossover_probe.py,
closing the same question for the DEDUP tier): as the corpus replicates
N×, does maintaining the stored cluster assignment under a BOUNDED
append batch beat re-clustering from scratch, and by how much?

Production shape measured here:
  - corpus_N = sf0.1 documents replicated N×, ids offset per copy and
    every token copy-salted (c<i>_ prefix via one regexp pass) so copies
    do NOT collide in LSH buckets — cluster sizes stay corpus-scale-
    independent, the realistic geometry (un-salted replication would
    inflate every bucket N× and make the FULL arm artificially
    quadratic);
  - the append batch is BOUNDED (copy-0 docs with doc_id % 25 == 0,
    200 docs at sf0.1) — the nightly-crawl shape;
  - STORED STATE lives in parquet, built OUTSIDE the timed path, exactly
    what production persists: the band-signature table
    (llm/dedup.banded_signatures — incremental_near_dups' documented
    contract) and the cluster assignment
    (llm/dedup.connected_components over base-internal pairs);
  - FULL  = minhash_lsh_candidates(corpus) → connected_components
            (re-band + re-pair + re-cluster everything)
  - MAINT = banded_signatures(batch) → incremental_lsh_candidates
            (broadcast batch bands over ONE streamed scan of the stored
            bands table) → connected_components_incremental
            (emit="updates": the MERGE payload — changed stored rows +
            batch rows)

Results land in SCALE.md §r11.

Usage: python tools/cc_incremental_probe.py [N ...]   (default 1 4 16)
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergproject_spark.llm.dedup import (
    banded_signatures,
    connected_components,
    connected_components_incremental,
    incremental_lsh_candidates,
    minhash_lsh_candidates,
)
from icebergproject_spark.session import build_session


def _release(spark) -> None:
    gc.collect()
    spark.sparkContext._jvm.System.gc()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/cc_inc_probe"
OFFSET = 10**7
RUNS = 3
BATCH_MOD = int(os.environ.get("CC_INC_BATCH_MOD", "25"))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session("cc-inc-probe")
    spark.sparkContext.setLogLevel("FATAL")
    shutil.rmtree(WORK, ignore_errors=True)

    one = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    print(
        f"{'N':>4} {'docs':>9} {'edges':>8} {'full_s':>8} {'maint_s':>8} "
        f"{'f/m':>6}  batch_edges/updates"
    )
    for n in ns:
        corpus = one
        for i in range(1, n):
            corpus = corpus.union(
                one.select(
                    (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", f"c{i}_$1").alias(
                        "text"
                    ),
                )
            )
        path = f"{WORK}/corpus_{n}x"
        corpus.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        is_batch = (F.col("doc_id") < OFFSET) & (
            F.col("doc_id") % BATCH_MOD == 0
        )  # bounded: copy 0 only
        base, batch = corpus.filter(~is_batch), corpus.filter(is_batch)

        # stored state (built OUTSIDE the timed path — production state)
        bands_path = f"{WORK}/bands_{n}x"
        banded_signatures(base).write.mode("overwrite").parquet(bands_path)
        stored_bands = spark.read.parquet(bands_path)
        assign_path = f"{WORK}/assign_{n}x"
        connected_components(
            minhash_lsh_candidates(base),
            nodes=base.select("doc_id"),
            node_col="doc_id",
        ).write.mode("overwrite").parquet(assign_path)
        assign = spark.read.parquet(assign_path)
        ndocs = corpus.count()

        t_full = []
        n_edges = 0
        for _ in range(RUNS):
            t0 = time.time()
            pairs = minhash_lsh_candidates(corpus)
            connected_components(
                pairs, nodes=corpus.select("doc_id"), node_col="doc_id"
            ).write.format("noop").mode("overwrite").save()
            t_full.append(time.time() - t0)
            _release(spark)
        n_edges = minhash_lsh_candidates(corpus).count()

        t_maint = []
        for _ in range(RUNS):
            t0 = time.time()
            new_edges = incremental_lsh_candidates(
                banded_signatures(batch), stored_bands
            )
            connected_components_incremental(
                assign,
                new_edges,
                new_nodes=batch.select(F.col("doc_id").alias("node")),
                emit="updates",
            ).write.format("noop").mode("overwrite").save()
            t_maint.append(time.time() - t0)
            _release(spark)
        batch_edges = incremental_lsh_candidates(
            banded_signatures(batch), stored_bands
        ).count()
        n_updates = connected_components_incremental(
            assign,
            incremental_lsh_candidates(banded_signatures(batch), stored_bands),
            new_nodes=batch.select(F.col("doc_id").alias("node")),
            emit="updates",
        ).count()
        tf = sorted(t_full)[len(t_full) // 2]
        tm = sorted(t_maint)[len(t_maint) // 2]
        print(
            f"{n:>4} {ndocs:>9} {n_edges:>8} {tf:>8.2f} {tm:>8.2f} "
            f"{tf / tm:>6.2f}  {batch_edges}/{n_updates}"
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
