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
  - MAINT_BKT (r12) = the same payload computed against the BUCKETED
            stored assignment (connected_components_incremental_bucketed:
            lakehouse table hidden-partitioned mod256(cluster_id),
            changed-row read-out partition-pruned at planning time)
  - apply (r12, once per N, after the timed runs): the write-back cost
            itself — merge() (copy-on-write: rewrites the table) vs
            upsert_by_key() (one equality-delete + data file, O(payload))
            — the O(corpus)-scan residual VERDICT r11 flagged, measured

Results land in SCALE.md §r11 / §r12.

Usage: python tools/cc_incremental_probe.py [N ...]   (default 1 4 16)
       python tools/cc_incremental_probe.py --flood [N ...]
         flood regime: the batch is an exact-text re-crawl of 60% of the
         stored corpus (every batch doc LSH-collides with its stored
         twin), so the touched-label fraction blows past 0.5 — times
         guard-off maintenance vs the guard's rebuild branch and prints
         the decision (VERDICT r11 ask #3's done-bar)
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
    cc_assignment_store,
    cc_assignment_table,
    connected_components,
    connected_components_incremental,
    connected_components_incremental_bucketed,
    connected_components_incremental_stored,
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


N_BUCKETS = int(os.environ.get("CC_INC_BUCKETS", "64"))
SKIP_FULL = os.environ.get("CC_INC_SKIP_FULL") == "1"


def _replicate(spark, one, n: int, path: str):
    corpus = one
    for i in range(1, n):
        corpus = corpus.union(
            one.select(
                (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"c{i}_$1").alias("text"),
            )
        )
    corpus.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


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
        f"{'mbkt_s':>8} {'mstore_s':>8} {'f/m':>6} {'f/mb':>6} {'f/ms':>6} "
        f"{'merge_s':>8} {'upsert_s':>9}  batch_edges/updates/buckets"
    )
    for n in ns:
        corpus = _replicate(spark, one, n, f"{WORK}/corpus_{n}x")
        is_batch = (F.col("doc_id") < OFFSET) & (
            F.col("doc_id") % BATCH_MOD == 0
        )  # bounded: copy 0 only
        base, batch = corpus.filter(~is_batch), corpus.filter(is_batch)

        # stored state (built OUTSIDE the timed path — production state)
        bands_path = f"{WORK}/bands_{n}x"
        banded_signatures(base).write.mode("overwrite").parquet(bands_path)
        stored_bands = spark.read.parquet(bands_path)
        stored_assign = connected_components(
            minhash_lsh_candidates(base),
            nodes=base.select("doc_id"),
            node_col="doc_id",
        )
        assign_path = f"{WORK}/assign_{n}x"
        stored_assign.write.mode("overwrite").parquet(assign_path)
        assign = spark.read.parquet(assign_path)
        # the SAME stored state in the production bucketed layout
        tbl = cc_assignment_table(
            spark, f"{WORK}/wh_{n}x", "probe", "assign",
            assign=spark.read.parquet(assign_path), n_buckets=N_BUCKETS,
        )
        # ... and in the r12 zero-full-scan layout (node-bucketed
        # assignment + cluster→node-bucket spill index)
        cstore = cc_assignment_store(
            spark, f"{WORK}/wh_{n}x", "probe", "cc",
            assign=spark.read.parquet(assign_path), n_buckets=N_BUCKETS,
        )
        ndocs = corpus.count()

        t_full = []
        if SKIP_FULL:
            t_full = [float("nan")]
            n_edges = -1
        else:
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

        t_bkt = []
        stats: dict = {}
        for _ in range(RUNS):
            t0 = time.time()
            # assignment-side pruning only: at probe scale the batch's
            # distinct band signatures (|batch|×bands = 1600) rival any
            # feasible bucket width, so sig-bucketing the bands table
            # cannot prune here (measured: 1299 of 4096 buckets touched,
            # plan-build tax 3.8 s > the 1.5 s flat scan it replaces —
            # incremental_lsh_candidates_bucketed pays only when
            # n_buckets >> |batch|×bands, the 100 TB regime; equality +
            # PartitionFilters pinned in tests instead)
            new_edges = incremental_lsh_candidates(
                banded_signatures(batch), stored_bands
            )
            connected_components_incremental_bucketed(
                tbl,
                new_edges,
                new_nodes=batch.select(F.col("doc_id").alias("node")),
                n_buckets=N_BUCKETS,
                stats=stats,
            ).write.format("noop").mode("overwrite").save()
            t_bkt.append(time.time() - t0)
            _release(spark)

        t_store = []
        sstats: dict = {}
        for _ in range(RUNS):
            t0 = time.time()
            new_edges = incremental_lsh_candidates(
                banded_signatures(batch), stored_bands
            )
            connected_components_incremental_stored(
                cstore,
                new_edges,
                new_nodes=batch.select(F.col("doc_id").alias("node")),
                stats=sstats,
            ).write.format("noop").mode("overwrite").save()
            t_store.append(time.time() - t0)
            _release(spark)

        batch_edges = incremental_lsh_candidates(
            banded_signatures(batch), stored_bands
        ).count()
        payload = connected_components_incremental(
            assign,
            incremental_lsh_candidates(banded_signatures(batch), stored_bands),
            new_nodes=batch.select(F.col("doc_id").alias("node")),
            emit="updates",
        ).localCheckpoint(eager=True)
        n_updates = payload.count()

        # the write-back itself, once per layout (the r11 residual):
        # copy-on-write merge rewrites the table; the equality-delete
        # upsert writes O(payload) — both land the identical state
        flat = cc_assignment_table(
            spark, f"{WORK}/wh_flat_{n}x", "probe", "assign",
            assign=spark.read.parquet(assign_path), n_buckets=N_BUCKETS,
        )
        t0 = time.time()
        flat.merge(payload, key_cols=["node"])
        t_merge = time.time() - t0
        t0 = time.time()
        tbl.upsert_by_key(payload, ["node"])
        t_upsert = time.time() - t0

        tf = sorted(t_full)[len(t_full) // 2]
        tm = sorted(t_maint)[len(t_maint) // 2]
        tb = sorted(t_bkt)[len(t_bkt) // 2]
        ts = sorted(t_store)[len(t_store) // 2]
        print(
            f"{n:>4} {ndocs:>9} {n_edges:>8} {tf:>8.2f} {tm:>8.2f} "
            f"{tb:>8.2f} {ts:>8.2f} {tf / tm:>6.2f} {tf / tb:>6.2f} "
            f"{tf / ts:>6.2f} {t_merge:>8.2f} "
            f"{t_upsert:>9.2f}  {batch_edges}/{n_updates}"
            f"/{stats.get('n_touched_buckets')}of{N_BUCKETS}"
            f" probe={sstats.get('n_probe_buckets')}"
            f" changed={sstats.get('n_changed_buckets')}"
        )
        spark.catalog.clearCache()

    spark.stop()


def main_flood() -> None:
    """--flood: the backfill regime — the batch is an exact-text
    re-crawl of 60% of the stored corpus, every batch doc LSH-collides
    with its stored twin, the touched-label fraction blows past the 0.5
    threshold, and the guard's rebuild branch must beat guard-off
    maintenance (whose batch-derived broadcast state is corpus-sized
    here)."""
    ns = [int(a) for a in sys.argv[2:]] or [4, 16]
    spark = build_session("cc-inc-probe-flood")
    spark.sparkContext.setLogLevel("FATAL")
    shutil.rmtree(WORK, ignore_errors=True)

    one = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    print(
        f"{'N':>4} {'docs':>9} {'batch':>8} {'maint_s':>8} {'rebuild_s':>9} "
        f"{'m/r':>6} {'ppm':>8} chose_rebuild"
    )
    for n in ns:
        base = _replicate(spark, one, n, f"{WORK}/corpus_{n}x")
        # re-crawl: 60% of stored docs reappear verbatim under NEGATIVE
        # ids — every twin pair's min node is the BATCH doc, so every
        # touched stored cluster must relabel (the hardest write-back:
        # remap and changed-row payload are both ~0.6·|corpus|, the
        # regime where broadcasting batch-derived state stops paying)
        batch_path = f"{WORK}/flood_batch_{n}x"
        base.filter(F.col("doc_id") % 5 < 3).select(
            (-(F.col("doc_id") + 1)).alias("doc_id"), "text"
        ).write.mode("overwrite").parquet(batch_path)
        batch = spark.read.parquet(batch_path)

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
        ndocs, nbatch = base.count(), batch.count()

        def run(threshold):
            stats: dict = {}
            times = []
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
                    rebuild_threshold=threshold,
                    stats=stats,
                ).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
                _release(spark)
            return sorted(times)[len(times) // 2], stats

        tm, _ = run(None)  # guard off: forced maintenance
        tr, stats = run(0.5)  # guard on: picks rebuild in this regime
        print(
            f"{n:>4} {ndocs:>9} {nbatch:>8} {tm:>8.2f} {tr:>9.2f} "
            f"{tm / tr:>6.2f} {stats['touched_fraction_ppm']:>8} "
            f"{stats['chose_rebuild']}"
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--flood":
        main_flood()
    else:
        main()
