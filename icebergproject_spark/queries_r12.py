"""Round-12 registry batch — completing the incremental tier's
storage/policy parity (VERDICT r11 asks #1 and #3), each at ORACLE
strength:

- ``dedup_clusters_bucketed`` — the BUCKETED STORED ASSIGNMENT measured
  in the correctness gate: the cluster assignment is persisted as a
  lakehouse table hidden-partitioned ``mod16(cluster_id)`` (plain
  modulus, so the oracle can replay the partition arithmetic in SQL),
  the maintenance step reads ONLY the touched-label partitions via
  ``read(partition_values=...)`` — planning-time pruning, visible as
  PartitionFilters (pinned in tests/test_llm.py) — and the MERGE payload
  lands through :meth:`LakehouseTable.upsert_by_key`, ONE atomic
  equality-delete + data-file commit with O(changed + batch) write cost
  and zero table scan (the Iceberg v2 Flink-CDC upsert shape).  The
  head then reads the maintained TABLE back and hash-checks it — plus
  the touched/total bucket counts — against a DuckDB full re-cluster
  over nothing but the parquet fixtures, proving the pruned-read +
  eq-delete-upsert composition loses nothing end-to-end.

- ``dedup_clusters_flood_guard`` — the CC flood guard engaged:
  ``connected_components_incremental(rebuild_threshold=)`` computes the
  touched-cluster fraction (distinct stored labels touched / distinct
  stored labels, exact integer ppm) and falls back to a full re-cluster
  above it.  At the %13 append split the fraction is ~1–2% at every
  fixture SF (measured: 11574 / 9195 / 17772 ppm at sf0.001/0.01/0.1),
  so the guard correctly chooses MAINTAIN at threshold 0.5 with a ≥28×
  margin — the honest nightly-append decision (the rebuild regime is
  exercised by tools/cc_incremental_probe.py --flood and pinned
  branch-equal by test_cc_flood_guard_both_regimes_equal).  The oracle
  recomputes the full re-cluster AND the decision arithmetic in SQL, so
  a hash match proves (a) the fraction/decision replay exactly and
  (b) the output is identical whichever branch the guard takes.

Reference anchor: the reference maintains derived dim state per
micro-batch (dim/DimDataToHBase.scala:79-110) against HBase/Phoenix
key-addressed storage; these heads are the dedup-tier counterpart with
the snapshot table format's equality-delete upsert standing in for the
Phoenix upsert and hidden partitioning for the region layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from icebergproject_spark.queries import Query
from icebergproject_spark.queries_r11 import (
    CC_SPLIT_MOD,
    CC_SPLIT_REM,
    _cc_maintenance_parts,
    _closure_cte,
    _mkdtemp_for_run,
)

# guard threshold: the %13 split touches 1–2% of stored cluster labels
# at every fixture SF (≥28× below 0.5) — the guard must choose MAINTAIN
# deterministically; the flood regime is the probe's --flood arm
CC_FLOOD_THRESHOLD = 0.5
CC_FLOOD_THRESHOLD_PPM = 500_000
CC_BUCKETS = 16


def q_dedup_clusters_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components maintaining a STORED,
    mod16(cluster_id)-partitioned lakehouse assignment: changed-row
    read-out partition-pruned at planning time, write-back one atomic
    equality-delete upsert, final table hash-equal to a full re-cluster
    (plus the replayed touched/total bucket counts)."""
    from icebergproject_spark.llm import dedup

    stored, new_pairs, batch_docs = _cc_maintenance_parts(spark, sf_dir)
    wh = _mkdtemp_for_run("cc_bkt_")
    tbl = dedup.cc_assignment_table(
        spark, wh, "tmp", "assign", assign=stored, n_buckets=CC_BUCKETS
    )
    # total occupied buckets BEFORE the batch (lab_b's in the oracle)
    n_total = (
        tbl.read()
        .select(F.pmod("cluster_id", F.lit(CC_BUCKETS)))
        .distinct()
        .count()
    )
    stats: dict = {}
    dedup.connected_components_incremental_bucketed(
        tbl,
        new_pairs,
        new_nodes=batch_docs,
        n_buckets=CC_BUCKETS,
        apply=True,
        stats=stats,
    )
    merged = tbl.read().select(F.col("node").alias("doc_id"), "cluster_id")
    return merged.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        F.lit(int(stats["n_touched_buckets"]))
        .cast("long")
        .alias("n_touched_buckets"),
        F.lit(int(n_total)).cast("long").alias("n_total_buckets"),
    )


# full-corpus closure + the bucket arithmetic replayed: touched buckets
# = distinct (old_label % 16) over the stored labels whose members'
# full-closure label differs (exactly the relabel map's domain)
ORACLE_DEDUP_CLUSTERS_BUCKETED = f"""
WITH RECURSIVE
{_closure_cte('_a', 'TRUE')},
{_closure_cte('_b', f'doc_id % {CC_SPLIT_MOD} <> {CC_SPLIT_REM}')},
changed AS (
  SELECT DISTINCT b.cluster_id AS old_label
  FROM lab_a a JOIN lab_b b USING (doc_id)
  WHERE a.cluster_id <> b.cluster_id
),
stats AS (
  SELECT
    (SELECT CAST(COUNT(DISTINCT old_label % {CC_BUCKETS}) AS BIGINT)
     FROM changed) AS n_touched_buckets,
    (SELECT CAST(COUNT(DISTINCT cluster_id % {CC_BUCKETS}) AS BIGINT)
     FROM lab_b) AS n_total_buckets
)
SELECT a.doc_id, a.cluster_id,
       COUNT(*) OVER (PARTITION BY a.cluster_id) AS cluster_size,
       stats.n_touched_buckets, stats.n_total_buckets
FROM lab_a a CROSS JOIN stats
"""


def q_dedup_clusters_flood_guard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Flood-guarded incremental dedup-cluster maintenance:
    rebuild_threshold=0.5 computes the touched-cluster fraction in exact
    integer ppm and picks maintain vs rebuild; the decision and fraction
    ship as hash-checked columns alongside the (branch-independent)
    merged assignment."""
    from icebergproject_spark.llm import dedup

    stored, new_pairs, batch_docs = _cc_maintenance_parts(spark, sf_dir)
    stats: dict = {}
    merged = dedup.connected_components_incremental(
        stored,
        new_pairs,
        new_nodes=batch_docs,
        rebuild_threshold=CC_FLOOD_THRESHOLD,
        stats=stats,
    )
    return merged.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        F.lit(int(stats["touched_fraction_ppm"]))
        .cast("long")
        .alias("touched_fraction_ppm"),
        F.lit(1 if stats["chose_rebuild"] else 0)
        .cast("long")
        .alias("chose_rebuild"),
    )


# full-corpus closure + the guard's decision arithmetic: touched stored
# labels = labels (in the base closure) of the batch-touching pairs'
# endpoints ∪ the batch docs; fraction in exact integer ppm at ≥ 0.5
ORACLE_DEDUP_CLUSTERS_FLOOD_GUARD = f"""
WITH RECURSIVE
{_closure_cte('_a', 'TRUE')},
{_closure_cte('_b', f'doc_id % {CC_SPLIT_MOD} <> {CC_SPLIT_REM}')},
touched AS (
  SELECT id_a AS node FROM pairs_a
  WHERE id_a % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
     OR id_b % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
  UNION
  SELECT id_b FROM pairs_a
  WHERE id_a % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
     OR id_b % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
  UNION
  SELECT doc_id FROM documents
  WHERE doc_id % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
),
guard AS (
  SELECT CAST(
    (SELECT COUNT(DISTINCT b.cluster_id)
     FROM lab_b b JOIN touched t ON b.doc_id = t.node) * 1000000
    // GREATEST((SELECT COUNT(DISTINCT cluster_id) FROM lab_b), 1)
  AS BIGINT) AS touched_fraction_ppm
)
SELECT a.doc_id, a.cluster_id,
       COUNT(*) OVER (PARTITION BY a.cluster_id) AS cluster_size,
       guard.touched_fraction_ppm,
       CAST(CASE WHEN guard.touched_fraction_ppm >= {CC_FLOOD_THRESHOLD_PPM}
            THEN 1 ELSE 0 END AS BIGINT) AS chose_rebuild
FROM lab_a a CROSS JOIN guard
"""


def q_dedup_clusters_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ZERO-FULL-SCAN maintenance layout at oracle strength
    (llm/dedup.connected_components_incremental_stored): the assignment
    is node-bucketed (probe prunes on the batch's own node ids), the
    changed-row read-out prunes through the cluster→node-bucket spill
    index, and the write-back is three crash-ordered O(changed) commits
    — no read or write in the whole maintenance path scales with the
    corpus.  The maintained TABLE hash-equals the DuckDB full
    re-cluster, and BOTH pruning widths (probe buckets, changed-scan
    buckets) ship as columns the oracle recomputes from the closures —
    proving not just the answer but the locality arithmetic."""
    from icebergproject_spark.llm import dedup

    stored, new_pairs, batch_docs = _cc_maintenance_parts(spark, sf_dir)
    wh = _mkdtemp_for_run("cc_store_")
    st = dedup.cc_assignment_store(
        spark, wh, "tmp", "cc", assign=stored, n_buckets=CC_BUCKETS
    )
    stats: dict = {}
    dedup.connected_components_incremental_stored(
        st, new_pairs, new_nodes=batch_docs, apply=True, stats=stats
    )
    merged = st.assign.read().select(F.col("node").alias("doc_id"), "cluster_id")
    return merged.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        F.lit(int(stats["n_probe_buckets"])).cast("long").alias(
            "n_probe_buckets"
        ),
        F.lit(int(stats["n_changed_buckets"])).cast("long").alias(
            "n_changed_buckets"
        ),
    )


# full-corpus closure + BOTH pruning widths replayed: probe buckets =
# distinct node-id buckets of the touched set (batch-pair endpoints ∪
# batch docs); changed-scan buckets = distinct buckets of every member
# of a relabeled stored cluster (the spill-index lookup's exact result
# on a freshly-seeded store)
ORACLE_DEDUP_CLUSTERS_STORED = f"""
WITH RECURSIVE
{_closure_cte('_a', 'TRUE')},
{_closure_cte('_b', f'doc_id % {CC_SPLIT_MOD} <> {CC_SPLIT_REM}')},
touched AS (
  SELECT id_a AS node FROM pairs_a
  WHERE id_a % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
     OR id_b % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
  UNION
  SELECT id_b FROM pairs_a
  WHERE id_a % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
     OR id_b % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
  UNION
  SELECT doc_id FROM documents
  WHERE doc_id % {CC_SPLIT_MOD} = {CC_SPLIT_REM}
),
changed AS (
  SELECT DISTINCT b.cluster_id AS old_label
  FROM lab_a a JOIN lab_b b USING (doc_id)
  WHERE a.cluster_id <> b.cluster_id
),
widths AS (
  SELECT
    (SELECT CAST(COUNT(DISTINCT node % {CC_BUCKETS}) AS BIGINT)
     FROM touched) AS n_probe_buckets,
    (SELECT CAST(COUNT(DISTINCT b.doc_id % {CC_BUCKETS}) AS BIGINT)
     FROM lab_b b JOIN changed c ON b.cluster_id = c.old_label)
      AS n_changed_buckets
)
SELECT a.doc_id, a.cluster_id,
       COUNT(*) OVER (PARTITION BY a.cluster_id) AS cluster_size,
       widths.n_probe_buckets, widths.n_changed_buckets
FROM lab_a a CROSS JOIN widths
"""


R12_REGISTRY: dict[str, Query] = {
    "dedup_clusters_bucketed": Query(
        q_dedup_clusters_bucketed, ORACLE_DEDUP_CLUSTERS_BUCKETED
    ),
    "dedup_clusters_flood_guard": Query(
        q_dedup_clusters_flood_guard, ORACLE_DEDUP_CLUSTERS_FLOOD_GUARD
    ),
    "dedup_clusters_stored": Query(
        q_dedup_clusters_stored, ORACLE_DEDUP_CLUSTERS_STORED
    ),
}
