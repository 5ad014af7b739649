"""Physical-plan guardrails — fail fast if a query regresses into an
extra shuffle, loses a broadcast, or drops a pushed-down filter.

These mirror PLANS.md: the numbers asserted here are the plan shapes the
100 TB design depends on (SCALE.md), not incidental; loosening one should
be a conscious decision, not a silent regression.
"""

from __future__ import annotations

import re

import pytest

from icebergproject_spark.queries import REGISTRY


def _executed_plan(spark, sf_dir: str, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    # executedPlan is pre-AQE-finalization but Exchange/Broadcast/pushdown
    # structure is already decided
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, node: str) -> int:
    return len(re.findall(rf"\b{node}\b", plan))


@pytest.mark.parametrize(
    "name,max_exchanges,min_broadcasts",
    [
        # r13 RECALIBRATION (conscious, per the module docstring): the
        # fixture loader now spreads the five single-row-group
        # fact/corpus scans (lineitem/orders/events/documents/embeddings)
        # to the session's core count with one explicit hash-repartition
        # per scan — a 1-task scan otherwise serializes every map above
        # it (tables._SPREAD_KEYS; measured −21% over 19 heads,
        # OPTIMIZATION_r13.md).  Each affected pin below moved by exactly
        # +1 plain Exchange per spread-table scan instance in its plan
        # (dq_audit's 11 independent aggregates re-scan spread tables 12
        # more times, hence +12); broadcasts are unchanged or higher.
        # At production input sizes the loader adds no exchange (the
        # spread only fires when the file is below one scan split).
        # dim enrichment: broadcast joins only, zero shuffles
        ("user_login_wide", 0, 2),
        ("browse_wide", 0, 1),
        # routing: broadcast config join, zero shuffles
        ("route_fact", 0, 1),
        # single-aggregate queries: exactly one shuffle
        ("user_points", 2, 0),
        ("product_visit_10s", 2, 0),
        ("dedup_exact", 2, 0),
        # TPC-H analogs: star joins broadcast their dims
        ("shipping_priority", 2, 1),
        ("local_supplier_volume", 2, 2),
        ("forecast_revenue", 2, 0),
        # round-2 continuation: substring dedup is 3 aggregates + 2
        # broadcast-sized side relations over a checkpointed (id, hash)
        # stream; a 4th Exchange means the window build leaked a shuffle
        ("duplicate_spans", 3, 2),
        # variant path: 2 shuffles is the floor for a COUNT(DISTINCT)
        # (partial on (grp, k), then re-aggregate on grp); a 3rd means
        # the variant parse stopped pushing into the first projection
        ("events_props_variant", 3, 0),
        # value-RANGE window: single hash shuffle by customer
        ("rolling_30d_revenue", 2, 0),
        # round 8: integer-grid PCA projection and the real-decode arm
        # are PURE MAPS — components/rasters ride in closures or
        # literals, so ANY shuffle is a regression
        ("embedding_pca_sql", 1, 0),
        ("multimodal_decode", 1, 0),
        # round 8, session 4: the graph heads cut the kNN edge
        # derivation with one localCheckpoint, so the visible plan is
        # the triangle/wedge join chain only (before the cut the gemm
        # replayed per branch: 22 and 48 shuffles respectively); the
        # remaining joins on the small edge list broadcast
        ("knn_triangles", 2, 4),
        ("link_prediction", 4, 3),
        # blocked fuzzy ER: token-block join shuffles; the 64-name clean
        # catalog broadcasts
        ("fuzzy_join_parts", 2, 1),
        # spine join + one per-user window pass
        ("gapfill_interpolate", 3, 1),
        # rank path (1 range exchange) + three lag self-joins + union
        # aggregate; a 10th exchange means the checkpointed rank relation
        # stopped being reused across lags
        ("events_autocorr", 9, 0),
        # robust-stats batch: daily rollup + pair join + grouped median /
        # one prefix-sum range exchange + argmax / 9-group digit profile
        ("trend_theil_sen", 4, 1),
        ("events_cusum", 4, 1),
        ("benford_audit", 4, 1),
        # DBSCAN: checkpointed gemm pairs; degree/core/border joins
        ("density_clusters", 8, 3),
        # item CF: a 6th exchange means the checkpointed pair aggregate
        # stopped being reused across the two union directions
        ("item_similarity", 5, 0),
        # eval: both ANN arms behind one checkpointed join — the visible
        # plan is just the two metric aggregates
        ("retrieval_eval", 2, 0),
        # SNM: rank path + offset equi-join + resolve
        ("fuzzy_join_snm", 3, 0),
        # KS: value-grain aggregate + two prefix-sum range exchanges +
        # argmax; per-group totals and midpoint broadcast
        ("events_ks_drift", 8, 5),
        # OLS: one hash aggregate over the daily rollup
        ("trend_ols", 3, 0),
        # attribution: ONE shuffle on user (the as-of union window)
        ("purchase_attribution", 3, 0),
        # modularity: checkpointed edge/label relations, three aggregates
        ("community_modularity", 3, 0),
        # PMI: doc-word distinct + pair aggregate + top-k; vocab broadcast
        ("pmi_collocations", 3, 4),
        # Gini: one range exchange (rank path) + final aggregate
        ("revenue_gini", 2, 1),
        # round-8 heads not yet pinned: integer-grid graph iterations sit
        # behind lineage cuts (visible plan = final joins only); the
        # prefix filter broadcasts its size/df side relations
        ("pagerank_weighted", 0, 0),
        ("label_propagation", 0, 0),
        ("pagerank_personalized", 0, 0),
        ("pagerank_sql", 0, 0),
        ("pagerank_delta", 2, 0),
        ("graph_hits", 2, 0),
        # r12 recalibration: the PPJoin-style sorted-array verify swaps
        # the expand-and-regroup stage (2 broadcast joins + a 34M-row
        # groupBy at sf0.1 — the head's variance source) for ONE
        # collect_list groupBy shuffle + 2 keyed joins
        ("dedup_prefix_filter", 1, 7),
        ("hll_audit", 3, 3),
        ("hdr_quantiles", 3, 4),
        ("lm_bigram_score", 6, 3),
        ("doc_lsa_sql", 1, 1),
        ("bm25_topk", 4, 4),
        # round-9 production twins: the ANN edge list is materialized
        # with TRUE stats (queries_r9._materialized_with_stats), so the
        # consuming joins broadcast exactly like the exact-gemm twins —
        # a lost broadcast here means the stats refresh regressed
        ("knn_triangles_ann", 2, 6),
        ("link_prediction_ann", 4, 5),
        ("label_propagation_ann", 0, 0),
        ("community_modularity_ann", 3, 0),
        ("knn_edge_recall", 3, 3),
        ("knn_edge_recall_multi", 3, 3),
        # capped CF: uncapped's 5 — the r13 basket-array shape turned
        # the cap from a sizes-aggregate join into a size(items) filter,
        # so only the 1-row dropped-count broadcast remains
        ("item_similarity_capped", 5, 1),
        ("pagerank_delta_local", 2, 0),
        # LSH-DBSCAN: 3 visible shuffles vs the exact arm's 8 — the
        # ε-pair generator is materialized, core/border joins broadcast
        ("density_clusters_lsh", 3, 4),
        # sketch audits: distinct + per-group window (KMV), distinct +
        # broadcast bit-set probe join (Bloom)
        ("kmv_audit", 4, 1),
        ("bloom_audit", 5, 4),
        # BFS: lineage-cut rounds — visible plan is the final level join
        ("graph_bfs_levels", 2, 0),
        # DQ suite: 11 independent single-row aggregates unioned — one
        # group-less aggregate pair per check (partial+final), FK parent
        # key sets broadcast
        ("dq_audit", 25, 6),
        # unrolled-round graph walks behind lineage cuts: the visible
        # plan is the final membership / distance join
        ("graph_kcore", 2, 0),
        ("graph_shortest_paths", 2, 0),
        # split + leakage audit: checkpointed assignment consumed by
        # counts/total/pair-audit; minhash band joins broadcast
        ("dataset_split", 0, 5),
        ("leakage_safe_split", 5, 2),
        # multi-table LPA sits fully behind the materialized edge list;
        # k-center is k map-only scans of the checkpointed grid — ANY
        # shuffle is a regression
        ("label_propagation_ann4", 0, 0),
        ("coreset_kcenter", 0, 0),
        # round-10 ANN evidence heads: every derived relation (gated
        # buckets, true pairs, prev graph) is materialized with true
        # stats, so the only plain exchanges left are the 1-row scalar
        # aggregates and the metric nets to <= 0 — a rising number here
        # means a stats refresh or broadcast regressed
        ("knn_edge_recall_dial", 1, 5),
        ("neardup_pair_recall", 0, 8),
        ("ann_graph_incremental", 1, 5),
        ("ann_graph_incremental_multi", 0, 8),
        # round-11 ANN policy heads: the guard head's decision is two
        # driver-side counts (literal columns in-plan), so its visible
        # plan is just the rebuilt graph + the 1-row stats broadcast;
        # the bucketed head's stored-base scan must stay partition-
        # pruned (the PartitionFilters pin lives in
        # test_graph_retrieval.py::test_ann_incremental_pruned_stored_base)
        ("ann_graph_flood_guard", 3, 1),
        ("ann_graph_incremental_bucketed", 0, 5),
        # round-11 dedup-tier maintenance: the stored assignment is
        # touched by broadcast joins only (touched-label read-out,
        # relabel write-back) — the remaining plain exchanges are the
        # O(batch) canonicalization/distincts + the output window
        # (broadcasts dropped 5 → 4 when the touched-node probe gained
        # its O(batch) checkpoint: the checkpointed relation feeds two
        # consumers through ONE BroadcastExchange)
        ("dedup_clusters_incremental", 0, 4),
        # the MERGE-payload twin: same shape minus the output window
        ("dedup_clusters_upserts", 0, 4),
        # round-12 dedup maintenance heads.  bucketed/stored return the
        # READ-BACK of the maintained table (the maintenance ran inside
        # the head as side-effecting commits): one window shuffle, one
        # broadcast of the stats row, and NEVER a sort-merge — a
        # sort-merge appearing here would mean the assignment read-back
        # lost its layout
        ("dedup_clusters_bucketed", 1, 1),
        ("dedup_clusters_stored", 1, 1),
        # the guard head's maintain branch: stored side touched by
        # broadcast joins only (same contract as dedup_clusters_incremental)
        ("dedup_clusters_flood_guard", 0, 4),
        # cluster-assignment consumers: the driver-path union-find
        # result is broadcast into the nodes join (r11 fix — before it,
        # the RDD-backed result's unknown stats silently sort-merged,
        # shuffling the O(corpus) nodes side; dataset_split −2.1s)
        ("dedup_clusters", 1, 1),
        ("dedup_clusters_lsh_sql", 1, 1),
        ("dataset_split", 0, 5),
        # round-13 fourth-batch heads.  bm25_index_incremental returns
        # the SERVE over the maintained tables (maintenance committed
        # inside the head): both stored reads partition-pruned, query/
        # df/stats sides all broadcast, never a sort-merge.  The
        # heavy-hitter audit's plain shuffles are the two tok group-bys
        # (summary + exact audit arm) plus the bounded merge/top
        # windows — production drops the exact arm.  Fellegi-Sunter:
        # pseudo-pair u-estimation + weight row + query side are all
        # broadcasts; the one aggregation is the per-dirty argmax.
        ("bm25_index_incremental", 0, 3),
        ("heavy_hitters_audit", 9, 2),
        ("er_fellegi_sunter", 0, 5),
        # EWMA chart: one shuffle to the daily rollup, one to the
        # per-group ordered window — the bounded LAG chain adds none
        ("events_ewma_control", 3, 0),
        # Heaps curve: the two-pass range shapes (rank + prefix sum)
        # cost bounded shuffles; its two sort-merge joins are the
        # big×big first-occurrence⋈doc-rank joins, correctly NOT
        # broadcast (vocab-sized × corpus-sized)
        ("heaps_vocab_curve", 6, 4),
    ],
)
def test_shuffle_and_broadcast_budget(spark, sf_dir, name, max_exchanges, min_broadcasts):
    plan = _executed_plan(spark, sf_dir, name)
    # NOTE on the metric: \bExchange\b matches only PLAIN exchanges
    # (no word boundary inside "BroadcastExchange"), so the subtraction
    # makes this `plain_shuffles - broadcasts`, not plain shuffles — a
    # historical quirk every budget below is calibrated to.  It remains
    # a valid regression detector: an added shuffle raises it by 1 AND a
    # lost broadcast raises it by 1 (with min_broadcasts as the second
    # guard).  Recalibrating 66 pins to the raw count buys nothing.
    shuffles = _count(plan, "Exchange") - _count(plan, "BroadcastExchange")
    assert shuffles <= max_exchanges, plan
    assert _count(plan, "BroadcastExchange") >= min_broadcasts, plan


def test_incremental_lsh_candidates_broadcasts_batch_side(spark, sf_dir):
    """The incremental dedup edge generator must meet the O(corpus)
    stored-bands relation with a broadcast of the (bounded) batch bands
    on BOTH joins — a sort-merge here would shuffle the stored band-
    signature table to absorb a nightly batch."""
    import pyspark.sql.functions as F

    from icebergproject_spark.llm import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    is_b = F.col("doc_id") % 13 == 0
    df = dedup.incremental_lsh_candidates(
        dedup.banded_signatures(docs.where(is_b)),
        dedup.banded_signatures(docs.where(~is_b)),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _count(plan, "BroadcastHashJoin") == 2, plan
    assert _count(plan, "SortMergeJoin") == 0, plan


def test_cc_incremental_assign_side_never_sort_merges(spark, sf_dir):
    """The incremental connected-components head must not sort-merge
    anywhere: the O(corpus) stored assignment meets the batch only
    through broadcast hash joins (a sort-merge here would shuffle the
    whole assignment to absorb a batch — the exact failure the operator
    exists to avoid at 100 TB)."""
    plan = _executed_plan(spark, sf_dir, "dedup_clusters_incremental")
    assert _count(plan, "SortMergeJoin") == 0, plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "ods_browselog")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 4-column projection must not read the full events schema."""
    plan = _executed_plan(spark, sf_dir, "ods_browselog")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "value" not in read_cols  # unused wide column pruned
    assert read_cols <= {"event_id", "ts", "user_id", "props", "event_type"}


def test_topk_uses_partial_limits_not_global_sort(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "top_parts_by_revenue")
    assert "WindowGroupLimit" in plan  # per-partition top-k before shuffle


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a filtered dim must prune fact
    partitions at RUNTIME from the dim filter (dynamicpruning in the
    scan) — the mechanism that makes star-schema date filters cheap at
    100 TB without the fact query mentioning dates at all."""
    import pyspark.sql.functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_path)

    dim = spark.range(1995, 2002).select(
        F.col("id").alias("d_year"),
        F.when(F.col("id") == 1996, "target").otherwise("other").alias("tag"),
    )
    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim, fact["o_year"] == dim["d_year"]).filter(
        F.col("tag") == "target"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    want = orders.filter(F.col("o_year") == 1996).count()
    assert joined.count() == want


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE skew-join handling: a heavily skewed sort-merge join must show
    skew=true in the final adaptive plan — the runtime answer to hot keys
    that no static plan can size for."""
    import pyspark.sql.functions as F

    left = (
        spark.range(0, 200_000)
        .select(F.when(F.col("id") % 100 < 99, 0).otherwise(F.col("id")).alias("k"),
                F.col("id").alias("payload"))
    )
    right = spark.range(0, 50_000).select(F.col("id").alias("k"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k")
        # AQE finalizes per-execution: run THIS Dataset's own plan, then
        # read it back (a write/count would spawn a fresh QueryExecution)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning: with a selective build side and
    broadcast disabled (forcing a shuffle join, the 100 TB fact⋈fact
    shape), Catalyst injects a might_contain() filter on the probe scan —
    most of the fact table is dropped before the shuffle."""
    import pyspark.sql.functions as F

    from icebergproject_spark.session import enable_runtime_bloom_filters

    enable_runtime_bloom_filters(spark, application_side_threshold="0")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()
        # and the result is still correct vs the broadcast plan
        n = j.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    assert n and n[0]["count"] > 0
