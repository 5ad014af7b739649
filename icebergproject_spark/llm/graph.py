"""Graph analytics over derived relations — PageRank on an integer grid.

Companion to the connected-components operator (llm/dedup.py): where
components answer "which docs form one duplicate cluster", PageRank
answers "which nodes matter" — the standard centrality signal for
link-graph curation (seed selection, crawl prioritization, graph-based
quality weighting a la Common Crawl's harmonic-centrality cut).

**Integer-exact by construction**: classic PageRank is a float fixpoint,
whose sums are order-dependent and therefore engine-unstable.  This
implementation defines the iteration ON AN INTEGER MICRO-GRID:

    r0(v)     = scale                    (10^9 micro-points)
    c(u -> v) = (damping_pct * r(u)) DIV (100 * outdeg(u))
    r'(v)     = (100 - damping_pct) * scale DIV 100  +  SUM c(u -> v)

All quantities are BIGINTs; DIV is floor division; the per-target SUM is
an order-independent integer sum — so K iterations produce bit-identical
ranks on any engine, and the whole computation is ANSI-SQL-replayable by
unrolling the K iterations as CTEs (the repo's established oracle
pattern for iterative algorithms: Lloyd steps, BPE merges).  The floor
in DIV leaks ≤ outdeg(u) micro-points per node per iteration — bounded,
deterministic, and irrelevant at scale 10^9.

100 TB shape: one iteration = one join of the edge list with the rank
vector on ``src`` (co-partition both by ``src`` once and the join is
shuffle-free after the first iteration; the rank vector is |V| rows —
broadcastable when the graph is wide and shallow) plus one shuffle of
contributions by ``dst`` (the unavoidable transpose, partial-aggregated
map-side).  Lineage is cut per iteration with a lazy localCheckpoint,
matching the Lloyd-training pattern (llm/similarity.py).

Dangling nodes (outdeg 0) contribute nothing — their rank leaks rather
than redistributing, the common simplification; symmetrized edge sets
(the registry query's shape) have none by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """K-iteration integer-grid PageRank over ``edges``.

    ``edges``: directed (src, dst) pairs, pre-deduplicated by the caller
    if multi-edges should not multi-count.  Returns (node, rank_micro)
    for every node appearing as a src or dst.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)  # reused every iteration
    )
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("rank_micro")
    )
    ed = e.join(deg, "src")  # (src, dst, outdeg): static across iterations
    ed = ed.localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = ed.join(
            ranks.select(
                F.col("node").alias("src"), F.col("rank_micro").alias("r")
            ),
            "src",
        ).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping_pct} * r) DIV (100 * outdeg)").alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(base) + F.coalesce(F.col("in_rank"), F.lit(0))
            ).cast("long").alias("rank_micro"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_personalized_micro(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """K-iteration PERSONALIZED PageRank on the integer grid: teleport
    mass returns only to the ``seeds`` node set (one column ``node``) —
    the topic-sensitive variant (Haveliwala 2002) used for seed-biased
    crawl prioritization and related-entity expansion: rank measures
    proximity to the seed set, not global centrality.

    Same recurrence as :func:`pagerank_micro` with the teleport term
    restricted: r0(v) = scale·[v ∈ S], and each iteration adds
    ``base`` only for seeds (per-seed scale, not 1/|S|-normalized —
    a positive global rescaling that keeps the ranking and stays
    integral).  Non-seed nodes unreachable from S stay at exactly 0 —
    a useful structural property the tests pin.  Identical 100 TB
    shape and CTE-unrollability as the global variant."""
    if iterations < 1:
        raise ValueError(
            f"pagerank_personalized_micro requires iterations >= 1, "
            f"got {iterations}"
        )
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sd = seeds.select(F.col("node").cast("long").alias("node")).distinct()
    marked = nodes.join(
        sd.withColumn("__seed", F.lit(1)), "node", "left"
    ).select(
        "node", F.coalesce(F.col("__seed"), F.lit(0)).alias("__seed")
    ).localCheckpoint(eager=False)
    base = (100 - damping_pct) * scale // 100
    ranks = marked.select(
        "node",
        (F.col("__seed") * F.lit(scale)).cast("long").alias("rank_micro"),
    )
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = ed.join(
            ranks.select(
                F.col("node").alias("src"), F.col("rank_micro").alias("r")
            ),
            "src",
        ).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping_pct} * r) DIV (100 * outdeg)").alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        ranks = marked.join(summed, "node", "left").select(
            "node",
            (
                F.col("__seed") * F.lit(base)
                + F.coalesce(F.col("in_rank"), F.lit(0))
            ).cast("long").alias("rank_micro"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_micro_history(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> list[DataFrame]:
    """:func:`pagerank_micro`, but returning EVERY iteration's rank
    vector ``[r_0, …, r_K]`` — the stored state that makes exact
    incremental maintenance possible (:func:`pagerank_micro_delta`).
    ``r_K`` is bit-identical to ``pagerank_micro(...)``'s output.  At
    100 TB the history is K+1 |V|-row tables (store partitioned by
    iteration in the lakehouse); K is small (5 here)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = (100 - damping_pct) * scale // 100
    hist = [
        nodes.select("node", F.lit(scale).cast("long").alias("rank_micro"))
    ]
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = ed.join(
            hist[-1].select(
                F.col("node").alias("src"), F.col("rank_micro").alias("r")
            ),
            "src",
        ).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping_pct} * r) DIV (100 * outdeg)").alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        hist.append(
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_rank"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return hist


def pagerank_micro_delta(
    edges_full: DataFrame,
    edges_delta: DataFrame,
    history: list[DataFrame],
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    stats: dict | None = None,
) -> list[DataFrame]:
    """EXACT incremental PageRank maintenance (VERDICT r7 ask #8): when
    an edge-delta batch lands (e.g. drained from a lakehouse table via
    ``incremental_batches``), update the stored K-iteration history to
    what a full recompute over ``edges_full`` would produce — BIT
    IDENTICAL, by incremental view maintenance of the unrolled
    recurrence rather than approximate warm-starting (a warm start
    converges *near* the cold-start fixpoint but not to the same
    integers, so it could not be oracle-checked).

    The insight: ``r_i(v)`` can differ from the stored history only if
    some in-neighbor's ``r_{i-1}`` changed, or an in-edge is new, or an
    in-neighbor's outdeg changed (all new-edge sources).  So the dirty
    set starts at ``D`` = destinations of edges whose src gained
    out-edges (plus brand-new nodes) and grows ONE HOP per iteration:
    ``F_i = N_out(F_{i-1}) ∪ D``.  Each iteration recomputes ranks for
    ``F_i`` only, reading unchanged in-neighbor ranks from the stored
    ``history[i-1]`` — cost O(Σ_i |edges into F_i|), independent of
    graph size for a localized delta, which is the point at 100 TB:
    the nightly crawl-graph delta touches the K-hop neighborhood of
    new links, not the whole web graph.

    ``edges_full`` must be the complete post-delta edge set (old ∪
    delta, deltas strictly additive); ``history`` is the prior run's
    ``pagerank_micro_history`` output (its length fixes K).  Returns
    the updated history; ``[-1]`` is the new rank vector.  When
    ``stats`` is passed, ``stats["frontier_sizes"]`` records |F_i| per
    iteration — the measurable incrementality claim (tests pin that a
    localized delta keeps frontiers ≪ |V|)."""
    iterations = len(history) - 1
    e = edges_full.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    de = edges_delta.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = (100 - damping_pct) * scale // 100
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    delta_srcs = de.select("src").distinct()
    new_nodes = nodes.join(
        history[0].select("node"), "node", "left_anti"
    )
    # dirty seed: every dst an affected source points at (its per-edge
    # contribution changed via outdeg, or the edge itself is new), plus
    # nodes absent from the stored history entirely
    dirty = (
        ed.join(delta_srcs, "src").select(F.col("dst").alias("node"))
        .union(new_nodes.select("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    new_hist = [
        nodes.select("node", F.lit(scale).cast("long").alias("rank_micro"))
    ]
    frontier = dirty
    updated_prev: DataFrame | None = None  # updated rows at level i-1
    for i in range(1, iterations + 1):
        if i > 1:
            frontier = (
                ed.join(
                    frontier.select(F.col("node").alias("src")), "src"
                )
                .select(F.col("dst").alias("node"))
                .union(dirty.select("node"))
                .distinct()
                .localCheckpoint(eager=False)
            )
        # merged r_{i-1}: recomputed frontier rows override the stored
        # history; level 0 is the constant `scale` for every node
        if i == 1:
            r_prev = new_hist[0]
        else:
            r_prev = updated_prev.unionByName(
                history[i - 1].join(
                    updated_prev.select("node"), "node", "left_anti"
                )
            )
        contrib = (
            ed.join(frontier.select(F.col("node").alias("dst")), "dst")
            .join(
                r_prev.select(
                    F.col("node").alias("src"), F.col("rank_micro").alias("r")
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(f"({damping_pct} * r) DIV (100 * outdeg)").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        updated = (
            frontier.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_rank"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
        new_hist.append(
            updated.unionByName(
                history[i].join(updated.select("node"), "node", "left_anti")
            )
        )
        if stats is not None:
            stats.setdefault("frontier_sizes", []).append(frontier.count())
        updated_prev = updated
    return new_hist


def hits_micro(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """K-iteration integer-grid HITS (Kleinberg 1999): hubs point to
    good authorities, authorities are pointed to by good hubs.

    The float fixpoint normalizes by the L2 norm each iteration — an
    order-dependent float sum.  This implementation normalizes by the
    MAX on an integer grid instead:

        a_raw(v) = Σ_{u→v} h(u)          (exact BIGINT sum)
        a(v)     = (a_raw(v) · scale) DIV max_v a_raw(v)
        h_raw(u) = Σ_{u→v} a(v)          (with the NEW a)
        h(u)     = (h_raw(u) · scale) DIV max_u h_raw(u)

    Max-normalization keeps the same ranking as L2 (both are positive
    rescalings) while every quantity stays a BIGINT — K iterations are
    bit-identical on any engine and CTE-unrollable for the oracle.

    Overflow bound: raw ≤ max_degree · scale, and the rescale
    multiplies by ``scale`` before DIV — so max_degree · scale² must
    stay ≪ 2^63.  The 1e6 default grid supports max degree ~9e6; for
    denser graphs at 100 TB, drop ``scale`` (ranking granularity trades
    against headroom) — the recurrence is unchanged.

    100 TB shape mirrors pagerank_micro: per iteration, one broadcast-
    able join of the score vector onto the static (src, dst) edge list
    plus one map-side-combined SUM shuffle; the scalar MAX is a
    single-row broadcast.  Output: (node, hub_micro, auth_micro) for
    every node appearing as src or dst (nodes with no in-edges have
    authority 0; no out-edges, hub 0).
    """
    if iterations < 1:
        raise ValueError(
            f"hits_micro requires iterations >= 1, got {iterations}"
        )
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hubs = nodes.select("node", F.lit(scale).cast("long").alias("s"))

    def _step(scores: DataFrame, join_on: str, emit: str) -> DataFrame:
        raw = (
            e.join(
                scores.select(F.col("node").alias(join_on), "s"), join_on
            )
            .groupBy(F.col(emit).alias("node"))
            .agg(F.sum("s").alias("raw"))
            # referenced twice below (scalar MAX + normalize join) and
            # Spark recomputes both branches of a self-reference —
            # materialize once
            .localCheckpoint(eager=False)
        )
        mx = raw.agg(F.max("raw").alias("m"))
        normed = raw.crossJoin(F.broadcast(mx)).select(
            "node", F.expr(f"CAST((raw * {scale}) DIV m AS BIGINT)").alias("s")
        )
        return nodes.join(normed, "node", "left").select(
            "node", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        )

    auths = None
    for _ in range(iterations):
        auths = _step(hubs, "src", "dst").localCheckpoint(eager=False)
        hubs = _step(auths, "dst", "src").localCheckpoint(eager=False)
    return (
        hubs.select("node", F.col("s").alias("hub_micro"))
        .join(
            auths.select("node", F.col("s").alias("auth_micro")), "node"
        )
        .select("node", "hub_micro", "auth_micro")
    )
