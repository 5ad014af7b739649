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
