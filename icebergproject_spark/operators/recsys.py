"""Item-item collaborative filtering — the co-occurrence recommender.

The neighborhood-method recommender (Sarwar et al. 2001; Linden et al.
2003, "Amazon.com recommendations"): two items are similar when the
sets of users who interact with them overlap.  With binary baskets the
natural score is the cosine of the two items' user-incidence vectors,

    sim(a, b) = co(a,b) / sqrt(n_a · n_b)

where ``co`` counts users touching both and ``n_x`` users touching x.
Everything is a COUNT, so the repo's integer-exactness program applies
directly: rank on ``sim² in ppm = co²·10⁶ DIV (n_a·n_b)`` — a pure
BIGINT that orders identically to the cosine (squaring is monotone on
non-negatives) with no float in the pipeline at all.

Scale shape: candidate pairs are generated THROUGH the interaction
table (self-join on user → only co-purchased pairs appear, never the
item×item cross product); a user with B distinct items emits B(B−1)/2
pairs, so production caps pathological baskets (the same guard as the
fuzzy join's blocking-key cap — documented, not silent: see
``max_basket``).  The pair aggregate is one map-side-combined shuffle;
the top-k cut is a per-item window over each item's candidate list
(bounded by co-purchase fan-out, not catalog size).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def item_similarity_topk(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    micro: int = 10**6,
    max_basket: int | None = None,
    emit_dropped_count: bool = False,
) -> DataFrame:
    """Top-``k`` most similar items per item by binary-cosine
    co-occurrence.  ``interactions``: (user, item) events, deduplicated
    internally.  ``max_basket`` drops users with more distinct items
    (the skew cap — a crawler account with 10⁶ items would emit 10¹²
    pairs; None keeps everything, the exact baseline the oracle
    checks).  ``emit_dropped_count`` appends a constant
    ``dropped_baskets`` column (how many users the cap removed) so the
    cap's effect ships as visible data, never a silent truncation.

    Integer-overflow bound: ``sim_ppm = co²·micro DIV (n_a·n_b)`` keeps
    every intermediate in BIGINT only while ``co < √(2⁶³/micro)`` ≈
    3.03e6 co-users at the default ``micro=10⁶`` — past that Spark
    wraps silently where DuckDB raises, the exact engine divergence the
    integer-exactness program exists to avoid.  ``co`` is bounded by
    the largest per-item user count, so corpora within the bound are
    safe by construction; beyond it, shrink ``micro`` (the rank order
    is unchanged — sim² is monotone in co²/(n_a·n_b)).

    Returns (item_a, item_b, co_users, sim_ppm, rank), rank 1..k per
    item_a by (sim desc, co desc, item_b asc) — fully integral and
    deterministic."""
    ui = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).where(
        # NULL users/items can never form a pair (the former self-join's
        # a.u = b.u / a.i < b.i both reject NULL) nor join to the output;
        # dropping them up front keeps the basket aggregate's sizes and
        # the pair generator exactly equal to the join arm's semantics.
        F.col("u").isNotNull() & F.col("i").isNotNull()
    )
    # r13 optimization (guide §2.3 "aggregate before you shuffle", §2.4):
    # the former shape self-joined ui with itself on u — the SAME relation
    # shuffled twice plus a sort-merge join — before the pair aggregate.
    # One groupBy(u) into a SORTED basket array generates the identical
    # pair multiset with ZERO joins: for the element at 0-based position
    # p, its pair partners are exactly the later elements of the sorted
    # array (slice), so (ia < ib) holds by construction and the per-pair
    # multiplicity is the number of users holding both items — the same
    # quantity the join counted.  collect_set replaces the former
    # ui.distinct() + collect_list (one exchange fewer, identical set).
    # Per-task memory: one basket array (8 B per item, bounded by
    # max_basket on the production twin) versus the join arm's B²
    # shuffled rows for the same basket — strictly tighter.
    #
    # The explicit-N repartition matters (guide §2.5 AQE interaction):
    # the basket aggregate is a few MB, so AQE coalesces its shuffle to
    # 1-3 partitions — but the DOWNSTREAM pair explode multiplies rows
    # B(B-1)/2 per basket (13M pairs from 15k baskets at sf0.1), so the
    # byte-based coalesce decision starves the expensive stage of
    # parallelism (measured: the pair aggregate off a 3-partition
    # checkpoint 4.7 s vs 1.0 s off the explicit-width one).  A
    # REPARTITION_BY_NUM exchange is exempt from AQE coalescing and the
    # groupBy reuses its hash partitioning, so the plan still has ONE
    # exchange here — just at the declared width.  N follows the
    # session's shuffle-partition conf (scale-parameterised; at cluster
    # scale the conf is sized to the cluster and the same width is
    # right for the explode).
    n_shuf = int(
        interactions.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    baskets = (
        ui.repartition(n_shuf, "u")
        .groupBy("u")
        .agg(F.sort_array(F.collect_set("i")).alias("items"))
        .localCheckpoint(eager=False)
    )  # consumed by the cap filter/count,
    # the per-item counts, and the pair generator
    dropped = None
    if emit_dropped_count and max_basket is None:
        # No cap ⇒ nothing is ever dropped, but the output schema must
        # be a function of emit_dropped_count ALONE (r9 ADVICE): emit a
        # literal 0 so downstream consumers can always select the column.
        dropped = interactions.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("dropped_baskets")
        )
    if max_basket is not None:
        if emit_dropped_count:
            dropped = baskets.agg(
                F.sum(
                    (F.size("items") > max_basket).cast("long")
                ).alias("dropped_baskets")
            ).select(
                F.coalesce("dropped_baskets", F.lit(0))
                .cast("long")
                .alias("dropped_baskets")
            )
        baskets = baskets.where(F.size("items") <= max_basket)
    ni = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n"))
    co = (
        baskets.select(F.posexplode("items").alias("pos", "ia"), "items")
        .select(
            "ia",
            F.explode(
                F.expr("slice(items, pos + 2, size(items) - pos - 1)")
            ).alias("ib"),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("co"))
        .localCheckpoint(eager=False)  # the expensive pair aggregate is
        # consumed by BOTH direction branches of the union — run it once
    )
    sym = co.select(
        F.col("ia").alias("item_a"), F.col("ib").alias("item_b"), "co"
    ).union(
        co.select(
            F.col("ib").alias("item_a"), F.col("ia").alias("item_b"), "co"
        )
    )
    scored = (
        sym.join(ni.select(F.col("item").alias("item_a"),
                           F.col("n").alias("na")), "item_a")
        .join(ni.select(F.col("item").alias("item_b"),
                        F.col("n").alias("nb")), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("co").cast("long").alias("co_users"),
            F.expr(f"(co * co * {micro}) DIV (na * nb)")
            .cast("long")
            .alias("sim_ppm"),
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("sim_ppm").desc(), F.col("co_users").desc(), F.col("item_b")
    )
    out = (
        # same AQE/explode mismatch as the basket stage, other direction:
        # the window's input is the ~2×|pairs| symmetrised score relation
        # (26M rows at sf0.1) whose upstream aggregate AQE coalesced to a
        # handful of partitions; pre-partitioning by the window key at
        # the declared width keeps the big sort parallel, and the window
        # reuses the partitioning (no second exchange).
        scored.repartition(n_shuf, "item_a")
        .withColumn("rank", F.row_number().over(w).cast("integer"))
        .where(F.col("rank") <= k)
        .select("item_a", "item_b", "co_users", "sim_ppm", "rank")
    )
    if dropped is not None:
        # 1-row scalar — a broadcast nested-loop stamp, not a shuffle
        out = out.crossJoin(F.broadcast(dropped))
    return out
