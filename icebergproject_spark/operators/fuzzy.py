"""Blocked fuzzy matching — the entity-resolution join.

The canonical record-linkage shape (Fellegi & Sunter 1969; surveyed in
Christen 2012): matching a dirty feed against a clean reference catalog
under an edit-distance tolerance.  A naive fuzzy join is all-pairs —
O(|dirty|·|clean|) Levenshtein calls, catastrophic at scale — so the
standard architecture is BLOCK → VERIFY → RESOLVE:

1. **Block**: generate candidate pairs that agree on a cheap key (here:
   share at least one whitespace token — the inverted-index join).  A
   pair that shares no token can't be within a small edit distance of a
   multi-token string unless an entire token was mangled, which the
   caller's tolerance excludes; blocking keys are a recall contract the
   caller picks.
2. **Verify**: exact Levenshtein on the candidates only; keep pairs
   within ``max_dist``.
3. **Resolve**: best match per dirty record — smallest distance, ties to
   the smallest clean id (deterministic).

100 TB shape: the blocking join shuffles on the token key (skewed
stop-word-like tokens are the known hazard — cap or drop
ultra-frequent blocking keys in production, the same guard as the
prefix-filter dedup's rarity ordering); verification is a linear scan
of candidates; the resolve step is a hash-aggregate argmax
(max(struct(...)), no window).  Levenshtein runs JVM-side
(``F.levenshtein`` — no Python in the hot path) and renders identically
in DuckDB's ``levenshtein()``, so the whole operator is
oracle-checkable: distances are integers, the argmax tie-break total.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def blocked_fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    max_dist: int = 2,
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    clean_id: str = "clean_id",
    clean_name: str = "clean_name",
) -> DataFrame:
    """Match each ``dirty`` record to its best ``clean`` catalog entry
    under token blocking + Levenshtein ``max_dist``.

    Returns (dirty_id, dirty_name, clean_id, clean_name, dist) — one row
    per dirty record that found at least one candidate within tolerance;
    best = (min dist, then min clean_id)."""
    d_tok = dirty.select(
        dirty_id,
        dirty_name,
        F.explode(F.split(F.col(dirty_name), " ")).alias("__tok"),
    )
    c_tok = clean.select(
        clean_id,
        clean_name,
        F.explode(F.split(F.col(clean_name), " ")).alias("__tok"),
    )
    cand = d_tok.join(c_tok, "__tok").select(
        dirty_id, dirty_name, clean_id, clean_name
    ).distinct()
    verified = cand.withColumn(
        "dist", F.levenshtein(F.col(dirty_name), F.col(clean_name))
    ).where(F.col("dist") <= max_dist)
    best = verified.groupBy(dirty_id, dirty_name).agg(
        F.max(
            F.struct(
                (-F.col("dist")).alias("nd"),
                (-F.col(clean_id)).alias("nc"),
                F.col(clean_name).alias("cn"),
            )
        ).alias("m")
    )
    return best.select(
        dirty_id,
        dirty_name,
        (-F.col("m.nc")).cast("long").alias(clean_id),
        F.col("m.cn").alias(clean_name),
        (-F.col("m.nd")).cast("integer").alias("dist"),
    )


def snm_fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    window: int = 8,
    max_dist: int = 2,
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    clean_id: str = "clean_id",
    clean_name: str = "clean_name",
) -> DataFrame:
    """Sorted-Neighborhood blocking (Hernández & Stolfo 1995) — the
    OTHER classic ER candidate generator: pool both sides, sort by the
    name key, and consider only record pairs within ``window`` rank
    positions, then Levenshtein-verify and best-match resolve exactly
    like :func:`blocked_fuzzy_match`.

    Complementary trade-off to token blocking: SNM needs no
    tokenizable structure (works on opaque strings) and its candidate
    count is EXACTLY bounded by n·(2w+1) regardless of key-frequency
    skew — but a corruption in the string's PREFIX moves the record far
    away in sort order and the window misses it (token blocking
    survives any single-token corruption; run both and union for
    recall, the standard multi-pass SNM).

    100 TB shape: the sort is :func:`llm.sharding.exact_global_rank`
    (range-partitioned, no global window funnel); the neighborhood
    pairing is 2w equi-joins on (rank + offset) expressed as one
    exploded offset array — shuffle-friendly, no range join; verify and
    resolve as in token blocking.

    Returns (dirty_id, dirty_name, clean_id, clean_name, dist)."""
    from icebergproject_spark.llm.sharding import exact_global_rank

    pool = dirty.select(
        F.lit(0).alias("__role"),
        F.col(dirty_id).alias("__id"),
        F.col(dirty_name).alias("__name"),
    ).unionByName(
        clean.select(
            F.lit(1).alias("__role"),
            F.col(clean_id).alias("__id"),
            F.col(clean_name).alias("__name"),
        )
    )
    ranked, _ = exact_global_rank(
        pool, [F.col("__name"), F.col("__role"), F.col("__id")]
    )
    ranked = ranked.localCheckpoint(eager=False)  # both join sides
    d = ranked.where(F.col("__role") == 0).select(
        F.col("__id").alias(dirty_id),
        F.col("__name").alias(dirty_name),
        F.col("__rn").alias("__rd"),
    )
    c = ranked.where(F.col("__role") == 1).select(
        F.col("__id").alias(clean_id),
        F.col("__name").alias(clean_name),
        F.col("__rn").alias("__rc"),
    )
    offsets = F.explode(
        F.array(*[F.lit(o) for o in range(-window, window + 1)])
    )
    cand = (
        d.withColumn("__off", offsets)
        .withColumn("__rc", F.col("__rd") + F.col("__off"))
        .join(c, "__rc")
        .select(dirty_id, dirty_name, clean_id, clean_name)
        .distinct()
    )
    verified = cand.withColumn(
        "dist", F.levenshtein(F.col(dirty_name), F.col(clean_name))
    ).where(F.col("dist") <= max_dist)
    best = verified.groupBy(dirty_id, dirty_name).agg(
        F.max(
            F.struct(
                (-F.col("dist")).alias("nd"),
                (-F.col(clean_id)).alias("nc"),
                F.col(clean_name).alias("cn"),
            )
        ).alias("m")
    )
    return best.select(
        dirty_id,
        dirty_name,
        (-F.col("m.nc")).cast("long").alias(clean_id),
        F.col("m.cn").alias(clean_name),
        (-F.col("m.nd")).cast("integer").alias("dist"),
    )
