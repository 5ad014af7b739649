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
