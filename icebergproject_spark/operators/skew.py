"""Skew mitigation: salted aggregation and salted broadcast-side join.

The reference never hits skew (its keyBy is a low-cardinality composite,
dm/ProcessBrowseLogInfoToDM.scala:71-73) but at 100 TB a handful of hot
keys — one viral product, one bot user — can pin a whole stage on one
task. Two standard remedies, both pure DataFrame compositions:

- **salted_agg**: two-phase aggregate. Phase 1 groups on
  (key, salt=hash(row)%N) so a hot key spreads over N reducers; phase 2
  merges the N partials per key. Only worthwhile for algebraic
  aggregates (sum/count/min/max) whose partials merge losslessly; the
  extra shuffle is tiny (≤ N rows per key).
- **salted_join**: replicate the SMALL side N× (one copy per salt),
  salt the big side's rows randomly-but-deterministically, join on
  (key, salt). Spreads a hot join key over N tasks. Only needed when
  the small side is too big to broadcast — with a broadcast join there
  is no shuffle to skew, so prefer ``F.broadcast`` first (AQE's
  skewJoin handles the sort-merge case automatically; this helper is
  the explicit fallback when AQE can't, e.g. under
  ``spark.sql.adaptive.enabled=false`` or non-splittable stages).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: algebraic merge functions for phase 2 of salted_agg
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregate.

    ``aggs``: {out_col: (fn_name, input_col)} with fn_name in
    sum/count/min/max. Equivalent to ``df.groupBy(keys).agg(...)`` for
    any input, skewed or not — use when one key dominates the data.
    """
    for name, (fn, _c) in aggs.items():
        if fn not in _MERGE and fn != "count":
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1 = [
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(f"__p_{n}")
        for n, (fn, c) in aggs.items()
    ]
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1)
    phase2 = [
        _MERGE[fn](f"__p_{n}").alias(n) for n, (fn, _c) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Semantically identical to ``big.join(small, on, how)`` for inner and
    left joins. Cost: small side shuffles ``salt_buckets``× its size —
    use only when it's too big to broadcast and AQE skew handling is
    unavailable.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = big_s.join(small_s, on + ["__salt"], how)
    return joined.drop("__salt")
