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
    # r13 (guide §1.2 per-task work): the bounded three-arg levenshtein
    # runs the banded O(max_dist·len) DP and returns -1 past the bound —
    # exactly the rows the filter discarded anyway, so `>= 0` is
    # row-for-row equal to the unbounded `<= max_dist` at a fraction of
    # the per-pair cost (the verify scan IS this operator's hot loop).
    verified = cand.withColumn(
        "dist",
        F.levenshtein(F.col(dirty_name), F.col(clean_name), max_dist),
    ).where(F.col("dist") >= 0)
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
    # bounded-DP levenshtein; `>= 0` ≡ `<= max_dist` (see
    # blocked_fuzzy_match)
    verified = cand.withColumn(
        "dist",
        F.levenshtein(F.col(dirty_name), F.col(clean_name), max_dist),
    ).where(F.col("dist") >= 0)
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


def fellegi_sunter_match(
    dirty: DataFrame,
    clean: DataFrame,
    eq_fields: list[str],
    m_ppm: dict[str, int],
    name_max_dist: int = 2,
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    clean_id: str = "clean_id",
    clean_name: str = "clean_name",
    t_upper: int = 2_302_585,
    t_lower: int = -2_302_585,
) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969) — the
    scoring rung above the two blocking strategies in this module:
    instead of a hard accept at ``levenshtein <= max_dist``, every
    blocked candidate pair gets an AGREEMENT VECTOR over the name
    comparison (edit distance <= ``name_max_dist``) plus the
    ``eq_fields`` equality comparisons, weighted by log-likelihood
    ratios, summed into a match score, and classified against the
    decision thresholds into match / possible / nonmatch — the
    three-way decision rule the paper derives as optimal.

    Parameters the classical way when no labeled data exists:
    ``m_ppm[field]`` (P(agree | true match), parts-per-million) is a
    DECLARED prior (a mangled field still usually agrees), while each
    u-probability (P(agree | non-match)) is ESTIMATED FROM THE DATA on
    deterministic pseudo-random pairs — dirty record d is paired with
    the clean record at id ``(d*7+3) mod n + 1`` (id-keyed, so the
    sample is reproducible and a SQL oracle replays it exactly), and
    the per-field agreement rate in ppm (integer DIV, clamped to
    [1, 999999]) is the u estimate.  Agreement/disagreement weights are
    ``ln(m/u)`` / ``ln((1-m)/(1-u))`` quantized once to integer
    micro-nats (the repo's micro-integer convention: one float
    expression per weight, BIGINT sums after), so scores are
    order-independent exact integers.  The default thresholds are
    ±ln(10) micro-nats: 10:1 posterior odds either way.

    100 TB shape: candidate generation is the same token-blocking join
    as :func:`blocked_fuzzy_match` (skew caveat identical); the u
    estimation adds ONE equi-join over the dirty side against the
    clean side (the pseudo-pairing) and a 1-row aggregate broadcast
    into the scoring; resolve is the same hash-aggregate argmax.

    Returns one row per dirty record that blocked to >= 1 candidate:
    (dirty_id, clean_id, g_name, g_<f>..., score_micro, decision,
    u_name_ppm, u_<f>_ppm...), best candidate = (max score, then min
    clean_id)."""
    fields = ["name"] + list(eq_fields)
    d = dirty.select(
        F.col(dirty_id).alias("__did"),
        F.col(dirty_name).alias("__dname"),
        *[F.col(f).alias(f"__d_{f}") for f in eq_fields],
    )
    c = clean.select(
        F.col(clean_id).alias("__cid"),
        F.col(clean_name).alias("__cname"),
        *[F.col(f).alias(f"__c_{f}") for f in eq_fields],
    )

    def gammas(df: DataFrame) -> DataFrame:
        # bounded-DP levenshtein; `>= 0` ≡ `<= name_max_dist` (see
        # blocked_fuzzy_match)
        out = df.withColumn(
            "g_name",
            (
                F.levenshtein(
                    F.col("__dname"), F.col("__cname"), name_max_dist
                )
                >= 0
            ).cast("long"),
        )
        for f in eq_fields:
            out = out.withColumn(
                f"g_{f}",
                (F.col(f"__d_{f}") == F.col(f"__c_{f}")).cast("long"),
            )
        return out

    # u estimation on the deterministic pseudo-pairs (one per dirty row)
    n_clean = c.agg(F.count(F.lit(1)).alias("__n"))
    pseudo = gammas(
        d.crossJoin(F.broadcast(n_clean))
        .withColumn(
            "__cid", (F.col("__did") * 7 + 3) % F.col("__n") + 1
        )
        .join(c, "__cid")
    )
    u = pseudo.agg(
        F.count(F.lit(1)).alias("__np"),
        *[F.sum(f"g_{f}").alias(f"__a_{f}") for f in fields],
    ).select(
        *[
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(999_999),
                    F.expr(f"__a_{f} * 1000000 DIV __np"),
                ),
            ).alias(f"u_{f}_ppm")
            for f in fields
        ]
    )
    # micro-nat weights from the declared m and the estimated u —
    # each ONE float expression quantized once (engine-stable)
    for f in fields:
        m = int(m_ppm[f])
        if not 0 < m < 1_000_000:
            raise ValueError(f"m_ppm[{f!r}] must be in (0, 1e6) ppm")
        uc = F.col(f"u_{f}_ppm").cast("double") / 1_000_000
        u = u.withColumn(
            f"wa_{f}",
            F.round(
                (F.log(F.lit(m / 1_000_000)) - F.log(uc)) * 1_000_000
            ).cast("long"),
        ).withColumn(
            f"wd_{f}",
            F.round(
                (F.log(F.lit(1 - m / 1_000_000)) - F.log(F.lit(1) - uc))
                * 1_000_000
            ).cast("long"),
        )

    # token blocking (identical to blocked_fuzzy_match) -> gamma -> score.
    # r13 (guide §2.3 "project before the exchange", §8 "decide with
    # small rows"): the blocking join and its dedup used to carry every
    # name/attribute column through the shuffle; generating candidates as
    # bare (dirty_id, clean_id) pairs shuffles 16-byte rows through the
    # distinct and re-attaches the comparison payload once per SURVIVING
    # pair (two id-keyed joins — broadcastable whenever a side fits, and
    # never wider than the old shuffle's own payload).
    d_tok = d.select(
        "__did", F.explode(F.split(F.col("__dname"), " ")).alias("__tok")
    )
    c_tok = c.select(
        "__cid", F.explode(F.split(F.col("__cname"), " ")).alias("__tok")
    )
    cand = (
        d_tok.join(c_tok, "__tok")
        .select("__did", "__cid")
        .distinct()
        .join(d, "__did")
        .join(c, "__cid")
    )
    score = sum(
        (
            F.when(F.col(f"g_{f}") == 1, F.col(f"wa_{f}")).otherwise(
                F.col(f"wd_{f}")
            )
            for f in fields
        ),
        start=F.lit(0),
    )
    scored = (
        gammas(cand)
        .crossJoin(F.broadcast(u))
        .withColumn("score_micro", score.cast("long"))
    )
    # the u estimates are per-run CONSTANTS (one broadcast row): they can
    # never influence the argmax, so they ride along AFTER the aggregate
    # instead of inflating every row of its hash-map input.  (s, nc) is
    # already a total order per __did — cand is distinct on (did, cid) —
    # so the g fields are carried, never compared.
    best = scored.groupBy("__did").agg(
        F.max(
            F.struct(
                F.col("score_micro").alias("s"),
                (-F.col("__cid")).alias("nc"),
                *[F.col(f"g_{f}").alias(f"g_{f}") for f in fields],
            )
        ).alias("m")
    ).crossJoin(
        F.broadcast(u.select(*[f"u_{f}_ppm" for f in fields]))
    )
    decision = (
        F.when(F.col("score_micro") >= t_upper, F.lit("match"))
        .when(F.col("score_micro") <= t_lower, F.lit("nonmatch"))
        .otherwise(F.lit("possible"))
    )
    return best.select(
        F.col("__did").alias(dirty_id),
        (-F.col("m.nc")).cast("long").alias(clean_id),
        *[F.col(f"m.g_{f}").alias(f"g_{f}") for f in fields],
        F.col("m.s").alias("score_micro"),
        *[F.col(f"u_{f}_ppm") for f in fields],
    ).withColumn("decision", decision)
