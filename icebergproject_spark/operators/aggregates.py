"""Aggregation operators (SURVEY §2.5 A1, A2).

A1 — the reference's offline points aggregate:
``SELECT log_time AS dt, user_id, product_name,
sum(cast(obtain_points AS int)) AS total_points FROM DWS_BROWSE_INFO
GROUP BY log_time, user_id, product_name``
(offlineanls/ProcessUserPoints.scala:35-44).

A2 — the DM tumbling-window count: keyBy(first$second$product), 10-second
tumbling window, emit count (dm/ProcessBrowseLogInfoToDM.scala:71-96). The
reference uses processing time; we standardize on event time (deterministic
and testable — SURVEY §2.5 note), grouping by the three key columns
directly instead of concat+split (F6 both directions collapses away).

Scale: both are hash aggregates with map-side partial aggregation —
Spark's HashAggregate emits partial sums/counts before the shuffle, so the
shuffle carries one row per (partition × group), not per input row. At
100 TB with low-cardinality keys this is the optimal plan; skewed keys are
handled by AQE skew mitigation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def group_sum_points(
    df: DataFrame,
    group_cols: list[str],
    points_col: str = "obtain_points",
    out_col: str = "total_points",
) -> DataFrame:
    """A1: group-by SUM with string→int cast (F12)."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(points_col).cast("int")).alias(out_col)
    )


def tumbling_window_count(
    df: DataFrame,
    ts_col: str | Column,
    key_cols: list[str],
    window_length: str = "10 seconds",
    count_col: str = "product_cnt",
) -> DataFrame:
    """A2: per-key tumbling-window count.

    Output matches the reference's ProductVisitInfo shape
    (dm/ProcessBrowseLogInfoToDM.scala:77-96, utils/Beans.scala:21):
    window_date ('yyyy-MM-dd' of window start), window_start, window_end
    ('yyyy-MM-dd HH:mm:ss' strings), the key columns, and the count.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    w = F.window(ts, window_length)
    return (
        df.groupBy(w.alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias(count_col))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_date"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            *key_cols,
            F.col(count_col),
        )
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Time-series OHLC downsampling: per (group, time bucket) —
    open / high / low / close / volume / integer-micro turnover — the
    canonical resample of tick data into bars (and of any event stream
    into per-interval summaries).

    Determinism: open/close are ``min_by``/``max_by`` on the UNIQUE
    composite order key (ts, id) — hash aggregates with map-side
    partial combine, not windows, so no per-partition sort of the full
    stream and no ties; the value sum is micro-integer-quantized per
    row BEFORE aggregation (order-independent BIGINT sum, the repo's
    convention); high/low/volume are plain min/max/count.  The bucket
    renders as a string (no raw timestamps in oracle outputs).

    Scale shape: ONE shuffle on (group, bucket) with partial
    aggregation map-side — the natural 100 TB rollup; nothing else.
    """
    b = F.date_format(
        F.date_trunc(bucket, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    ).alias("bucket_start")
    key = F.struct(F.col(ts_col), F.col(id_col))
    return (
        df.select(
            *group_cols,
            b,
            F.col(value_col).alias("__v"),
            key.alias("__k"),
            F.round(F.col(value_col) * 1_000_000)
            .cast("bigint")
            .alias("__vi"),
        )
        .groupBy(*group_cols, "bucket_start")
        .agg(
            F.round(F.expr("min_by(__v, __k)"), 6).alias("open"),
            F.round(F.max("__v"), 6).alias("high"),
            F.round(F.min("__v"), 6).alias("low"),
            F.round(F.expr("max_by(__v, __k)"), 6).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.sum("__vi").alias("turnover_micro"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    z: int = 3,
) -> DataFrame:
    """Robust per-group outlier detection: median / MAD (median absolute
    deviation), the standard heavy-tail-safe alternative to mean/stddev
    z-scores (Leys et al. 2013) — data-quality triage for event streams
    and numeric columns at ingestion.

    A row is an outlier iff ``|v − median| > z · MAD`` (groups with
    MAD = 0 are skipped: every deviation would be infinitely many MADs).
    Exact interpolated medians (``percentile``, not approx) so the
    result is engine-reproducible; the z comparison operates on the same
    doubles both engines derive, and the reported ``mad_z`` is rounded
    to 6 places per the repo's float-output convention.

    Scale shape: two grouped exact percentiles (each one shuffle on the
    group key, sort-based within groups) + two BROADCAST joins of the
    per-group stats back onto the rows — the data is never reshuffled.
    At 100 TB swap ``percentile`` for ``percentile_approx`` and the plan
    shape is unchanged (documented tradeoff; the exact form is the
    oracle contract).

    Output: id_cols + group_cols + (value rounded, mad_z rounded).
    """
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr("percentile(__adev, 0.5)").alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), group_cols)
        .filter(
            (F.col("__mad") > 0) & (F.col("__adev") > F.lit(z) * F.col("__mad"))
        )
        .select(
            *id_cols,
            *group_cols,
            F.round(F.col(value_col), 6).alias("value_r"),
            F.round(F.col("__adev") / F.col("__mad"), 6).alias("mad_z"),
        )
    )


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 6,
) -> DataFrame:
    """Log-linear (HdrHistogram-style) quantile sketch over a POSITIVE
    integer column: bucket id = ``k·2^sub_bits + sub`` where ``k`` is
    the bit length of the value minus one (its octave) and ``sub`` the
    linear sub-bucket inside the octave — pure integer arithmetic (bit
    length via ``bin()``, shifts, integer division), so every engine
    derives the identical sketch.  Relative error of any quantile read
    from the sketch is bounded by ``2^-sub_bits`` (default 1/64 ≈
    1.6%); values below ``2^sub_bits`` are represented EXACTLY (the
    sub-bucket width collapses to 1).

    This is the quantile member of the repo's mergeable-sketch family
    (count_min_audit = frequency, hll_audit = cardinality): the sketch
    is just (group, bucket) → count, so partial sketches merge by
    ADDING counts — map-side combine does it for free, and the shuffle
    carries ≤ ~64·64 small rows per group regardless of input size.

    Rows with value < 1 are dropped (positive-domain sketch; a
    mirrored negative sketch is the standard extension, out of scope).

    Output: group_cols + (bucket, cnt, lo, hi) with [lo, hi] the
    bucket's integer value bounds (hi of the top sub-bucket = 2^(k+1)).
    """
    s = 1 << sub_bits
    v = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).cast("long").alias("__v"),
    ).filter(F.col("__v") >= 1)
    b = (
        v.withColumn("__k", (F.length(F.bin(F.col("__v"))) - 1).cast("int"))
        .withColumn("__p2k", F.expr("shiftleft(CAST(1 AS BIGINT), __k)"))
        .withColumn(
            "__sub",
            F.expr(f"shiftleft(__v - __p2k, {sub_bits}) DIV __p2k").cast("int"),
        )
        .withColumn("bucket", (F.col("__k") * s + F.col("__sub")).cast("int"))
    )
    counts = b.groupBy(*group_cols, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.withColumn("__k", F.expr(f"bucket DIV {s}"))
        .withColumn("__sub", F.expr(f"bucket % {s}"))
        .withColumn("__p2k", F.expr("shiftleft(CAST(1 AS BIGINT), __k)"))
        .withColumn(
            "lo", F.expr(f"__p2k + (__sub * __p2k) DIV {s}").cast("long")
        )
        .withColumn(
            "hi", F.expr(f"__p2k + ((__sub + 1) * __p2k) DIV {s}").cast("long")
        )
        .select(*group_cols, "bucket", "cnt", "lo", "hi")
    )


def hdr_quantiles_audit(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: tuple[int, ...] = (1, 5, 25, 50, 75, 95, 99),
    sub_bits: int = 6,
) -> DataFrame:
    """Quantile-sketch estimator audit — the quantile sibling of
    ``llm/text.count_min_audit`` / ``hll_audit``: read the requested
    percentiles from the :func:`hdr_sketch` and ship them NEXT TO the
    exact rank-based quantiles as hash-checked data, plus the measured
    error in basis points and the containment invariant.

    Definitions (all integer, engine-identical):

    - target rank ``r = ceil(q·n/100) = (q·n + 99) DIV 100`` (type-1 /
      lower empirical quantile);
    - estimated bucket = first bucket whose cumulative count reaches
      ``r`` (bucket id is monotone in the value, so this is exactly the
      bucket holding the rank-r value);
    - ``est = (lo + hi) DIV 2``; ``err_bp = (10000·|est − exact|) DIV
      exact``; ``in_bucket = [lo ≤ exact ≤ hi]`` — 1 by construction
      (the theorem shipped as data; ``≤ hi`` inclusive because the
      sub-2^sub_bits collapse makes lo = hi = exact for small values).

    Scale shape: the SKETCH arm is one map + one tiny groupBy (map-side
    combined, ≤ ~4k buckets/group on the wire) + a per-group running
    sum over those buckets — this is the 100 TB production path.  The
    EXACT arm (per-group full sort for row_number) exists only to
    measure the estimator against truth, exactly as hll_audit's
    exact_distinct does.

    Output: (group, q_pct, exact, est, err_bp, in_bucket) — names
    suffixed by the caller's aliasing.
    """
    spark = df.sparkSession
    # the (g, v) projection feeds FOUR consumers (sketch, n, ranked,
    # and targets via n); Spark re-executes shared subtrees per branch
    # (no cross-branch exchange reuse), so checkpoint the 2-column
    # projection once instead of scanning the source four times
    v = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .filter(F.col("__v") >= 1)
        .localCheckpoint(eager=True)
    )
    sk = hdr_sketch(v, "__v", ["g"], sub_bits=sub_bits)
    cum = sk.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("g")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    n = v.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    qdf = spark.createDataFrame(
        [(int(q),) for q in quantiles], "q_pct int"
    )
    targets = n.crossJoin(F.broadcast(qdf)).select(
        "g", "q_pct", F.expr("(q_pct * n + 99) DIV 100").alias("r")
    )
    est = (
        cum.join(F.broadcast(targets), "g")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("g", "q_pct")
        .agg(
            F.min_by(F.col("lo"), F.col("bucket")).alias("lo"),
            F.min_by(F.col("hi"), F.col("bucket")).alias("hi"),
        )
        .select(
            "g",
            "q_pct",
            F.expr("(lo + hi) DIV 2").cast("long").alias("est"),
            "lo",
            "hi",
        )
    )
    ranked = v.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("__v"))
    )
    tg = targets.select(
        F.col("g").alias("__tg"), "q_pct", F.col("r").alias("rn")
    )
    exact = ranked.join(
        F.broadcast(tg),
        (ranked["g"] == tg["__tg"]) & (ranked["rn"] == tg["rn"]),
    ).select(ranked["g"], "q_pct", F.col("__v").alias("exact"))
    return est.join(exact, ["g", "q_pct"]).select(
        "g",
        "q_pct",
        F.col("exact"),
        F.col("est"),
        F.expr("(10000 * abs(est - exact)) DIV exact").cast("long").alias(
            "err_bp"
        ),
        F.when(
            (F.col("exact") >= F.col("lo")) & (F.col("exact") <= F.col("hi")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("in_bucket"),
    )


def lag_autocorr(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    order_exprs: list[Column],
    lags: tuple[int, ...] = (1, 2, 3),
    quant: int = 100,
) -> DataFrame:
    """Exact lag-k autocorrelation per group — the time-series
    seasonality/persistence diagnostic (the first panel of any ACF
    plot), computed distributedly with NO per-group global window sort.

    The series is quantized ONCE (``xq = ROUND(value·quant)`` as
    BIGINT): Pearson over the integer series needs only the six exact
    partial sums (n, Σx, Σy, Σxy, Σx², Σy²), which are order-independent
    BIGINTs — so the result is engine-exact (the quantity_price_corr
    pattern extended to self-joined lagged pairs).  The final
    correlation is a single double expression over the exact sums,
    rounded to 1e-6.

    Ordering uses :func:`llm.sharding.exact_global_rank` over
    ``group_cols + order_exprs`` — group-major, so ranks within a group
    are consecutive and lag-k pairs are a plain equi-join on
    ``(group, rank + k)``; at 100 TB no stage ever sorts more than one
    range partition (a low-cardinality group column would otherwise
    funnel the whole table through a handful of window partitions).

    Overflow bound: Σx² ≤ n·(max·quant)² must stay below 2^63 — at
    quant=100 that is ~9e8 rows per group at value≈500; beyond that,
    center on an integer pre-mean or drop ``quant``.

    Returns one row per (group, lag): (``*group_cols``, lag, n_pairs,
    autocorr) with autocorr NULL when a side has zero variance.
    """
    from icebergproject_spark.llm.sharding import exact_global_rank

    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lag_autocorr requires lags >= 1, got {lags!r}")
    q = df.withColumn(
        "__xq", F.expr(f"CAST(ROUND({value_col} * {quant}) AS BIGINT)")
    )
    ranked, _ = exact_global_rank(
        q, [F.col(c) for c in group_cols] + order_exprs
    )
    ranked = ranked.select(*group_cols, "__rn", "__xq").localCheckpoint(
        eager=False  # consumed once per lag on both join sides
    )
    left = ranked.select(
        *group_cols, F.col("__rn"), F.col("__xq").alias("x")
    )
    per_lag = []
    for k in lags:
        right = ranked.select(
            *group_cols,
            (F.col("__rn") - k).alias("__rn"),
            F.col("__xq").alias("y"),
        )
        pairs = left.join(right, [*group_cols, "__rn"])
        per_lag.append(
            pairs.groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
            )
            .withColumn("lag", F.lit(k).cast("integer"))
        )
    u = per_lag[0]
    for p in per_lag[1:]:
        u = u.unionByName(p)
    # identical expression text on the oracle side — double arithmetic
    # over exact BIGINTs renders the same in both engines
    return u.select(
        *group_cols,
        "lag",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.expr(
            "ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / NULLIF(SQRT(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
            "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " * SQRT(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
            "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6)"
        ).alias("autocorr"),
    )


def theil_sen_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per group: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i), x_i < x_j — the standard
    outlier-resistant alternative to OLS for drift/trend monitoring
    (29.3% breakdown point vs OLS's zero).

    ``x_col`` must be integer-valued (day index, epoch day, rank) and
    unique per group; ``y_col`` integer-valued (counts, quantized
    values) — every slope is then one exact integer division rendered
    identically across engines, and the exact interpolated median
    (the mad_outliers contract) is engine-stable on those doubles.

    Scale shape: the pair join is O(points²) PER GROUP — intended for
    PRE-AGGREGATED series (daily/hourly rollups: bounded by days², not
    rows²).  For long series switch to the repeated-median or a
    pair-sampling variant; this operator is the exact baseline tier.

    Returns (``*group_cols``, n_pairs, slope) — slope rounded 1e-6.
    """
    a = df.select(*group_cols, F.col(x_col).alias("__xa"), F.col(y_col).alias("__ya"))
    b = df.select(*group_cols, F.col(x_col).alias("__xb"), F.col(y_col).alias("__yb"))
    pairs = a.join(b, group_cols).where(F.col("__xa") < F.col("__xb"))
    slope = (
        (F.col("__yb") - F.col("__ya")).cast("double")
        / (F.col("__xb") - F.col("__xa")).cast("double")
    )
    return (
        pairs.withColumn("__s", slope)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.expr("percentile(__s, 0.5)"), 6).alias("slope"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    order_exprs: list[Column],
    tiebreak_expr: str,
    payload_cols: list[tuple[str, str]] | None = None,
    quant: int = 100,
) -> DataFrame:
    """Single-changepoint estimate per group via the CUSUM argmax
    (Page 1954; the max-|CUSUM| location is the classic mean-shift
    changepoint estimator and the backbone of drift detection on
    ingestion pipelines).

    Exact-integer construction: with ``x`` the quant-grid series,
    ``S_t`` its prefix sum, ``n``/``S_n`` the group totals, the
    centered statistic is ``D_t = n·S_t − t·S_n`` (the ×n-scaled CUSUM
    — same argmax, no division).  The trick that keeps it ONE pass:
    ``D_t`` is itself the prefix sum of the per-row value
    ``n·x_i − S_n``, so a single :func:`llm.sharding.exact_prefix_sum`
    over the (group, order) range partitioning produces it without any
    per-group global window.  The argmax is a hash-aggregate
    ``max(struct(|D|, tiebreak))`` — deterministic, no sort.

    Overflow bound: |D_t| ≤ n·Σ|x| ≤ n²·max|x|·quant must stay below
    2^63 — n up to ~4e8 rows per group at value≈500, quant=100; shrink
    ``quant`` for longer groups.

    ``tiebreak_expr``: SQL expression over ``df``'s columns, unique per
    row within a group, whose MAX among |D| ties picks the canonical
    row (e.g. ``-event_id`` → earliest id wins).  ``payload_cols``:
    (alias, sql_expr) pairs carried through to describe the changepoint
    row (they ride in the argmax struct AFTER the unique tiebreak, so
    they never influence the comparison).

    Returns one row per group: (``*group_cols``, n, dmax, *payload).
    """
    from icebergproject_spark.llm.sharding import exact_prefix_sum

    payload_cols = payload_cols or []
    q = df.withColumn(
        "__xq", F.expr(f"CAST(ROUND({value_col} * {quant}) AS BIGINT)")
    )
    totals = q.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__xq").alias("__sn"),
    )
    centered = q.join(F.broadcast(totals), group_cols).withColumn(
        "__v", F.col("__n") * F.col("__xq") - F.col("__sn")
    )
    cum = exact_prefix_sum(
        centered, "__v", order_exprs, group_cols=group_cols, sum_col="__d"
    )
    struct_fields = [
        F.abs(F.col("__d")).alias("ad"),
        F.expr(tiebreak_expr).alias("tb"),
    ] + [F.expr(expr).alias(alias) for alias, expr in payload_cols]
    best = cum.groupBy(*group_cols).agg(
        F.max(F.struct(*struct_fields)).alias("m"),
        F.max("__n").alias("n"),  # constant within the group
    )
    return best.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("m.ad").cast("long").alias("dmax"),
        *[F.col(f"m.{alias}").alias(alias) for alias, _ in payload_cols],
    )


def benford_profile(
    df: DataFrame,
    value_col: str,
    micro: int = 10**6,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    fabricated-data / unit-drift audit for financial-style columns
    (Nigrini 2012): natural multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); a flat or spiked profile flags synthetic or
    corrupted feeds.

    Engine-exact: values go to integer cents (``ROUND(v·100)``), the
    first digit comes from the integer's decimal string (no float
    log10 — exact at powers of ten), shares are integer ppm via
    truncating division, and the per-digit chi-square term
    ``(obs−exp)² DIV exp`` stays integral; the Benford expectation is
    quantized once per digit from ``ln``'s identical rendering (the
    micro-nat pattern).  Non-positive values are excluded (no leading
    digit).  One hash aggregate over 9 groups + a one-row broadcast —
    nothing about this changes at 100 TB.

    Returns 9 rows: (digit, cnt, obs_ppm, exp_ppm, chi2_term).
    """
    digits = (
        df.select(
            F.expr(
                f"CAST(ROUND({value_col} * 100) AS BIGINT)"
            ).alias("__c")
        )
        .where(F.col("__c") > 0)
        .select(
            F.expr(
                "CAST(substring(CAST(__c AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("obs_ppm", F.expr(f"(cnt * {micro}) DIV __tot"))
        .withColumn(
            "exp_ppm",
            F.expr(
                f"CAST(ROUND({micro} * ln(1 + 1.0 / digit) / ln(10)) AS BIGINT)"
            ),
        )
        .select(
            "digit",
            "cnt",
            F.col("obs_ppm").cast("long").alias("obs_ppm"),
            "exp_ppm",
            F.expr(
                "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) DIV exp_ppm"
            ).cast("long").alias("chi2_term"),
        )
    )


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact per-group OLS line from integer partial sums — the
    least-squares counterpart to :func:`theil_sen_trend`, so pipelines
    can ship BOTH trends and read their divergence as an outlier signal
    (OLS bends toward bursts, Theil-Sen does not).

    ``x_col``/``y_col`` integer-valued: the five sums (n, Σx, Σy, Σxy,
    Σx²) are exact order-independent BIGINTs; slope and intercept are
    single double expressions over them (identical rendering both
    engines), rounded 1e-6.  One map-side-combined hash aggregate —
    nothing changes at any scale.  Zero-variance x (single point /
    vertical stack) yields NULL slope via the nullif guard.

    Returns (``*group_cols``, n, slope, intercept)."""
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x_col)).alias("sx"),
        F.sum(F.col(y_col)).alias("sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("sxx"),
    )
    slope_expr = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
    )
    return sums.selectExpr(
        *group_cols,
        "n",
        f"ROUND({slope_expr}, 6) AS slope",
        f"ROUND((CAST(sy AS DOUBLE) - ({slope_expr}) * CAST(sx AS DOUBLE))"
        " / CAST(n AS DOUBLE), 6) AS intercept",
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    ts_col: str,
    quant: int = 100,
    micro: int = 10**6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per group between
    the group's FIRST and SECOND time halves (split at the midpoint of
    its epoch-millis span) — the standard nonparametric
    distribution-shift audit (did the value distribution change, not
    just its mean — the CUSUM head's complement).

    Exact-integer construction: with per-half cumulative counts c1/c2
    and totals n1/n2 over the quant-grid value order,

        D = max |c1/n1 − c2/n2|  =  max |c1·n2 − c2·n1| / (n1·n2)

    — the numerator is an exact BIGINT (cross-multiplication, the
    repo's float-threshold rule), so the argmax value and the final
    ``ks_micro = D_num·micro DIV (n1·n2)`` are engine-identical.
    Overflow: n1·n2 < 2^63 ⇒ fine to ~3e9 rows per group.

    Scale shape: one hash aggregate to (group, value) granularity, two
    range-partitioned prefix sums (:func:`llm.sharding
    .exact_prefix_sum` — no per-group window funnel), one broadcast of
    the per-group totals, one argmax hash aggregate.  Groups with an
    empty half are omitted (KS undefined).

    Returns (``*group_cols``, n1, n2, ks_micro, ks_at_q) — ``ks_at_q``
    the quant-grid value where the gap is attained (ties → smallest).
    """
    from icebergproject_spark.llm.sharding import exact_prefix_sum

    q = df.select(
        *group_cols,
        F.unix_millis(F.col(ts_col)).alias("__ms"),
        F.expr(f"CAST(ROUND({value_col} * {quant}) AS BIGINT)").alias("__xq"),
    )
    rng = q.groupBy(*group_cols).agg(
        F.expr("(MIN(__ms) + MAX(__ms)) DIV 2").alias("__mid")
    )
    tagged = q.join(F.broadcast(rng), group_cols).withColumn(
        "__h", F.when(F.col("__ms") <= F.col("__mid"), 1).otherwise(0)
    )
    ns = tagged.groupBy(*group_cols).agg(
        F.sum("__h").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("__h")).cast("long").alias("n2"),
    )
    counts = tagged.groupBy(*group_cols, "__xq").agg(
        F.sum("__h").cast("long").alias("__d1"),
        (F.count(F.lit(1)) - F.sum("__h")).cast("long").alias("__d2"),
    )
    c1 = exact_prefix_sum(
        counts, "__d1", [F.col("__xq")], group_cols=group_cols, sum_col="__c1"
    )
    c2 = exact_prefix_sum(
        c1, "__d2", [F.col("__xq")], group_cols=group_cols, sum_col="__c2"
    )
    scored = c2.join(F.broadcast(ns), group_cols).withColumn(
        "__dnum",
        F.abs(F.col("__c1") * F.col("n2") - F.col("__c2") * F.col("n1")),
    )
    best = scored.groupBy(*group_cols).agg(
        F.max(
            F.struct(F.col("__dnum"), (-F.col("__xq")).alias("nx"))
        ).alias("m")
    )
    return (
        best.join(ns, group_cols)
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            *group_cols,
            "n1",
            "n2",
            F.expr(f"CAST((m.__dnum * {micro}) DIV (n1 * n2) AS BIGINT)").alias(
                "ks_micro"
            ),
            (-F.col("m.nx")).cast("long").alias("ks_at_q"),
        )
    )


def gini_index(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    micro: int = 10**6,
) -> DataFrame:
    """Exact Gini concentration index per group over a non-negative
    INTEGER value column (cents, counts) — the inequality audit behind
    'top-x% of customers drive y% of revenue' (the revenue_pareto
    head's scalar summary), and a drift signal for corpus source
    concentration.

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  x_(i) ascending

    Ranks come from :func:`llm.sharding.exact_global_rank` over
    (group, value, id) — group-major total order, per-group rank =
    global rank − the group's min rank + 1, so no per-group window
    funnel; every term is an exact BIGINT and the result one truncating
    division to micro units.  Overflow: n·max_rank·max_x < 2^63.

    The micro scaling runs in TWO stages of 10³ (quotient carried, then
    the remainder rescaled — exactly (G_num·10⁶) DIV d without ever
    forming G_num·10⁶, which overflows int64 once n·Σx exceeds ~9e12;
    G_num ≥ 0 by the Chebyshev sum inequality, so truncation is
    floor on both engines).  Remaining bound: n·Σx·10³ < 2^63.

    Returns (``*group_cols``, n, total, gini_micro); groups with zero
    total are omitted (Gini undefined)."""
    from icebergproject_spark.llm.sharding import exact_global_rank

    ranked, _ = exact_global_rank(
        df.select(*group_cols, F.col(value_col).alias("__x"),
                  F.col(id_col).alias("__id")),
        [F.col(c) for c in group_cols] + [F.col("__x"), F.col("__id")],
    )
    base = ranked.groupBy(*group_cols).agg(
        F.min("__rn").alias("__r0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("total"),
        F.sum(F.col("__rn") * F.col("__x")).alias("__rs"),
    )
    # per-group Σ i·x = Σ (rn − r0 + 1)·x = __rs − (r0 − 1)·total
    gnum = "(2 * (__rs - (__r0 - 1) * total) - (n + 1) * total)"
    half = int(micro**0.5)
    return base.where(F.col("total") > 0).select(
        *group_cols,
        "n",
        "total",
        F.expr(
            f"CAST((({gnum} * {half}) DIV (n * total)) * {half}"
            f" + ((({gnum} * {half}) % (n * total)) * {half})"
            f"   DIV (n * total) AS BIGINT)"
        ).alias("gini_micro"),
    )


def ewma_control(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    date_col: str = "ts",
    window: int = 8,
    quant: int = 100,
) -> DataFrame:
    """EWMA control chart (Roberts 1959) — the ONLINE-monitoring member
    of the drift family (cusum_changepoint = retrospective single shift,
    ks_drift = window-vs-window distribution): per group, the daily
    value series smoothed by an exponentially-weighted moving average
    with alpha = 1/4, and each day's residual against its own smoothed
    history flagged when it exceeds half the smoothed level.

    Exact-integer formulation (no float recurrence, so any engine
    replays it bit-for-bit): alpha = 1/4 makes the lag-i weight
    (3/4)^i; scaling through by 4^(window-1) gives the integer weight
    w_i = 3^i * 4^(window-1-i), so over the last ``window`` PRESENT
    days the EWMA is the rational  num/den  with
    num = sum w_i * x_{t-i}  and  den = sum w_i  over available lags —
    both BIGINT sums of a bounded LAG chain (series heads with < window history renormalize
    automatically because den only counts present lags).  The emitted
    smoothed value is the integer quotient, and the alarm rule is
    cross-multiplied (|x*den - num| * 2 > num, i.e. residual > half the
    EWMA level) so no division ever happens in a comparison.

    100 TB shape: one shuffle to the daily rollup, then a per-group
    ordered window over days (days per group is small and bounded by
    retention); the LAG chain is ``window`` column expressions inside
    one window spec — no self-joins, no iteration.

    Output: group_cols + (day, value_q, ewma_q, resid_q, alarm)."""
    day = F.date_format(date_col, "yyyy-MM-dd").alias("day")
    daily = (
        df.groupBy(*group_cols, day)
        .agg(
            F.sum(F.round(F.col(value_col) * quant).cast("long")).alias(
                "value_q"
            )
        )
    )
    w = Window.partitionBy(*group_cols).orderBy("day")
    num = F.lit(0)
    den = F.lit(0)
    for i in range(window):
        lag_i = F.lag("value_q", i).over(w)
        weight = 3 ** i * 4 ** (window - 1 - i)
        num = num + F.coalesce(lag_i * weight, F.lit(0))
        den = den + F.when(lag_i.isNotNull(), F.lit(weight)).otherwise(0)
    resid = F.abs(
        F.col("value_q") * F.col("den") - F.col("num")
    )  # scaled by den
    return (
        daily.withColumn("num", num.cast("long"))
        .withColumn("den", den.cast("long"))
        .withColumn("ewma_q", F.expr("num DIV den"))
        .withColumn("resid_q", F.expr("abs(value_q - (num DIV den))"))
        .withColumn(
            "alarm",
            (resid * 2 > F.col("num")).cast("long"),
        )
        .select(*group_cols, "day", "value_q", "ewma_q", "resid_q", "alarm")
    )
