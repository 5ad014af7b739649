"""Round-13 second registry batch — surplus after the VERDICT r12 asks:

- ``bm25_index_incremental`` — the retrieval tier joins the stored-state
  maintenance arc (ANN graph r10/r11, CC assignment r12, LSH bands r13):
  a BM25 inverted index as three lakehouse tables (term-bucketed
  postings with denormalized doc lengths, additively-merged df, 1-row
  corpus stats) is built from the base corpus and MAINTAINED through an
  append batch — O(batch) tokenize + append + vocab-sized additive
  merges, never a corpus re-scan — then serves top-5 for the fixed
  query workload reading ONLY the query terms' buckets (pure-Python
  xxhash64 planning + O(touched) listing).  The DuckDB oracle rebuilds
  the scoring from the raw corpus from scratch (the bm25_topk CTE
  chain) and recomputes the three index aggregates, so one hash match
  proves maintain==rebuild for scores AND index state.
- ``heavy_hitters_audit`` — parallel SpaceSaving / Misra-Gries clip
  merge (Agarwal et al. 2013 mergeable summaries), the TOP-K member of
  the sketch family: per-part clipped summaries (≤ k rows each) merge
  by addition into global estimates with the one-sided guarantee
  ``est ≤ exact ≤ est + Σ t_p`` — emitted as hash-checked DATA per
  top-20 term next to the exact counts.  This is the hot-key detector
  that feeds the skew policies (salting, AQE skew-join).

Reference anchor: the reference's serving tier maintains state
incrementally per micro-batch (offlineanls/ProcessUserPoints.scala:
52-58); no retrieval/sketch tier exists there — these extend the
LLM-pipeline extension set the build brief grades as first-class.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from icebergproject_spark.queries import Query, _t
from icebergproject_spark.queries_r7 import BM25_QUERIES, _bm25_ctes
from icebergproject_spark.queries_r11 import CC_SPLIT_MOD, CC_SPLIT_REM

#: heavy-hitter sketch parameters (8 parts × 32 counters; audit top-20)
HH_PARTS = 8
HH_K = 32
HH_TOP = 20


def q_bm25_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the stored BM25 index through an append batch, then
    serve the fixed query workload from the MAINTAINED tables only.
    The corpus splits on the same %13 seam as the CC/LSH incremental
    heads (base = %13 != 0 seeds the index, the %13 == 0 slice arrives
    as the append).  Emits the served top-5 per query PLUS the three
    maintained index aggregates (n_docs, total_dl, n_terms) as proof
    columns — the oracle recomputes scores and aggregates from the raw
    corpus, so the hash checks the additive df/stats merges, the
    doc-disjoint postings appends, and the bucket-pruned serve path in
    one pass."""
    from icebergproject_spark.llm.index import BM25IndexStore
    from icebergproject_spark.queries_r11 import _mkdtemp_for_run

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    in_batch = F.col("doc_id") % CC_SPLIT_MOD == CC_SPLIT_REM
    # 64 term buckets: the workload's ~11 distinct terms touch ≤ 11
    # directories however large the postings table grows
    store = BM25IndexStore(
        spark, _mkdtemp_for_run("bm25_idx_"), "tmp", "bm25", n_buckets=64
    )
    store.append_batch(docs.where(~in_batch))
    store.append_batch(docs.where(in_batch))
    n_docs, total_dl, n_terms = store.stats()
    return store.query_topk(BM25_QUERIES, k=5).select(
        "query_id",
        "rank",
        "doc_id",
        "score_micro",
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.lit(total_dl).cast("long").alias("total_dl"),
        F.lit(n_terms).cast("long").alias("n_terms"),
    )


# the oracle is the from-scratch rebuild: the bm25_topk scoring chain
# over the FULL corpus (identical CTEs to ORACLE_BM25_TOPK) plus the
# three index aggregates recomputed from the same chain's dfreq/stats
ORACLE_BM25_INDEX_INCREMENTAL = f"""
WITH {_bm25_ctes(BM25_QUERIES)},
agg AS (
  SELECT CAST(stats.n AS BIGINT) AS n_docs,
         CAST(stats.total_dl AS BIGINT) AS total_dl,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM dfreq) AS n_terms
  FROM stats
)
SELECT query_id, rank, doc_id, score_micro, n_docs, total_dl, n_terms
FROM (
  SELECT query_id, doc_id, score_micro,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC
         ) AS rank
  FROM tot
) CROSS JOIN agg
WHERE rank <= 5
"""


def q_heavy_hitters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms by the merged clip summary, audited against
    exact counts (llm/text.heavy_hitters_audit)."""
    from icebergproject_spark.llm.text import heavy_hitters_audit

    docs = _t(spark, sf_dir, "documents")
    return heavy_hitters_audit(
        docs, n_parts=HH_PARTS, k=HH_K, top_n=HH_TOP
    )


# identical arithmetic in DuckDB: doc_id is non-negative at every SF,
# so plain % replays pmod (the documented mod-replay convention)
ORACLE_HEAVY_HITTERS_AUDIT = f"""
WITH tok AS (
  SELECT doc_id % {HH_PARTS} AS p,
         UNNEST(string_split(text, ' ')) AS term
  FROM documents
),
pc AS (SELECT p, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
thr AS (
  SELECT p,
         MAX(CASE WHEN rn = {HH_K + 1} THEN c ELSE 0 END) AS t_p
  FROM (
    SELECT p, c,
           ROW_NUMBER() OVER (
             PARTITION BY p ORDER BY c DESC, term ASC
           ) AS rn
    FROM pc
  ) GROUP BY p
),
bnd AS (SELECT CAST(SUM(t_p) AS BIGINT) AS clip_bound FROM thr),
summ AS (
  SELECT term, CAST(SUM(c - t_p) AS BIGINT) AS est
  FROM pc JOIN thr USING (p)
  WHERE c > t_p
  GROUP BY term
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY term
),
top AS (
  SELECT term, est,
         ROW_NUMBER() OVER (ORDER BY est DESC, term ASC) AS rank
  FROM summ
)
SELECT rank, top.term, est, exact_cnt,
       exact_cnt - est AS err,
       clip_bound,
       CAST(CASE WHEN est <= exact_cnt
                  AND exact_cnt - est <= clip_bound
             THEN 1 ELSE 0 END AS BIGINT) AS ok
FROM top
JOIN exact ON top.term = exact.term
CROSS JOIN bnd
WHERE rank <= {HH_TOP}
"""


R13B_REGISTRY: dict[str, Query] = {
    "bm25_index_incremental": Query(
        q_bm25_index_incremental, ORACLE_BM25_INDEX_INCREMENTAL
    ),
    "heavy_hitters_audit": Query(
        q_heavy_hitters_audit, ORACLE_HEAVY_HITTERS_AUDIT
    ),
}


# ---------------------------------------------------------------------------
# er_fellegi_sunter — probabilistic record linkage over the dirty-parts feed
# ---------------------------------------------------------------------------

#: declared m-probabilities (P(agree | match), ppm) — the classical
#: no-training-data priors; u-probabilities are estimated from the data
FS_M_PPM = {"name": 900_000, "brand": 950_000, "type": 950_000,
            "size": 950_000}


def q_er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage (operators/fuzzy
    .fellegi_sunter_match) on the SAME dirty feed as fuzzy_join_parts /
    fuzzy_join_snm — the ER family's third rung: token blocking
    generates candidates, each pair gets an agreement vector (name
    edit-distance <= 2; brand/container/size equality), weights are
    ln(m/u) micro-nats with u ESTIMATED from deterministic
    id-keyed pseudo-random pairs, scores are exact BIGINT sums, and
    the best candidate per dirty record is classified match / possible
    / nonmatch at +/- ln(10).  The oracle replays the entire chain —
    feed, pseudo-pairs, u ppm, weights, blocking, scoring, argmax,
    decision — so the hash checks the parameter ESTIMATION arithmetic,
    not just the scoring."""
    from icebergproject_spark.operators.fuzzy import fellegi_sunter_match
    from icebergproject_spark.queries_r8b import _dirty_parts

    parts = _t(spark, sf_dir, "part")
    attrs = parts.select(
        F.col("p_partkey").alias("dirty_id"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
    )
    # the dirty feed is a 5% SLICE linked against the FULL catalog (the
    # realistic linkage shape: incoming batch << reference).  Unlike
    # fuzzy_join_parts' distinct-name catalog, the clean side here must
    # be the full ROW set (the attribute comparisons need per-record
    # brand/type/size), and the fixture's two-token small-vocab names
    # make token blocking quadratic-ish in the dirty count — the slice
    # bounds candidates, the catalog stays whole
    dirty = (
        _dirty_parts(spark, sf_dir)
        .where(F.col("dirty_id") % 20 == 0)
        .join(attrs, "dirty_id")
    )
    clean = parts.select(
        F.col("p_partkey").alias("clean_id"),
        F.col("p_name").alias("clean_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
    )
    return fellegi_sunter_match(
        dirty, clean, eq_fields=["brand", "type", "size"],
        m_ppm=FS_M_PPM,
    )


def _fs_oracle() -> str:
    """Oracle for er_fellegi_sunter: float literals for the declared m
    arms are interpolated via repr() of the SAME Python arithmetic the
    Spark arm evaluates (1 - 900000/1e6 != 0.1 in binary), so both
    engines quantize identical doubles."""
    fields = ["name", "brand", "type", "size"]
    g_exprs = {
        "name": "CAST(levenshtein(dirty_name, clean_name) <= 2 AS BIGINT)",
        "brand": "CAST(d_brand = c_brand AS BIGINT)",
        "type": "CAST(d_type = c_type AS BIGINT)",
        "size": "CAST(d_size = c_size AS BIGINT)",
    }
    u_cols = ",\n         ".join(
        f"CAST(GREATEST(1, LEAST(999999,"
        f" SUM(g_{f}) * 1000000 // COUNT(*))) AS BIGINT) AS u_{f}_ppm"
        for f in fields
    )
    w_cols = ",\n         ".join(
        f"CAST(ROUND((LN({FS_M_PPM[f] / 1_000_000!r})"
        f" - LN(u_{f}_ppm / 1000000.0)) * 1000000) AS BIGINT) AS wa_{f},\n"
        f"         CAST(ROUND((LN({1 - FS_M_PPM[f] / 1_000_000!r})"
        f" - LN(1 - u_{f}_ppm / 1000000.0)) * 1000000) AS BIGINT) AS wd_{f}"
        for f in fields
    )
    score = " + ".join(
        f"CASE WHEN g_{f} = 1 THEN wa_{f} ELSE wd_{f} END" for f in fields
    )
    best_struct = ", ".join(
        ["'s': score_micro", "'nc': -clean_id"]
        + [f"'g_{f}': g_{f}" for f in fields]
        + [f"'u_{f}': u_{f}_ppm" for f in fields]
    )
    gsel = ",\n       ".join(f"m.g_{f} AS g_{f}" for f in fields)
    usel = ",\n       ".join(f"m.u_{f} AS u_{f}_ppm" for f in fields)
    pseudo_g = ",\n         ".join(
        f"{g_exprs[f]} AS g_{f}" for f in fields
    )
    cand_g = ",\n         ".join(f"{g_exprs[f]} AS g_{f}" for f in fields)
    return f"""
WITH base AS (
  SELECT p_partkey AS dirty_id, p_name,
         CAST(p_partkey % length(p_name) + 1 AS INT) AS p0
  FROM part
),
dirty0 AS (
  SELECT dirty_id,
         concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1))
           AS dirty_name
  FROM (
    SELECT dirty_id, p_name,
           CASE WHEN substring(p_name, p0, 1) = ' ' THEN p0 + 1 ELSE p0 END
             AS pos
    FROM base
  )
),
d AS (
  SELECT dirty_id, dirty_name,
         p_brand AS d_brand, p_type AS d_type, p_size AS d_size
  FROM dirty0 JOIN part ON p_partkey = dirty_id
  WHERE dirty_id % 20 = 0
),
c AS (
  SELECT p_partkey AS clean_id, p_name AS clean_name,
         p_brand AS c_brand, p_type AS c_type, p_size AS c_size
  FROM part
),
n AS (SELECT COUNT(*) AS n FROM c),
pseudo AS (
  SELECT {pseudo_g}
  FROM d CROSS JOIN n
  JOIN c ON c.clean_id = (d.dirty_id * 7 + 3) % n.n + 1
),
u AS (
  SELECT {u_cols}
  FROM pseudo
),
w AS (
  SELECT u.*,
         {w_cols}
  FROM u
),
dt AS (
  SELECT d.*, UNNEST(string_split(dirty_name, ' ')) AS tok FROM d
),
ct AS (
  SELECT c.*, UNNEST(string_split(clean_name, ' ')) AS tok FROM c
),
cand AS (
  SELECT DISTINCT d.dirty_id, d.dirty_name, d.d_brand, d.d_type,
         d.d_size, c.clean_id, c.clean_name, c.c_brand, c.c_type,
         c.c_size
  FROM dt d JOIN ct c USING (tok)
),
scored AS (
  SELECT dirty_id, clean_id, {score} AS score_micro,
         g_name, g_brand, g_type, g_size,
         u_name_ppm, u_brand_ppm, u_type_ppm, u_size_ppm
  FROM (
    SELECT dirty_id, clean_id,
         {cand_g}
    FROM cand
  ) CROSS JOIN w
),
best AS (
  SELECT dirty_id, MAX({{{best_struct}}}) AS m
  FROM scored GROUP BY dirty_id
)
SELECT dirty_id,
       CAST(-(m.nc) AS BIGINT) AS clean_id,
       {gsel},
       m.s AS score_micro,
       {usel},
       CASE WHEN m.s >= 2302585 THEN 'match'
            WHEN m.s <= -2302585 THEN 'nonmatch'
            ELSE 'possible' END AS decision
FROM best
"""


ORACLE_ER_FELLEGI_SUNTER = _fs_oracle()

R13B_REGISTRY["er_fellegi_sunter"] = Query(
    q_er_fellegi_sunter, ORACLE_ER_FELLEGI_SUNTER
)


# ---------------------------------------------------------------------------
# events_ewma_control — EWMA control chart over the daily event series
# ---------------------------------------------------------------------------

EWMA_WINDOW = 8  # alpha = 1/4; integer weights 3^i * 4^(window-1-i)


def q_events_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (operators/aggregates.ewma_control) per
    event_type over the daily value rollup — the ONLINE member of the
    drift-monitoring family (cusum = retrospective shift, ks = window
    distribution drift): exact rational EWMA (integer num/den of a
    bounded LAG chain, heads renormalize), alarm on cross-multiplied
    residual > half the smoothed level."""
    from icebergproject_spark.operators.aggregates import ewma_control

    ev = _t(spark, sf_dir, "events")
    return ewma_control(
        ev, "value", ["event_type"], date_col="ts", window=EWMA_WINDOW
    )


def _ewma_oracle(window: int) -> str:
    weights = [3**i * 4 ** (window - 1 - i) for i in range(window)]
    lag_cols = ",\n         ".join(
        f"LAG(value_q, {i}) OVER w AS l{i}" for i in range(1, window)
    )
    num = " + ".join(
        [f"value_q * {weights[0]}"]
        + [f"COALESCE(l{i} * {weights[i]}, 0)" for i in range(1, window)]
    )
    den = " + ".join(
        [f"{weights[0]}"]
        + [
            f"CASE WHEN l{i} IS NOT NULL THEN {weights[i]} ELSE 0 END"
            for i in range(1, window)
        ]
    )
    return f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_q
  FROM events GROUP BY 1, 2
),
lagd AS (
  SELECT event_type, day, value_q,
         {lag_cols}
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
e AS (
  SELECT event_type, day, value_q,
         CAST({num} AS BIGINT) AS num,
         CAST({den} AS BIGINT) AS den
  FROM lagd
)
SELECT event_type, day, value_q,
       CAST(num // den AS BIGINT) AS ewma_q,
       CAST(abs(value_q - num // den) AS BIGINT) AS resid_q,
       CAST(CASE WHEN abs(value_q * den - num) * 2 > num
             THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM e
"""


ORACLE_EVENTS_EWMA_CONTROL = _ewma_oracle(EWMA_WINDOW)

R13B_REGISTRY["events_ewma_control"] = Query(
    q_events_ewma_control, ORACLE_EVENTS_EWMA_CONTROL
)


# ---------------------------------------------------------------------------
# heaps_vocab_curve — vocabulary-growth audit (Heaps' law)
# ---------------------------------------------------------------------------

def q_heaps_vocab_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve in ingestion order — the
    measurement behind the BM25 df-maintenance ceiling claim (SCALE.md
    r13: the termstats table grows with the vocabulary, which trails
    the corpus): for each doc-count decile, the cumulative token count
    and the cumulative DISTINCT-term count (a term's first occurrence
    is its min doc_id — one aggregation, no per-decile rescans), plus
    the log-log OLS slope (the Heaps exponent beta) fitted over the 10
    points, micro-quantized with the repo's single-float-expression
    convention.

    100 TB shape: one (doc, term) shuffle for first-occurrences, one
    doc-level shuffle for sizes; the doc rank and the cumulative token
    count use the range-partitioned two-pass shape
    (llm/sharding.exact_global_rank / exact_prefix_sum — no global
    window funnel); a 10-row decile frame joins by broadcast; the OLS
    runs over 10 rows.  Output: (decile, docs, tokens, vocab,
    beta_micro)."""
    from icebergproject_spark.llm.sharding import (
        exact_global_rank,
        exact_prefix_sum,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # per-doc rank in ingestion (doc_id) order and cumulative tokens —
    # both via the range-partitioned two-pass shape (no global-window
    # funnel; byte-identical to the single-window oracle).
    # r13 (guide §2.4): n_tok = size(split(...)) is a pure map — the
    # former explode+groupBy re-tokenized the corpus a second time and
    # shuffled one row per TOKEN just to count them per doc.  size() of
    # the split array counts the identical tokens (split never yields
    # an empty array; null text never reached the old aggregate and is
    # filtered to match).
    sizes = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    ranked_r, _ = exact_global_rank(sizes, [F.col("doc_id")], rank_col="r")
    ranked = exact_prefix_sum(
        ranked_r, "n_tok", [F.col("doc_id")], sum_col="cum_tok"
    )
    n_docs = docs.count()  # scalar: decile cutoffs are driver-known
    cuts = [(d, n_docs * d // 10) for d in range(1, 11)]
    cut_df = spark.createDataFrame(cuts, "decile int, cutoff long")
    # cumulative docs/tokens AT each cutoff rank
    at = (
        ranked.where(F.col("r").isin([c for _, c in cuts]))
        .join(
            F.broadcast(cut_df),
            F.col("r") == F.col("cutoff"),
        )
        .select("decile", F.col("r").alias("docs"), F.col("cum_tok").alias("tokens"))
    )
    # vocab at cutoff: terms whose first-occurrence doc has rank <= cutoff
    first = tok.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    first_ranked = first.join(
        ranked.select("doc_id", "r"),
        first["first_doc"] == ranked["doc_id"],
    ).select("term", "r")
    vocab = (
        first_ranked.crossJoin(F.broadcast(cut_df))
        .where(F.col("r") <= F.col("cutoff"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    curve = at.join(vocab, "decile")
    # Heaps beta via log-log OLS over the 10 points: quantize each
    # ln() ONCE to micro (engine-stable single float expression), then
    # exact integer OLS on the quantized values
    lx = F.round(F.log(F.col("tokens").cast("double")) * 1_000_000).cast(
        "long"
    )
    ly = F.round(F.log(F.col("vocab").cast("double")) * 1_000_000).cast(
        "long"
    )
    pts = curve.select("decile", "docs", "tokens", "vocab",
                       lx.alias("lx"), ly.alias("ly"))
    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    ).select(
        F.expr(
            "(n * sxy - sx * sy) * 1000000 DIV (n * sxx - sx * sx)"
        ).alias("beta_micro")
    )
    return (
        pts.crossJoin(F.broadcast(stats))
        .select("decile", "docs", "tokens", "vocab", "beta_micro")
    )


ORACLE_HEAPS_VOCAB_CURVE = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY 1),
ranked AS (
  SELECT doc_id, n_tok,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
         SUM(n_tok) OVER (ORDER BY doc_id) AS cum_tok
  FROM sizes
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
cuts AS (
  SELECT d AS decile, (n_docs * d) // 10 AS cutoff
  FROM (SELECT UNNEST(range(1, 11)) AS d) CROSS JOIN nd
),
at_cut AS (
  SELECT decile, CAST(r AS BIGINT) AS docs, CAST(cum_tok AS BIGINT) AS tokens
  FROM ranked JOIN cuts ON r = cutoff
),
first AS (SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
fr AS (
  SELECT term, r FROM first JOIN ranked ON first_doc = doc_id
),
vocab AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM fr CROSS JOIN cuts WHERE r <= cutoff GROUP BY decile
),
pts AS (
  SELECT decile, docs, tokens, vocab,
         CAST(ROUND(LN(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
         CAST(ROUND(LN(CAST(vocab AS DOUBLE)) * 1000000) AS BIGINT) AS ly
  FROM at_cut JOIN vocab USING (decile)
),
beta AS (
  SELECT CAST(
    (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT
  ) AS beta_micro
  FROM (
    SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
           SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
    FROM pts
  )
)
SELECT decile, docs, tokens, vocab, beta_micro
FROM pts CROSS JOIN beta
"""

R13B_REGISTRY["heaps_vocab_curve"] = Query(
    q_heaps_vocab_curve, ORACLE_HEAPS_VOCAB_CURVE
)
