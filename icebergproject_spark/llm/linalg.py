"""Distributed linear algebra over embedding columns: scalable PCA.

The classic two-phase shape (what MLlib's RowMatrix.computePrincipalComponents
does, re-expressed directly):

1. **Distributed pass** — accumulate the d×d Gram matrix Σ xᵀx and the
   column-sum vector via ``mapInPandas`` partial sums: each Arrow batch
   contributes one (d²+d+1)-float row, so the driver collects
   O(partitions) rows, never the data. d=64 ⇒ a partial is 33 KB;
   at 100 TB the reduce is thousands of 33 KB rows — trivial.
2. **Driver solve** — covariance from Gram + means, ``numpy.linalg.eigh``
   (d×d, microseconds), sign-fixed so results are run-stable.
3. **Distributed project** — components broadcast in a pandas-UDF closure,
   one Arrow-batched matmul per batch. No shuffle anywhere in the whole
   pipeline: pass 1 is a map + driver-side reduce, pass 3 is a pure map.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _gram_and_mean(df: DataFrame, vec_col: str, dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed pass: (Gram = Σ x xᵀ, column sums, n)."""
    out_schema = StructType([StructField("partial", ArrayType(DoubleType()))])

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim))
        sums = np.zeros(dim)
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += len(x)
        flat = np.concatenate([gram.ravel(), sums, [float(n)]])
        yield pd.DataFrame({"partial": [flat.tolist()]})

    rows = df.select(vec_col).mapInPandas(partials, out_schema).collect()
    total = np.zeros(dim * dim + dim + 1)
    for r in rows:
        total += np.asarray(r.partial)
    gram = total[: dim * dim].reshape(dim, dim)
    sums = total[dim * dim : dim * dim + dim]
    n = int(total[-1])
    return gram, sums, n


def pca_components(
    df: DataFrame, dim: int, k: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal components of the embedding column.

    Returns (components k×d, explained_variance k, mean d). Deterministic:
    eigh on a symmetric covariance, each component sign-fixed so its
    largest-|.| coordinate is positive.
    """
    gram, sums, n = _gram_and_mean(df, vec_col, dim)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project vectors onto the given components (centered), Arrow-batched."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("pc", ArrayType(DoubleType())),
        ]
    )
    comps_t = components.T.copy()
    mu = mean.copy()

    def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mu
            yield pd.DataFrame(
                {"id": pdf[id_col], "pc": list((x @ comps_t))}
            )

    return df.select(id_col, vec_col).mapInPandas(project, out_schema)


def kmeans(
    df: DataFrame,
    dim: int,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray, float]:
    """Distributed Lloyd's k-means over the embedding column.

    Per iteration ONE distributed pass: ``mapInPandas`` assigns each Arrow
    batch to nearest centroids (vectorized argmin over a broadcast k×d
    closure array) and emits per-centroid partial (sum, count, sse) rows —
    O(partitions·k) tiny rows to the driver, which updates centroids.
    Like the PCA above there is NO shuffle; the iteration state (k×d
    floats) rides in the UDF closure. Deterministic: init = first k
    vectors by id order, ties broken by lowest centroid index.

    Returns (assignments DataFrame (id, cluster), centroids k×d, sse).
    """
    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centroids = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])
    out_schema = StructType([StructField("partial", ArrayType(DoubleType()))])

    prev_sse = None
    sse = float("inf")
    for _ in range(max_iter):
        c = centroids.copy()

        def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sums = np.zeros((k, dim))
            counts = np.zeros(k)
            err = 0.0
            for pdf in it:
                if len(pdf) == 0:
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                err += d2[np.arange(len(x)), a].sum()
                for j in range(k):
                    m = a == j
                    if m.any():
                        sums[j] += x[m].sum(axis=0)
                        counts[j] += m.sum()
            yield pd.DataFrame(
                {"partial": [np.concatenate([sums.ravel(), counts, [err]]).tolist()]}
            )

        rows = df.select(vec_col).mapInPandas(partials, out_schema).collect()
        tot = np.zeros(k * dim + k + 1)
        for r in rows:
            tot += np.asarray(r.partial)
        sums = tot[: k * dim].reshape(k, dim)
        counts = tot[k * dim : k * dim + k]
        sse = float(tot[-1])
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        if prev_sse is not None and abs(prev_sse - sse) <= tol * prev_sse:
            break
        prev_sse = sse

    cfinal = centroids.copy()
    assign_schema = StructType(
        [StructField("id", LongType()), StructField("cluster", LongType())]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = ((x[:, None, :] - cfinal[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({"id": pdf[id_col], "cluster": d2.argmin(axis=1)})

    assignments = df.select(id_col, vec_col).mapInPandas(assign, assign_schema)
    return assignments, centroids, sse


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (b > 0) — the shared
    semantics of Spark's ``DIV`` and DuckDB's ``//`` (both verified to
    truncate, not floor, on negative numerators)."""
    return -((-a) // b) if a < 0 else a // b


def _int_gram(
    df: DataFrame, dim: int, quant: int, vec_col: str
) -> tuple[list[list[int]], list[int], int]:
    """Distributed EXACT integer second-moment pass: quantize each
    vector to ``q = CAST(ROUND(x*quant) AS BIGINT)`` and accumulate
    (Σ q qᵀ, Σ q, n) as int64 partials per partition — the integer twin
    of :func:`_gram_and_mean` (same map-side-reduce shape, no shuffle;
    O(partitions) d²-sized rows to the driver).  int64 is exact here:
    with |x| ≤ 1 and quant=1e4, Σ q_a q_b ≤ n·1e8 — no overflow until
    n ~ 9e10 rows."""
    out_schema = StructType([StructField("partial", ArrayType(LongType()))])

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # half-AWAY-from-zero, matching Spark F.round / DuckDB
            # ROUND — np.round would bankers-round exact .5 cases
            v = x * quant
            q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            gram += q.T @ q
            sums += q.sum(axis=0)
            n += len(q)
        flat = np.concatenate([gram.ravel(), sums, [n]])
        yield pd.DataFrame({"partial": [flat.tolist()]})

    rows = df.select(vec_col).mapInPandas(partials, out_schema).collect()
    total = [0] * (dim * dim + dim + 1)
    for r in rows:
        for i, v in enumerate(r.partial):
            total[i] += int(v)
    gram = [total[a * dim : (a + 1) * dim] for a in range(dim)]
    sums = total[dim * dim : dim * dim + dim]
    return gram, sums, total[-1]


def _tdiv_np(a: np.ndarray, b: int) -> np.ndarray:
    """Element-wise :func:`_tdiv` (numpy ``//`` floors negatives — the
    sign-split keeps truncation toward zero, matching SQL)."""
    return np.sign(a) * (np.abs(a) // b)


def _power_iterate(
    mat: np.ndarray, grid: int, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """Integer-grid power iteration: T rounds of (matvec, max-abs
    renormalize to ``grid``) from the all-ones start.  Every value is a
    bounded int64 and every division truncates toward zero, so the
    recurrence is bit-replayable as unrolled SQL CTEs on any engine.
    Returns (v at grid scale, final un-normalized matvec w)."""
    v = np.full(mat.shape[0], grid, dtype=np.int64)
    for _ in range(iters):
        w = mat @ v
        wm = max(int(np.abs(w).max()), 1)
        v = _tdiv_np(w * grid, wm)
    return v, mat @ v


def _renorm_grid(mat: np.ndarray, grid: int) -> np.ndarray:
    """Rescale a d×d integer matrix so max|entry| ≈ grid: divide by
    GREATEST(max|entry| DIV grid, 1).  Divide-by-precomputed-quotient
    (instead of multiply-then-divide) keeps the numerator in int64."""
    md = max(int(np.abs(mat).max()) // grid, 1)
    return _tdiv_np(mat, md)


def pca_micro_components(
    df: DataFrame,
    dim: int,
    k: int = 2,
    iters: int = 16,
    squarings: int = 6,
    quant: int = 10**4,
    grid: int = 10**5,
    vec_col: str = "embedding",
) -> tuple[list[list[int]], list[int], int]:
    """Top-k principal directions on an INTEGER grid — the
    oracle-strength twin of :func:`pca_components` (VERDICT r7 ask #2).

    The covariance is exact: craw = n·Σqqᵀ − (Σq)(Σq)ᵀ = n²·cov(q),
    a PSD BIGINT matrix (the distributed pass is the only data-sized
    work).  Driver-side, each direction is T=``iters`` rounds of
    integer power iteration (matvec + max-abs renormalize, the
    PageRank/HITS trick applied to a dense d×d operator), then
    deflation stays integral via the Rayleigh quotient:

        lam = (v·Mv) DIV (v·v)            (≤ λmax ≤ trace — in range)
        u_a = (lam·v_a·grid) DIV (v·v)
        D   = M − (u vᵀ) DIV grid          ≈ M − lam·v vᵀ/(v·v)

    then D is renormalized back to the grid and iterated for the next
    direction.  Truncating division at every stage makes the whole
    chain a deterministic integer recurrence — DuckDB replays it as
    unrolled CTEs bit-for-bit (queries_r8.ORACLE_EMBEDDING_PCA_SQL).

    Bounds (|x| ≤ 1, quant=1e4, grid=1e5, d=64): matrix entries ≤ 1e5,
    matvec ≤ d·1e10 = 6.4e11, renormalize numerator ≤ 6.4e16, Rayleigh
    numerator ≤ d²·grid³ = 4.1e18 < 2^63 — every stage fits int64, so
    DuckDB (which checks overflow) and Spark (which wraps) agree.
    Driver work is O(k·T·d²) on a d×d aggregate — the same bounded
    driver-solve class as the float arm's ``eigh`` (never data-sized).

    Returns (components k×d at grid scale, column sums Σq, n)."""
    gram, sums, n = _int_gram(df, dim, quant, vec_col)
    g = np.asarray(gram, dtype=np.int64)
    s = np.asarray(sums, dtype=np.int64)
    craw = n * g - np.outer(s, s)
    base = _renorm_grid(craw, grid)
    comps: list[list[int]] = []
    for _ in range(k):
        # accelerate: iterate on M^(2^squarings) — embedding covariances
        # can have CLUSTERED spectra (fixture λ2/λ1 is 0.93 at sf0.001
        # and 0.98 at sf0.1), so plain power iteration needs hundreds of
        # rounds for 1e-2 residual; squaring the grid matrix 6× (one d×d
        # integer matmul each, renormalized back to the grid) makes T=16
        # rounds act like 1024 — and in SQL each squaring is ONE 64×64
        # self-join CTE, far cheaper than unrolled matvecs.  Validated
        # vs numpy eigh: |cos| = 1.0000 for both components at
        # sf0.001/0.01/0.1 (embeddings) and for LSA's hashed counts.
        #
        # The squared matrix finds ONLY this component's direction;
        # deflation happens on the UNSQUARED base and the next component
        # re-squares the deflated base.  Deflating the squared matrix
        # instead fails with a WIDE eigengap (hashed-count LSA measures
        # λ2/λ1 = 0.16): (λ2/λ1)^64 underflows the integer grid, so the
        # squared matrix holds pure v1 and its deflation is truncation
        # noise.
        mat = base
        for _ in range(squarings):
            mat = _renorm_grid(mat @ mat, grid)
        v, _w = _power_iterate(mat, grid, iters)
        comps.append([int(x) for x in v])
        # integral Rayleigh deflation of the BASE matrix (num ≤
        # d²·grid³ = 4.1e18 < 2^63 — exact in int64)
        w0 = base @ v
        den = int(v @ v)
        num = int(v @ w0)
        lam = _tdiv(num, den)
        u = _tdiv_np(lam * v * grid, den)
        base = _renorm_grid(base - _tdiv_np(np.outer(u, v), grid), grid)
    return comps, [int(x) for x in sums], n


def pca_micro(
    df: DataFrame,
    dim: int,
    k: int = 2,
    iters: int = 16,
    squarings: int = 6,
    quant: int = 10**4,
    grid: int = 10**5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Integer-grid PCA projection: (id, pc1_q, …, pck_q) BIGINTs.

    The centered projection stays integral by cross-multiplying with n:
    n·(q − s/n)·v = n·(q·v) − s·v, then one final DIV n.  Components
    are only max-abs normalized (‖v₁‖₂ ≠ ‖v₂‖₂), so each projection is
    rescaled by ×1000 DIV isqrt(v·v) — floor of the IEEE double sqrt,
    which is correctly rounded and hence engine-deterministic — making
    pc columns comparable milli-units of the unit-direction projection
    (so var(pc1) ≥ var(pc2) holds numerically).  The per-row work is a
    JVM-side ``zip_with``/``aggregate`` dot product against the k
    broadcast-literal component arrays — a pure map, no shuffle, no
    Python in the row path (components were solved driver-side from
    the d²-sized aggregate)."""
    import math

    comps, sums, n = pca_micro_components(
        df, dim, k, iters=iters, squarings=squarings,
        quant=quant, grid=grid, vec_col=vec_col,
    )
    q = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * quant).cast("long"),
        ).alias("__q"),
    )
    out = [F.col(id_col)]
    for j, v in enumerate(comps):
        sv = sum(s * x for s, x in zip(sums, v))  # scalar Σ s_i·v_i
        isq = max(int(math.floor(math.sqrt(sum(x * x for x in v)))), 1)
        lit = F.array(*[F.lit(x).cast("long") for x in v])
        dot = F.aggregate(
            F.zip_with(F.col("__q"), lit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out.append(
            F.expr(
                f"((({n} * __dot{j} - ({sv})) DIV {n}) * 1000) DIV {isq}"
            ).alias(f"pc{j + 1}_q")
        )
        q = q.withColumn(f"__dot{j}", dot)
    return q.select(*out)


def pca(
    df: DataFrame, dim: int, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """End-to-end PCA: fit components, project, round for stability.

    Output: (vec_id, pc: array<double> length k, rounded to 6)."""
    comps, _, mean = pca_components(df, dim, k, vec_col)
    proj = pca_project(df, comps, mean, vec_col, id_col)
    return proj.select(
        F.col("id").alias(id_col),
        F.transform("pc", lambda x: F.round(x, 6)).alias("pc"),
    )
