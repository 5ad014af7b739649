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
