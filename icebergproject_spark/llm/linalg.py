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
