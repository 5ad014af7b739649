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
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (l2_norm(F.col("__qvec")) * l2_norm(F.col("__cvec")))
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
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    scored = cb.join(F.broadcast(qb), "__bucket").select(
        query_id_col,
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (l2_norm(F.col("__qvec")) * l2_norm(F.col("__cvec")))
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
