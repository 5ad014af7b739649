"""Hybrid retrieval — dense query-by-example ranking + Reciprocal Rank
Fusion (RRF, Cormack/Clarke/Büttcher 2009), the standard way modern
RAG / curation stacks combine a lexical ranker (BM25, llm/text.py) with
an embedding ranker without score calibration.

**Integer-exact by construction** (the repo's oracle convention):

- Dense scores quantize embeddings to the 1e4 integer grid first
  (``int_quantized_base`` convention, llm/similarity.py): dot products
  of integer-valued doubles are exact (≪ 2^53) in any summation order,
  and the cosine is a fixed chain of IEEE ops (sqrt/mul/div) on exact
  inputs — bit-identical across engines.  Ranking ties break on doc id.
- RRF contributions are ``scale DIV (k0 + rank)`` — floor division on
  BIGINTs — so the fused score is an order-independent integer sum.

100 TB shape: the probe set is tiny and BROADCAST into a corpus scan
(one pass, no shuffle on the corpus); per-query top-k is a window over
the probe partitions only.  Brute-force scoring is the exact baseline —
the production scale path swaps ``dense_topk`` for the IVF/PQ index
arms (llm/similarity.py: ivf_sql_topk, pq_adc_topk) and feeds the same
``rrf_fuse``; fusion itself is one groupBy on (query_id, doc_id) over
k·|queries|·|systems| rows — negligible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from icebergproject_spark.llm.similarity import _dot


def dense_topk(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 20,
    quant: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query-by-example dense ranking: for each probe vector (a corpus
    row named by id), the cosine top-k corpus rows on the quantized
    integer grid.  Output: (query_id, doc_id, rank)."""
    base = emb.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * quant).cast("double"),
        ).alias("q"),
    )
    probes = base.filter(F.col("doc_id").isin(probe_ids)).select(
        F.col("doc_id").alias("query_id"), F.col("q").alias("pq")
    )
    # nullif(denominator, 0): a zero vector would give 0/0, which
    # Spark's non-ANSI Divide renders NULL while DuckDB's IEEE mode
    # yields NaN — ordering and the oracle hash would diverge.  With
    # the guard BOTH engines produce NULL, which both ORDER BY ... DESC
    # sort last (ADVICE r7, retrieval.py:58; same guard in the oracle).
    cos = _dot(F.col("q"), F.col("pq")) / F.nullif(
        F.sqrt(_dot(F.col("q"), F.col("q")))
        * F.sqrt(_dot(F.col("pq"), F.col("pq"))),
        F.lit(0.0),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("doc_id").asc()
    )
    return (
        base.crossJoin(F.broadcast(probes))
        .select("query_id", "doc_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    scale: int = 10**9,
) -> DataFrame:
    """Fuse ranked lists — each (query_id, doc_id, rank) — by RRF:
    ``score = Σ_systems scale DIV (k0 + rank)``.  Output:
    (query_id, rank, doc_id, rrf_micro), top-k per query."""
    u = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "doc_id", "rank"))
    fused = (
        u.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST({scale} DIV ({k0} + rank) AS BIGINT)").alias("c"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("rrf_micro"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_micro")
    )
