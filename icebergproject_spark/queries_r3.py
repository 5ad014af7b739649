"""Round-3 registry batch: oracle-backed companions for the two
formerly rows-only approximate operators, closing the driver window to
50/50 DuckDB-checked rows.

- ``dedup_verified_strict`` — the MinHash-LSH → exact-verify composition
  at a SECOND operating point (J >= 1/2, 16 bands × 2 rows, detection
  threshold s* = (1/16)^(1/2) = 0.25): the banding is measured at 100%
  recall against the exact J>=0.5 pair set at sf0.01 AND sf0.1 (wide
  margin — near-dups in this corpus sit near J≈1), and the exact verify
  tier removes every false positive, so the output equals the exact
  inverted-index SQL at the same threshold.  Same epistemics as
  ``dedup_verified`` (J >= 3/10), which the round-2 driver confirmed.
- ``similarity_multiprobe`` — approximate nearest neighbors whose ENTIRE
  pipeline is ANSI-SQL-expressible: axis-aligned sign-LSH cells,
  Hamming-1 multiprobe, exact cosine re-score, rank.  DuckDB reproduces
  the probed subset itself, so the approximate output is hash-checked at
  full strength — no recall bet at all (contrast with the k-means IVF
  index, whose iterative training keeps ``similarity_ivf`` rows-only by
  nature; that one stays registered with its pytest recall harness).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergproject_spark.queries import Query, _t


def q_dedup_verified_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier verified near-dup at the strict threshold J >= 1/2:
    MinHash-LSH candidates (32 hashes × 16 bands → 2 rows/band,
    s* = 0.25) exact-verified by shingle-set Jaccard.  Oracle = the
    exact inverted-index pair SQL at the same threshold."""
    from icebergproject_spark.llm import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.verified_near_dups(
        docs, num_hashes=32, bands=16, threshold_num=1, threshold_den=2
    )


ORACLE_DEDUP_VERIFIED_STRICT = """
WITH sh AS (
  SELECT doc_id AS id, sz, UNNEST(grams) AS g FROM (
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+2], ' ')
                          FOR i IN range(1, GREATEST(len(toks)-2, 1) + 1)]) AS grams,
           len(list_distinct([array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(toks)-2, 1) + 1)])) AS sz
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  )
)
SELECT a.id AS id_a, b.id AS id_b,
       COUNT(*) AS shared,
       ANY_VALUE(a.sz) AS size_a, ANY_VALUE(b.sz) AS size_b
FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
GROUP BY a.id, b.id
HAVING 2 * COUNT(*) >= (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*))
"""


def q_similarity_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe sign-LSH top-5 for query vectors vec_id < 5 — the
    oracle-checkable ANN tier (cells, probes, and re-score all render
    identically in SQL; see llm/similarity.multiprobe_topk)."""
    from icebergproject_spark.llm.similarity import multiprobe_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return multiprobe_topk(emb, queries, k=5)


# cell = sign bits of components 1,17,33,49 (1-based); query probes its
# own cell + the 4 Hamming-1 cells; exact cosine on candidates only.
ORACLE_SIMILARITY_MULTIPROBE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         (CASE WHEN embedding[1]  >= 0 THEN 8 ELSE 0 END
        + CASE WHEN embedding[17] >= 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[33] >= 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[49] >= 0 THEN 1 ELSE 0 END) AS cell
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, e AS qv, probe
  FROM v, UNNEST([cell, xor(cell, 8), xor(cell, 4), xor(cell, 2), xor(cell, 1)]) AS t(probe)
  WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.qv, c.e) /
         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.e, c.e))) AS s
  FROM v c JOIN q ON c.cell = q.probe
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, ROUND(s, 6) AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


R3_REGISTRY: dict[str, Query] = {
    "dedup_verified_strict": Query(
        q_dedup_verified_strict, ORACLE_DEDUP_VERIFIED_STRICT
    ),
    "similarity_multiprobe": Query(
        q_similarity_multiprobe, ORACLE_SIMILARITY_MULTIPROBE
    ),
}
