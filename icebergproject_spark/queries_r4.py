"""Round-4 registry batch.

- ``similarity_ivf_sql`` — the IVF index promoted to ORACLE strength
  (VERDICT r3 ask #4) by making the training itself replayable: one
  integer-exact Lloyd step from data seeds (quantize → seed-assign →
  BIGINT centroid sums rescaled by member count → assign/probe → exact
  re-score).  Every stage is deterministic integer/double arithmetic
  that renders identically in ANSI SQL, so DuckDB reproduces the probed
  candidate set and the APPROXIMATE output is hash-checked at full
  strength — the ``similarity_multiprobe`` epistemics extended to a
  trained coarse quantizer.  The k-means variant (``similarity_ivf``)
  stays registered as the quality-tuned rows-only arm.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergproject_spark.queries import Query, _t


def q_similarity_ivf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-strength IVF top-5 for query vectors vec_id < 5: 16
    centroids from one integer-exact Lloyd step, nprobe=4, exact cosine
    re-score on candidates (llm/similarity.ivf_sql_topk)."""
    from icebergproject_spark.llm.similarity import ivf_sql_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_sql_topk(emb, queries, k=5, n_centroids=16, nprobe=4)


# mirrors ivf_sql_topk stage for stage; all index arithmetic is
# integer-exact (quantized BIGINT sums, count-rescaled centroids), so
# both engines mint identical centroids, cells, and probe sets, and the
# final scores are the multiprobe-proven double cosine ROUND(·, 6)
ORACLE_SIMILARITY_IVF_SQL = """
WITH v AS (
  SELECT vec_id AS cid,
         CAST(embedding AS DOUBLE[]) AS e,
         [CAST(ROUND(x * 10000) AS DOUBLE) FOR x IN CAST(embedding AS DOUBLE[])] AS q
  FROM embeddings
),
seeds AS (
  SELECT CAST(cid AS INTEGER) AS cluster_id, q AS c FROM v WHERE cid < 16
),
a0 AS (
  SELECT cid, cluster_id FROM (
    SELECT v.cid, s.cluster_id,
           ROW_NUMBER() OVER (PARTITION BY v.cid ORDER BY
             list_dot_product(v.q, s.c) /
               (sqrt(list_dot_product(v.q, v.q)) * sqrt(list_dot_product(s.c, s.c))) DESC,
             s.cluster_id ASC) AS rn
    FROM v CROSS JOIN seeds s
  ) WHERE rn = 1
),
flat AS (
  SELECT a0.cluster_id,
         UNNEST(range(1, len(v.q) + 1)) AS pos,
         UNNEST(v.q) AS x
  FROM v JOIN a0 USING (cid)
),
sums AS (
  SELECT cluster_id, pos, SUM(CAST(x AS BIGINT)) AS s, COUNT(*) AS n
  FROM flat GROUP BY cluster_id, pos
),
centroids AS (
  SELECT cluster_id,
         array_agg(CAST(ROUND(s / n) AS DOUBLE) ORDER BY pos) AS c
  FROM sums GROUP BY cluster_id
),
a1 AS (
  SELECT v.cid, c.cluster_id,
         ROW_NUMBER() OVER (PARTITION BY v.cid ORDER BY
           list_dot_product(v.q, c.c) /
             (sqrt(list_dot_product(v.q, v.q)) * sqrt(list_dot_product(c.c, c.c))) DESC,
           c.cluster_id ASC) AS rn
  FROM v CROSS JOIN centroids c
),
cells AS (SELECT cid, cluster_id AS cell FROM a1 WHERE rn = 1),
probes AS (SELECT cid AS qid, cluster_id AS cell FROM a1 WHERE rn <= 4 AND cid < 5),
scored AS (
  SELECT p.qid AS query_id, n.cid AS neighbor_id,
         list_dot_product(vq.e, vn.e) /
           (sqrt(list_dot_product(vq.e, vq.e)) * sqrt(list_dot_product(vn.e, vn.e))) AS s
  FROM probes p
  JOIN cells n ON n.cell = p.cell AND n.cid <> p.qid
  JOIN v vq ON vq.cid = p.qid
  JOIN v vn ON vn.cid = n.cid
),
ranked AS (
  SELECT query_id, neighbor_id, ROUND(s, 6) AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-history verified near-dup: documents from
    source 'src0' arrive as the new batch and are LSH-banded against
    the rest of the corpus only (history never re-pairs with itself) —
    the continuously-ingested-corpus production shape
    (llm/dedup.incremental_near_dups).  Output: each duplicate new doc
    with its smallest matching history doc and the exact pair stats."""
    from icebergproject_spark.llm import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_near_dups(docs, F.col("source") == "src0")


# exact cross-set twin: brute-force batch×history distinct-3-gram
# Jaccard (oracle scale only — the Spark side is banded+verified; the
# equality rests on the same pinned no-mid-band-pairs corpus bet as
# dedup_verified, test_banding_recall_bet_pinned_explicitly)
ORACLE_DEDUP_INCREMENTAL = """
WITH sh AS (
  SELECT doc_id AS id, source, grams,
         len(grams) AS sz
  FROM (
    SELECT doc_id, source,
           list_distinct([array_to_string(toks[i:i+2], ' ')
                          FOR i IN range(1, GREATEST(len(toks)-2, 1) + 1)]) AS grams
    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
  )
),
pairs AS (
  SELECT n.id AS doc_id, h.id AS hid,
         len(list_intersect(n.grams, h.grams)) AS shared,
         n.sz AS size_new, h.sz AS size_hist
  FROM sh n JOIN sh h
    ON n.source = 'src0' AND h.source <> 'src0'
)
SELECT doc_id, dup_of, shared, size_new, size_hist FROM (
  SELECT doc_id, hid AS dup_of, shared, size_new, size_hist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hid) AS rn
  FROM pairs
  WHERE 10 * shared >= 3 * (size_new + size_hist - shared)
) WHERE rn = 1
"""


R4_REGISTRY: dict[str, Query] = {
    "similarity_ivf_sql": Query(q_similarity_ivf_sql, ORACLE_SIMILARITY_IVF_SQL),
    "dedup_incremental": Query(q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL),
}
