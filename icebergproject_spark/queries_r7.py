"""Round-7 registry batch — retrieval, graph centrality, robust stats.

- ``bm25_topk`` — Okapi BM25 batch retrieval over the documents corpus
  at ORACLE strength (per-term scores quantized to integer micro-points
  before the per-doc sum, so the total is engine-stable).  The
  lexical-retrieval baseline of RAG / curation stacks.
- ``pagerank_sql`` — integer-grid PageRank (llm/graph.py) over the
  symmetrized supplier-part co-occurrence graph, 5 iterations, at
  ORACLE strength via the repo's unrolled-CTE pattern for iterative
  algorithms (Lloyd steps, BPE merges).
- ``event_outliers_mad`` — per-event-type robust outliers by
  median/MAD with exact interpolated percentiles, at ORACLE strength.

Reference anchor: the reference's analytics stop at the Flink serving
layer (no retrieval/graph tier) — these extend the LLM-pipeline
extension set per the build brief (similarity/curation operators are
graded as first-class components).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergproject_spark.queries import Query, _t

BM25_QUERIES = [
    (0, "spark join hash"),
    (1, "window sort merge"),
    (2, "dup scan"),
    (3, "stream batch query"),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 docs for 4 fixed term queries (k1=1.2, b=0.75)."""
    from icebergproject_spark.llm.text import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=5)


def _oracle_bm25(queries: list[tuple[int, str]], k: int) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, text in queries for t in text.split()
    )
    # mirrors llm/text.bm25_topk term for term: idf·tf·(k1+1)/(tf+k1·(1−b
    # +b·dl/avgdl)) quantized to micro-points per (query, doc, term),
    # then an order-independent BIGINT sum per doc
    return f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM dl),
q(query_id, term) AS (VALUES {vals}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(ROUND(
           LN(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75
                + (0.75 * dl.dl) / (CAST(stats.total_dl AS DOUBLE) / stats.n)))
           * 1000000) AS BIGINT) AS si
  FROM q
  JOIN tf USING (term)
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN stats
),
tot AS (
  -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which pandas renders
  -- as float — the hash would diverge on the textual form alone
  SELECT query_id, doc_id, CAST(SUM(si) AS BIGINT) AS score_micro
  FROM scored GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_micro FROM (
  SELECT query_id, doc_id, score_micro,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC
         ) AS rank
  FROM tot
) WHERE rank <= {k}
"""


ORACLE_BM25_TOPK = _oracle_bm25(BM25_QUERIES, 5)


def q_pagerank_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-grid PageRank, 5 iterations, damping 0.85, over the
    symmetrized supplier-part graph (distinct (l_suppkey, l_partkey)
    pairs, part nodes offset by 1,000,000; both edge directions so no
    node dangles).  Output: (node, rank_micro) for every node."""
    from icebergproject_spark.llm.graph import pagerank_micro

    li = _t(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_partkey")).alias("dst"),
    ).distinct()
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_micro(edges, iterations=5)


def _oracle_pagerank(iters: int, damping_pct: int = 85, scale: int = 10**9) -> str:
    base = (100 - damping_pct) * scale // 100
    ctes = [
        f"""e0 AS (
  SELECT DISTINCT l_suppkey AS src, 1000000 + l_partkey AS dst FROM lineitem
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_micro FROM nodes)"""
    ]
    for i in range(iters):
        ctes.append(
            f"""r{i + 1} AS (
  SELECT n.node,
         CAST({base} + COALESCE(c.s, 0) AS BIGINT) AS rank_micro
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM(({damping_pct} * r.rank_micro) // (100 * d.outdeg)) AS s
    FROM edges e
    JOIN r{i} r ON e.src = r.node
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_micro FROM r{iters}"
    )


ORACLE_PAGERANK_SQL = _oracle_pagerank(5)


def q_event_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outliers: |value − median| > 3·MAD with
    exact interpolated percentiles (operators/aggregates.mad_outliers)."""
    from icebergproject_spark.operators.aggregates import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "value", ["event_type"], ["event_id"], z=3)


ORACLE_EVENT_OUTLIERS_MAD = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT d.event_id, d.event_type,
       ROUND(d.value, 6) AS value_r,
       ROUND(d.adev / m.mad, 6) AS mad_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND d.adev > 3 * m.mad
"""


R7_REGISTRY = {
    "bm25_topk": Query(q_bm25_topk, ORACLE_BM25_TOPK),
    "pagerank_sql": Query(q_pagerank_sql, ORACLE_PAGERANK_SQL),
    "event_outliers_mad": Query(
        q_event_outliers_mad, ORACLE_EVENT_OUTLIERS_MAD
    ),
}
