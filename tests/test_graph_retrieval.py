"""Tests for the round-7 batch: integer-grid PageRank, BM25 retrieval,
median/MAD robust outliers — each pinned against a pure-Python replay of
the same integer/float recurrence (the repo's oracle-strength pattern)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from icebergproject_spark.llm.graph import pagerank_micro
from icebergproject_spark.llm.text import bm25_topk
from icebergproject_spark.operators.aggregates import mad_outliers


# --- pagerank_micro --------------------------------------------------------

def _pagerank_ref(edges, iterations, damping_pct=85, scale=10**9):
    """Pure-Python replay of the integer-grid recurrence."""
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - damping_pct) * scale // 100
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (damping_pct * r[s]) // (100 * outdeg[s])
        r = nxt
    return r


def test_pagerank_cycle_is_fixed_point(spark):
    """On a simple cycle every node keeps exactly rank = scale: the
    integer recurrence has no floor loss when outdeg == 1."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {r.node: r.rank_micro for r in pagerank_micro(edges, 4).collect()}
    assert got == {0: 10**9, 1: 10**9, 2: 10**9}


def test_pagerank_star_concentrates_on_hub(spark):
    edges_py = [(1, 0), (2, 0), (3, 0)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank_micro(edges, 1).collect()}
    # hub: base + 3 leaf contributions; leaves (dangling sources): base only
    assert got[0] == 150_000_000 + 3 * 850_000_000
    assert got[1] == got[2] == got[3] == 150_000_000


def test_pagerank_matches_python_replay_exactly(spark):
    """Deterministic pseudo-random graph: Spark ranks == pure-Python
    replay bit-for-bit after 5 iterations (the integer-grid guarantee)."""
    edges_py = sorted(
        {((i * 7 + 3) % 23, (i * 11 + 5) % 23) for i in range(60)}
    )
    edges_py = [(s, d) for s, d in edges_py if s != d]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    want = _pagerank_ref(edges_py, 5)
    got = {r.node: r.rank_micro for r in pagerank_micro(edges, 5).collect()}
    assert got == want


# --- bm25_topk -------------------------------------------------------------

def _bm25_ref(docs, queries, k1=1.2, b=0.75):
    """Pure-Python replay: per-(query, doc, term) micro-quantized scores,
    summed per doc."""
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        for term in qtext.split():
            if term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for i, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
                key = (qid, i)
                out[key] = out.get(key, 0) + round(w * 1_000_000)
    return out


def test_bm25_matches_python_replay(spark):
    docs_py = [
        (1, "spark shuffle join hash join build probe"),
        (2, "sort merge join spill disk"),
        (3, "hash aggregate partial final"),
        (4, "window rank dense over partition"),
        (5, "the the the the the spark"),
    ]
    queries = [(0, "hash join"), (1, "spark window")]
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.score_micro
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    assert got == _bm25_ref(docs_py, queries)


def test_bm25_rank_order_and_k(spark):
    """Doc with both query terms outranks single-term docs; k truncates;
    docs with no query term are absent."""
    docs_py = [
        (1, "alpha beta gamma"),
        (2, "alpha delta"),
        (3, "beta epsilon"),
        (4, "zeta eta"),
    ]
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    rows = bm25_topk(docs, [(0, "alpha beta")], k=2).collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] [0] == 1
    assert len(rows) == 2          # k truncation
    assert all(r.doc_id != 4 for r in rows)


# --- mad_outliers ----------------------------------------------------------

def test_mad_outliers_flags_heavy_tail(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
         (5, "a", 100.0),
         # constant group: MAD = 0 -> skipped entirely
         (6, "b", 7.0), (7, "b", 7.0), (8, "b", 7.0)],
        "event_id long, event_type string, value double",
    )
    rows = mad_outliers(df, "value", ["event_type"], ["event_id"], z=3).collect()
    assert len(rows) == 1
    r = rows[0]
    # group a: median 3, adev [2,1,0,1,97], MAD 1 -> only 100 is > 3 MADs
    assert (r.event_id, r.event_type, r.value_r, r.mad_z) == (5, "a", 100.0, 97.0)


def test_mad_outliers_symmetric_tail(spark):
    """Outliers on both sides of the median are caught (|v - med|)."""
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate([-50, 10, 11, 12, 13, 14, 80])],
        "event_id long, event_type string, value double",
    )
    got = {r.event_id for r in
           mad_outliers(df, "value", ["event_type"], ["event_id"], z=3).collect()}
    assert got == {0, 6}  # median 12, MAD 1.0 -> -50 and 80
