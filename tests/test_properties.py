"""Property-based tests (hypothesis) for the scalar library: Spark output
must equal a pure-Python model for ALL inputs, not just the fixtures.
Each example batch runs as one Spark job to keep runtime bounded."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from icebergproject_spark.functions import (
    composite_key,
    epoch_millis_to_date,
    epoch_millis_to_datetime,
    split_composite_key,
    str_to_map_expr,
)

SETTINGS = dict(max_examples=8, deadline=None)

# millis from 1970 to ~2100; None exercises the 1970 default
millis_st = st.one_of(st.none(), st.integers(min_value=0, max_value=4_102_444_800_000))

# map-safe tokens: no '{', '}', ',', '=', '$', no spaces, nonempty
token_st = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)


def _expect_dt(ms: int | None) -> str:
    if ms is None:
        return "1970-01-01 00:00:00"
    return dt.datetime.fromtimestamp(ms / 1000, dt.UTC).strftime("%Y-%m-%d %H:%M:%S")


def _expect_d(ms: int | None) -> str:
    if ms is None:
        return "1970-01-01"
    return dt.datetime.fromtimestamp(ms / 1000, dt.UTC).strftime("%Y-%m-%d")


@settings(**SETTINGS)
@given(st.lists(millis_st, min_size=1, max_size=25))
def test_epoch_millis_formatting_matches_model(spark, batch):
    df = spark.createDataFrame(
        [(i, str(m) if m is not None else None) for i, m in enumerate(batch)],
        "i int, ms string",
    )
    got = {
        r.i: (r.f2, r.f3)
        for r in df.select(
            "i",
            epoch_millis_to_datetime("ms").alias("f2"),
            epoch_millis_to_date("ms").alias("f3"),
        ).collect()
    }
    for i, m in enumerate(batch):
        assert got[i] == (_expect_dt(m), _expect_d(m)), f"ms={m}"


@settings(**SETTINGS)
@given(st.lists(st.tuples(token_st, token_st, token_st), min_size=1, max_size=25))
def test_composite_key_roundtrip(spark, batch):
    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(batch)],
        "i int, a string, b string, c string",
    )
    key = composite_key("a", "b", "c")
    parts = split_composite_key(key, 3)
    got = {
        r.i: (r.k, r.p0, r.p1, r.p2)
        for r in df.select(
            "i",
            key.alias("k"),
            parts[0].alias("p0"),
            parts[1].alias("p1"),
            parts[2].alias("p2"),
        ).collect()
    }
    for i, (a, b, c) in enumerate(batch):
        assert got[i] == (f"{a}${b}${c}", a, b, c)


@settings(**SETTINGS)
@given(
    st.lists(
        st.dictionaries(token_st, token_st, min_size=1, max_size=6),
        min_size=1,
        max_size=15,
    )
)
def test_str_to_map_roundtrip(spark, batch):
    # encode exactly like Flink's Map.toString: "{k1=v1, k2=v2}"
    encoded = [
        (i, "{" + ", ".join(f"{k}={v}" for k, v in d.items()) + "}")
        for i, d in enumerate(batch)
    ]
    df = spark.createDataFrame(encoded, "i int, s string")
    got = {r.i: r.m for r in df.select("i", str_to_map_expr("s").alias("m")).collect()}
    for i, d in enumerate(batch):
        assert got[i] == d, f"input={encoded[i][1]!r}"


@given(
    batch=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(**SETTINGS)
def test_zvalue_bit_interleave_roundtrip(spark, batch):
    """zvalue must equal the pure-Python Morton interleave, and the
    inputs must be recoverable from its bits (no collisions possible)."""
    from icebergproject_spark.operators.zorder import zvalue

    def model(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(batch, ["a", "b"]).select(
        "a", "b", zvalue("a", "b", bits=16).alias("z")
    )
    for r in df.collect():
        assert r.z == model(r.a, r.b)
        # deinterleave recovers both inputs exactly
        a = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


words_st = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=12,
)


@given(docs=st.lists(words_st, min_size=2, max_size=8))
@settings(**SETTINGS)
def test_ngram_jaccard_pairs_match_bruteforce(spark, docs):
    """Inverted-index Jaccard pairs must equal the brute-force all-pairs
    computation for ANY corpus (threshold 0.3, 2-gram shingles)."""
    from icebergproject_spark.llm.dedup import ngram_jaccard_pairs

    def shingles(ws, n=2):
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    expected = set()
    sh = [shingles(d) for d in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j])
            if 10 * inter >= 3 * union:
                expected.add((i, j))

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, n=2, threshold_num=3, threshold_den=10
        ).collect()
    }
    assert got == expected


@given(docs=st.lists(words_st, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_exact_dedup_keeps_one_rep_per_content(spark, docs):
    from icebergproject_spark.llm.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    rows = exact_dedup(df).collect()
    texts = [" ".join(d) for d in docs]
    # one output row per distinct content; representative = min id;
    # dup_cnt = multiplicity
    assert {r.text for r in rows} == set(texts)
    for r in rows:
        ids = [i for i, t in enumerate(texts) if t == r.text]
        assert r.doc_id == min(ids)
        assert r.dup_cnt == len(ids)


# --- sequence packing invariants -------------------------------------------

pack_counts_st = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=30
)


@given(counts=pack_counts_st, ctx=st.integers(min_value=2, max_value=16))
@settings(**SETTINGS)
def test_pack_sequences_matches_python_model(spark, counts, ctx):
    """pack id / offset / span must equal the pure-Python concat-and-chop
    model for arbitrary token-count sequences and context lengths."""
    from icebergproject_spark.llm.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)],
        ["doc_id", "text"],
    )
    got = {
        r.id: (r.n_tokens, r.pack_id, r.pack_offset, r.n_packs_spanned)
        for r in pack_sequences(docs, context_len=ctx).collect()
    }
    cum = 0
    for i, n in enumerate(counts):
        first, last = cum // ctx, (cum + n - 1) // ctx
        assert got[i] == (n, f"all-{first}", cum % ctx, last - first + 1)
        cum += n


# --- round-2 continuation: duplicate_spans / global_shuffle / BPE ----------

span_docs_st = st.lists(
    st.lists(token_st, min_size=1, max_size=14).map(lambda ws: " ".join(ws)),
    min_size=1,
    max_size=8,
)


@given(docs=span_docs_st, k=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_duplicate_spans_matches_bruteforce(spark, docs, k):
    from collections import Counter

    from icebergproject_spark.llm.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["total_windows"], r["dup_windows"])
        for r in duplicate_spans(df, k=k, min_docs=2).collect()
    }

    wins = {
        i: [
            " ".join(t.split(" ")[j : j + k])
            for j in range(len(t.split(" ")) - k + 1)
        ]
        for i, t in enumerate(docs)
    }
    by_win = Counter()
    for i, ws in wins.items():
        for w in set(ws):
            by_win[w] += 1
    for i, ws in wins.items():
        if not ws:
            assert i not in got
            continue
        dup = sum(1 for w in ws if by_win[w] >= 2)
        assert got[i] == (len(ws), dup)


@given(n=st.integers(min_value=1, max_value=60), shards=st.integers(min_value=1, max_value=9))
@settings(**SETTINGS)
def test_global_shuffle_is_permutation(spark, n, shards):
    from icebergproject_spark.llm.sharding import global_shuffle

    df = spark.createDataFrame([(i, "x") for i in range(n)], "doc_id long, text string")
    rows = global_shuffle(df, num_shards=shards).collect()
    assert sorted(r["pos"] for r in rows) == list(range(n))
    assert all(r["shard"] == r["pos"] % shards for r in rows)


@given(docs=span_docs_st)
@settings(**SETTINGS)
def test_bpe_encode_bounds(spark, docs):
    from icebergproject_spark.llm.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=3, min_freq=2)
    out = {r["doc_id"]: r["n_tokens_bpe"] for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(docs):
        words = [w for w in t.split(" ") if w]
        n_chars = sum(len(w) for w in words)
        # token count bounded by [#words, #chars]; merges only shrink
        assert len(words) <= out[i] <= n_chars


@given(docs=span_docs_st, k=st.integers(min_value=2, max_value=4))
@settings(**SETTINGS)
def test_remove_duplicate_spans_matches_model(spark, docs, k):
    from icebergproject_spark.llm.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, k=k).collect()
    }

    # model: survivor = first (doc, pos) occurrence of each duplicated
    # window; other occurrences cover their k positions
    occs: dict = {}
    toks = {i: t.split(" ") for i, t in enumerate(docs)}
    for i, ts in sorted(toks.items()):
        for p in range(len(ts) - k + 1):
            occs.setdefault(" ".join(ts[p : p + k]), []).append((i, p))
    covered = {i: set() for i in toks}
    for w, lst in occs.items():
        if len(lst) < 2:
            continue
        for (i, p) in lst[1:]:  # lst is already in (doc, pos) order
            covered[i].update(range(p, p + k))
    for i, ts in toks.items():
        keep = [t for p, t in enumerate(ts) if p not in covered[i]]
        assert got[i] == (" ".join(keep), len(ts), len(ts) - len(keep))


# --- round 3: dedup tier boundaries (VERDICT r2 ask #9) ---------------------

# small alphabet forces shared shingles → non-trivial pair sets
_small_word_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
jaccard_docs_st = st.lists(
    st.lists(_small_word_st, min_size=3, max_size=10).map(lambda ws: " ".join(ws)),
    min_size=2,
    max_size=7,
)


@given(docs=jaccard_docs_st)
@settings(max_examples=100, deadline=None)
def test_ngram_pair_arms_equivalent(spark, docs):
    """ngram_jaccard_pairs' two pair-generation arms must produce the
    IDENTICAL 5-column result for any corpus: expand_cap=0 routes every
    gram through the inverted-index join arm, expand_cap=10**9 expands
    every gram map-side from grouped postings.  The hybrid's correctness
    rests on this multiset equality."""
    from icebergproject_spark.llm.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    cols = ("id_a", "id_b", "shared", "size_a", "size_b")
    join_arm = sorted(
        tuple(r[c] for c in cols)
        for r in ngram_jaccard_pairs(df, n=2, expand_cap=0).collect()
    )
    expand_arm = sorted(
        tuple(r[c] for c in cols)
        for r in ngram_jaccard_pairs(df, n=2, expand_cap=10**9).collect()
    )
    assert join_arm == expand_arm


edges_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
    ),
    min_size=0,
    max_size=12,
)


@given(edges=edges_st)
@settings(max_examples=100, deadline=None)
def test_connected_components_paths_agree(spark, edges):
    """The driver union-find fast path and the distributed
    large-star/small-star contraction must assign the IDENTICAL
    (node, cluster_id) labels for any edge list — including self-loops,
    duplicates, and both orientations."""
    from icebergproject_spark.llm.dedup import connected_components

    nodes = spark.createDataFrame(
        [(i,) for i in range(16)], "node long"
    )
    if edges:
        e = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        e = spark.createDataFrame([], "id_a long, id_b long")
    fast = {
        (r.node, r.cluster_id)
        for r in connected_components(
            e, nodes=nodes, node_col="node", driver_threshold=10**6
        ).collect()
    }
    dist = {
        (r.node, r.cluster_id)
        for r in connected_components(
            e, nodes=nodes, node_col="node", driver_threshold=0
        ).collect()
    }
    assert fast == dist


# --- round-4 primitives: exact_ntile model + Avro codec round-trip ---------

@given(
    n=st.integers(min_value=0, max_value=400),
    k=st.integers(min_value=1, max_value=17),
)
@settings(max_examples=30, deadline=None)
def test_exact_ntile_matches_standard_model(n, k):
    """exact_ntile as a PURE EXPRESSION must equal the standard NTILE
    model (first n%k buckets take ceil(n/k) rows) for every (rank, n, k)
    — evaluated symbolically via python ints, no Spark job needed (the
    expression is deterministic arithmetic on rn)."""
    from icebergproject_spark.llm.sharding import exact_ntile

    # reference model
    def ntile_model(rn: int) -> int:
        q, r = divmod(n, k)
        if q == 0:
            return rn
        thresh = r * (q + 1)
        if rn <= thresh:
            return (rn - 1) // (q + 1) + 1
        return r + (rn - thresh - 1) // q + 1

    # sizes: contiguous, depths differ by at most 1, ceil-first
    buckets = [ntile_model(rn) for rn in range(1, n + 1)]
    if n:
        from collections import Counter

        depth = Counter(buckets)
        assert sorted(depth) == list(range(1, min(n, k) + 1))
        assert max(depth.values()) - min(depth.values()) <= 1
        assert buckets == sorted(buckets)
        q, r = divmod(n, k)
        if q and r:
            assert depth[1] == q + 1 and depth[min(n, k)] == q
    # and the Spark expression agrees (one tiny job for the whole case)
    if n and n <= 60:  # bound the Spark work per example
        import pyspark.sql.functions as FF
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            df = spark.range(1, n + 1).select(
                FF.col("id").alias("rn"),
                exact_ntile(FF.col("id"), n, k).alias("bin"),
            )
            got = {r2["rn"]: r2["bin"] for r2 in df.collect()}
            assert got == {rn: ntile_model(rn) for rn in range(1, n + 1)}


avro_value_st = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
    st.text(max_size=40),
)


@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "l": st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
                "s": st.text(max_size=60),
                "d": st.floats(allow_nan=False, width=64),
                "b": st.booleans(),
                "maybe": st.one_of(st.none(), st.integers(min_value=-(1 << 40), max_value=1 << 40)),
                "tags": st.dictionaries(st.text(min_size=1, max_size=8), st.text(max_size=10), max_size=4),
                "arr": st.lists(st.integers(min_value=-(1 << 40), max_value=1 << 40), max_size=6),
            }
        ),
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None)
def test_avro_ocf_roundtrip_property(tmp_path_factory, rows):
    """The Avro codec round-trips arbitrary records exactly (zigzag
    varints across the full long range, unicode strings, nullable
    unions, maps, arrays, IEEE doubles incl. ±inf and signed zero)."""
    from icebergproject_spark.lakehouse.avro_ocf import read_ocf, write_ocf

    schema = {
        "type": "record",
        "name": "prop",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "maybe", "type": ["null", "long"]},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    p = str(tmp_path_factory.mktemp("avro") / "p.avro")
    write_ocf(p, schema, rows)
    _, _, back = read_ocf(p)
    assert back == rows


@settings(max_examples=150, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=2, max_size=12), min_size=1, max_size=8
    ),
    pair=st.tuples(
        st.text(alphabet="ab", min_size=1, max_size=2),
        st.text(alphabet="ab", min_size=1, max_size=2),
    ),
)
def test_sql_windowed_bpe_merge_matches_greedy(words, pair):
    """The BPE oracle's merge application is a WINDOWED parity trick
    (gaps-and-islands: within a run of consecutive match positions,
    merges start at even offsets), not the sequential greedy scan — this
    pins their equivalence on adversarial inputs: a 2-letter alphabet
    forces left==right pairs over long identical-char runs ('aaaa' with
    (a,a) must yield [aa, aa], 'aaa' must yield [aa, a]), the exact
    shapes the corpus-learned merges never exercise."""
    import duckdb

    a, b = pair

    def greedy(syms):  # the Python kernel's reference semantics
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sy1 AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{w}__{k}', [{', '.join(repr(c) for c in w)}])"
            for k, w in enumerate(words)
        )
        + ") t(wid, syms)"
    )
    con.execute(f"CREATE TABLE best1 AS SELECT '{a}' AS l, '{b}' AS r2")
    rows = con.execute("""
WITH m1 AS (
    SELECT wid, n, i, s, lead(s) OVER (PARTITION BY wid ORDER BY i) AS s2
    FROM (
      SELECT wid, len(syms) AS n,
             UNNEST(range(1, len(syms) + 1)) AS i, UNNEST(syms) AS s
      FROM sy1
    )
), st1 AS (
    SELECT wid, i, s, s2,
           (mt AND ((i - MIN(i) OVER (PARTITION BY wid, grp)) % 2 = 0)) AS strt
    FROM (
      SELECT *, CASE WHEN mt THEN i - ROW_NUMBER() OVER (PARTITION BY wid, mt ORDER BY i) END AS grp
      FROM (
        SELECT wid, n, i, s, s2,
               COALESCE(s = (SELECT l FROM best1) AND s2 = (SELECT r2 FROM best1), FALSE) AS mt
        FROM m1
      )
    )
)
SELECT wid,
       array_agg(CASE WHEN strt THEN s || s2 ELSE s END ORDER BY i)
         FILTER (WHERE NOT COALESCE(lag_strt, FALSE)) AS syms
FROM (SELECT *, lag(strt) OVER (PARTITION BY wid ORDER BY i) AS lag_strt FROM st1)
GROUP BY wid
""").fetchall()
    got = {wid: syms for wid, syms in rows}
    for k, w in enumerate(words):
        assert got[f"{w}__{k}"] == greedy(list(w)), (w, a, b)


# --- incremental ANN maintenance == full rebuild, for ALL inputs ------------

@settings(max_examples=4, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),  # vector seed
    st.integers(min_value=2, max_value=7),          # split modulus
    st.integers(min_value=1, max_value=3),          # tables (L)
)
def test_ann_incremental_equals_full_for_all_splits(spark, seed, mod, tables):
    """The maintain-under-append invariant holds for ANY corpus and ANY
    append split, not just the fixture: ann_knn_graph_incremental(base,
    batch) over a random 40-vector corpus equals ann_knn_graph(base ∪
    batch) edge-for-edge — including empty batches (mod split may leave
    one side small) and multi-table candidate unions."""
    import numpy as np

    from icebergproject_spark.llm.similarity import (
        ann_knn_graph,
        ann_knn_graph_incremental,
    )

    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(size=6).round(3)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.where(f"vec_id % {mod} != 1")
    batch = df.where(f"vec_id % {mod} = 1")
    got = ann_knn_graph_incremental(
        base, batch, dim=6, k=2, planes=3, tables=tables
    )
    want = ann_knn_graph(df, dim=6, k=2, planes=3, tables=tables)
    key = lambda r: (r.query_id, r.neighbor_id, r.score, r.rank)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


# --- incremental connected components == full re-cluster, for ALL inputs ----

@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=29),
            st.integers(min_value=0, max_value=29),
        ),
        max_size=40,
    ),
    st.integers(min_value=2, max_value=7),  # node-split modulus
)
def test_cc_incremental_equals_full_for_all_splits(spark, raw_edges, mod):
    """The maintain-under-append invariant holds for ANY graph and ANY
    node split: stored = components over base-internal edges; maintain
    with every edge touching a batch node (+ the batch nodes) ==
    components over ALL edges and ALL nodes — including empty edge
    sets, self-loops, duplicates, and splits where the merged root is a
    batch node."""
    from icebergproject_spark.llm.dedup import (
        connected_components,
        connected_components_incremental,
    )

    nodes = list(range(30))
    in_batch = lambda n: n % mod == 0  # noqa: E731
    edges = spark.createDataFrame(
        raw_edges or [(0, 0)], "id_a long, id_b long"
    )
    if not raw_edges:
        edges = edges.limit(0)
    base_edges = edges.where(
        f"id_a % {mod} != 0 AND id_b % {mod} != 0"
    )
    new_edges = edges.where(f"id_a % {mod} = 0 OR id_b % {mod} = 0")
    base_nodes = spark.createDataFrame(
        [(n,) for n in nodes if not in_batch(n)], ["node"]
    )
    batch_nodes = spark.createDataFrame(
        [(n,) for n in nodes if in_batch(n)], ["node"]
    )
    all_nodes = spark.createDataFrame([(n,) for n in nodes], ["node"])
    stored = connected_components(base_edges, nodes=base_nodes)
    got = {
        r.node: r.cluster_id
        for r in connected_components_incremental(
            stored, new_edges, new_nodes=batch_nodes
        ).collect()
    }
    want = {
        r.node: r.cluster_id
        for r in connected_components(edges, nodes=all_nodes).collect()
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=29),
            st.integers(min_value=0, max_value=29),
        ),
        max_size=40,
    ),
    st.integers(min_value=2, max_value=7),  # node-split modulus
)
def test_cc_stored_layout_equals_full_for_all_splits(
    spark, tmp_path_factory, raw_edges, mod
):
    """The zero-full-scan layout preserves the maintain == rebuild
    invariant for ANY graph and ANY node split, INCLUDING the spill
    index after apply: the maintained table equals a full re-cluster
    and the stored index is exactly the cross-bucket membership set of
    the final assignment."""
    from icebergproject_spark.llm.dedup import (
        cc_assignment_store,
        connected_components,
        connected_components_incremental_stored,
    )

    nodes = list(range(30))
    in_batch = lambda n: n % mod == 0  # noqa: E731
    edges = spark.createDataFrame(
        raw_edges or [(0, 0)], "id_a long, id_b long"
    )
    if not raw_edges:
        edges = edges.limit(0)
    base_edges = edges.where(f"id_a % {mod} != 0 AND id_b % {mod} != 0")
    new_edges = edges.where(f"id_a % {mod} = 0 OR id_b % {mod} = 0")
    base_nodes = spark.createDataFrame(
        [(n,) for n in nodes if not in_batch(n)], ["node"]
    )
    batch_nodes = spark.createDataFrame(
        [(n,) for n in nodes if in_batch(n)], ["node"]
    )
    all_nodes = spark.createDataFrame([(n,) for n in nodes], ["node"])
    stored = connected_components(base_edges, nodes=base_nodes)
    st_dir = tmp_path_factory.mktemp("ccprop")
    store = cc_assignment_store(
        spark, str(st_dir), "db", "cc", assign=stored, n_buckets=4
    )
    connected_components_incremental_stored(
        store, new_edges, new_nodes=batch_nodes, apply=True
    )
    got = {
        r.node: r.cluster_id
        for r in store.assign.read().select("node", "cluster_id").collect()
    }
    want = {
        r.node: r.cluster_id
        for r in connected_components(edges, nodes=all_nodes).collect()
    }
    assert got == want
    rows = store.assign.read().select("node", "cluster_id").collect()
    need = {
        (r.cluster_id, r.node % 4)
        for r in rows
        if r.node % 4 != r.cluster_id % 4
    }
    have = (
        {tuple(r) for r in store.index.read().collect()}
        if store.index.current_snapshot() is not None
        else set()  # never-written index ⇔ no cross-bucket memberships
    )
    assert have == need


# --- round-13 hardening: partition-pruned reads equal a pure model ---------

#: identity-partition value pool: mixes fast-path-safe renderings
#: (``a.b-c_d``, ``UPPER``, ``0``, ``-1``) with values whose directory
#: name Spark must escape (space, ``=``, ``:``, ``/``, ``%``, ``#``,
#: unicode) — the latter MUST take the discovery+filter fallback, and
#: either path must return exactly the model's rows.
_IDENT_POOL = [
    "a b", "a=b", "a:b", "a/b", "a%b", "ü", "x#y",
    "a.b-c_d", "UPPER", "0", "-1", "plain",
]


@given(data=st.data())
@settings(max_examples=6, deadline=None)
def test_identity_partition_pruned_read_matches_model(
    spark, tmp_path_factory, data
):
    """read(partition_values=) over an identity-partitioned string
    column equals a pure-Python subset filter for ANY mix of safe and
    escape-needing partition values — the O(touched) fast path may only
    ever change HOW rows are found, never WHICH rows come back
    (guards tableformat.py's safe_vals gate; ADVICE r12 #1)."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog

    keys = data.draw(
        st.lists(st.sampled_from(_IDENT_POOL), min_size=1, max_size=8,
                 unique=True)
    )
    wanted = data.draw(
        st.lists(
            st.sampled_from(_IDENT_POOL + ["absent", "no such value"]),
            min_size=1, max_size=5, unique=True,
        )
    )
    base = tmp_path_factory.mktemp("prune_ident")
    t = LakehouseCatalog(spark, warehouse=str(base), db="propdb").table("T")
    t.set_partitioning("k", "identity")
    t.append(
        spark.createDataFrame(
            [(i, k) for i, k in enumerate(keys)], "i int, k string"
        )
    )
    got = {(r.i, r.k) for r in t.read(partition_values=wanted).collect()}
    want = {(i, k) for i, k in enumerate(keys) if k in set(wanted)}
    assert got == want


@given(
    keys=st.lists(
        st.integers(min_value=-60, max_value=60),
        min_size=1, max_size=12, unique=True,
    ),
    n=st.sampled_from([2, 7, 16]),
    wanted=st.lists(
        st.integers(min_value=-2, max_value=18),
        min_size=1, max_size=4, unique=True,
    ),
)
@settings(max_examples=6, deadline=None)
def test_mod_partition_pruned_read_matches_signed_model(
    spark, tmp_path_factory, keys, n, wanted
):
    """read(partition_values=) over a mod<N>-partitioned int column
    equals the documented sign-exact model ``((k % N) + N) % N`` for
    keys of EITHER sign — pmod's non-negative buckets, absent bucket
    ids, and out-of-range wanted values all reduce to the same subset
    filter (guards the mod<N> replay contract; ADVICE r12 #4)."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog

    base = tmp_path_factory.mktemp("prune_mod")
    t = LakehouseCatalog(spark, warehouse=str(base), db="propdb").table("M")
    t.set_partitioning("k", f"mod{n}")
    t.append(
        spark.createDataFrame([(k,) for k in keys], "k long")
    )
    got = sorted(r.k for r in t.read(partition_values=wanted).collect())
    want = sorted(k for k in keys if ((k % n) + n) % n in set(wanted))
    assert got == want


@given(
    longs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8
    ),
    ints=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8
    ),
    strs=st.lists(st.text(max_size=64), max_size=8),
)
@settings(max_examples=10, deadline=None)
def test_python_xxhash64_matches_spark(spark, longs, ints, strs):
    """The xxh64 replication (lakehouse/xxh64.py) must return Spark's
    own xxhash64 for every value — bigint/int scalars and vectorized,
    and arbitrary-unicode strings through every XXH64 length regime
    (empty / <4 / <8 / <32 / stripes).  This is the contract that lets
    the bloom read path hash literals with zero Spark jobs and the
    driver-side dir-bloom build coexist with the distributed one."""
    import numpy as np
    import pyspark.sql.functions as F

    from icebergproject_spark.lakehouse import xxh64 as xh

    cases = (
        [(v, "bigint") for v in longs]
        + [(v, "int") for v in ints]
        + [(v, "string") for v in strs]
    )
    if not cases:
        return
    exprs = [
        F.xxhash64(F.lit(v).cast(t)).alias(f"c{i}")
        for i, (v, t) in enumerate(cases)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, (v, t) in enumerate(cases):
        assert xh.spark_xxhash64(v, t) == row[f"c{i}"], (v, t)
    if longs:
        got = xh.hash_longs_np(np.array(longs, dtype=np.int64))
        assert [int(x) for x in got] == [
            xh.spark_xxhash64(v, "bigint") for v in longs
        ]
    if ints:
        got = xh.hash_ints_np(np.array(ints, dtype=np.int32))
        assert [int(x) for x in got] == [
            xh.spark_xxhash64(v, "int") for v in ints
        ]


def test_identity_partition_numeric_dirs_nonnumeric_wanted(
    spark, tmp_path_factory
):
    """Deterministic pin of the hypothesis-found ANSI trap (r13): when
    every stored identity-STRING partition value is numeric, Spark's
    partition discovery types __p as BIGINT, and the residual filter
    for an escape-needing wanted value ('a b' → discovery+filter
    fallback) used to THROW on the cast instead of matching nothing.
    The read must return exactly the model rows, matching on directory
    NAMES, not inferred types."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog

    base = tmp_path_factory.mktemp("prune_numdir")
    t = LakehouseCatalog(spark, warehouse=str(base), db="propdb").table("N")
    t.set_partitioning("k", "identity")
    t.append(
        spark.createDataFrame(
            [(0, "0"), (1, "-1")], "i int, k string"
        )
    )
    got = {
        (r.i, r.k)
        for r in t.read(partition_values=["a b", "0"]).collect()
    }
    assert got == {(0, "0")}
