"""Deduplication operators for document corpora.

Four strategies, cheapest → most general; all built from Spark built-ins
(no Python in the hot path):

- **exact_dedup** — hash-groupBy on content. One shuffle on a short digest
  key (never the full text). At 100 TB: shuffle carries (digest, doc_id)
  pairs only, the canonical-text lookup is a second, pruned pass.
- **ngram_jaccard_pairs** — *exact* near-dup pairs above a Jaccard
  threshold, via an inverted shingle index: explode shingles → self-join on
  shingle (only docs sharing ≥1 shingle ever meet) → count shared → integer
  Jaccard test. This is the exact counterpart the MinHash path approximates;
  the shuffle is on shingle hashes and candidate pairs, never all O(n²)
  pairs.
- **minhash_lsh_candidates** — MinHash signatures + LSH banding: k hash
  permutations via ``xxhash64(shingle, seed)``, per-band min → band
  signature → group docs by (band, signature). At 100 TB this is THE
  scalable near-dup path: cost is O(n·k) map-side plus a shuffle on band
  signatures.
- **simhash** — 64-bit SimHash fingerprint per document from token hash
  bit-votes; near-dups = fingerprints within small Hamming distance,
  found by banding the 64 bits into chunks (same LSH trick).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def content_digest(c: F.Column | str) -> F.Column:
    """Short stable digest for exact dedup — md5 hex of the raw content."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(col)


def exact_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the min-id representative per distinct content.

    Returns (doc_id, <content_col>, dup_cnt). groupBy(digest) would shuffle
    only 16-byte keys at scale; we group by the digest and keep
    min(content) (identical within a group) to avoid shuffling full texts
    twice.
    """
    return (
        df.groupBy(content_digest(content_col).alias("__digest"))
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.first(F.col(content_col)).alias(content_col),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .drop("__digest")
    )


def word_shingles(c: F.Column | str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Tokenize on single spaces (harness corpus is space-joined); slide a
    window of n via transform over token indexes — pure SQL expressions,
    fully codegen'd.
    """
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    grams = F.when(
        k <= 0, F.array(F.concat_ws(" ", toks))  # short doc: one shingle
    ).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 10,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs with J ≥ num/den.

    Inverted-index self-join: docs meet only on shared shingles, pair
    counts come from a groupBy — the integer test
    ``den*shared ≥ num*(|A|+|B|-shared)`` avoids float threshold edges.
    Output: (id_a, id_b, shared, size_a, size_b) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(content_col, n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    inv = sh.select("id", "sz", F.explode("sh").alias("g"))
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("size_a"),
            F.col("b.sz").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    thr = (F.lit(threshold_den) * F.col("shared")) >= (
        F.lit(threshold_num) * (F.col("size_a") + F.col("size_b") - F.col("shared"))
    )
    return pairs.filter(thr).select("id_a", "id_b", "shared", "size_a", "size_b")


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Deterministic, JVM-side, no UDFs."""
    flat = _minhash_flat(df, content_col, id_col, n, num_hashes)
    return flat.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _minhash_flat(
    df: DataFrame, content_col: str, id_col: str, n: int, num_hashes: int
) -> DataFrame:
    """(id, h0..h{k-1}) minhash columns via explode + min-aggregate.

    Faster than per-row array transforms (measured ~25% at sf0.1) and the
    scale-correct shape: the hash evaluation is a flat whole-stage-codegen
    projection over exploded shingles, and the groupBy(id) shuffle carries
    one partially-aggregated row per (partition, id) thanks to map-side
    combine — not one row per shingle.
    """
    # hash each shingle STRING once *inside* the transform (permutation i
    # re-hashes the 8-byte base — ~40% cheaper than num_hashes string
    # hashes) and skip array_distinct: duplicate shingles cannot change a
    # min, and exploding longs instead of strings shrinks the exploded
    # stream. Net ~30% over the distinct+string-explode shape at sf0.1.
    col = F.col(content_col)
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    grams = F.when(k <= 0, F.array(F.xxhash64(F.concat_ws(" ", toks)))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )
    )
    inv = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("b"))
    aggs = [F.min(F.xxhash64("b", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return inv.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: docs sharing any band signature are candidate near-dups.

    rows = num_hashes / bands per band; J ≈ (1/bands)^(1/rows) detection
    knee. Output: distinct (id_a, id_b) candidate pairs, id_a < id_b.
    At scale the only shuffle is groupBy(band, band_sig) on 16-byte keys.
    """
    rows = num_hashes // bands
    sigs = _minhash_flat(df, content_col, id_col, n, num_hashes)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * rows + r}") for r in range(rows)]
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.band_sig")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def verified_near_dups(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold_num: int = 3,
    threshold_den: int = 10,
) -> DataFrame:
    """The production two-tier near-dup pipeline: MinHash-LSH generates
    candidate pairs (cheap, possibly false-positive), then EXACT Jaccard
    is computed for candidates only — shingle sets joined back per pair,
    intersection via array_intersect, integer threshold test.

    At 100 TB this is the shape that works: the exact inverted-index
    self-join on the full corpus explodes on frequent shingles, while
    here the expensive comparison runs on |candidates| pairs (linear-ish
    in corpus size by LSH design). False positives are eliminated;
    recall is the LSH recall (pytest-measured vs the exact path).
    Output: (id_a, id_b, shared, size_a, size_b) like the exact variant.
    """
    cand = minhash_lsh_candidates(df, content_col, id_col, n, num_hashes, bands)
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(content_col, n).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    sa, sb = F.size("sh_a"), F.size("sh_b")
    return (
        joined.select(
            "id_a", "id_b",
            shared.alias("shared"),
            sa.alias("size_a"),
            sb.alias("size_b"),
        )
        .filter(
            F.lit(threshold_den) * F.col("shared")
            >= F.lit(threshold_num)
            * (F.col("size_a") + F.col("size_b") - F.col("shared"))
        )
    )


def simhash64(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document.

    Classic bit-vote: for each token hash, bit i votes +1 if set else -1;
    fingerprint bit i = 1 iff the vote is positive.

    Shape: explode distinct tokens to flat (id, hash) rows, then ONE
    groupBy with 64 conditional sums. The sums are plain whole-stage-
    codegen'd aggregates with map-side partial combine — the shuffle
    carries 64 longs per (partition, id), and per-row work is 64 ANDs,
    not 64 interpreted array-fold passes (the previous nested
    ``F.aggregate`` form; this one measures ~5× faster at sf0.1).

    Contract: ONE output row per DISTINCT id (duplicate-id input rows
    collapse into a single vote — identical text votes identically, mixed
    text yields the merged-token fingerprint).  Rows with NULL text are
    PRESERVED (``explode_outer``) and get the all-zero fingerprint 0 —
    they don't silently vanish from downstream anti-joins.
    """

    def bit_mask(i: int) -> F.Column:
        # bit 63 is the sign bit: 1<<63 overflows signed long, use its
        # two's-complement value instead
        return F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")

    toks = F.array_distinct(F.split(F.col(content_col), " "))
    flat = df.select(
        F.col(id_col).alias("id"), F.explode_outer(toks).alias("t")
    ).select(
        # NULL text → one row with h NULL → every vote sums to NULL →
        # every `v > 0` is false → fingerprint 0 (not a dropped row)
        "id",
        F.when(F.col("t").isNotNull(), F.xxhash64("t")).alias("h"),
    )
    votes = flat.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(bit_mask(i)) != 0, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    fp = None
    for i in range(64):
        term = F.when(F.col(f"v{i}") > 0, bit_mask(i)).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp.bitwiseOR(term)
    return votes.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into ``chunks`` 16-bit
    pieces — any pair within Hamming distance < chunks shares ≥1 piece
    (pigeonhole) — then verify exact Hamming ≤ max_hamming."""
    fp = simhash64(df, content_col, id_col)
    pieces = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("piece"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("p"),
    ).select("id", "simhash", "p.chunk", "p.piece")
    a, b = pieces.alias("a"), pieces.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve duplicate-candidate pairs into clusters: connected
    components by iterative min-label propagation.

    Each iteration is join + groupBy (two shuffles) pushing the smallest
    reachable id one hop further; iterations needed = graph diameter.
    Near-dup graphs are unions of near-cliques (every copy pairs with most
    others), so diameter is tiny and this converges in 2–3 rounds.
    ``localCheckpoint`` truncates lineage each round — without it the plan
    doubles per iteration and the 100 TB job dies in the optimizer, not
    the executors. For adversarial long-chain graphs swap in the
    large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — same DataFrame shapes,
    O(log² n) rounds; not needed for dedup workloads.

    Returns (node, cluster_id): cluster_id = min node id in the component.
    Nodes absent from any edge (if ``nodes`` given) are singletons.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    # materialize the edge set once — it is re-joined every iteration, and
    # an expensive upstream (e.g. the n-gram inverted-index self-join that
    # produces near-dup pairs) must not be recomputed per round
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["s"] == labels["node"])
            .groupBy(F.col("d").alias("nbr"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["nbr"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    out = labels.select("node", F.col("label").alias("cluster_id"))
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_col).alias("node"))
        out = all_nodes.join(out, "node", "left").select(
            "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
        )
    return out


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact embedding near-dup: (id_a, id_b, score) pairs with rounded
    cosine ≥ threshold, id_a < id_b. All-pairs — the verification/baseline
    tier; use :func:`embedding_near_pairs_lsh` as the 100 TB path.

    Implemented as **blocked matrix multiplication**: rows hash into
    ``n_blocks`` blocks, each of the (n_blocks+1 choose 2) block pairs
    becomes one ``applyInPandas`` group computing a BLAS gemm for its
    tile (~10× faster than per-pair JVM expression evaluation, measured
    at sf0.1). Shuffle volume is n·(n_blocks+1) vectors; tile tasks are
    independent, so parallelism scales with n_blocks², not executors×1.

    The candidate cut inside the kernel uses ``threshold - 1e-7``; the
    final cut re-rounds in Spark (HALF_UP, 6 places) so the boundary
    semantics are engine-stable and identical to a SQL oracle.
    """
    import pandas as pd

    if n_blocks is None:
        # ~25k vectors per block keeps a tile's two blocks comfortably in
        # one task's memory (25k × 64 dims × 8 B ≈ 13 MB a side) while the
        # tile count b(b+1)/2 still saturates executors; floor of 4 keeps
        # small inputs parallel, cap 256 bounds the replication factor
        n = df.count()
        n_blocks = min(256, max(4, n // 25_000 + 1))
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    rows = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), blk.alias("b")
    )
    # a row in block b belongs to tile (min(b,k), max(b,k)) for every k —
    # explode that list instead of joining a tile table (narrow op, no
    # join; the only exchange left is the groupBy(p,q) tile shuffle)
    tiles_of_b = F.array(
        *[
            F.struct(
                F.least(F.col("b"), F.lit(k)).alias("p"),
                F.greatest(F.col("b"), F.lit(k)).alias("q"),
            )
            for k in range(n_blocks)
        ]
    )
    repl = rows.select("id", "v", "b", F.explode(tiles_of_b).alias("pq")).select(
        "id", "v", "b", "pq.p", "pq.q"
    )
    loose = threshold - 1e-7

    def score_tile(key, pdf):
        import numpy as np

        p, q = key
        left = pdf[pdf.b == p]
        right = pdf[pdf.b == q]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "raw": []})
        a = np.stack(left.v.to_numpy()).astype(np.float64)
        bm = np.stack(right.v.to_numpy()).astype(np.float64)
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(bm, axis=1)
        s = (a @ bm.T) / (na[:, None] * nb[None, :])
        ia, ib = np.where(s >= loose)
        ids_a = left.id.to_numpy()[ia]
        ids_b = right.id.to_numpy()[ib]
        lo = np.minimum(ids_a, ids_b)
        hi = np.maximum(ids_a, ids_b)
        keep = ids_a != ids_b
        if p == q:  # diagonal tile sees both (i,j) and (j,i)
            keep &= ids_a < ids_b
        return pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "raw": s[ia, ib][keep]}
        )

    tiles = repl.groupBy("p", "q").applyInPandas(
        score_tile, "id_a long, id_b long, raw double"
    )
    return tiles.select(
        "id_a", "id_b", F.round("raw", 6).alias("score")
    ).filter(F.col("score") >= threshold)


def embedding_near_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate embedding near-dup: hyperplane-LSH bucket both sides,
    score only same-bucket pairs. Replaces the O(n²) cross join with a
    bucket equi-join (expected ~2^planes× fewer scored pairs); recall <1
    for pairs straddling a hyperplane — raise recall by lowering
    ``planes`` or multi-probing. Same output shape as the exact variant.
    """
    from icebergproject_spark.llm.similarity import _dot, hyperplane_bucket, l2_norm

    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
        hyperplane_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    score = F.round(
        _dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
