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
from pyspark.sql.window import Window


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

    Tokenize on single spaces (harness corpus is space-joined); build the
    sliding window as a ``zip_with`` of n SHIFTED SLICES of the token
    array — n slices per row, O(L) total work.  (The obvious
    transform-over-indexes form is an O(L²) trap: Catalyst inlines the
    ``split`` into every per-index ``slice``, re-tokenizing the document
    once per gram — measured 5× slower at sf0.1.)
    """
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    zipped = F.slice(toks, 1, k)
    for j in range(1, n):
        zipped = F.zip_with(
            zipped, F.slice(toks, j + 1, k), lambda x, y: F.concat_ws(" ", x, y)
        )
    grams = F.when(
        k <= 0, F.array(F.concat_ws(" ", toks))  # short doc: one shingle
    ).otherwise(zipped)
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 10,
    max_df: int | None = None,
    expand_cap: int = 64,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs with J ≥ num/den.

    Inverted-index self-join: docs meet only on shared shingles, pair
    counts come from a groupBy — the integer test
    ``den*shared ≥ num*(|A|+|B|-shared)`` avoids float threshold edges.
    Output: (id_a, id_b, shared, size_a, size_b) with id_a < id_b.

    ``max_df`` caps shingle DOCUMENT FREQUENCY: shingles appearing in
    more than ``max_df`` docs are dropped from the index (and from the
    per-doc set sizes — Jaccard is then over the reduced shingle
    universe).  A shingle in k docs contributes k² join rows, so one
    corpus-wide stop-phrase makes the self-join quadratic; capping bounds
    each gram's fan-out at max_df² while near-dup pairs — which share
    mostly RARE shingles — keep their score.  Standard near-dup practice
    (df-capped shingling); the hot-gram list is tiny and broadcast.

    With ``max_df`` set, pair generation also switches from the
    inverted-index SELF-JOIN to GROUPED-PAIR EXPANSION: one shuffle
    groups postings per gram (arrays bounded by max_df — that bound is
    what makes the collect safe), pairs expand map-side from the sorted
    array, and only the pair aggregate shuffles after that.  Measured
    ~2× faster than the self-join at sf0.1; without a df bound the
    grouped array for a hot gram is a single-row memory blowup, so the
    uncapped path keeps the join (skew degrades gracefully, AQE splits).
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(content_col, n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    # join on the 8-byte xxhash of the gram, not the gram string: the
    # shuffle carries longs, compares are single instructions, and the
    # output columns are counts only so the key never surfaces (collision
    # odds across engines ~|grams|²/2⁶⁴ — vanishing)
    inv = sh.select("id", "sz", F.explode("sh").alias("g0")).select(
        "id", "sz", F.xxhash64("g0").alias("g")
    )
    if max_df is not None:
        # single-pass capped form: ONE groupBy(gram) both enforces the df
        # cap (postings arrays longer than max_df drop whole — they are
        # the hot grams) and feeds (a) per-doc sizes over the RETAINED
        # universe and (b) map-side pair expansion from the bounded,
        # sorted postings array.  Three shuffles total; no anti-join, no
        # second scan of the inverted index.
        postings = (
            inv.groupBy("g")
            .agg(F.array_sort(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") <= max_df)
        )
        postings = postings.localCheckpoint(eager=True)  # reused twice
        sizes = (
            postings.select(F.explode("ids").alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        pair_arr = F.expr(
            """
            flatten(transform(ids, (a, i) ->
              transform(slice(ids, i + 2, size(ids) - i - 1), b ->
                struct(a AS id_a, b AS id_b))))
            """
        )
        shared = (
            postings.filter(F.size("ids") >= 2)
            .select(F.explode(pair_arr).alias("p"))
            .groupBy("p.id_a", "p.id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
        pairs = shared.join(sa, "id_a").join(sb, "id_b")
    else:
        # exact hybrid (no df cap): ONE groupBy(gram) builds postings
        # arrays, pairs expand MAP-SIDE from the sorted array for normal
        # grams, and only grams hotter than ``expand_cap`` docs fall back
        # to the inverted-index self-join (bounded to the hot slice, so
        # no single collect_list row can blow up memory).  Exactly the
        # same pair multiset as the plain self-join — same counts, same
        # output — but one shingle build + one big shuffle instead of
        # two of each (measured ~30% faster at sf0.1; the bound, not the
        # speedup, is why the expansion is safe uncapped).
        postings = (
            inv.select("id", "g")
            .groupBy("g")
            .agg(F.array_sort(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") >= 2)
            # materialized once: both arms read it (the plan audit shows
            # Catalyst does NOT reuse the exchange across the two
            # filter branches — without this the scan+shuffle run twice)
            .localCheckpoint(eager=True)
        )
        pair_arr = F.expr(
            """
            flatten(transform(ids, (a, i) ->
              transform(slice(ids, i + 2, size(ids) - i - 1), b ->
                struct(a AS id_a, b AS id_b))))
            """
        )
        small_pairs = (
            postings.filter(F.size("ids") <= expand_cap)
            .select(F.explode(pair_arr).alias("p"))
            .select("p.id_a", "p.id_b")
        )
        hot = postings.filter(F.size("ids") > expand_cap).select(
            "g", F.explode("ids").alias("id")
        )
        a, b = hot.alias("a"), hot.alias("b")
        hot_pairs = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id"))
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        shared = (
            small_pairs.unionByName(hot_pairs)
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        sizes = sh.select("id", "sz")
        sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
        pairs = shared.join(sa, "id_a").join(sb, "id_b")
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
    # hash each shingle STRING once (permutation i re-hashes the 8-byte
    # base — ~40% cheaper than num_hashes string hashes) and skip
    # array_distinct: duplicate shingles cannot change a min, and
    # exploding longs instead of strings shrinks the exploded stream.
    # Shingles come from zip_with'd shifted slices (O(L) per row — the
    # transform-over-indexes form re-splits the text per gram, O(L²)).
    col = F.col(content_col)
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    zipped = F.slice(toks, 1, k)
    for j in range(1, n):
        zipped = F.zip_with(
            zipped, F.slice(toks, j + 1, k), lambda x, y: F.concat_ws(" ", x, y)
        )
    grams = F.when(k <= 0, F.array(F.xxhash64(F.concat_ws(" ", toks)))).otherwise(
        F.transform(zipped, lambda s: F.xxhash64(s))
    )
    inv = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("b"))
    aggs = [F.min(F.xxhash64("b", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return inv.groupBy("id").agg(*aggs)


def banded_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The (id, band, band_sig) stream :func:`minhash_lsh_candidates`
    self-joins — exposed because it is also the STORED STATE of the
    incremental dedup tier: production persists this table once and
    appends each batch's rows, so a daily batch pays |batch| × bands
    signature rows, never a corpus re-band (the contract
    :func:`incremental_near_dups` documents and
    :func:`incremental_lsh_candidates` consumes)."""
    rows = num_hashes // bands
    sigs = _minhash_flat(df, content_col, id_col, n, num_hashes)
    return sigs.select(
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


def incremental_lsh_candidates(
    batch_bands: DataFrame, stored_bands: DataFrame
) -> DataFrame:
    """Candidate near-dup pairs TOUCHING an append batch, against stored
    band signatures: batch×stored bucket hits plus batch×batch internal
    hits — exactly the edge set :func:`connected_components_incremental`
    needs to maintain a stored cluster assignment.

    Scale shape: the batch side is broadcast (a bounded nightly append),
    so the O(corpus) stored-bands table is met by ONE streamed
    broadcast-hash join — no shuffle of the stored side, the same
    two-broadcast contract as the assignment write-back.  Output:
    distinct (id_a, id_b), id_a < id_b.
    """
    nb = batch_bands.select(
        F.col("id").alias("nid"), "band", "band_sig"
    )
    hist = stored_bands.join(F.broadcast(nb), ["band", "band_sig"]).filter(
        F.col("id") != F.col("nid")
    )
    n2 = nb.select(F.col("nid").alias("nid2"), "band", "band_sig")
    intra = nb.join(F.broadcast(n2), ["band", "band_sig"]).filter(
        F.col("nid") < F.col("nid2")
    )
    return (
        hist.select(
            F.least("id", "nid").alias("id_a"),
            F.greatest("id", "nid").alias("id_b"),
        )
        .union(
            intra.select(
                F.col("nid").alias("id_a"), F.col("nid2").alias("id_b")
            )
        )
        .distinct()
    )


def bands_table(
    spark,
    warehouse: str,
    db: str,
    name: str,
    bands: DataFrame | None = None,
    n_buckets: int = 4096,
):
    """Create (and optionally seed) the BUCKETED stored-bands table —
    hidden-partitioned ``bucket{n_buckets}(band_sig)`` (xxhash64, the
    Iceberg bucket[N] shape) so :func:`incremental_lsh_candidates_bucketed`
    can read only the signature buckets a batch actually hashes into.
    The bucket width should comfortably exceed a batch's distinct
    signature count (|batch| × bands): pruning reads ≤ that many
    directories however large the corpus grows.  Seeded one file per
    occupied bucket (the co-locating repartition below — same 100 TB
    layout lesson as :func:`cc_assignment_table`)."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseTable

    tbl = LakehouseTable(spark, warehouse, db, name)
    tbl.set_partitioning("band_sig", f"bucket{n_buckets}")
    if bands is not None:
        tbl.append(
            bands.repartition(
                F.pmod(F.xxhash64("band_sig"), F.lit(n_buckets))
            )
        )
    return tbl


def incremental_lsh_candidates_bucketed(
    batch_bands: DataFrame, bands_tbl, n_buckets: int = 4096
) -> DataFrame:
    """:func:`incremental_lsh_candidates` against a BUCKETED stored-bands
    lakehouse table (from :func:`bands_table`): identical output, but the
    stored side is read partition-pruned — the batch's band signatures
    hash to a bounded set of buckets (≤ |batch| × bands of
    ``n_buckets``), and only those directories are listed into the scan
    (planning-time O(touched), PartitionFilters — pinned in
    tests/test_llm.py).  This closes the LAST O(corpus) touch in the
    dedup maintenance read path: with it, a batch costs O(batch) banding
    + O(touched-bucket) edge probe + O(touched-label-bucket) relabel
    read + O(payload) equality-delete upsert — nothing scales with the
    corpus except the one narrow node→label probe.

    Exactness: a stored row can only join a batch row if they share
    ``band_sig``, every such row hashes into a touched bucket, and rows
    outside touched buckets match nothing — the pruned relation is a
    superset of the join's stored-side support.

    ``n_buckets`` must equal the table's ``bucket<N>`` width or bucket
    ids are computed under the wrong modulus and stored candidates are
    silently dropped — validated here against the table's own partition
    spec (mirroring ``connected_components_incremental_bucketed``)."""
    spec = bands_tbl._partition_spec()
    want = {"column": "band_sig", "transform": f"bucket{n_buckets}"}
    if spec != want:
        raise ValueError(
            f"bands_tbl must be partitioned {want}, got {spec} "
            "(create it with bands_table(n_buckets=...) and pass the "
            "same n_buckets here)"
        )
    nb = batch_bands.select(
        F.col("id").alias("nid"), "band", "band_sig"
    ).localCheckpoint(eager=True)  # bucket-id collect + both joins reuse it
    bucket_ids = sorted(
        r[0]
        for r in nb.select(
            F.pmod(F.xxhash64("band_sig"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    )
    stored = bands_tbl.read(partition_values=bucket_ids)
    hist = stored.join(F.broadcast(nb), ["band", "band_sig"]).filter(
        F.col("id") != F.col("nid")
    )
    n2 = nb.select(F.col("nid").alias("nid2"), "band", "band_sig")
    intra = nb.join(F.broadcast(n2), ["band", "band_sig"]).filter(
        F.col("nid") < F.col("nid2")
    )
    return (
        hist.select(
            F.least("id", "nid").alias("id_a"),
            F.greatest("id", "nid").alias("id_b"),
        )
        .union(
            intra.select(
                F.col("nid").alias("id_a"), F.col("nid2").alias("id_b")
            )
        )
        .distinct()
    )


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

    Pair generation stays a banded SELF-join on purpose: both sides are
    the IDENTICAL canonical plan, so Spark's ReusedExchange computes the
    signature stream once (A/B-measured round 3 — a grouped-bucket
    rewrite with an eager checkpoint was ~0.4 s SLOWER at sf0.1 than the
    join it replaced; the ngram case needed grouped postings only
    because its two branches carry different filters, which defeats
    exchange reuse).
    """
    banded = banded_signatures(df, content_col, id_col, n, num_hashes, bands)
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


def minhash_sql_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Engine-portable MinHash signatures ``(id, h0..h{k-1})``:
    permutation *i* of shingle *g* is the first 12 hex digits of
    ``md5("<i>-<g>")`` as a (48-bit, positive) BIGINT.  Pure refactor out
    of :func:`minhash_lsh_sql_candidates` (identical expressions) so the
    estimator-error audit can reuse the exact signature chain."""
    col = F.col(content_col)
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    zipped = F.slice(toks, 1, k)
    for j in range(1, n):
        zipped = F.zip_with(
            zipped, F.slice(toks, j + 1, k), lambda x, y: F.concat_ws(" ", x, y)
        )
    # r13 (guide §2.3 "shuffle/evaluate fewer rows"): duplicate shingles
    # within a doc cannot change any min but each paid ``num_hashes``
    # md5s — array_distinct drops them before the explode.
    grams = F.array_distinct(F.when(k <= 0, F.array(col)).otherwise(zipped))
    inv = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))

    def hhex(i: int):
        return F.substring(
            F.md5(F.concat_ws("-", F.lit(str(i)), F.col("g"))), 1, 12
        )

    # r13: take the min over the 12-char hex PREFIX and convert once per
    # (id, permutation) after the aggregate — fixed-width lowercase hex
    # orders identically to its numeric value, so min(conv(x)) ==
    # conv(min(x)) and the conv+cast drops from per-shingle×k to
    # per-doc×k.  Measured (with array_distinct) 6.4 -> 5.2 s median /
    # 5.5 -> 4.0 s min on the full sf0.1 candidate pipeline, candidate
    # set exactly equal.
    agg = inv.groupBy("id").agg(
        *[F.min(hhex(i)).alias(f"__x{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id",
        *[
            F.conv(F.col(f"__x{i}"), 16, 10).cast("long").alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


def banded_sql_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """The ORACLE-strength twin of :func:`banded_signatures`: the same
    (id, band, band_sig) stream, but md5-derived
    (:func:`minhash_sql_signatures`) so any engine replays identical
    band keys bit-for-bit.  This is the stored-state schema of the
    incremental dedup tier at oracle strength — persist it per corpus,
    band each append batch with the SAME function, and
    :func:`incremental_lsh_candidates` generates the batch's candidate
    edges without re-banding the corpus (hash-proved equal to slicing
    the full :func:`minhash_lsh_sql_candidates` run by the registered
    head ``dedup_lsh_candidates_incremental``)."""
    rows = num_hashes // bands
    sigs = minhash_sql_signatures(df, content_col, id_col, n, num_hashes)
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"h{b * rows + r}").cast("string")
                                for r in range(rows)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.band_sig")


def minhash_lsh_sql_candidates(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate pairs at ORACLE strength: identical plan
    shape to :func:`minhash_lsh_candidates`, but every hash is
    cross-engine replayable — permutation *i* of shingle *g* is the
    first 12 hex digits of ``md5("<i>-<g>")`` as a (48-bit, positive)
    BIGINT, and the band key is the ':'-joined decimal rendering of the
    band's row minima.  Any engine with md5 mints the exact same
    signatures, bands, buckets, and therefore the exact same candidate
    set — the LSH *mechanism itself* is hash-checked, not just a
    downstream verification.

    Defaults 16 hashes / 8 bands / 2 rows put the detection knee at
    J* = (1/8)^(1/2) ≈ 0.35, protecting the J ≥ 0.3 operating point.
    The xxhash64 arm stays the production default (one string hash per
    shingle vs ``num_hashes`` md5s here — the md5 arm costs more per
    byte and exists for bit-exact replay).  Scale shape is unchanged:
    flat codegen projection over exploded shingles, map-side-combined
    min aggregate, one groupBy(band, band_sig)-shaped self-join on
    short string keys, ReusedExchange on the identical-plan sides.

    Output: (id_a, id_b, n_shared_bands), id_a < id_b.
    """
    banded = banded_sql_signatures(df, content_col, id_col, n, num_hashes, bands)
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_error_audit(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Estimator-quality audit for the MinHash mechanism: for every LSH
    candidate pair, the SIGNATURE-estimated Jaccard (fraction of the
    ``num_hashes`` positions that agree — the textbook unbiased
    estimator) side by side with the EXACT shingle-set Jaccard, plus the
    absolute error.  The measurement loop a production dedup pipeline
    needs before trusting a banding configuration: if ``abs_err`` drifts
    up, the permutation count is too low for the corpus' length profile.

    Everything is md5-derived (:func:`minhash_sql_signatures`), so a SQL
    oracle replays the estimator AND its ground truth bit-for-bit.

    Scale shape: the signature groupBy and the piece-bucket band join
    are the only corpus-wide shuffles; exact Jaccard (the expensive
    part) runs on |candidates| pairs only — same contract as
    :func:`verified_near_dups`.  Output: (id_a, id_b, n_agree, shared,
    size_a, size_b, est_jaccard, exact_jaccard, abs_err), id_a < id_b.
    """
    rows = num_hashes // bands
    sigs = minhash_sql_signatures(
        df, content_col, id_col, n, num_hashes
    ).localCheckpoint(eager=True)  # banding + both agree sides reuse it
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"h{b * rows + r}").cast("string")
                                for r in range(rows)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.band_sig")
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    sb = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    agree_expr = None
    for i in range(num_hashes):
        term = F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        agree_expr = term if agree_expr is None else agree_expr + term
    agreed = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", agree_expr.cast("long").alias("n_agree"))
    )
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(content_col, n).alias("sh")
    )
    ga = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    gb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    paired = (
        agreed.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("shared"),
            F.size("sh_a").cast("long").alias("size_a"),
            F.size("sh_b").cast("long").alias("size_b"),
        )
    )
    est_raw = F.col("n_agree").cast("double") / F.lit(num_hashes).cast("double")
    union = (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double")
    ex_raw = F.col("shared").cast("double") / union
    return paired.select(
        "id_a",
        "id_b",
        "n_agree",
        "shared",
        "size_a",
        "size_b",
        F.round(est_raw, 6).alias("est_jaccard"),
        F.round(ex_raw, 6).alias("exact_jaccard"),
        F.round(F.abs(est_raw - ex_raw), 6).alias("abs_err"),
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

    The verify joins carry xxhash64'd shingle arrays (8-byte longs), not
    the shingle strings: the two enrichment joins shuffle ~n·8 bytes per
    doc instead of the full n-gram text, and array_intersect compares
    longs.  Jaccard over hashed shingles equals Jaccard over shingles
    modulo 64-bit collisions (~|shingles|²/2⁶⁴ — the same vanishing-odds
    convention as the inverted index's hashed gram keys).
    """
    cand = minhash_lsh_candidates(df, content_col, id_col, n, num_hashes, bands)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.transform(word_shingles(content_col, n), lambda g: F.xxhash64(g)).alias("sh"),
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


def incremental_near_dups(
    df: DataFrame,
    is_new,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold_num: int = 3,
    threshold_den: int = 10,
) -> DataFrame:
    """Incremental (batch-vs-history) verified near-dup — the shape a
    CONTINUOUSLY-INGESTED corpus needs: only the new batch is banded
    against history, never history against itself (that work was already
    paid when each older batch arrived).  ``is_new`` is a boolean Column
    marking the incoming batch.

    Pipeline: MinHash-band the WHOLE corpus once (one slim (id, band,
    sig) stream, checkpointed because the new/history branches carry
    different filters — the documented exchange-reuse defeat), join
    new×history on band signature, exact-verify candidates with hashed
    shingle sets, then keep each new doc's SMALLEST matching history id
    (deterministic).  Cost per batch is |batch|·bands signatures + the
    candidate joins — independent of history SIZE beyond the signature
    join, which is the property that lets a 100 TB corpus absorb daily
    batches.  The streaming sibling (`streaming/runner.py`
    incremental dedup sink) persists the signature table instead of
    recomputing history signatures; this batch form recomputes so it
    stays a pure function of the input (and therefore oracle-checkable).

    Output: one row per DUPLICATE new document —
    (doc_id, dup_of, shared, size_new, size_hist), J ≥ num/den vs
    ``dup_of`` (the minimal matching history id).
    """
    rows_per = num_hashes // bands
    sigs = _minhash_flat(df, content_col, id_col, n, num_hashes)
    flags = df.select(F.col(id_col).alias("id"), is_new.alias("is_new"))
    banded = (
        sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[F.col(f"h{b * rows_per + r}") for r in range(rows_per)]
                            ).alias("band_sig"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bs"),
        )
        .select("id", "bs.band", "bs.band_sig")
        .join(flags, "id")
        .localCheckpoint(eager=True)
    )
    newb = banded.filter(F.col("is_new")).select("id", "band", "band_sig")
    hist = banded.filter(~F.col("is_new")).select(
        F.col("id").alias("hid"), "band", "band_sig"
    )
    cand = (
        newb.join(hist, ["band", "band_sig"])
        .select(F.col("id"), F.col("hid"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("__sid"),
        F.transform(word_shingles(content_col, n), lambda g: F.xxhash64(g)).alias("sh"),
    )
    a = sh.select(F.col("__sid").alias("id"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("__sid").alias("hid"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "id").join(b, "hid")
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    sa, sb = F.size("sh_a"), F.size("sh_b")
    verified = joined.select(
        F.col("id").alias(id_col),
        F.col("hid"),
        shared.alias("shared"),
        sa.alias("size_new"),
        sb.alias("size_hist"),
    ).filter(
        F.lit(threshold_den) * F.col("shared")
        >= F.lit(threshold_num)
        * (F.col("size_new") + F.col("size_hist") - F.col("shared"))
    )
    # smallest matching history id per new doc, carrying ITS pair stats
    best = F.min(
        F.struct("hid", "shared", "size_new", "size_hist")
    ).alias("m")
    return (
        verified.groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            F.col("m.hid").alias("dup_of"),
            F.col("m.shared").alias("shared"),
            F.col("m.size_new").alias("size_new"),
            F.col("m.size_hist").alias("size_hist"),
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
    """Fingerprint pairs by SimHash: band the 64 bits into ``chunks`` 16-bit
    pieces — any pair within Hamming distance < chunks shares ≥1 piece
    (pigeonhole) — then verify exact Hamming ≤ max_hamming.

    SCOPE: SimHash proximity means near-identical token DISTRIBUTIONS
    (order- and multiplicity-insensitive), NOT Jaccard overlap — measured
    ~16% recall vs the exact J≥0.3 pair set on the synthetic corpus
    (NOTES.md). Position it as a distribution-shift / boilerplate-family
    detector; the near-dup production path is `verified_near_dups`.

    The fingerprint relation is checkpointed before the banding
    self-join: it is tiny (one long per doc), and without the
    materialization BOTH join sides recompute the full explode +
    64-aggregate fingerprint pipeline (measured ~2× at sf0.1)."""
    fp = simhash64(df, content_col, id_col).localCheckpoint(eager=True)
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


def simhash64_sql(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document from MD5-NIBBLE token hashes — the
    engine-portable twin of :func:`simhash64` (``xxhash64`` is
    Spark-private; md5 is bit-identical in any engine, so a DuckDB
    oracle can replay the fingerprints, the banding, AND the Hamming
    verification — the full SimHash mechanism, not just a downstream
    check).

    Hash-bit convention (must only match the oracle, not any canonical
    integer layout): bit ``i`` of a token's 64-bit hash = bit ``i % 4``
    of the value of hex character ``i // 4`` (0-based, leftmost first)
    of ``md5(token)``.

    Same shape as ``simhash64``: explode distinct tokens, decode the 16
    nibbles once per (doc, token), then ONE groupBy with 64 conditional
    sums — plain codegen aggregates with map-side partial combine; the
    shuffle carries 64 longs per (partition, id).

    Output: ``(id, c0..c3)`` — the fingerprint as four 16-bit chunks
    (chunk c = vote bits [16c, 16c+16), LSB-first within the chunk).
    Chunked output is exactly what the banding join needs, keeps every
    value far from the BIGINT sign bit, and makes the Hamming distance
    a sum of four small ``bit_count`` terms in both engines.
    """
    toks = F.array_distinct(F.split(F.col(content_col), " "))
    flat = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("t")
    ).select("id", F.md5("t").alias("hx"))
    nib = flat.select(
        "id",
        *[
            F.conv(F.substring("hx", j + 1, 1), 16, 10)
            .cast("int")
            .alias(f"n{j}")
            for j in range(16)
        ],
    )
    votes = nib.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{i // 4}"), i % 4).bitwiseAND(1) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    chunk_cols = []
    for c in range(4):
        ch = None
        for j in range(16):
            term = F.when(F.col(f"v{16 * c + j}") > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            ch = term if ch is None else ch + term
        chunk_cols.append(ch.cast("int").alias(f"c{c}"))
    return votes.select("id", *chunk_cols)


def simhash_sql_near_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-pairs at ORACLE strength: md5-nibble fingerprints
    (:func:`simhash64_sql`), banded into the four 16-bit chunks, exact
    Hamming verify on candidates.

    EXACTNESS: with 4 bands and ``max_hamming <= 3``, pigeonhole
    guarantees every qualifying pair differs in at most 3 chunks, i.e.
    agrees on at least one — the banding loses NOTHING, so the output
    equals the brute-force all-pairs Hamming filter (pinned by
    ``tests/test_llm.py::test_simhash_sql_equals_bruteforce``) while the
    join stays a bucket equi-join on 16-bit pieces.  At 100 TB the only
    shuffles are the fingerprint groupBy and the piece-bucket join —
    never all O(n²) pairs.

    Fingerprints are checkpointed pre-join for the same reason as
    ``simhash_near_pairs``: tiny relation, and both join sides would
    otherwise recompute the 64-aggregate pipeline.
    """
    if max_hamming >= 4:
        raise ValueError(
            "simhash_sql_near_pairs bands into 4 chunks; max_hamming must "
            "be < 4 for the pigeonhole-exact candidate set"
        )
    fp = simhash64_sql(df, content_col, id_col).localCheckpoint(eager=True)
    pieces = fp.select(
        "id",
        "c0",
        "c1",
        "c2",
        "c3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"), F.col(f"c{c}").alias("piece")
                    )
                    for c in range(4)
                ]
            )
        ).alias("p"),
    ).select("id", "c0", "c1", "c2", "c3", "p.chunk", "p.piece")
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
            *[F.col(f"a.c{c}").alias(f"ac{c}") for c in range(4)],
            *[F.col(f"b.c{c}").alias(f"bc{c}") for c in range(4)],
        )
        .distinct()
    )
    ham = None
    for c in range(4):
        term = F.bit_count(F.col(f"ac{c}").bitwiseXOR(F.col(f"bc{c}")))
        ham = term if ham is None else ham + term
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 30,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Resolve duplicate-candidate pairs into clusters: connected
    components by alternating LARGE-STAR / SMALL-STAR contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14).

    Edge sets at or below ``driver_threshold`` take a DRIVER-SIDE
    union-find fast path instead: near-dup edge sets are SPARSE relative
    to the corpus (thresholded pairs, not documents), so even a 100 TB
    corpus commonly yields a few million edges — 2M (id, id) longs is
    ~32 MB, a bounded driver reduction in the same spirit as the PCA/
    k-means partials (llm/linalg.py), and O(E α(E)) beats ~10 Spark
    rounds by an order of magnitude in wall clock.  Larger edge sets run
    the distributed contraction unchanged; set ``driver_threshold=0`` to
    force it.

    Each round rewires every node toward the minimum id of its
    neighborhood: large-star points every neighbor LARGER than u at
    min(N(u) ∪ {u}); small-star collapses the smaller neighbors and u
    itself onto that minimum.  Components contract toward their min-id
    root in **O(log² n) rounds regardless of diameter** — a 10k-node
    path graph converges in ~10 rounds where min-label propagation needs
    10k (one hop per round).  Per round: two groupBy/join shuffles over
    the CURRENT edge set, which shrinks as stars collapse.
    ``localCheckpoint`` truncates lineage each round — without it the
    plan doubles per iteration and the 100 TB job dies in the optimizer,
    not the executors.  Convergence = edge multiset fixpoint, detected
    with an O(1)-row (count, xor-of-hashes) aggregate, not a full diff.

    Returns (node, cluster_id): cluster_id = min node id in the component.
    Nodes absent from any edge (if ``nodes`` given) are singletons.
    """
    # canonical directed form: u > v, self-loops dropped, deduped
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    # ONE job decides the path AND fetches the edges when small: collect
    # through a threshold+1 limit — if the limit wasn't hit we already
    # hold the full edge set (bounded by construction), else fall through
    # to the distributed contraction.  No checkpoint on this path: the
    # (possibly expensive) upstream pair generator runs exactly once,
    # inside this collect — materializing it first would pay an extra
    # write+read for nothing.  The distributed path below checkpoints
    # before iterating (there the generator WOULD rerun every round).
    edge_rows = e.limit(driver_threshold + 1).collect() if driver_threshold else None
    if edge_rows is not None and len(edge_rows) <= driver_threshold:
        from pyspark.sql.types import StructField, StructType

        spark = edges.sparkSession
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        touched: set = set()
        for row in edge_rows:
            touched.add(row.u)
            touched.add(row.v)
            ru, rv = find(row.u), find(row.v)
            if ru != rv:
                # union by min id keeps cluster_id = component minimum
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        rows = [(n, find(n)) for n in touched]
        id_type = e.schema["u"].dataType  # skip schema inference sampling
        schema = StructType(
            [StructField("node", id_type), StructField("cluster_id", id_type)]
        )
        out = (
            spark.createDataFrame(rows, schema)
            if rows
            else e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
        )
        if nodes is not None:
            all_nodes = nodes.select(F.col(node_col).alias("node"))
            # the driver-path result is an RDD-backed relation with UNKNOWN
            # plan stats, so without a hint this left join sort-merges —
            # shuffling the O(corpus) nodes side to meet a driver-bounded
            # right side.  Broadcast it whenever it provably fits (≤ 1M
            # (node, cluster) longs ≈ 16 MB payload): the corpus side then
            # streams through un-shuffled — the shape every cluster-
            # assignment consumer (dedup_clusters*, dataset_split) needs
            # at 100 TB.
            if len(rows) <= 1_000_000:
                out = F.broadcast(out)
            out = all_nodes.join(out, "node", "left").select(
                "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
            )
        return out
    # distributed path: pin the canonical edge set so the upstream pair
    # generator does not recompute every contraction round
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        # -- large-star: neighbors bigger than u attach to u's min ------
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("mv"), F.col("u"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))  # v > u ≥ m
            .distinct()
        )
        # -- small-star: u and its smaller neighbors collapse onto min --
        mins2 = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            # DECIMAL(38,0) sum: exact and overflow-free under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixpoint edge set is a star forest u → root(v); roots label themselves
    out = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    )
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_col).alias("node"))
        out = all_nodes.join(out, "node", "left").select(
            "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
        )
    return out


def _cc_inc_prepare(
    a: DataFrame,
    new_edges: DataFrame,
    src: str,
    dst: str,
    new_nodes: DataFrame | None,
    node_col: str,
    bcast,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared front half of the incremental-CC variants: canonicalize
    the batch edges, derive the touched-node set, and read the touched
    nodes' stored labels out of ``a`` with ONE probe join.  Returns
    (canonical_edges, touched_nodes, touched_labels) — each O(batch)
    and localCheckpointed where multiple consumers follow."""
    e = (
        new_edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # endpoints + label join + contraction reuse it
    )
    # touched nodes = edge endpoints ∪ declared batch nodes; ONE
    # broadcast scan of the stored assignment reads their labels out.
    # Including new_nodes in the probe costs nothing extra and makes a
    # REPLAYED batch (nodes already merged into the store by a prior
    # attempt) degrade gracefully: store-present nodes route through the
    # stored side instead of re-emitting themselves as singletons —
    # pinned by test_cc_incremental_replay_is_idempotent.
    eps = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    touched = (
        eps
        if new_nodes is None
        else eps.union(new_nodes.select(F.col(node_col).alias("node"))).distinct()
    ).localCheckpoint(eager=True)  # O(batch) rows, consumed by the store
    # probe's broadcast AND the fresh anti-join — un-pinned, the union's
    # source scans re-run per consumer (measured ~2s at the probe's 64×)
    lab = (
        a.join(bcast(touched), "node")
        .select("node", "cluster_id")
        .localCheckpoint(eager=True)  # reused for both edge endpoints
    )
    return e, touched, lab


def _cc_inc_remap(
    e: DataFrame,
    lab: DataFrame,
    bcast,
    max_iter: int,
    driver_threshold: int,
) -> DataFrame:
    """Shared middle: contract the batch edges onto the stored labels
    and mint the (old_label → root) relabel map — everything here is
    O(batch); the contraction runs on the label graph, whose size is
    ≤ |batch edges|."""
    lu = lab.select(F.col("node").alias("u"), F.col("cluster_id").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("cluster_id").alias("cv"))
    contracted = (
        e.join(bcast(lu), "u", "left")
        .join(bcast(lv), "v", "left")
        .select(
            F.coalesce("cu", F.col("u")).alias("la"),
            F.coalesce("cv", F.col("v")).alias("lb"),
        )
        .filter(F.col("la") != F.col("lb"))
    )
    # per-merged-component min label == min node id of the merged component
    roots = connected_components(
        contracted,
        src="la",
        dst="lb",
        max_iter=max_iter,
        driver_threshold=driver_threshold,
    )
    return (
        roots.filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("old_label"), F.col("cluster_id").alias("root"))
        .localCheckpoint(eager=True)  # stored-side + batch-side reuse it
    )


def _cc_inc_fresh_out(
    touched: DataFrame, lab: DataFrame, remap: DataFrame, bcast
) -> DataFrame:
    """Shared tail: label the genuinely-new nodes (touched but absent
    from the store) — their own id unless a batch edge merged them."""
    fresh = touched.join(bcast(lab.select("node")), "node", "left_anti")
    return fresh.join(
        bcast(remap), F.col("node") == F.col("old_label"), "left"
    ).select("node", F.coalesce("root", F.col("node")).alias("cluster_id"))


def _cc_inc_rebuild(
    a: DataFrame,
    e: DataFrame,
    touched: DataFrame,
    emit: str,
    max_iter: int,
    driver_threshold: int,
) -> DataFrame:
    """The flood-guard fallback: re-cluster from the stored STAR FOREST
    plus the batch edges — exact because contracting a graph onto its
    components preserves connectivity and every stored label is already
    the min node id of its old component, so CC over (star edges ∪
    batch edges) mints exactly the labels a rebuild over base ∪ batch
    edges would.  O(corpus) by design (that is the regime the guard
    fires in); skips every broadcast of batch-derived state, which is
    precisely what stops scaling when the batch floods the store."""
    star = a.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    all_edges = star.union(
        e.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    )
    all_nodes = a.select("node").union(touched).distinct()
    rebuilt = connected_components(
        all_edges,
        nodes=all_nodes,
        max_iter=max_iter,
        driver_threshold=driver_threshold,
    )
    if emit == "merged":
        return rebuilt
    old = a.select("node", F.col("cluster_id").alias("__old"))
    return (
        rebuilt.join(old, "node", "left")
        .filter(
            F.col("__old").isNull() | (F.col("__old") != F.col("cluster_id"))
        )
        .select("node", "cluster_id")
    )


def _cc_guard_decision(
    a: DataFrame,
    lab: DataFrame,
    rebuild_threshold: float,
    stats: dict | None,
) -> bool:
    """Flood-guard arithmetic, shared by both incremental-CC variants and
    mirroring ``ann_knn_graph_incremental``'s contract exactly: touched
    fraction = distinct stored labels touched / distinct stored labels,
    in EXACT integer ppm (both sides are bounded counts; the ratio is
    integer division, so a SQL oracle replays the decision bit-for-bit)."""
    n_t = lab.select("cluster_id").distinct().count()
    n_all = a.select("cluster_id").distinct().count()
    frac_ppm = n_t * 1_000_000 // max(n_all, 1)
    chose = frac_ppm >= int(round(rebuild_threshold * 1_000_000))
    if stats is not None:
        stats["touched_fraction_ppm"] = frac_ppm
        stats["chose_rebuild"] = chose
    return chose


def connected_components_incremental(
    assign: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    new_nodes: DataFrame | None = None,
    node_col: str = "node",
    emit: str = "merged",
    max_iter: int = 30,
    driver_threshold: int = 2_000_000,
    broadcast_batch: bool = True,
    rebuild_threshold: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Maintain a stored connected-components assignment under an APPEND
    batch of edges/nodes — the dedup-tier sibling of
    ``ann_knn_graph_incremental`` / ``pagerank_micro_delta``: instead of
    re-clustering the whole corpus when a day's documents arrive, contract
    only the clusters the new edges touch.

    ``assign`` is the stored state — (node, cluster_id) with cluster_id =
    min node id of the component, exactly :func:`connected_components`'s
    output contract.  ``new_edges`` are the batch's candidate pairs (e.g.
    the batch-vs-history LSH join of :func:`incremental_near_dups`);
    ``new_nodes`` the batch's nodes (singletons unless edged).  Append
    semantics only: edges merge components, never split them (near-dup
    corpora are append-mostly; deletions need a rebuild, same contract as
    every monotone IVM).  A REPLAYED batch (its nodes already merged into
    the store by a prior attempt) is a no-op: store-present nodes route
    through the stored side, already-merged edges contract to nothing,
    and ``emit="updates"`` returns an empty payload — foreachBatch sinks
    can MERGE the output without an external dedup fence.

    Why this is exact: each stored cluster_id is the MIN node of its old
    component, and each genuinely-new node's label is its own id, so
    contracting the batch edges onto those labels and taking per-component
    min-of-labels yields the min node id of every MERGED component — the
    same label a full rebuild over base ∪ batch edges would mint.  No
    float, no order dependence; maintain == rebuild bit-for-bit (pinned by
    a hypothesis property test over arbitrary graphs and splits, and
    hash-proven against a DuckDB full-rebuild oracle by the registered
    head ``dedup_clusters_incremental``).

    Scale shape (the reason this exists): the stored assignment — the
    O(corpus) side — is touched by exactly TWO broadcast hash joins and
    never shuffled: one inner join against the broadcast batch-endpoint
    set (to read the touched labels out) and one left join against the
    broadcast relabel map (to write the merged labels back).  Everything
    else — canonicalization, contraction (:func:`connected_components`
    on the label graph, whose size is ≤ |new_edges|), the relabel map —
    is O(batch).  With ``emit="updates"`` the output is only the rows a
    MERGE INTO needs (changed stored rows + all batch rows), so a 100 TB
    corpus absorbs a daily batch at O(batch) shuffle + one columnar scan
    of the assignment table.  Reference parity: the reference's dim
    upsert pipeline (dim/DimDataToHBase.scala:79-110) maintains stored
    state per micro-batch; this maintains the dedup CLUSTER state the
    same way.

    ``broadcast_batch=True`` (the default, the bounded-nightly-append
    contract) broadcast-hints every batch-derived side; flip it off for
    a backfill-sized batch whose endpoint set would not fit a broadcast
    — the joins then fall back to Catalyst's own strategy (AQE picks
    shuffle or broadcast from runtime sizes) with identical results
    (pinned by test_cc_incremental_no_broadcast_same_result).

    ``rebuild_threshold`` (the FLOOD GUARD — policy parity with
    ``ann_knn_graph_incremental``'s, VERDICT r11 ask #3): when the batch
    touches ≥ this fraction of the stored cluster labels (distinct
    stored labels touched / distinct stored labels, exact integer ppm —
    both sides bounded counts, the ratio replayable in ANSI SQL), fall
    back to a full re-cluster over the stored star forest ∪ batch edges
    instead of maintaining — the backfill regime where broadcasting
    batch-derived state stops paying (measured in
    tools/cc_incremental_probe.py --flood).  NEVER changes the result:
    the rebuild mints identical labels (contracting a graph onto its
    components preserves connectivity; stored labels are already
    component minima), pinned bit-equal by
    test_cc_flood_guard_both_regimes_equal and shipped at oracle
    strength by the registered head ``dedup_clusters_flood_guard``.
    ``stats``: pass a dict to receive ``touched_fraction_ppm`` and
    ``chose_rebuild``.

    Returns (node, cluster_id): the full merged assignment
    (``emit="merged"``) or the MERGE payload (``emit="updates"``).
    """
    if emit not in ("merged", "updates"):
        raise ValueError(f"emit must be 'merged' or 'updates', got {emit!r}")
    bcast = F.broadcast if broadcast_batch else (lambda d: d)
    a = assign.select(F.col(node_col).alias("node"), "cluster_id")
    e, touched, lab = _cc_inc_prepare(
        a, new_edges, src, dst, new_nodes, node_col, bcast
    )
    if rebuild_threshold is not None and _cc_guard_decision(
        a, lab, rebuild_threshold, stats
    ):
        return _cc_inc_rebuild(a, e, touched, emit, max_iter, driver_threshold)
    remap = _cc_inc_remap(e, lab, bcast, max_iter, driver_threshold)
    # write-back: ONE broadcast-remap scan of the stored assignment
    if emit == "updates":
        stored_out = a.join(
            bcast(remap), a["cluster_id"] == F.col("old_label")
        ).select("node", F.col("root").alias("cluster_id"))
    else:
        stored_out = a.join(
            bcast(remap), a["cluster_id"] == F.col("old_label"), "left"
        ).select(
            "node", F.coalesce("root", F.col("cluster_id")).alias("cluster_id")
        )
    # batch nodes: every touched node absent from the store (explicit
    # new_nodes and edge endpoints alike — store-present ones already
    # flowed through the stored side above)
    fresh_out = _cc_inc_fresh_out(touched, lab, remap, bcast)
    return stored_out.union(fresh_out)


def connected_components_incremental_bucketed(
    assign_tbl,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    new_nodes: DataFrame | None = None,
    node_col: str = "node",
    n_buckets: int = 16,
    max_iter: int = 30,
    driver_threshold: int = 2_000_000,
    rebuild_threshold: float | None = None,
    stats: dict | None = None,
    apply: bool = False,
    batch_id: str | None = None,
    fold_eq_debt: int | None = 16,
) -> DataFrame:
    """:func:`connected_components_incremental` against a STORED,
    hash-bucketed assignment — the storage/policy parity move the ANN
    tier proved out in round 11 (``ann_graph_incremental_bucketed``),
    applied to the one family that still paid an O(corpus) scan per
    batch (VERDICT r11 ask #1).

    ``assign_tbl`` is a :class:`~icebergproject_spark.lakehouse.
    tableformat.LakehouseTable` holding (``node_col``, cluster_id),
    hidden-partitioned ``set_partitioning("cluster_id",
    f"mod{n_buckets}")`` — plain-modulus bucketing so a SQL oracle can
    replay the partition arithmetic (``cluster_id % N``), exactly like
    Iceberg's bucket[N] minus the hash.  Use
    :func:`cc_assignment_table` to create/seed it one-file-per-bucket.

    What gets pruned vs the in-memory variant (whose write-back scans
    the whole assignment):

    - the PROBE (touched nodes → labels) still reads the full table
      once — it is keyed on ``node`` and the layout is keyed on
      ``cluster_id``; one narrow 2-column columnar scan, the documented
      residual;
    - the CHANGED-ROW read-out is partition-pruned: every stored row
      whose label changes has ``cluster_id ∈ old_labels``, so reading
      ``partition_values = {l % N for l in old_labels}`` lists ONLY the
      touched bucket directories (planning-time, PartitionFilters —
      pinned in tests/test_plans.py) instead of re-scanning the corpus;
    - the WRITE-BACK is :meth:`LakehouseTable.upsert_by_key` — one
      atomic equality-delete + append commit, O(changed + batch) write
      cost, zero table scan (``apply=True``; pass ``batch_id`` for
      exactly-once foreachBatch replay).

    Returns the MERGE payload (``emit="updates"`` shape: changed stored
    rows + all batch rows).  ``rebuild_threshold``/``stats``: same flood
    guard as the in-memory variant; the rebuild branch returns the
    payload computed from a full re-cluster (and, with ``apply=True``,
    still applies it through the same upsert).  Maintain == rebuild is
    hash-proved by the registered head ``dedup_clusters_bucketed``
    against the full-corpus recursive-closure oracle."""
    spec = assign_tbl._partition_spec()
    want = {"column": "cluster_id", "transform": f"mod{n_buckets}"}
    if spec != want:
        raise ValueError(
            f"assign_tbl must be partitioned {want}, got {spec} "
            "(create it with cc_assignment_table)"
        )
    bcast = F.broadcast
    a = assign_tbl.read().select(F.col(node_col).alias("node"), "cluster_id")
    e, touched, lab = _cc_inc_prepare(
        a, new_edges, src, dst, new_nodes, node_col, bcast
    )
    if rebuild_threshold is not None and _cc_guard_decision(
        a, lab, rebuild_threshold, stats
    ):
        payload = _cc_inc_rebuild(
            a, e, touched, "updates", max_iter, driver_threshold
        )
    else:
        remap = _cc_inc_remap(e, lab, bcast, max_iter, driver_threshold)
        # the buckets holding every to-be-relabeled stored row: O(merged
        # clusters) driver state, bounded by the batch edge count.
        # Restricted to labels that EXIST in the store — remap's domain
        # also covers fresh batch-node labels, which live in no stored
        # partition and would only widen the pruned read (and desync the
        # oracle-replayed count)
        stored_labels = lab.select(
            F.col("cluster_id").alias("old_label")
        ).distinct()
        bucket_ids = sorted(
            r[0]
            for r in remap.join(bcast(stored_labels), "old_label")
            .select(F.pmod("old_label", F.lit(n_buckets)).alias("b"))
            .distinct()
            .collect()
        )
        if stats is not None:
            # plain-modulus arithmetic — a SQL oracle replays the count
            stats["n_touched_buckets"] = len(bucket_ids)
        changed = (
            assign_tbl.read(partition_values=bucket_ids)
            .select(F.col(node_col).alias("node"), "cluster_id")
            .join(bcast(remap), F.col("cluster_id") == F.col("old_label"))
            .select("node", F.col("root").alias("cluster_id"))
            if bucket_ids
            else a.limit(0)
        )
        payload = changed.union(_cc_inc_fresh_out(touched, lab, remap, bcast))
    if node_col != "node":
        payload = payload.withColumnRenamed("node", node_col)
    if apply:
        payload = payload.localCheckpoint(eager=True)  # upsert reads it twice
        assign_tbl.upsert_by_key(payload, [node_col], batch_id=batch_id)
        if fold_eq_debt is not None:
            # bounded read debt without an external scheduler: fold the
            # accumulated equality deletes once they exceed the measured
            # knee (maybe_fold_eq_debt docstring / SCALE.md r13)
            assign_tbl.maybe_fold_eq_debt(fold_eq_debt)
    return payload


class CCStore:
    """Handle for the FULLY-PRUNED stored-assignment layout (see
    :func:`cc_assignment_store`): ``assign`` partitioned
    ``mod{n}(node)``, ``index`` — the (cluster_id, node_bucket) spill
    index — partitioned ``mod{n}(cluster_id)``."""

    def __init__(self, assign_tbl, index_tbl, n_buckets: int):
        self.assign = assign_tbl
        self.index = index_tbl
        self.n_buckets = n_buckets


def cc_assignment_store(
    spark,
    warehouse: str,
    db: str,
    name: str,
    assign: DataFrame | None = None,
    node_col: str = "node",
    n_buckets: int = 16,
) -> CCStore:
    """Create (and optionally seed) the ZERO-FULL-SCAN assignment layout
    — the r12 capstone that removes the one O(corpus) read the
    cluster_id-bucketed layout still paid (the node→label probe):

    - ``<name>_assign`` (node, cluster_id), hidden-partitioned
      ``mod{n_buckets}(node)``.  The probe prunes: touched-node buckets
      are computable from the batch alone (mod of the node ids).  And
      because a node's id never changes, upserted rows NEVER migrate
      partitions — the right partition key for an update-heavy table.
    - ``<name>_labelidx`` (cluster_id, node_bucket), hidden-partitioned
      ``mod{n_buckets}(cluster_id)`` — the SPILL INDEX: one row per
      (cluster, node-bucket) pair where a member lives OUTSIDE the
      cluster label's own bucket.  Singleton clusters (the near-dup
      corpus's overwhelming majority — label == node) need no row, so
      the index is O(non-singleton cross-bucket memberships), tiny
      relative to the assignment.  The changed-row read-out prunes to
      {mod(old_label)} ∪ index[old_label].

    Invariant (correctness-critical, superset-safe): for every
    assignment row (node, c) with mod(node) ≠ mod(c), the index holds
    (c, mod(node)).  EXTRA index rows only widen a pruned read (never
    wrong); MISSING rows would under-read — which is why
    :func:`connected_components_incremental_stored` appends new index
    rows BEFORE the assignment upsert and deletes dead labels last."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseTable

    a_tbl = LakehouseTable(spark, warehouse, db, f"{name}_assign")
    a_tbl.set_partitioning(node_col, f"mod{n_buckets}")
    i_tbl = LakehouseTable(spark, warehouse, db, f"{name}_labelidx")
    i_tbl.set_partitioning("cluster_id", f"mod{n_buckets}")
    if assign is not None:
        # both seed writes consume this relation — one evaluation
        a = assign.select(
            F.col(node_col).alias(node_col), "cluster_id"
        ).localCheckpoint(eager=True)
        a_tbl.append(a.repartition(F.pmod(node_col, F.lit(n_buckets))))
        idx = (
            a.select(
                "cluster_id",
                F.pmod(node_col, F.lit(n_buckets)).alias("node_bucket"),
            )
            .where(
                F.pmod(node_col, F.lit(n_buckets))
                != F.pmod("cluster_id", F.lit(n_buckets))
            )
            .distinct()
        )
        if not idx.isEmpty():
            i_tbl.append(
                idx.repartition(F.pmod("cluster_id", F.lit(n_buckets)))
            )
    return CCStore(a_tbl, i_tbl, n_buckets)


def connected_components_incremental_stored(
    store: CCStore,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    new_nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 30,
    driver_threshold: int = 2_000_000,
    apply: bool = False,
    batch_id: str | None = None,
    stats: dict | None = None,
    fold_eq_debt: int | None = 16,
) -> DataFrame:
    """Incremental connected components with EVERY stored read
    partition-pruned — no O(corpus) scan anywhere in the maintenance
    path (the cluster_id-bucketed variant still full-scanned the
    assignment once for the node→label probe; SCALE.md §r12 named that
    the remaining residual, this closes it):

    1. PROBE — touched nodes' buckets are mod(node) of the batch's own
       ids (O(batch) driver state, no lookup needed); read ONLY those
       assignment partitions, join the broadcast touched set.
    2. CONTRACTION — unchanged O(batch) algebra (shared helpers).
    3. CHANGED-ROW READ-OUT — the relabeled clusters' members live in
       {mod(old_label)} ∪ spill-index[old_label]; the index itself is
       read pruned on mod(old_label) partitions.  Exact while the index
       invariant holds (superset-safe: stale extra rows only widen the
       read).
    4. WRITE-BACK (``apply=True``) — three commits in
       crash-safe order: index APPEND first (a crash after it leaves a
       harmless superset), assignment equality-delete upsert second,
       index delete of the now-dead labels last (dead labels can never
       be minted again — labels are component minima and only merge
       downward, so a missed cleanup is garbage, not corruption).
       ``batch_id`` short-circuits a fully-committed replay via the
       assignment's commit token; a partial replay recomputes an empty
       payload (the operator's idempotence contract).

    Returns the MERGE payload (changed stored rows + batch rows).
    ``stats`` receives ``n_probe_buckets`` / ``n_changed_buckets`` —
    both replayable in SQL (plain mod arithmetic), shipped at oracle
    strength by the registered head ``dedup_clusters_stored``.

    No ``rebuild_threshold`` here, by design: a flood/backfill batch
    contradicts this layout's premise (every cost bounded by the batch),
    so the policy belongs a level up — compare the batch's row count to
    the assignment's (an O(1) snapshot-summary read) and on a backfill
    RE-SEED via :func:`cc_assignment_store` instead of maintaining;
    the in-memory and bucketed variants keep the in-operator guard for
    the orchestrations that want it."""
    n = store.n_buckets
    bcast = F.broadcast
    if (
        apply
        and batch_id is not None
        and store.assign.current_snapshot() is not None
        and store.assign.has_batch(batch_id)
    ):
        # fully-committed replay: empty payload, no writes (limit(0)
        # never scans — the read is only a schema source)
        return store.assign.read().select(node_col, "cluster_id").limit(0)
    e = (
        new_edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    eps = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    touched = (
        eps
        if new_nodes is None
        else eps.union(new_nodes.select(F.col(node_col).alias("node"))).distinct()
    ).localCheckpoint(eager=True)
    probe_buckets = sorted(
        r[0]
        for r in touched.select(F.pmod("node", F.lit(n)).alias("b"))
        .distinct()
        .collect()
    )
    a_t = store.assign.read(partition_values=probe_buckets).select(
        F.col(node_col).alias("node"), "cluster_id"
    )
    lab = (
        a_t.join(bcast(touched), "node")
        .select("node", "cluster_id")
        .localCheckpoint(eager=True)
    )
    remap = _cc_inc_remap(e, lab, bcast, max_iter, driver_threshold)
    stored_labels = lab.select(
        F.col("cluster_id").alias("old_label")
    ).distinct()
    remap_stored = remap.join(bcast(stored_labels), "old_label").localCheckpoint(
        eager=True
    )
    old_label_buckets = sorted(
        r[0]
        for r in remap_stored.select(F.pmod("old_label", F.lit(n)).alias("b"))
        .distinct()
        .collect()
    )
    if old_label_buckets:
        idx_rows = (
            store.index.read(partition_values=old_label_buckets)
            .join(
                bcast(remap_stored.select(F.col("old_label").alias("cluster_id"))),
                "cluster_id",
            )
            if store.index.current_snapshot() is not None
            else None
        )
        spill = (
            sorted(
                r[0]
                for r in idx_rows.select("node_bucket").distinct().collect()
            )
            if idx_rows is not None
            else []
        )
        changed_buckets = sorted(set(old_label_buckets) | set(spill))
        changed = (
            store.assign.read(partition_values=changed_buckets)
            .select(F.col(node_col).alias("node"), "cluster_id")
            .join(bcast(remap_stored), F.col("cluster_id") == F.col("old_label"))
            .select("node", F.col("root").alias("cluster_id"))
        )
    else:
        changed_buckets = []
        changed = lab.limit(0).select("node", "cluster_id")
    if stats is not None:
        stats["n_probe_buckets"] = len(probe_buckets)
        stats["n_changed_buckets"] = len(changed_buckets)
    payload = changed.union(_cc_inc_fresh_out(touched, lab, remap, bcast))
    if node_col != "node":
        payload = payload.withColumnRenamed("node", node_col)
    if apply:
        payload = payload.localCheckpoint(eager=True)
        # (1) index append FIRST — superset-safe crash window
        new_idx = (
            payload.select(
                "cluster_id",
                F.pmod(node_col, F.lit(n)).alias("node_bucket"),
            )
            .where(
                F.pmod(node_col, F.lit(n))
                != F.pmod("cluster_id", F.lit(n))
            )
            .distinct()
        )
        if not new_idx.isEmpty():
            # upsert on the composite key (not plain append) so rows a
            # surviving root already owns don't accumulate as duplicates
            store.index.upsert_by_key(new_idx, ["cluster_id", "node_bucket"])
        # (2) the assignment upsert — the batch's commit token
        store.assign.upsert_by_key(payload, [node_col], batch_id=batch_id)
        # (3) dead-label index cleanup LAST (roots are never in the key
        # set, so the just-appended rows survive)
        if old_label_buckets and store.index.current_snapshot() is not None:
            store.index.delete_by_key(
                remap_stored.select(F.col("old_label").alias("cluster_id")),
                ["cluster_id"],
            )
        if fold_eq_debt is not None:
            # bounded read debt on BOTH tables (the index accumulates
            # one eq file per upsert + one per cleanup delete): fold
            # past the measured knee (maybe_fold_eq_debt / SCALE.md r13)
            store.assign.maybe_fold_eq_debt(fold_eq_debt)
            store.index.maybe_fold_eq_debt(fold_eq_debt)
    return payload


def cc_store_backfill_decision(
    store: CCStore,
    batch_rows: int,
    backfill_factor: float = 0.5,
    stats: dict | None = None,
) -> str:
    """The LEVEL-UP flood policy :func:`connected_components_incremental_stored`
    prescribes (its docstring: a flood/backfill batch contradicts the
    zero-full-scan layout's premise, so the decision belongs to the
    orchestration): compare the batch's row count to the stored
    assignment's — an O(1) read of the current snapshot's SUMMARY
    (Iceberg-style footer stats: ``total-records`` minus
    ``total-equality-deletes``, a conservative live-row estimate that
    never scans data).  Returns:

    - ``"seed"`` — no assignment exists yet (or it is empty): cold-start
      by clustering the batch alone.
    - ``"reseed"`` — ``batch_rows >= backfill_factor × live-estimate``:
      a backfill; maintain-per-edge would force O(touched) broadcasts
      near the whole corpus (the CC guard's broadcast-memory rationale,
      SCALE.md r12 negative result #2) — RE-SEED via
      :func:`cc_assignment_store_reseed` from a full re-cluster instead.
    - ``"maintain"`` — the nightly-append regime:
      :func:`connected_components_incremental_stored`.

    The estimate is conservative on purpose: superseded upsert rows
    still count into ``total-records`` until compaction folds them, so
    a debt-heavy table under-reports the ratio and leans MAINTAIN — the
    cheaper wrong answer (correctness is unaffected; both branches are
    hash-proved equal by the flood-guard head's contract)."""
    snap = store.assign.current_snapshot()
    if snap is None:
        return "seed"
    s = snap.get("summary", {})
    live = max(
        (s.get("total-records") or 0) - (s.get("total-equality-deletes") or 0),
        0,
    )
    if stats is not None:
        stats["stored_rows_est"] = live
        stats["batch_rows"] = batch_rows
    if live == 0:
        return "seed"
    return "reseed" if batch_rows >= backfill_factor * live else "maintain"


def cc_assignment_store_reseed(
    store: CCStore, assign: DataFrame, node_col: str = "node"
) -> CCStore:
    """Backfill recovery for the zero-full-scan layout: replace BOTH
    tables' contents from a full re-cluster, in the same superset-safe
    crash order the maintenance path commits (the index invariant —
    every cross-bucket membership has an index row — must hold after
    ANY prefix of the commits):

    1. index ← new ∪ old (overwrite with the SUPERSET: whichever
       assignment is current afterward, its memberships are covered);
    2. assignment ← new (overwrite);
    3. index ← new exact (drops the dead half of the superset).

    A crash between any two leaves a readable store whose index is a
    superset of the invariant set — pruned reads widen, never under-read
    — and the streaming sink's replay (bands marker lands last) redoes
    the whole reseed idempotently."""
    n = store.n_buckets
    a = assign.select(
        F.col(node_col).alias(node_col), "cluster_id"
    ).localCheckpoint(eager=True)
    new_idx = (
        a.select(
            "cluster_id",
            F.pmod(node_col, F.lit(n)).alias("node_bucket"),
        )
        .where(
            F.pmod(node_col, F.lit(n)) != F.pmod("cluster_id", F.lit(n))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    old_exists = store.index.current_snapshot() is not None
    superset = (
        new_idx.union(
            store.index.read().select("cluster_id", "node_bucket")
        ).distinct()
        if old_exists
        else new_idx
    )
    if not superset.isEmpty():
        store.index.overwrite(
            superset.repartition(F.pmod("cluster_id", F.lit(n)))
        )
        old_exists = True
    store.assign.overwrite(a.repartition(F.pmod(node_col, F.lit(n))))
    if old_exists:
        if new_idx.isEmpty():
            # an empty partitioned overwrite is not re-readable — clear
            # the stale superset with an O(index) equality delete instead
            dead = store.index.read().select("cluster_id").distinct()
            if not dead.isEmpty():
                store.index.delete_by_key(dead, ["cluster_id"])
        else:
            store.index.overwrite(
                new_idx.repartition(F.pmod("cluster_id", F.lit(n)))
            )
    return store


def cc_assignment_table(
    spark,
    warehouse: str,
    db: str,
    name: str,
    assign: DataFrame | None = None,
    node_col: str = "node",
    n_buckets: int = 16,
):
    """Create (and optionally seed) the bucketed stored-assignment table
    :func:`connected_components_incremental_bucketed` maintains:
    hidden-partitioned ``mod{n_buckets}(cluster_id)``, seeded with ONE
    file per bucket directory (the repartition below co-locates each
    bucket before the partitioned write — the 100 TB layout lesson the
    r11 ANN probe measured: a file-per-task-per-bucket write makes the
    pruned read list O(tasks × buckets) slivers)."""
    from icebergproject_spark.lakehouse.tableformat import LakehouseTable

    tbl = LakehouseTable(spark, warehouse, db, name)
    tbl.set_partitioning("cluster_id", f"mod{n_buckets}")
    if assign is not None:
        tbl.append(
            assign.select(F.col(node_col).alias(node_col), "cluster_id")
            .repartition(F.pmod("cluster_id", F.lit(n_buckets)))
        )
    return tbl


def _near_pair_blocks(size_based, rows_est, count) -> int:
    """Block-count decision for :func:`embedding_near_pairs` (pure, so the
    clamp is unit-testable): the LARGER of the bytes-based and rows-based
    estimates — bytes alone under-provision when parquet compresses the
    vectors hard, because the per-tile memory budget is ROWS × dims, not
    file bytes (ADVICE r6 #3 restored this floor).  ``rows_est`` is a
    free row count (plan stats / footer walk) or None; ``count`` is the
    pay-one-job fallback, only invoked when stats are missing or at the
    floor."""
    if size_based is not None and size_based > 4:
        count_based = (
            min(256, max(4, rows_est // 25_000 + 1))
            if rows_est is not None
            else 4
        )
        return max(size_based, count_based)
    # stats missing (in-memory relations) or at the floor (tiny or
    # over-compressed input): one exact count — for bare parquet scans
    # that's footer metadata only, and for derived plans the floor case
    # means the input is small anyway
    rows = rows_est if rows_est is not None else count()
    return max(size_based or 4, min(256, max(4, rows // 25_000 + 1)))


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
        # small inputs parallel, cap 256 bounds the replication factor.
        # Sized from Catalyst's plan statistics (file-scan inputs report
        # their byte size — NO extra job); 8 MiB of compressed parquet ≈
        # the 25k-vector block. Only statless inputs (in-memory local
        # relations, i.e. tests) report Long.MaxValue and pay a count.
        # queryExecution().…stats() is a PRIVATE JVM API and the <2^50
        # "has stats" sentinel is a heuristic, so the call is guarded:
        # any failure falls back to the exact row-count path.  A
        # highly-compressible file can also under-report (blocks larger
        # than the ~13 MB/side budget); a cheap row-count FLOOR (parquet
        # count = footer metadata only, no data scan) clamps that.
        rows_est = None
        try:
            jstats = df._jdf.queryExecution().optimizedPlan().stats()
            size = int(jstats.sizeInBytes())
            # CBO / footer row counts ride along for free when present
            jrc = jstats.rowCount()
            if jrc.isDefined():
                rows_est = int(str(jrc.get()))
        except Exception:
            size = 1 << 50  # stats unavailable: use the count path
        size_based = min(256, max(4, size // (8 << 20) + 1)) if size < (1 << 50) else None
        if rows_est is None and size_based is not None and size_based > 4:
            # heavy compression can make the byte estimate under-count
            # rows by an order of magnitude (the per-tile memory budget
            # is ROWS × dims, not parquet bytes): when the plan is a
            # bare scan (Project/Filter over one file relation), a
            # count() is footer-metadata-only — pay it for the row
            # floor.  Derived plans (joins/aggs upstream) skip it and
            # trust bytes (ADVICE r5 #4: don't re-run a derived plan).
            try:
                jplan = df._jdf.queryExecution().optimizedPlan()
                while jplan.getClass().getSimpleName() in ("Project", "Filter"):
                    jplan = jplan.children().head()
                if "Relation" in jplan.getClass().getSimpleName():
                    rows_est = df.count()
            except Exception:
                rows_est = None
        n_blocks = _near_pair_blocks(size_based, rows_est, df.count)
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


def embedding_near_pairs_lsh_sql(
    df: DataFrame,
    dim: int,
    threshold: float = 0.35,
    planes: int = 4,
    quant: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed embedding near-dup at ORACLE strength: buckets come
    from :func:`~icebergproject_spark.llm.similarity.int_sign_bucket`
    (md5-minted integer hyperplanes, exact BIGINT projections — the
    sign can never flip from float noise), and the same-bucket cosine
    is the sequential-order double fold both engines evaluate
    identically, so the pair set AND the threshold decision replay
    bit-exactly in ANSI SQL.  Same output shape and threshold semantics
    as :func:`embedding_near_pairs_lsh` (which stays the xxhash
    float-weight production arm).  Scale shape: one bucket-equi
    self-join (ReusedExchange on the identical-plan sides) instead of
    the O(n²) cross join."""
    from icebergproject_spark.llm.similarity import (
        _dot,
        int_sign_bucket,
        l2_norm,
        lsh_weights,
    )

    W = lsh_weights(planes, dim)
    qz = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * quant).cast("long"),
    )
    # norms precomputed per VECTOR, not per pair — same doubles either
    # way (sqrt of the identical sequential fold), ~3× less per-pair
    # work on the O(pairs) hot path
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        l2_norm(F.col(vec_col).cast("array<double>")).alias("__n"),
        int_sign_bucket(qz, W).alias("__bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    score = F.round(
        _dot(F.col("a.__v"), F.col("b.__v"))
        / (F.col("a.__n") * F.col("b.__n")),
        6,
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


def _window_hashes(toks: F.Column, k: int) -> F.Column:
    """Rolling k-token window fingerprints of a token array: hash each
    token ONCE, then chain xxhash64 across the k shifted slices of the
    token-hash array — all integer ops after the initial per-token hash.
    (Building each window as a concat_ws STRING and hashing that is
    O(L·k) character copying — measured ~2× slower at sf0.1.)  Shared by
    `duplicate_spans` (profiling) and `remove_duplicate_spans` (removal)
    so both always operate on the identical window universe."""
    th = F.transform(toks, lambda t: F.xxhash64(t))
    m = F.size(toks) - (k - 1)
    zipped = F.slice(th, 1, m)
    for j in range(1, k):
        zipped = F.zip_with(
            zipped, F.slice(th, j + 1, m), lambda x, y: F.xxhash64(x, y)
        )
    return zipped


def duplicate_spans(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level duplication profile: for every document, how many
    of its rolling k-token windows also appear (verbatim) in at least
    ``min_docs - 1`` OTHER documents — the exact-substring-dedup shape of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., ACL 2022; their suffix-array ExactSubstr at 50-token spans),
    re-expressed as a window-fingerprint aggregation.  Extension beyond
    the reference surface (the reference has no text analytics at all);
    complements the document-level dedup family: `exact_dedup` kills
    whole-doc copies, this finds boilerplate/quotation overlap INSIDE
    otherwise-distinct documents.

    Plan shape (100 TB-safe): windows keep their POSITIONS (coverage is
    per-occurrence, duplicate windows inside one doc each count), built
    from n shifted slices zip_with'd in O(L); the exploded stream carries
    ``xxhash64(window)`` 8-byte keys, never window text.  One shuffle
    reduces the stream to (id, hash, occurrences) with map-side combine;
    totals, the shared-fingerprint set (a plain row count per hash —
    rows are distinct in id), and per-doc duplicate counts all derive
    from that small relation.  No self-join — cost is linear in corpus
    token count.

    Output: (doc_id, total_windows, dup_windows, dup_ratio) for every
    doc with at least one full window (len >= k tokens); dup_ratio =
    round(dup/total, 6).
    """
    toks = F.split(F.col(content_col), " ")
    wins = (
        df.filter(F.size(F.split(F.col(content_col), " ")) >= k)
        .select(F.col(id_col).alias("id"), F.explode(_window_hashes(toks, k)).alias("h"))
    )
    # ONE shuffle of the exploded stream — (id, h) occurrence counts —
    # then every downstream aggregate runs over this (much smaller)
    # relation: per-doc totals are sum(cnt), the shared-fingerprint test
    # is a plain row count per h (rows are already distinct in id), and
    # the window build itself runs once, not once per consumer.
    wc = (
        wins.groupBy("id", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    tot = wc.groupBy("id").agg(F.sum("cnt").alias("total_windows"))
    shared = (
        wc.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    dup = (
        wc.join(shared, "h", "left_semi")
        .groupBy("id")
        .agg(F.sum("cnt").alias("dup_windows"))
    )
    return (
        tot.join(dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "total_windows",
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0)).cast("double")
                / F.col("total_windows").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )


def semantic_near_pairs(
    df: DataFrame,
    dim: int,
    k: int = 16,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 5,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means partition the
    embedding space, then compute exact pairwise cosine ONLY within each
    cluster — semantic duplicates are near each other, so the cross-
    cluster pairs k-means prunes are overwhelmingly below threshold.
    Approximate by design (a near-dup pair split across a cluster
    boundary is missed — same recall bet every SemDeDup deployment
    makes); `embedding_near_pairs` is the exact baseline it is measured
    against in tests.

    Scale shape: the k-means stage is the zero-shuffle partial-sums
    implementation (llm/linalg.py); the pair stage shuffles each vector
    ONCE (hash by cluster) and runs one BLAS gram per cluster inside
    ``applyInPandas``. Work is Σ|cluster|² instead of n² — at 100 TB, k
    grows with the corpus so clusters stay bounded (SemDeDup used 25k
    clusters for LAION); skewed clusters split by raising k, the same
    lever the paper uses.

    Output: (id_a, id_b, score) with id_a < id_b, rounded-cosine ≥
    threshold — same contract as `embedding_near_pairs`.
    """
    import numpy as np
    import pandas as pd

    from icebergproject_spark.llm.linalg import kmeans

    assignments, _, _ = kmeans(
        df, dim, k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    tagged = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        assignments, "id"
    )
    cut = threshold - 1e-7  # kernel-side cut; Spark re-rounds at the end

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
            {"id_a": "int64", "id_b": "int64", "score": "float64"}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy()
        x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        s = (x / norms[:, None]) @ (x / norms[:, None]).T
        iu, ju = np.triu_indices(len(ids), 1)
        keep = s[iu, ju] >= cut
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "score": s[iu[keep], ju[keep]]}
        )

    pairs = tagged.groupBy("cluster").applyInPandas(
        tile, "id_a long, id_b long, score double"
    )
    return pairs.select(
        "id_a", "id_b", F.round("score", 6).alias("score")
    ).filter(F.col("score") >= threshold)


def semantic_near_pairs_sql(
    df: DataFrame,
    dim: int,
    k: int = 16,
    threshold: float = 0.35,
    quant: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup at ORACLE strength: the k-means partition is the
    integer-exact one-step Lloyd shared with :func:`ivf_sql_topk`
    (:func:`~icebergproject_spark.llm.similarity.int_lloyd_cells` —
    bit-identical cluster cells on any engine), and the within-cluster
    cosine is the sequential-order double fold both engines evaluate
    identically, so the APPROXIMATE pair set hash-checks at full
    strength.  The iterative-k-means + BLAS arm
    (:func:`semantic_near_pairs`) stays the quality-tuned production
    default; this arm trades Lloyd iterations for cross-engine replay.

    Scale shape: Σ|cell|² scoring work instead of n² — the SemDeDup
    economics — via one broadcast-seeded assignment and one
    cell-equi self-join (ReusedExchange on the identical-plan sides).
    Output: (id_a, id_b, score), id_a < id_b, rounded-cosine ≥
    threshold — same contract as :func:`semantic_near_pairs`."""
    from icebergproject_spark.llm.similarity import (
        _dot,
        int_lloyd_cells,
        int_quantized_base,
        l2_norm,
    )

    base = int_quantized_base(df, quant=quant, vec_col=vec_col, id_col=id_col)
    cells, _ = int_lloyd_cells(base, k)
    # norms once per vector (identical doubles; ~3× less per-pair work)
    tagged = cells.join(base, "cid").select(
        "cid", "e", l2_norm(F.col("e")).alias("__n"), "__cell"
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    score = F.round(
        _dot(F.col("a.e"), F.col("b.e")) / (F.col("a.__n") * F.col("b.__n")),
        6,
    )
    # broadcast the build side: a sort-merge self-join on __cell has only
    # k distinct keys (k=8-16), so at most k tasks do all the scoring no
    # matter how many partitions exist; the broadcast hash join keeps the
    # probe side's full parallelism and drops the skewed sort entirely.
    # (This arm is the oracle tier — bounded corpora by contract; the
    # production arm, semantic_near_pairs, shuffles by cluster and runs
    # per-cluster BLAS gemms instead.)
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.cid") < F.col("b.cid")),
        )
        .select(
            F.col("a.cid").alias("id_a"),
            F.col("b.cid").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def remove_duplicate_spans(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al., ACL 2022 — the active half of
    `duplicate_spans`): every k-token window occurring more than once in
    the corpus keeps exactly ONE occurrence (the lexicographically first
    (doc, pos)); all other occurrences have their k token positions
    deleted from their documents.  Overlapping duplicated spans merge
    through the covered-position set, exactly like the paper's span
    merging.

    Deterministic across engines: the survivor is argmin over the
    combined key ``doc_id·2²⁰ + pos`` (valid for docs under 2²⁰ tokens
    and ids under 2⁴³ — enforced per row with ``assert_true``, so
    out-of-domain inputs fail loudly), windows are compared by content (hashed
    Spark-side; the key never surfaces), and the rebuilt text is the
    pos-ordered join of uncovered tokens.

    Scale shape: linear like `duplicate_spans` — one shuffle to window
    occurrence lists, one to covered positions, one groupBy(doc) to
    rebuild. The rebuild carries each doc's tokens once (array_sort of
    (pos, token) structs, JVM-side); no self-join, no text in join keys.

    Output: (doc_id, clean_text, n_tokens, n_removed).
    """
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(content_col), " ").alias("toks")
    )
    wins = (
        base.filter(F.size("toks") >= k)
        .select(
            "id", F.posexplode(_window_hashes(F.col("toks"), k)).alias("pos", "h")
        )
        .select("id", "pos", "h")
    )
    # one shuffle: per-hash occurrence count + survivor key.  The
    # combined key packs pos into the low 20 bits — guarded per row, so
    # an out-of-domain doc (≥2²⁰ tokens or id ≥2⁴³) fails loudly instead
    # of silently electing the wrong survivor
    guard = F.assert_true(
        (F.col("pos") < F.lit(1 << 20)) & (F.col("id") < F.lit(1 << 43)),
        F.lit("remove_duplicate_spans: doc too long or id too large for "
              "the packed survivor key"),
    )
    key = F.when(guard.isNull(), F.col("id") * F.lit(1 << 20) + F.col("pos"))
    occ = wins.select("id", "pos", "h", key.alias("k"))
    agg = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("k").alias("surv")
    )
    doomed = (
        occ.join(agg.filter(F.col("cnt") >= 2), "h")
        .filter(F.col("k") != F.col("surv"))
        .select("id", "pos")
    )
    covered = doomed.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("pos")
    ).distinct()
    tokens = base.select("id", F.posexplode("toks").alias("pos", "tok"))
    kept = tokens.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("tok")))
        ).alias("ordered"),
    )
    totals = base.select("id", F.size("toks").alias("n_tokens"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(
                F.concat_ws(
                    " ", F.transform(F.col("ordered"), lambda s: s.getField("tok"))
                ),
                F.lit(""),
            ).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


def window_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    content_col: str = "text",
    id_col: str = "doc_id",
    bench_content_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Span-level benchmark decontamination, GPT-3 style (Brown et al.
    2020, appendix C: training docs sharing any 13-gram with an eval
    example are flagged): a corpus document is contaminated if ANY of
    its rolling k-token windows appears verbatim in the benchmark set.
    Complements `contamination_pairs` (llm/text.py), which counts
    n-gram OVERLAP mass per (doc, bench) pair — this one answers the
    binary production question "which docs must I drop", at the span
    granularity the GPT-3 pipeline used.

    Shape: both sides reduce to window fingerprints via the shared
    `_window_hashes` kernel; the benchmark side is DISTINCT hashes
    (benchmark sets are small — the join side broadcasts); one semi-ish
    inner join + groupBy(doc) counts colliding window positions.
    Linear in corpus tokens, no text in join keys.

    Output: (doc_id, n_hits) — corpus docs with >= 1 colliding window
    and how many of their window positions collide.
    """
    c_toks = F.split(F.col(content_col), " ")
    c_wins = (
        corpus.filter(F.size(c_toks) >= k)
        .select(
            F.col(id_col).alias("id"),
            F.explode(_window_hashes(c_toks, k)).alias("h"),
        )
    )
    b_toks = F.split(F.col(bench_content_col), " ")
    b_wins = (
        benchmark.filter(F.size(b_toks) >= k)
        .select(F.explode(_window_hashes(b_toks, k)).alias("h"))
        .distinct()
    )
    return (
        c_wins.join(b_wins, "h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def prefix_filter_pairs(
    df: DataFrame,
    threshold_pct: int = 30,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT set-similarity self-join by PREFIX FILTERING (AllPairs,
    Bayardo 2007 / PPJoin, Xiao 2008) — the third classic candidate
    generator next to the inverted-index expansion (ngram_jaccard) and
    LSH banding (minhash), and unlike LSH it is LOSSLESS: every pair
    with shingle-set Jaccard ≥ t is guaranteed found.  Operates on the
    family's standard distinct word ``shingle_n``-grams (unigram sets
    are non-discriminative on a shared vocabulary: measured ≥0.8
    unigram Jaccard on 30k of 125k fixture pairs).

    Mechanism: order each document's DISTINCT shingles by global
    rarity (document frequency asc, shingle asc — a canonical total
    order both engines reproduce), keep only the first
    ``|x| − ceil(t·|x|) + 1`` as the doc's *prefix* (the theorem: two
    sets with Jaccard ≥ t must share at least one prefix element under
    any shared total order), self-join ON PREFIX SHINGLES ONLY, then
    verify candidates exactly with integer cross-multiplication
    (``100·inter ≥ t_pct·(|a|+|b|−inter)``).

    100 TB shape: the join key set is the RAREST tokens only — the
    candidate volume is Σ_token df(token)² over prefix tokens, which
    rarity-ordering minimizes (frequent tokens never become join
    keys), vs the full inverted index's sum over ALL tokens.  Every
    step is a groupBy/join on (id, token) — no windows over the corpus
    (the ordering window partitions BY DOCUMENT), no driver state —
    and the whole chain is exact integers, so DuckDB replays mechanism
    and verification bit-for-bit.

    Output: (id_a, id_b, inter_count, union_count, jaccard_milli),
    jaccard_milli = (1000·inter) DIV union.
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(content_col, shingle_n)).alias("token"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # sizes, prefix, and verify reuse it
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        toks.join(dfreq, "token")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.col("df").asc(), F.col("token").asc()
                )
            ),
        )
        .join(sizes, "id")
    )
    # ceil(t·n) with t = threshold_pct/100, in integers
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("n")
        - F.expr(f"CAST(({threshold_pct} * n + 99) DIV 100 AS INT)")
        + F.lit(1)
    ).select("id", "token")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    # intersection size per candidate pair: PPJoin-style SORTED-LIST
    # verification — each doc's distinct tokens become ONE sorted array,
    # each candidate pair fetches the two arrays by key and intersects
    # them JVM-side (array_intersect, whole-stage codegen).  This
    # replaced the r8–r11 expand-and-regroup verify (cand ⨝ a-tokens ⨝
    # b-tokens → groupBy), whose candidates × |doc| intermediate (34M
    # rows at sf0.1) was the head's dominant stage AND its variance
    # source (8.4 s ±40% run-to-run from AQE/GC on the expansion
    # shuffle; the array verify measures ~3× faster with the spread
    # collapsed — SCALE.md §r12).  Scale shape: two hash joins keyed on
    # doc id (the array relation shuffles at most once, O(corpus
    # tokens) — the same volume the index pass already paid, never
    # candidates × doc size) and a per-row merge of two sorted lists.
    doc_toks = toks.groupBy("id").agg(
        F.sort_array(F.collect_list("token")).alias("ts"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cand.join(
            doc_toks.select(
                F.col("id").alias("id_a"),
                F.col("ts").alias("ta"),
                F.col("n").alias("na"),
            ),
            "id_a",
        )
        .join(
            doc_toks.select(
                F.col("id").alias("id_b"),
                F.col("ts").alias("tb"),
                F.col("n").alias("nb"),
            ),
            "id_b",
        )
        .withColumn("inter_count", F.size(F.array_intersect("ta", "tb")))
        .filter(
            100 * F.col("inter_count")
            >= threshold_pct * (F.col("na") + F.col("nb") - F.col("inter_count"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("inter_count").cast("long").alias("inter_count"),
            (F.col("na") + F.col("nb") - F.col("inter_count"))
            .cast("long")
            .alias("union_count"),
            F.expr(
                "CAST((1000 * inter_count) DIV (na + nb - inter_count) AS BIGINT)"
            ).alias("jaccard_milli"),
        )
    )


def density_clusters(
    df: DataFrame,
    threshold: float = 0.30,
    min_pts: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """DBSCAN-style density clustering over the embedding space
    (Ester et al. 1996, with cosine similarity as the ε-neighborhood
    relation): the semantic-domain discovery step that — unlike
    k-means — needs no preset k, finds arbitrarily-shaped clusters, and
    EXPLICITLY separates noise (the long tail SemDeDup-style curation
    wants to treat differently from coherent topic clusters).

    Definitions on the ε-graph (exact rounded-cosine pairs ≥
    ``threshold``): a CORE point has ≥ ``min_pts`` neighbors; clusters
    are the connected components of the core-core subgraph (one
    component per density ridge — the standard simplification that
    makes DBSCAN's "density-reachable" relation a plain CC problem); a
    BORDER point is a non-core adjacent to ≥ 1 core and joins its best
    core neighbor's cluster (max score, ties to the smaller core id —
    deterministic where classic DBSCAN is scan-order-dependent);
    everything else is NOISE (cluster −1).

    Scale shape: the pair generator is the pluggable tier — pass
    ``pairs`` (an (id_a, id_b, score) ε-edge set, id_a < id_b) to swap
    it; the default exact all-pairs arm is the verification baseline,
    the LSH/cell-blocked generators (:func:`embedding_near_pairs_lsh`,
    :func:`embedding_near_pairs_lsh_sql`,
    :func:`semantic_near_pairs`) the 100 TB path, identical downstream;
    components run through :func:`connected_components`
    (O(log²) rounds / driver union-find fast path); the border argmax
    is a hash aggregate.

    Returns (vec_id, role, cluster_id): role ∈ core/border/noise,
    cluster_id = min core id of the cluster, −1 for noise."""
    if min_pts < 1:
        raise ValueError(f"density_clusters requires min_pts >= 1, got {min_pts}")
    if pairs is None:
        pairs = embedding_near_pairs(
            df, threshold=threshold, vec_col=vec_col, id_col=id_col
        ).localCheckpoint(eager=False)  # consumed by degree, core-edge,
        # and border branches — the gemm must run once.  Callers passing
        # their own ``pairs`` checkpoint it themselves (an LSH-join
        # generator wants EAGER so its ~n² pre-AQE estimate doesn't
        # poison the downstream joins out of broadcasting).
    und = pairs.select(
        F.col("id_a").alias("x"), F.col("id_b").alias("y"), "score"
    ).union(
        pairs.select(
            F.col("id_b").alias("x"), F.col("id_a").alias("y"), "score"
        )
    )
    deg = und.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    core = deg.where(F.col("d") >= min_pts).select("node").localCheckpoint(
        eager=False
    )
    core_edges = pairs.join(
        core.select(F.col("node").alias("id_a")), "id_a"
    ).join(core.select(F.col("node").alias("id_b")), "id_b")
    labels = connected_components(
        core_edges, src="id_a", dst="id_b", nodes=core
    )  # (node, cluster_id); core-only
    border_best = (
        und.join(core.select(F.col("node").alias("y")), "y")
        .join(core.select(F.col("node").alias("x")), "x", "left_anti")
        .groupBy(F.col("x").alias("node"))
        .agg(
            F.max(
                F.struct(F.col("score"), (-F.col("y")).alias("ny"))
            ).alias("m")
        )
        .select("node", (-F.col("m.ny")).cast("long").alias("best_core"))
    )
    all_nodes = df.select(F.col(id_col).alias("node"))
    return (
        all_nodes.join(labels, "node", "left")
        .join(
            border_best.join(
                labels.select(
                    F.col("node").alias("best_core"),
                    F.col("cluster_id").alias("__bc"),
                ),
                "best_core",
            ).select("node", "__bc"),
            "node",
            "left",
        )
        .select(
            F.col("node").alias(id_col),
            F.when(F.col("cluster_id").isNotNull(), F.lit("core"))
            .when(F.col("__bc").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster_id", F.col("__bc"), F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )
