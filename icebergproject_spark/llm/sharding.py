"""Training-data ordering: deterministic global shuffle, shard
assignment, and curriculum binning.

Extension beyond the reference surface (no analog in
/root/reference — the reference stops at the serving layer): these are
the batch-prep steps between "corpus is clean" and "trainer reads
shards" in an LLM data pipeline.  Everything here is deterministic —
pseudo-randomness comes from md5 of (salt, id), never from RNG state —
so shard layouts are reproducible across engines, retries, and
partitionings (and therefore DuckDB-oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shuffle_key(id_col: str, salt: str) -> F.Column:
    """md5("<salt>-<id>") — the deterministic stand-in for a random sort
    key. md5 renders identical lowercase hex on Spark and ANSI engines,
    unlike xxhash64 (Spark-only) or rand() (nondeterministic)."""
    return F.md5(F.concat_ws("-", F.lit(salt), F.col(id_col).cast("string")))


def hash_shard(id_col: str, salt: str, num_shards: int) -> F.Column:
    """Map-side deterministic shard assignment: the first 16 bits of the
    md5 shuffle key, modulo ``num_shards``.  Unlike the round-robin
    deal over a global order (``global_shuffle``), this needs NO window,
    no sort, and no shuffle at all — shard is a pure projection, so it
    survives any scale — at the cost of multinomial rather than exactly
    equal shard sizes (relative imbalance ~sqrt(shards/rows), negligible
    for training shards of millions of rows; modulo bias ≤ num_shards/65536).

    Renders identically in ANSI SQL (hex chars → integer via position in
    the hex alphabet), so hash-sharded outputs stay oracle-checkable.
    """
    key = shuffle_key(id_col, salt)
    word = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    return (word % num_shards).cast("long")


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 16,
    salt: str = "seed0",
    mode: str = "portable",
) -> DataFrame:
    """Deterministic global shuffle + shard/position assignment: order
    the corpus by ``md5(salt || id)`` and deal rows round-robin into
    ``num_shards`` shards.  Re-salting reshuffles; same salt always
    yields the same layout (the property retry-safe training-data jobs
    need — a rerun must not produce different shards).

    ``mode="portable"`` computes (shard, pos) with ONE global
    row_number window — a single total order, exact, and expressible in
    ANSI SQL (the oracle form).  A global window is a one-partition sort
    in Spark, so this mode is for oracle parity and modest data.

    ``mode="scale"`` is the 100 TB path: ``repartitionByRange`` on the
    md5 key (distributed range sort, no single-partition stage) +
    ``sortWithinPartitions``; shard = range-partition id, pos = position
    within shard.  Same statistical properties (md5 keys are uniform, so
    range shards are balanced), different — but still deterministic up
    to Spark's range-sampling — shard boundaries; emits the same
    columns.
    """
    key = shuffle_key(id_col, salt)
    if mode == "scale":
        parted = (
            df.withColumn("__k", key)
            .repartitionByRange(num_shards, "__k")
            .sortWithinPartitions("__k")
        )
        w = Window.partitionBy(F.spark_partition_id()).orderBy("__k")
        return parted.select(
            F.col(id_col),
            F.spark_partition_id().alias("shard"),
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
        )
    w = Window.orderBy(key, F.col(id_col))
    rn = F.row_number().over(w)
    return df.select(
        F.col(id_col),
        ((rn - 1) % num_shards).cast("long").alias("shard"),
        (rn - 1).cast("long").alias("pos"),
    )


def curriculum_bins(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_bins: int = 10,
    mode: str = "portable",
) -> DataFrame:
    """Length-based curriculum binning: rank documents by token count
    (shortest first — the classic easy→hard proxy) and cut the ranking
    into ``num_bins`` equal-depth bins.  A curriculum scheduler then
    drains bin 1 before bin 2, etc.

    ``mode="portable"``: NTILE over the deterministic total order
    (n_tokens, then id) — exact equal-depth and hash-stable across
    engines (the oracle form), but a one-partition global sort.

    ``mode="scale"`` is the 100 TB path: one distributed
    ``approxQuantile`` pass over the token counts yields num_bins-1 cut
    points (bounded O(k) driver reduction), and bin assignment becomes a
    map-side comparison against the broadcast cut points — no window, no
    global sort, no shuffle at all (token counting is per-row).  Bins
    are equal-depth up to sketch error; ties on length share a bin
    (value-cut semantics — fine for a curriculum, which orders by the
    VALUE anyway).
    """
    n_tok = F.size(F.split(F.col(content_col), " "))
    if mode == "scale":
        scored = df.select(
            F.col(id_col), n_tok.cast("long").alias("n_tokens")
        )
        probs = [i / num_bins for i in range(1, num_bins)]
        cuts = scored.stat.approxQuantile("n_tokens", probs, 1e-3)
        b = F.lit(1)
        for c in cuts:  # ascending; bin 1 = shortest documents
            b = b + F.when(F.col("n_tokens") > F.lit(c), 1).otherwise(0)
        return scored.select(id_col, "n_tokens", b.cast("int").alias("bin"))
    w = Window.orderBy(n_tok.asc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.ntile(num_bins).over(w).alias("bin"),
    )
