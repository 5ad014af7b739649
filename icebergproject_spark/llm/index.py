"""Incrementally-maintained BM25 inverted index on the lakehouse.

The retrieval tier gets the same stored-state treatment the ANN graph
(r10/r11) and the CC assignment (r12) got: the index a 100 TB corpus
would actually serve BM25 from is three lakehouse tables maintained
O(batch) per append — never a corpus re-tokenization:

- ``<name>_postings`` (term, doc_id, tf, dl) — the posting list, with
  the doc length DENORMALIZED onto every posting row (Lucene's norms
  file collapsed into the posting), so scoring never joins a
  corpus-sized doc-stats table.  Hidden-partitioned
  ``bucket<B>(term)`` (xxhash64 — Iceberg's bucket[N] shape): a query
  touches only the directories its terms hash into, located by the
  pure-Python xxhash64 replica (zero Spark jobs at planning time —
  the same machinery as the Bloom planning path) + the O(touched)
  listing fast path.  Appends are doc-disjoint, so maintenance is a
  plain APPEND of the new docs' postings — no merge, no read.
- ``<name>_termstats`` (term, df) — document frequencies, maintained by
  ``merge_additive`` (the streaming serving-table pattern): each batch
  contributes its df deltas, the table always holds full-corpus df.
  Vocabulary-sized (Heaps' law: ≪ corpus), so the additive COW merge
  stays cheap while the corpus grows unboundedly.
- ``<name>_corpus`` (k, n_docs, total_dl) — one row, same additive
  merge: the global stats BM25's idf/avgdl need.

Query path: the driver-known query terms resolve to bucket ids in pure
Python, postings are read partition-pruned and filtered to the terms,
termstats/corpus are tiny broadcasts — the corpus is never scanned.
Scoring mirrors :func:`llm.text.bm25_topk` micro-point for micro-point
(one float expression per (query, doc, term), quantized to BIGINT
micro-points BEFORE the per-doc sum), so the maintained index's top-k
hash-matches a from-scratch rebuild — the maintain==rebuild contract
``bm25_index_incremental`` pins against the DuckDB oracle.

Reference anchor: the reference maintains serving state incrementally
per micro-batch (offlineanls/ProcessUserPoints.scala:52-58 upserts
running totals; dim/DimDataToHBase.scala:79-110 upserts dim rows); this
is that pattern applied to the retrieval tier's index state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from icebergproject_spark.lakehouse.tableformat import LakehouseTable
from icebergproject_spark.lakehouse.xxh64 import spark_xxhash64
from icebergproject_spark.llm.text import _tokens


class BM25IndexStore:
    """Handle on the three index tables (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        db: str,
        name: str,
        n_buckets: int = 8,
    ) -> None:
        self.spark = spark
        self.n_buckets = n_buckets
        self.postings = LakehouseTable(spark, warehouse, db, f"{name}_postings")
        self.termstats = LakehouseTable(spark, warehouse, db, f"{name}_termstats")
        self.corpus = LakehouseTable(spark, warehouse, db, f"{name}_corpus")
        if self.postings.current_snapshot() is None:
            self.postings.set_partitioning("term", f"bucket{n_buckets}")
        if self.termstats.current_snapshot() is None:
            # same bucketing as postings: the probe measured the df
            # read as the serve path's un-pruned residual (the vocab
            # table grows with the corpus under Heaps' law even though
            # it trails it); _write_data re-applies the spec on every
            # additive COW merge, so the layout survives maintenance
            self.termstats.set_partitioning("term", f"bucket{n_buckets}")

    # -- maintenance ------------------------------------------------------

    def append_batch(
        self,
        docs: DataFrame,
        content_col: str = "text",
        id_col: str = "doc_id",
        batch_id: str | None = None,
        df_merge: str = "cow",
        fold_eq_debt: int = 16,
    ) -> None:
        """Index an append batch of NEW docs: O(batch) tokenization, one
        postings append (co-located one file per occupied term bucket),
        one vocabulary-sized additive df merge, one 1-row stats merge.
        Correct only because appends are doc-disjoint (re-sending a doc
        would double its postings).

        Crash consistency: the three commits cannot be atomic, so with a
        ``batch_id`` every step is individually idempotent (stamped
        snapshots; replays skip) and ordered stats-first / postings-LAST
        — the postings snapshot is the batch's commit token
        (``postings.has_batch``), the same multi-table ``foreachBatch``
        discipline :meth:`LakehouseTable.has_batch` documents.  A crash
        between commits leaves df/stats momentarily ahead of postings (a
        bounded idf perturbation, not state corruption), and RE-RUNNING
        ``append_batch`` with the same batch_id converges to exactly the
        clean single application — pinned by
        tests/test_graph_retrieval.py::test_bm25_index_replay_is_idempotent.
        Without a batch_id (bounded back-tests, the oracle head) the
        caller owns replay discipline.

        ``df_merge`` picks the termstats maintenance write.  ``"cow"``
        (default) is the additive full-rewrite merge (merge_additive).
        ``"upsert"`` reads only the batch terms' current df rows
        (partition-pruned to the touched buckets, delta broadcast into
        the scan), applies the summed rows through the O(payload)
        equality-delete upsert, and auto-folds the read debt past
        ``fold_eq_debt`` files — write cost O(batch vocabulary),
        independent of the table.  The probe measured NO single-box
        crossover up to a 1M-term synthetic vocabulary (the 50-doc
        batch's ~1.4k terms touch all 64 buckets, so the pruned read
        degenerates to a full scan and the eq-delete commit machinery
        costs more than rewriting <=1M rows on 32 cores — SCALE.md r13
        third session, negative result); "upsert" is the documented
        scale path for the regime where the vocabulary table is too
        large to rewrite per batch (n_buckets >> batch vocabulary, df
        table >> single-box rewrite budget), the same policy class as
        the CC flood guard.  Both paths converge to the same table
        state (pytest-pinned) and both are idempotent under
        ``batch_id``."""
        if df_merge not in ("upsert", "cow"):
            raise ValueError(f"df_merge must be 'upsert' or 'cow': {df_merge!r}")
        if batch_id is not None and self.postings.has_batch(batch_id):
            return  # fully committed earlier attempt
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(content_col)).alias("term"),
        )
        posts = (
            tok.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(
                tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")),
                "doc_id",
            )
            .select("term", "doc_id", "tf", "dl")
            .persist()  # three consumers below; tokenize once
        )
        try:
            self.corpus.merge_additive(
                posts.groupBy("doc_id")
                .agg(F.first("dl").alias("dl"))
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_dl"),
                )
                .select(F.lit("all").alias("k"), "n_docs", "total_dl"),
                ["k"],
                batch_id=batch_id,
            )
            delta = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            if (
                df_merge == "cow"
                or self.termstats.current_snapshot() is None
            ):
                # first write: merge_additive just lands the partials
                # (partitioned by _write_data), so both modes seed alike
                self.termstats.merge_additive(
                    delta, ["term"], batch_id=batch_id
                )
            elif batch_id is None or not self.termstats.has_batch(batch_id):
                # O(batch-vocab): read only the touched buckets' current
                # rows with the delta BROADCAST into the scan (right-
                # outer keeps brand-new terms), sum, eq-delete upsert
                delta_b = delta.localCheckpoint(eager=True)
                touched = sorted(
                    r[0]
                    for r in delta_b.select(
                        F.pmod(
                            F.xxhash64("term"), F.lit(self.n_buckets)
                        ).alias("b")
                    )
                    .distinct()
                    .collect()
                )
                old = self.termstats.read(partition_values=touched).select(
                    "term", F.col("df").alias("__df_old")
                )
                merged = old.join(
                    F.broadcast(delta_b), "term", "right"
                ).select(
                    "term",
                    (
                        F.coalesce(F.col("__df_old"), F.lit(0))
                        + F.col("df")
                    ).alias("df"),
                )
                self.termstats.upsert_by_key(
                    merged, ["term"], batch_id=batch_id
                )
                self.termstats.maybe_fold_eq_debt(fold_eq_debt)
            bucketed = posts.repartition(
                F.pmod(F.xxhash64("term"), F.lit(self.n_buckets))
            )
            if batch_id is not None:
                self.postings.idempotent_append(bucketed, batch_id)
            else:
                self.postings.append(bucketed)
        finally:
            posts.unpersist()

    # -- serving ----------------------------------------------------------

    def term_buckets(self, terms: list[str]) -> list[int]:
        """Bucket ids the given terms hash into — pure Python (the
        xxhash64 replica), zero Spark jobs: the planning cost of the
        pruned read is a few hashes on the driver."""
        return sorted(
            {spark_xxhash64(t, "string") % self.n_buckets for t in terms}
        )

    def query_topk(
        self,
        queries: list[tuple[int, str]],
        k: int = 5,
        k1: float = 1.2,
        b: float = 0.75,
        pruned: bool = True,
    ) -> DataFrame:
        """BM25 top-k from the MAINTAINED tables (the corpus is never
        touched): postings read partition-pruned to the query terms'
        buckets + row-filtered to the terms, df/global stats broadcast.
        Output (query_id, rank, doc_id, score_micro) — bit-identical to
        :func:`llm.text.bm25_topk` over the same logical corpus.
        ``pruned=False`` scans the full postings table before the term
        filter — the A/B arm tools/bm25_index_probe.py measures the
        layout against (identical output either way)."""
        qterms = sorted({t for _, text in queries for t in text.split()})
        buckets = self.term_buckets(qterms) if pruned else None
        posts = self.postings.read(partition_values=buckets).where(
            F.col("term").isin(qterms)
        )
        ts = self.termstats.read(partition_values=buckets).where(
            F.col("term").isin(qterms)
        )
        stats = self.corpus.read().select("n_docs", "total_dl")
        q = self.spark.createDataFrame(
            [(qid, t) for qid, text in queries for t in text.split()],
            "query_id int, term string",
        )
        avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
        idf = F.log(
            F.lit(1)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        w = (
            idf
            * (F.col("tf") * (F.lit(k1) + F.lit(1)))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1) - F.lit(b) + (F.lit(b) * F.col("dl")) / avgdl)
            )
        )
        scored = (
            posts.join(F.broadcast(q), "term")
            .join(F.broadcast(ts), "term")
            .crossJoin(F.broadcast(stats))
            .select(
                "query_id",
                "doc_id",
                F.round(w * F.lit(1_000_000)).cast("long").alias("si"),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.sum("si").alias("score_micro"))
        )
        rank = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("score_micro").desc(), F.col("doc_id").asc()
            )
        )
        return (
            scored.withColumn("rank", rank)
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score_micro")
        )

    def stats(self) -> tuple[int, int, int]:
        """(n_docs, total_dl, n_terms) from the maintained tables — the
        three scalars the oracle recomputes from scratch, proving the
        additive merges tracked the corpus exactly."""
        row = self.corpus.read().select("n_docs", "total_dl").collect()[0]
        n_terms = self.termstats.read().count()
        return int(row["n_docs"]), int(row["total_dl"]), int(n_terms)
