"""BM25 stored-index probe: maintain vs rebuild, pruned vs flat serve.

The claim ``bm25_index_incremental`` makes for 100 TB: maintaining the
stored index through an append batch costs O(batch) (tokenize the batch,
append its postings, merge a bounded-vocabulary df table and a 1-row
stats table), while the non-incremental alternative re-tokenizes the
whole corpus; and serving reads only the query terms' buckets
(pure-Python xxhash64 planning + O(touched) listing), while the naive
serve scans the whole postings table.  This probe measures both ratios
on synthetic corpora at growing multiples of the 500-doc fixture shape.

Arms (median of N, full executions through a noop sink / count;
arms are INTERLEAVED and preceded by an untimed warmup of both serve
paths — the warm-up-bias trap the first bloom probe fell into, recorded
in SCALE.md r13, would otherwise charge JVM/codegen/footer warmup to
whichever arm runs first):
- maintain     — BM25IndexStore.append_batch(batch_i) on the seeded
                 store, a DISTINCT 50-doc batch per run (the O(batch)
                 path; includes the vocab-sized additive df merge,
                 which is the arm's scale ceiling — the 2^20-capped
                 synthetic vocab models Heaps' law)
- rebuild      — a fresh store built from corpus ∪ batch (what a
                 non-incremental pipeline pays per refresh)
- serve_pruned — query_topk on the maintained store (bucket-pruned)
- serve_flat   — query_topk(pruned=False): full postings scan + term
                 filter (identical output; the layout's value is the
                 difference)

Corpus docs are deterministic pseudo-random token draws (xxhash64,
2^20 vocab) — the same generator as bands_crossover_probe, so runs are
reproducible and cost measures machinery, not pathological data.

Usage: python tools/bm25_index_probe.py [--scales 16,64,256]
       [--batch 50] [--buckets 64] [--runs 3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # tools/ is not a package; import siblings flat

import pyspark.sql.functions as F  # noqa: E402

from bands_crossover_probe import _arg, synth_docs  # noqa: E402
from icebergproject_spark.session import build_session  # noqa: E402


def main() -> None:
    scales = [int(s) for s in _arg("--scales", "16,64,256").split(",")]
    batch_n = int(_arg("--batch", "50"))
    n_buckets = int(_arg("--buckets", "64"))
    runs = int(_arg("--runs", "3"))

    spark = build_session("bm25_index_probe")
    spark.sparkContext.setLogLevel("FATAL")
    from icebergproject_spark.llm.index import BM25IndexStore

    for scale in scales:
        n = 500 * scale
        wh = tempfile.mkdtemp(prefix="bm25_probe_")
        try:
            corpus = synth_docs(spark, n).localCheckpoint(eager=True)
            # the query workload: the first 3 tokens of 4 corpus docs —
            # terms guaranteed present, resolved once on the driver
            qdocs = corpus.where(F.col("doc_id") < 4).collect()
            queries = [
                (int(r["doc_id"]), " ".join(r["text"].split()[:3]))
                for r in qdocs
            ]
            store = BM25IndexStore(
                spark, wh, "probe", "bm25", n_buckets=n_buckets
            )
            t0 = time.time()
            store.append_batch(corpus)
            seed_sec = round(time.time() - t0, 3)

            def serve_pruned():
                store.query_topk(queries, k=5).write.format("noop").mode(
                    "overwrite"
                ).save()

            def serve_flat():
                store.query_topk(
                    queries, k=5, pruned=False
                ).write.format("noop").mode("overwrite").save()

            # untimed warmup of BOTH serve paths (codegen + footers)
            serve_pruned()
            serve_flat()
            pruned_s, flat_s = [], []
            for _ in range(runs):  # interleaved: same warmth per arm
                t0 = time.time(); serve_flat(); flat_s.append(time.time() - t0)
                t0 = time.time(); serve_pruned(); pruned_s.append(time.time() - t0)
            maint_s, reb_s = [], []
            for i in range(runs):
                nb = synth_docs(
                    spark, batch_n, start=n + (i + 1) * batch_n
                ).localCheckpoint(eager=True)
                t0 = time.time()
                store.append_batch(nb)
                maint_s.append(time.time() - t0)
                rwh = tempfile.mkdtemp(prefix="bm25_rebuild_")
                try:
                    fresh = BM25IndexStore(
                        spark, rwh, "probe", "bm25", n_buckets=n_buckets
                    )
                    t0 = time.time()
                    fresh.append_batch(corpus.union(nb))
                    reb_s.append(time.time() - t0)
                finally:
                    shutil.rmtree(rwh, ignore_errors=True)

            med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)  # noqa: E731
            row = {
                "scale": scale,
                "docs": n,
                "n_buckets": n_buckets,
                "batch_docs": batch_n,
                "touched_buckets": len(
                    store.term_buckets(
                        sorted({t for _, q in queries for t in q.split()})
                    )
                ),
                "seed_sec": seed_sec,
                "maintain_sec": med(maint_s),
                "rebuild_sec": med(reb_s),
                "serve_pruned_sec": med(pruned_s),
                "serve_flat_sec": med(flat_s),
            }
            row["rebuild_over_maintain"] = round(
                row["rebuild_sec"] / row["maintain_sec"], 2
            )
            row["flat_over_pruned"] = round(
                row["serve_flat_sec"] / row["serve_pruned_sec"], 2
            )
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
