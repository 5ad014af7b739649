"""Bucketed stored-bands crossover probe (closes SCALE.md r12 negative
result #1 with a ladder).

r12 measured the bucketed bands table LOSING at fixture scale — but
with a 200-doc batch whose 1600 band signatures touched 1299/4096
buckets, i.e. outside the layout's own premise (n_buckets ≫
|batch|×bands).  This probe measures the regime the claim actually
names: a 20-doc batch (160 signatures → ≤160 touched buckets of 4096)
against synthetic corpora at 64×/256×/1024× the fixture's 500 docs.

Arms (median of N, full executions through a noop sink):
- flat     — incremental_lsh_candidates against an UNPARTITIONED stored
             bands table (one columnar scan of O(corpus) rows — the r12
             comparison's stored layout)
- fullscan — the same generator against the BUCKETED table read without
             pruning (what ignoring the layout costs: 4096 small files)
- pruned   — incremental_lsh_candidates_bucketed (O(touched) listing)
- rebuild  — minhash_lsh_candidates over corpus ∪ batch (the
             non-incremental baseline every maintenance arm must beat)

Corpus docs are deterministic pseudo-random token sequences (xxhash64
vocab draws), so cross-doc candidate collisions are rare and the
measured cost is the machinery, not a pathological pair explosion.

Usage: python tools/bands_crossover_probe.py [--scales 64,256,1024]
       [--batch 20] [--buckets 4096] [--runs 3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergproject_spark.session import build_session  # noqa: E402


def _arg(name: str, default: str) -> str:
    argv = sys.argv[1:]
    return argv[argv.index(name) + 1] if name in argv else default


def synth_docs(spark, n: int, start: int = 0, tokens: int = 30):
    """Deterministic pseudo-random corpus: doc i = `tokens` draws from a
    2^20 vocab via xxhash64(i, pos) — no Python UDF, fully codegen."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(p)), F.lit(1 << 20)),
                )
                for p in range(tokens)
            ],
        ).alias("text"),
    )


def _median(fn, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    scales = [int(s) for s in _arg("--scales", "64,256,1024").split(",")]
    batch_n = int(_arg("--batch", "20"))
    n_buckets = int(_arg("--buckets", "4096"))
    runs = int(_arg("--runs", "3"))

    spark = build_session("bands_crossover_probe")
    spark.sparkContext.setLogLevel("FATAL")
    from icebergproject_spark.llm import dedup

    for scale in scales:
        n = 500 * scale
        wh = tempfile.mkdtemp(prefix="bands_xover_")
        try:
            corpus = synth_docs(spark, n).localCheckpoint(eager=True)
            batch = synth_docs(spark, batch_n, start=n).localCheckpoint(
                eager=True
            )
            stored_bands = dedup.banded_signatures(corpus).localCheckpoint(
                eager=True
            )
            t0 = time.time()
            tbl = dedup.bands_table(
                spark, wh, "probe", "bands",
                bands=stored_bands, n_buckets=n_buckets,
            )
            seed_sec = round(time.time() - t0, 3)
            # the r12 comparison's stored layout: flat, unpartitioned
            from icebergproject_spark.lakehouse.tableformat import (
                LakehouseTable,
            )

            flat_tbl = LakehouseTable(spark, wh, "probe", "bands_flat")
            t0 = time.time()
            flat_tbl.append(stored_bands)
            seed_flat_sec = round(time.time() - t0, 3)
            bb = dedup.banded_signatures(batch).localCheckpoint(eager=True)
            touched = (
                bb.select(
                    F.pmod(F.xxhash64("band_sig"), F.lit(n_buckets))
                ).distinct().count()
            )

            def flat():
                dedup.incremental_lsh_candidates(
                    bb, flat_tbl.read().select("id", "band", "band_sig")
                ).write.format("noop").mode("overwrite").save()

            def fullscan():
                dedup.incremental_lsh_candidates(
                    bb, tbl.read().select("id", "band", "band_sig")
                ).write.format("noop").mode("overwrite").save()

            def pruned():
                dedup.incremental_lsh_candidates_bucketed(
                    bb, tbl, n_buckets=n_buckets
                ).write.format("noop").mode("overwrite").save()

            def rebuild():
                dedup.minhash_lsh_candidates(
                    corpus.union(batch)
                ).write.format("noop").mode("overwrite").save()

            row = {
                "scale": scale,
                "docs": n,
                "stored_band_rows": stored_bands.count(),
                "touched_buckets": touched,
                "n_buckets": n_buckets,
                "seed_sec": seed_sec,
                "seed_flat_sec": seed_flat_sec,
                "flat_sec": _median(flat, runs),
                "fullscan_sec": _median(fullscan, runs),
                "pruned_sec": _median(pruned, runs),
                "rebuild_sec": _median(rebuild, runs),
            }
            row["flat_over_pruned"] = round(
                row["flat_sec"] / row["pruned_sec"], 2
            )
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
