"""Worktree A/B attribution probe (VERDICT r12 ask #1 protocol).

Runs a named list of registry heads N times each in ONE Spark session
and prints a single JSON line of per-head medians (+ all samples).
Deliberately self-contained to what exists in every round's tree
(REGISTRY + build_session) so the SAME script can run unchanged in a
git worktree of an older round: pair the invocations A,B,A,B on the
same box and compare medians — if both trees move together, the mover
is the host, not the code.

Usage:
    python tools/ab_probe.py community_modularity_ann knn_edge_recall \
        [--runs 3] [--label r12]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergproject_spark.queries import REGISTRY  # noqa: E402
from icebergproject_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    label = "tree"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--runs":
            runs = int(argv[i + 1])
            args.remove(argv[i + 1])
        if a == "--label":
            label = argv[i + 1]
            args.remove(argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab_probe")
    spark.sparkContext.setLogLevel("FATAL")
    # same warmups as bench.py: JVM/codegen + Python/Arrow worker pool
    REGISTRY["dedup_exact"].fn(spark, sf_dir).count()
    import pyspark.sql.functions as F

    (
        spark.range(0, 256, 1, 32)
        .withColumn("g", F.col("id") % 32)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id bigint, g bigint")
        .count()
    )
    out: dict[str, dict] = {}
    for name in args:
        samples = []
        for _ in range(runs):
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            del df
        srt = sorted(samples)
        out[name] = {"median": srt[len(srt) // 2], "samples": samples}
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"label": label, "sf_dir": sf_dir, "heads": out}))


if __name__ == "__main__":
    main()
