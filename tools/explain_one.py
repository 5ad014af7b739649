"""Dump `.explain("formatted")` for named registry heads to files.

Usage: python tools/explain_one.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt.  Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.01 — plan SHAPE is scale-independent here; the bench
numbers, not these files, carry the sf0.1 timings).

SPARK_GRAFT_EXPLAIN_NO_CKPT=1 disables ``DataFrame.localCheckpoint``
(identity) for the capture ONLY, so operators whose internals sit behind
checkpoint boundaries (which snapshot the plan into an opaque
``Scan ExistingRDD``) show their FULL composition in one plan.  Files
captured this way carry a header saying so — the executed plan is the
same graph cut into per-checkpoint jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergproject_spark.queries import REGISTRY  # noqa: E402
from icebergproject_spark.session import build_session  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = build_session("explain_one")
    spark.sparkContext.setLogLevel("FATAL")
    header = ""
    if os.environ.get("SPARK_GRAFT_EXPLAIN_NO_CKPT"):
        # Spark 4: the concrete class (classic.dataframe.DataFrame)
        # overrides the pyspark.sql.DataFrame base — patch the concrete
        # one or instance method lookup never sees the stub.
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # pragma: no cover - Spark 3.x fallback
            from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
        header = (
            "-- captured with localCheckpoint disabled "
            "(SPARK_GRAFT_EXPLAIN_NO_CKPT=1): the executed plan is this "
            "same graph cut into one job per checkpoint boundary --\n"
        )
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header + plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
