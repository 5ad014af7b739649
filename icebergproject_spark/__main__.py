"""Command-line entry point — run any registry query from a shell.

    python -m icebergproject_spark list [substring]
    python -m icebergproject_spark run <query> [--sf-dir DIR] [--show N]
                                      [--out PATH]
    python -m icebergproject_spark explain <query> [--sf-dir DIR]
    python -m icebergproject_spark sql "SELECT ..." [--sf-dir DIR] [--show N]

The reference's user surface is "submit a Flink job per pipeline"; here
every pipeline stage and analysis is a named query over the same tables
— list them, run one, read its plan, or go ad-hoc with plain SQL (the
harness tables are registered as temp views).
"""

from __future__ import annotations

import argparse
import os
import sys


def _session():
    from icebergproject_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    return build_session(
        "icebergproject-cli", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="icebergproject_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            sp.add_argument("--show", type=int, default=20)
            sp.add_argument("--out", help="write full result as parquet")

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the harness tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("--show", type=int, default=20)

    p_maint = sub.add_parser(
        "maintain",
        help="compact + expire + orphan-sweep every lakehouse table "
        "(the reference's CombinDataAndRemoveOldSnap job)",
    )
    p_maint.add_argument("--warehouse", required=True)
    p_maint.add_argument("--db", default="icebergdb")
    p_maint.add_argument(
        "--older-than-ms", type=int, default=None,
        help="expiry/orphan cutoff (default: now)",
    )

    args = p.parse_args(argv)

    if args.cmd == "maintain":
        from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog

        spark = _session()
        catalog = LakehouseCatalog(spark, warehouse=args.warehouse, db=args.db)
        for name, expired in catalog.maintain_all(args.older_than_ms).items():
            print(f"{name}: expired {expired} snapshot(s)")
        return 0

    from icebergproject_spark.queries import REGISTRY

    if args.cmd == "list":
        for name, q in REGISTRY.items():
            if args.substring in name:
                doc = (q.fn.__doc__ or "").strip().splitlines()
                print(f"{name:36s} {'oracle   ' if q.oracle else 'rows-only'} "
                      f"{doc[0] if doc else ''}")
        return 0

    if args.cmd == "sql":
        from icebergproject_spark.tables import TABLE_NAMES, load_table

        spark = _session()
        for t in TABLE_NAMES:
            load_table(spark, t, args.sf_dir).createOrReplaceTempView(t)
        spark.sql(args.statement).show(args.show, truncate=False)
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try: python -m "
              f"icebergproject_spark list", file=sys.stderr)
        return 2
    spark = _session()
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    df.show(args.show, truncate=False)
    print(f"[{df.count()} rows total]")
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"written: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
