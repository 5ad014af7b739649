"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

DRIVER-FAITHFUL RENDERING (round-2 hardening — the round-1 checker used
``Decimal.normalize()`` + ``round(float, 9)`` and was laxer than the
driver, which is why 6 queries passed locally but hash-failed in
CORRECTNESS_r01): BOTH sides go through a pandas fetch exactly like the driver — Spark via
``toPandas()`` (DECIMAL → object-dtype ``Decimal`` → ``138014.00``,
nullable bigint → float64), DuckDB via ``.df()`` (DECIMAL and HUGEINT →
float64 → ``138014.0``, ``3.0``).  No normalization on either side — a
terminal-type mismatch that the driver would flag now fails here too.
(Calibrated against CORRECTNESS_r01: this rendering reproduces the
driver's exact 6 fails / 37 passes on the round-1 code.)

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from __spark_entry__ import oracle_sql, queries
from icebergproject_spark.session import build_session
from icebergproject_spark.tables import TABLE_NAMES


def norm_value(v) -> str:
    """Raw stringification — no numeric coercion, no rounding.

    Both sides pass through here; the only adjustments are (a) None/NaN →
    the same token so a genuine SQL NULL compares equal regardless of
    fetch path, and (b) date-likes → a canonical timestamp string,
    because Spark's toPandas yields ``datetime.date`` objects for DATE
    while DuckDB's .df() yields midnight ``Timestamp``s — a difference
    the driver demonstrably tolerates (viewers_never_buy was green in
    CORRECTNESS_r01 with exactly this shape).  Numerics stay raw: that is
    where the driver is strict (Decimal('138014.00') ≠ float 138014.0).
    """
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:  # NaN from pandas nullable columns
        return "NULL"
    if isinstance(v, (datetime.date, datetime.datetime)):  # incl. Timestamp
        import pandas as pd

        return str(pd.Timestamp(v))
    return str(v)


def pandas_rows(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return cols, rows


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # adversarial-parallelism runs: ORACLE_MASTER=local[3] ORACLE_SHUFFLE=7
    # — results must be partitioning-independent, so the gate must pass
    # under ANY parallelism, not just the default
    master = os.environ.get("ORACLE_MASTER", "local[8]")
    shuffle = int(os.environ.get("ORACLE_SHUFFLE", "8"))
    spark = build_session("oracle-check", master=master, shuffle_partitions=shuffle)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = pandas_rows(sdf.toPandas())
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            ocols, orows = pandas_rows(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash spark={sh} duckdb={oh}")
                so = sorted(
                    "|".join(
                        norm_value(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "|".join(
                        norm_value(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        print(f"      first diff:\n      spark : {a}\n      duckdb: {b}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
