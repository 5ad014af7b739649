"""Data-quality constraint audit — the Deequ-style checks tier
(Schelter et al. 2018, "Automating large-scale data quality
verification"): declarative constraints evaluated as plain aggregates,
emitted as ONE long-format audit table so quality is DATA you can
diff/alert on, not log noise.

This is the gate a 100 TB training-data ingest runs before anything
else touches a batch: completeness (null rates), key uniqueness,
referential integrity (orphan foreign keys), domain membership, and
range checks.  Every check is a single aggregate over one table (or one
anti-join for FK checks) — column-pruned scans, map-side-combined
counts, no shuffle wider than the group-less aggregate; checks
parallelize trivially and the audit table is a few rows per table.

The reference has no quality tier at all (its jobs trust Kafka
payloads, e.g. ProcessODSDataToDWD.scala takes fields as-is); this is
part of the LLM-pipeline extension set.

Output schema (every builder): (entity, check, violations BIGINT,
total BIGINT, pass_ppm BIGINT) — pass_ppm = (total−violations)·10⁶
DIV total (0 total ⇒ ppm 10⁶: an empty table violates nothing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _emit(
    entity: str, check: str, violations: Column, total: Column, df: DataFrame
) -> DataFrame:
    return df.agg(
        violations.cast("long").alias("violations"),
        total.cast("long").alias("total"),
    ).select(
        F.lit(entity).alias("entity"),
        F.lit(check).alias("check"),
        "violations",
        "total",
        F.expr(
            "CAST(CASE WHEN total = 0 THEN 1000000"
            " ELSE (total - violations) * 1000000 DIV total END AS BIGINT)"
        ).alias("pass_ppm"),
    )


def completeness(df: DataFrame, entity: str, col: str) -> DataFrame:
    """Violation = NULL in ``col``."""
    return _emit(
        entity,
        f"complete:{col}",
        F.count(F.lit(1)) - F.count(F.col(col)),
        F.count(F.lit(1)),
        df,
    )


def uniqueness(df: DataFrame, entity: str, col: str) -> DataFrame:
    """Violation = rows beyond the first per key (duplicate pk rows)."""
    return _emit(
        entity,
        f"unique:{col}",
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
        F.count(F.lit(1)),
        df,
    )


def in_domain(
    df: DataFrame, entity: str, col: str, allowed: list[str]
) -> DataFrame:
    """Violation = non-NULL value outside the allowed set."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(allowed)
    return _emit(
        entity,
        f"domain:{col}",
        F.sum(bad.cast("long")),
        F.count(F.lit(1)),
        df,
    )


def in_range(
    df: DataFrame, entity: str, col: str, lo: int, hi: int
) -> DataFrame:
    """Violation = non-NULL value outside [lo, hi]."""
    bad = F.col(col).isNotNull() & (
        (F.col(col) < lo) | (F.col(col) > hi)
    )
    return _emit(
        entity,
        f"range:{col}",
        F.sum(bad.cast("long")),
        F.count(F.lit(1)),
        df,
    )


def non_empty(df: DataFrame, entity: str, col: str) -> DataFrame:
    """Violation = NULL or empty string."""
    bad = F.col(col).isNull() | (F.length(F.col(col)) == 0)
    return _emit(
        entity,
        f"nonempty:{col}",
        F.sum(bad.cast("long")),
        F.count(F.lit(1)),
        df,
    )


def json_parseable(
    df: DataFrame, entity: str, col: str, probe_path: str
) -> DataFrame:
    """Violation = JSON column where ``probe_path`` extracts NULL (a
    malformed document or a missing required key — the ingest contract
    for semi-structured payloads)."""
    bad = F.get_json_object(F.col(col), probe_path).isNull()
    return _emit(
        entity,
        f"json:{col}{probe_path.lstrip('$')}",
        F.sum(bad.cast("long")),
        F.count(F.lit(1)),
        df,
    )


def fk_integrity(
    child: DataFrame,
    entity: str,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """Violation = child rows whose non-NULL ``fk`` has no ``pk`` match
    (orphans) — one anti-join against the (usually broadcast-sized
    after distinct) parent key set."""
    orphans = (
        child.where(F.col(fk).isNotNull())
        .join(
            parent.select(F.col(pk).alias(fk)).distinct(),
            fk,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return orphans.crossJoin(F.broadcast(total)).select(
        F.lit(entity).alias("entity"),
        F.lit(f"fk:{fk}").alias("check"),
        "violations",
        "total",
        F.expr(
            "CAST(CASE WHEN total = 0 THEN 1000000"
            " ELSE (total - violations) * 1000000 DIV total END AS BIGINT)"
        ).alias("pass_ppm"),
    )


def dq_suite(checks: list[DataFrame]) -> DataFrame:
    """Union a list of check results into the one audit table, ordered
    stably by (entity, check) for readability (the driver hash is
    order-insensitive; the ORDER is for humans tailing the table)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
