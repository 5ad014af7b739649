"""Tests for the second extension registry (CDC views + relational surface)."""

from __future__ import annotations

import pyspark.sql.functions as F

import icebergproject_spark.queries  # noqa: F401  (registry defines import order)
from icebergproject_spark.queries_ext2 import (
    q_active_customers_semi,
    q_big_spender_exists,
    q_cdc_latest,
    q_events_moving_avg,
    q_ods_union_multiplex,
    q_orders_grouping_sets,
    q_user_last_state,
)


def test_cdc_latest_one_row_per_key(spark, sf_dir):
    out = q_cdc_latest(spark, sf_dir)
    total = out.count()
    assert total == out.select("user_id").distinct().count()
    assert total > 0


def test_cdc_latest_agrees_with_max_by(spark, sf_dir):
    """row_number and max_by strategies must produce the same last_type."""
    a = q_cdc_latest(spark, sf_dir).select("user_id", "last_type", "last_value")
    b = q_user_last_state(spark, sf_dir).select("user_id", "last_type", "last_value")
    assert a.subtract(b).count() == 0
    assert b.subtract(a).count() == 0


def test_grouping_sets_includes_grand_total(spark, sf_dir):
    out = q_orders_grouping_sets(spark, sf_dir)
    rows = out.filter((F.col("status") == "ALL") & (F.col("priority") == "ALL")).collect()
    assert len(rows) == 1
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert rows[0]["n_orders"] == n_orders


def test_semi_join_equals_exists_shape(spark, sf_dir):
    """Semi join never multiplies rows: output keys ⊆ customer keys, distinct."""
    out = q_active_customers_semi(spark, sf_dir)
    assert out.count() == out.select("c_custkey").distinct().count()


def test_exists_decorrelates_to_join(spark, sf_dir):
    out = q_big_spender_exists(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SemiJoin" in plan or "semi" in plan.lower()


def test_moving_avg_first_row_equals_value(spark, sf_dir):
    """Frame of size 1 at partition start: avg4 == value."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    first = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("s"))
        .select("user_id", F.col("s.event_id").alias("event_id"))
    )
    out = q_events_moving_avg(spark, sf_dir).join(first, ["user_id", "event_id"])
    joined = out.join(
        ev.select("event_id", F.col("value").cast("decimal(18,6)").alias("v")),
        "event_id",
    )
    assert joined.filter(F.col("avg4") != F.col("v")).count() == 0


def test_union_multiplex_counts_add_up(spark, sf_dir):
    out = q_ods_union_multiplex(spark, sf_dir)
    totals = {r["rec_type"]: r["n"] for r in
              out.groupBy("rec_type").agg(F.sum("n").alias("n")).collect()}
    assert totals["order"] == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert totals["ship"] == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def test_approx_percentile_error_bound(spark, sf_dir):
    """The sketch path must track the exact path: with accuracy=10000 on
    ~60k rows the rank error is tiny — assert each approx percentile is
    within 1 quantity unit of exact."""
    from icebergproject_spark.queries import REGISTRY

    exact = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in REGISTRY["quantity_quantiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in REGISTRY["quantity_quantiles_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag in exact:
        for e, a in zip(exact[flag], approx[flag]):
            assert abs(e - a) <= 1.0, (flag, exact[flag], approx[flag])
