"""Temporal operator tests: as-of join semantics (<=, ties, misses,
key isolation) and gap sessionization boundaries."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from icebergproject_spark.operators.temporal import asof_join, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 10:05:00")),
            (3, "k2", _ts("2024-01-01 10:00:00")),
            (4, "k3", _ts("2024-01-01 09:00:00")),  # before any quote
        ],
        ["trade_id", "key", "t_ts"],
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 09:59:00"), 100, 9.5),
            ("k1", _ts("2024-01-01 10:00:00"), 101, 10.0),  # same-ts as trade 1
            ("k1", _ts("2024-01-01 10:00:00"), 102, 10.5),  # tie → greater key wins
            ("k1", _ts("2024-01-01 10:04:00"), 103, 11.0),
            ("k2", _ts("2024-01-01 09:30:00"), 200, 20.0),
            ("k3", _ts("2024-01-01 12:00:00"), 300, 30.0),  # after trade 4
        ],
        ["key", "q_ts", "quote_id", "px"],
    )


def test_asof_basic(trades, quotes):
    out = asof_join(
        trades, quotes, key="key", left_ts="t_ts", right_ts="q_ts",
        right_vals=["quote_id", "px"], tiebreak="quote_id",
    )
    rows = {r.trade_id: r for r in out.collect()}
    assert len(rows) == 4  # every left row survives exactly once
    # same-timestamp quote IS eligible (as-of is <=); tie → max quote_id
    assert rows[1].quote_id == 102 and rows[1].px == 10.5
    # strictly-latest earlier quote
    assert rows[2].quote_id == 103 and rows[2].px == 11.0
    # keys don't leak across partitions
    assert rows[3].quote_id == 200
    # no earlier quote → nulls, row retained
    assert rows[4].quote_id is None and rows[4].px is None


def test_asof_keeps_left_columns(trades, quotes):
    out = asof_join(
        trades, quotes, key="key", left_ts="t_ts", right_ts="q_ts",
        right_vals=["px"],
    )
    assert set(out.columns) == {"trade_id", "key", "t_ts", "px"}


def test_sessionize_gap_boundary(spark):
    # gaps: 0s, exactly 1800s (same session — break is strictly >), 1801s
    base = _ts("2024-01-01 00:00:00")
    rows = [
        ("u1", base),
        ("u1", base + dt.timedelta(seconds=1800)),
        ("u1", base + dt.timedelta(seconds=1800 + 1801)),
        ("u2", base),  # separate key restarts numbering
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, "user_id", "ts", gap="30 minutes")
    got = {(r.user_id, r.ts): r.session_id for r in out.collect()}
    assert got[("u1", rows[0][1])] == 1
    assert got[("u1", rows[1][1])] == 1  # 1800s gap == limit → same session
    assert got[("u1", rows[2][1])] == 2  # 1801s gap → new session
    assert got[("u2", base)] == 1


def test_sessionize_preserves_rows(spark, sf_dir):
    from icebergproject_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    out = sessionize(ev, "user_id", "ts", gap="30 minutes")
    assert out.count() == ev.count()
    assert "session_id" in out.columns


def test_range_join_semantics(spark):
    from icebergproject_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")),   # == start of A (inclusive)
         (2, _ts("2024-01-03 12:00:00")),   # inside A and B (overlap → 2 rows)
         (3, _ts("2024-01-05 00:00:00")),   # == end of A (inclusive)
         (4, _ts("2024-02-01 00:00:00"))],  # outside all
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [("A", _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00")),
         ("B", _ts("2024-01-03 00:00:00"), _ts("2024-01-04 00:00:00"))],
        ["iid", "start_ts", "end_ts"],
    )
    # narrow bucket (1 day) → intervals replicate across several buckets;
    # results must be identical to the naive definition regardless
    out = {(r.pid, r.iid) for r in range_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket="1 day"
    ).collect()}
    assert out == {(1, "A"), (2, "A"), (2, "B"), (3, "A")}

    # wide bucket (30 days) → same answer, fewer replicas
    out30 = {(r.pid, r.iid) for r in range_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket="30 days"
    ).collect()}
    assert out30 == out


# --- interpolate_gaps -------------------------------------------------------

def test_interpolate_gaps_lerp(spark):
    import datetime

    from icebergproject_spark.operators.temporal import interpolate_gaps

    d = datetime.date
    df = spark.createDataFrame(
        [(1, d(2024, 1, 1), 10.0), (1, d(2024, 1, 4), 40.0),
         (2, d(2024, 2, 1), 5.0)],
        "u long, d date, v double",
    )
    out = interpolate_gaps(df, "u", "d", "v").collect()
    got = {(r.u, str(r.d)): (r.v, r.interpolated) for r in out}
    assert got == {
        (1, "2024-01-01"): (10.0, False),
        (1, "2024-01-02"): (20.0, True),
        (1, "2024-01-03"): (30.0, True),
        (1, "2024-01-04"): (40.0, False),
        (2, "2024-02-01"): (5.0, False),
    }


def test_interpolate_gaps_uneven_spacing(spark):
    """LERP weights by actual day distance, not gap index."""
    import datetime

    from icebergproject_spark.operators.temporal import interpolate_gaps

    d = datetime.date
    df = spark.createDataFrame(
        [(1, d(2024, 1, 1), 0.0), (1, d(2024, 1, 11), 5.0)],
        "u long, d date, v double",
    )
    out = {str(r.d): r.v
           for r in interpolate_gaps(df, "u", "d", "v").collect()}
    assert out["2024-01-03"] == 1.0   # 2/10 of the way
    assert out["2024-01-08"] == 3.5   # 7/10


def test_interpolate_gaps_dense_series_passthrough(spark):
    import datetime

    from icebergproject_spark.operators.temporal import interpolate_gaps

    d = datetime.date
    rows = [(1, d(2024, 3, 1 + i), float(i * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "u long, d date, v double")
    out = interpolate_gaps(df, "u", "d", "v").collect()
    assert all(not r.interpolated for r in out)
    assert {r.v for r in out} == {0.0, 1.0, 4.0, 9.0, 16.0}


# --- purchase_attribution (as-of composition) --------------------------------

def test_purchase_attribution_cases(spark):
    """Within-window view attributed (latest wins); stale view -> NULL;
    no view at all -> NULL."""
    import datetime

    # import through the assembled registry — importing queries_r8b
    # directly re-enters the circular queries<->r8b import
    from icebergproject_spark.queries import REGISTRY

    q_purchase_attribution = REGISTRY["purchase_attribution"].fn

    # build a tiny parquet sf_dir with just the events table
    import tempfile

    d = tempfile.mkdtemp()
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, uid, typ, offset_min):
        return (
            eid,
            base + datetime.timedelta(minutes=offset_min),
            uid,
            typ,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 100, "view", 0),
        ev(2, 100, "view", 10),      # latest view before the purchase
        ev(3, 100, "purchase", 20),  # gap 10 min -> attributed to 2
        ev(4, 200, "view", 0),
        ev(5, 200, "purchase", 45),  # gap 45 min -> stale, NULL
        ev(6, 300, "purchase", 5),   # no view ever -> NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r.purchase_id: (r.view_id, r.gap_ms)
           for r in q_purchase_attribution(spark, d).collect()}
    assert got[3] == (2, 10 * 60 * 1000)
    assert got[5] == (None, None)
    assert got[6] == (None, None)
