"""Golden end-to-end medallion test over FIXTURES.md hand-written rows:
ODS parse/route → DWD cleanse → DIM upsert → DWS wide joins → DM marts.
Covers null timestamps, unmatched dim keys, non-business databases, and
CDC delete suppression — the exact edge cases FIXTURES.md calls out."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from icebergproject_spark.lakehouse.tableformat import LakehouseCatalog
from icebergproject_spark.plans import (
    browse_wide,
    cleanse_browselog,
    cleanse_user_login,
    dm_product_visit,
    dm_user_login_info,
    ods_browselog,
    ods_user_login,
    parse_cdc_stream,
    route_cdc,
    upsert_dims,
    user_login_wide,
)
from icebergproject_spark.plans.dim import filter_upsert_ops


@pytest.fixture()
def cdc(spark):
    rows = [
        # (database, table, type, ts, data)
        ("lakehousedb", "mc_user_login", "insert", "1648300465",
         {"id": "9992", "user_id": "uid185880", "ip": "54.223.109.158",
          "login_tm": "1646741000000", "logout_tm": None}),
        ("lakehousedb", "mc_user_login", "insert", "1648300466",
         {"id": "9993", "user_id": "uid000001", "ip": "10.0.0.1",
          "login_tm": None, "logout_tm": None}),
        ("lakehousedb", "mc_member_info", "insert", "1648300467",
         {"id": "1", "user_id": "uid185880", "member_level": "gold",
          "member_points": "120", "balance": "30804",
          "member_growth_score": "7", "gmt_create": "1645019079851"}),
        ("lakehousedb", "mc_member_info", "delete", "1648300468",  # must be ignored
         {"id": "1", "user_id": "uid185880", "member_level": "bronze",
          "member_points": "0", "balance": "0",
          "member_growth_score": "0", "gmt_create": "1645019079851"}),
        ("otherdb", "mc_user_login", "insert", "1648300469",  # non-business db
         {"id": "1", "user_id": "nope", "ip": "x", "login_tm": None, "logout_tm": None}),
    ]
    return spark.createDataFrame(
        rows, "database string, table string, type string, ts string, data map<string,string>"
    )


@pytest.fixture()
def routing_config(spark):
    return spark.createDataFrame(
        [("lakehousedb:mc_member_info", "user_id", "DIM_MEMBER_INFO")],
        ["config_key", "pk_col", "sink"],
    )


def test_ods_routing(cdc, routing_config):
    biz = parse_cdc_stream(cdc)
    assert biz.count() == 4  # otherdb dropped
    dim, fact = route_cdc(biz, routing_config)
    assert dim.count() == 2  # member_info insert + delete
    assert {r.table for r in fact.collect()} == {"mc_user_login"}


def test_ods_dwd_user_login(cdc, routing_config):
    biz = parse_cdc_stream(cdc)
    _, fact = route_cdc(biz, routing_config)
    ods = ods_user_login(fact)
    dwd = cleanse_user_login(ods).collect()
    by_id = {r.id: r for r in dwd}
    assert by_id["9992"].login_tm == "2022-03-08 12:03:20"
    assert by_id["9992"].logout_tm == "1970-01-01 00:00:00"  # null default
    assert by_id["9993"].login_tm == "1970-01-01 00:00:00"


def test_dim_upsert_and_merge(spark, cdc, routing_config, tmp_path):
    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path), db="testdb")
    biz = parse_cdc_stream(cdc)
    dim, _ = route_cdc(biz, routing_config)
    cfg = [{
        "tbl_name": "mc_member_info", "tbl_db": "lakehousedb", "pk_col": "user_id",
        "cols": "id,user_id,member_level,member_points,balance,member_growth_score,gmt_create",
        "sink_tbl_name": "DIM_MEMBER_INFO",
    }]
    merged = upsert_dims(catalog, dim, cfg)
    assert merged == {"DIM_MEMBER_INFO": 1}  # delete filtered out (T8)
    t = catalog.table("DIM_MEMBER_INFO").read().collect()
    assert len(t) == 1 and t[0].member_level == "gold"  # delete didn't clobber

    # CDC update arrives → MERGE updates in place, no duplicate key
    upd = spark.createDataFrame(
        [("lakehousedb", "mc_member_info", "update", "9",
          {"id": "1", "user_id": "uid185880", "member_level": "platinum",
           "member_points": "150", "balance": "99", "member_growth_score": "9",
           "gmt_create": "1645019079851"})],
        "database string, table string, type string, ts string, data map<string,string>",
    )
    upsert_dims(catalog, upd, cfg)
    t2 = catalog.table("DIM_MEMBER_INFO").read().collect()
    assert len(t2) == 1 and t2[0].member_level == "platinum"


def test_dim_upsert_write_mode_upsert_same_state_o_batch_cost(
    spark, cdc, routing_config, tmp_path
):
    """write_mode='upsert' (the Phoenix-parity COST shape: one
    equality-delete + data file commit per batch, O(batch), no table
    rewrite) lands the IDENTICAL final dim state as the copy-on-write
    MERGE — and the update batch provably did not rewrite the seed data
    dir (the prior dirs survive in the new snapshot)."""
    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path), db="testdb")
    biz = parse_cdc_stream(cdc)
    dim, _ = route_cdc(biz, routing_config)
    cfg = [{
        "tbl_name": "mc_member_info", "tbl_db": "lakehousedb", "pk_col": "user_id",
        "cols": "id,user_id,member_level,member_points,balance,member_growth_score,gmt_create",
        "sink_tbl_name": "DIM_MEMBER_UPS",
    }]
    assert upsert_dims(catalog, dim, cfg, write_mode="upsert") == {
        "DIM_MEMBER_UPS": 1
    }
    t = catalog.table("DIM_MEMBER_UPS")
    before = t.current_snapshot()
    upd = spark.createDataFrame(
        [("lakehousedb", "mc_member_info", "update", "9",
          {"id": "1", "user_id": "uid185880", "member_level": "platinum",
           "member_points": "150", "balance": "99", "member_growth_score": "9",
           "gmt_create": "1645019079851"})],
        "database string, table string, type string, ts string, data map<string,string>",
    )
    upsert_dims(catalog, upd, cfg, write_mode="upsert")
    after = t.current_snapshot()
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].member_level == "platinum"
    # O(batch): the seed dirs were NOT rewritten, the update commit only
    # added one data dir + one equality-delete entry
    assert set(before["data_dirs"]) < set(after["data_dirs"])
    assert len(after["eq_delete_dirs"]) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_dims(catalog, upd, cfg, write_mode="phoenix")
    # fold_eq_debt wiring (r13): past the threshold the accumulated
    # equality deletes are folded to ONE positional file in-path, state
    # unchanged — the dim sink's read cost stays bounded without an
    # external maintain
    for i in range(2):
        upsert_dims(catalog, upd, cfg, write_mode="upsert", fold_eq_debt=2)
    cur = t.current_snapshot()
    assert len(cur.get("eq_delete_dirs", [])) <= 2
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].member_level == "platinum"
    # bloom_keys wiring (r13): the dim sink declared a pk bloom before
    # the first write (Phoenix per-key GET parity), so a key-addressed
    # read prunes every dir lacking the key, and an absent key proves
    # empty at planning time
    assert t._bloom_config()["columns"] == ["user_id"]
    dirs = t.current_snapshot()["data_dirs"]
    assert all(
        not t._dir_may_match(d, [("user_id", "=", "uid_no_such")])
        for d in dirs
    )
    assert t.read(where="user_id = 'uid_no_such'").count() == 0
    got = t.read(where="user_id = 'uid185880'").collect()
    assert len(got) == 1 and got[0].member_level == "platinum"


def test_dws_user_login_wide_null_attrs(spark):
    login = spark.createDataFrame(
        [("uid185880", "1.2.3.4", "2022-03-08 12:03:20", "1970-01-01 00:00:00"),
         ("uid_nodim", "5.6.7.8", "2022-03-08 13:00:00", "1970-01-01 00:00:00")],
        ["user_id", "ip", "login_tm", "logout_tm"],
    )
    member = spark.createDataFrame(
        [("uid185880", "1645019079851", "gold", "120", "30804", "7")],
        ["user_id", "gmt_create", "member_level", "member_points", "balance", "member_growth_score"],
    )
    addr = spark.createDataFrame(
        [("uid185880", "jiangsu", "nanjing", "qinhuai", "1 main st")],
        ["user_id", "province", "city", "area", "address"],
    )
    wide = user_login_wide(login, member, addr)
    assert wide.columns == [
        "user_id", "ip", "gmt_create", "login_tm", "logout_tm", "member_level",
        "province", "city", "area", "address", "member_points", "balance",
        "member_growth_score",
    ]  # 13-col DWS_USER_LOGIN shape (ProcessUserlogInToDWS.scala:230-248)
    rows = {r.user_id: r for r in wide.collect()}
    assert rows["uid185880"].province == "jiangsu"
    assert rows["uid_nodim"].province is None  # unmatched dim ⇒ nulls


def test_dws_browse_wide_and_dm(spark):
    log = spark.createDataFrame(
        [("1655274222161", "uid289100", "30.121.149.246", "",
          "https://2by/a9UWkE/npF76q", "14000", "demHQ6TADV", "42")],
        ["log_time", "user_id", "user_ip", "front_product_url",
         "browse_product_url", "browse_product_tpcode", "browse_product_code",
         "obtain_points"],
    )
    ods = cleanse_browselog(log)
    product = spark.createDataFrame(
        [("demHQ6TADV", "14000", "oil filter", "1645019079851")],
        ["product_id", "category_id", "product_name", "gmt_create"],
    )
    category = spark.createDataFrame(
        [("14000", "14", "repair"), ("14", None, "autoparts")],
        ["id", "p_id", "name"],
    )
    wide = browse_wide(ods, product, category)
    r = wide.collect()[0]
    assert r.log_time == "2022-06-15"  # date part only (ProduceBrowseLogToDWS.scala:209)
    assert r.product_name == "oil filter"
    assert r.first_category_name == "autoparts"
    assert r.second_category_name == "repair"
    assert r.obtain_points == "42"

    visits = dm_product_visit(
        wide.withColumn("event_ts", F.lit("2022-06-15 06:23:42").cast("timestamp"))
    ).collect()
    assert visits[0].product_cnt == 1
    assert visits[0].window_start == "2022-06-15 06:23:40"
    assert visits[0].first_cat == "autoparts"


def test_dm_user_login_info_drops_null_province(spark):
    wide = spark.createDataFrame(
        [("u1", "jiangsu", "nanjing", "2022-03-08 12:03:20", "1645019079851"),
         ("u2", None, None, "2022-03-08 12:05:00", "1645019079851")],
        ["user_id", "province", "city", "login_tm", "gmt_create"],
    )
    out = dm_user_login_info(wide)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].user_id == "u1"
    assert rows[0].dt  # wall-clock today (F1)


def test_filter_upsert_ops(spark):
    df = spark.createDataFrame(
        [("insert",), ("update",), ("bootstrap-insert",), ("delete",)], ["type"]
    )
    kept = {r.type for r in filter_upsert_ops(df).collect()}
    assert kept == {"insert", "update", "bootstrap-insert"}


def test_ods_browselog_envelope(spark):
    raw = spark.createDataFrame(
        [("browselog", {"logTime": "1655274222161", "userId": "uid813665",
                        "userIp": "30.121.149.246", "frontProductUrl": "",
                        "browseProductUrl": "https://2by/a9UWkE/npF76q",
                        "browseProductTpCode": "14000",
                        "browseProductCode": "demHQ6TADV", "obtainPoints": "42"}),
         ("otherlog", {"x": "y"})],
        "logtype string, data map<string,string>",
    )
    ods = ods_browselog(raw)
    rows = ods.collect()
    assert len(rows) == 1  # non-browselog routed nowhere
    assert rows[0].browse_product_code == "demHQ6TADV"
    assert rows[0].front_product_url == ""  # valueless key preserved


def test_streaming_medallion_e2e(spark, tmp_path):
    """The ODS→DWD chain as an actual stream: CDC JSON frames → envelope
    decode → business-db filter → routing → typed ODS → cleanse → lakehouse
    append per micro-batch. Same stage functions as the batch tests —
    proving the pipeline is source-agnostic (SURVEY §7 stance)."""
    import json

    from icebergproject_spark.sources import CDC_ENVELOPE_SCHEMA, kafka_json_source

    frames = [
        {"database": "lakehousedb", "table": "mc_user_login", "type": "insert",
         "ts": "1648300465", "xid": "1", "commit": "true",
         "data": {"id": "9992", "user_id": "uid185880", "ip": "54.223.109.158",
                  "login_tm": "1646741000000", "logout_tm": None}},
        {"database": "lakehousedb", "table": "mc_user_login", "type": "insert",
         "ts": "1648300466", "xid": "2", "commit": "true",
         "data": {"id": "9993", "user_id": "uid000001", "ip": "10.0.0.1",
                  "login_tm": None, "logout_tm": None}},
        {"database": "otherdb", "table": "mc_user_login", "type": "insert",
         "ts": "1648300469", "xid": "3", "commit": "true",
         "data": {"id": "1", "user_id": "nope", "ip": "x",
                  "login_tm": None, "logout_tm": None}},
    ]
    src = tmp_path / "cdc_frames"
    src.mkdir()
    (src / "batch.jsonl").write_text(
        "\n".join(json.dumps(f) for f in frames) + "\n"
    )

    stream = kafka_json_source(spark, CDC_ENVELOPE_SCHEMA, path=str(src))
    config = spark.createDataFrame(
        [("lakehousedb:mc_member_info", "user_id", "DIM_MEMBER_INFO")],
        ["config_key", "pk_col", "sink"],
    )
    biz = parse_cdc_stream(stream)
    _, fact = route_cdc(biz, config)
    dwd = cleanse_user_login(ods_user_login(fact))

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="testdb")

    def sink(batch, _):
        if batch.count():
            catalog.table("DWD_USER_LOGIN").append(batch)

    q = (
        dwd.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = {r.id: r for r in catalog.table("DWD_USER_LOGIN").read().collect()}
    assert set(out) == {"9992", "9993"}  # otherdb row dropped in-stream
    assert out["9992"].login_tm == "2022-03-08 12:03:20"
    assert out["9992"].logout_tm == "1970-01-01 00:00:00"
    assert out["9993"].login_tm == "1970-01-01 00:00:00"


def test_streaming_full_medallion_browse(spark, tmp_path):
    """The reference's entire browse pipeline as ONE stream: log envelope
    → ODS projection (P1/P2) → DWD cleanse (F2) → DWS stream-static dim
    joins (J3/J4) → DM tumbling-window count (A2), every stage per
    micro-batch, DWS and DM appended to lakehouse tables. Collapses four
    reference jobs (log-ODS, DWD, ProduceBrowseLogToDWS,
    ProcessBrowseLogInfoToDM) into one DAG."""
    import json

    from icebergproject_spark.plans.dm import dm_product_visit
    from icebergproject_spark.plans.dwd import cleanse_browselog
    from icebergproject_spark.plans.dws import browse_wide
    from icebergproject_spark.plans.ods import ods_browselog
    from icebergproject_spark.sources import LOG_ENVELOPE_SCHEMA, kafka_json_source

    def frame(log_ms, user, tpcode, code, points):
        return json.dumps(
            {"logtype": "browselog",
             "data": {"logTime": str(log_ms), "userId": user,
                      "userIp": "10.0.0.1", "frontProductUrl": "",
                      "browseProductUrl": "/p", "browseProductTpCode": tpcode,
                      "browseProductCode": code, "obtainPoints": str(points)}}
        )

    base_ms = 1_650_000_000_000
    src = tmp_path / "log_src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(
            [
                frame(base_ms, "u1", "c1", "p1", 5),
                frame(base_ms + 3_000, "u2", "c1", "p1", 7),  # same 10 s window
                frame(base_ms + 14_000, "u1", "c2", "p2", 9),  # next window
                json.dumps({"logtype": "otherlog", "data": {}}),  # dropped
            ]
        )
        + "\n"
    )

    product_info = spark.createDataFrame(
        [("p1", "widget"), ("p2", "gadget")], ["product_id", "product_name"]
    )
    category = spark.createDataFrame(
        [("c1", "c0", "books"), ("c2", "c0", "tools"), ("c0", None, "root")],
        ["id", "p_id", "name"],
    )

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="icebergdb")
    stream = kafka_json_source(spark, LOG_ENVELOPE_SCHEMA, path=str(src))
    dwd = cleanse_browselog(ods_browselog(stream))

    def sink(batch, _):
        # DWS table: date-reduced wide rows (ProductBrowseLogToDWS path)
        catalog.table("DWS_BROWSE_INFO").append(
            browse_wide(batch, product_info, category)
        )
        # DM: window over the wide-topic variant (full timestamp)
        wide_topic = browse_wide(
            batch, product_info, category, keep_full_time=True
        ).withColumn("event_ts", F.to_timestamp("log_time"))
        catalog.table("DM_PRODUCT_VISIT").append(dm_product_visit(wide_topic))

    q = (
        dwd.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dws = catalog.table("DWS_BROWSE_INFO").read().collect()
    assert len(dws) == 3  # otherlog row dropped at ODS
    assert {(r.user_id, r.product_name) for r in dws} == {
        ("u1", "widget"), ("u2", "widget"), ("u1", "gadget")
    }
    assert all(r.first_category_name == "root" for r in dws)
    assert all(" " not in r.log_time for r in dws)  # date-reduced

    dm_rows = catalog.table("DM_PRODUCT_VISIT").read().collect()
    visits = {(r.product, r.product_cnt) for r in dm_rows}
    assert ("widget", 2) in visits  # two browses in one 10 s window
    assert ("gadget", 1) in visits


def test_incremental_wide_refresh_matches_full_rebuild(spark, tmp_path):
    """IVM: after a dim update, refreshing only affected keys yields the
    same table as a full rebuild — without re-joining untouched facts."""
    from icebergproject_spark.plans.dws import refresh_wide_incremental

    facts = spark.createDataFrame(
        [("u1", "2022-01-01"), ("u2", "2022-01-02"), ("u3", "2022-01-03")],
        ["user_id", "login_dt"],
    )
    dim_v1 = spark.createDataFrame(
        [("u1", "bronze"), ("u2", "silver"), ("u3", "gold")],
        ["user_id", "member_level"],
    )

    def build_wide(f, dim):
        return f.join(dim, "user_id", "left").select(
            "user_id", "login_dt", "member_level"
        )

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="dws")
    t = catalog.table("WIDE")
    t.overwrite(build_wide(facts, dim_v1))

    # dim delta: u1 upgraded; u2/u3 untouched
    dim_v2 = spark.createDataFrame(
        [("u1", "platinum"), ("u2", "silver"), ("u3", "gold")],
        ["user_id", "member_level"],
    )
    delta_keys = spark.createDataFrame([("u1",)], ["user_id"])
    refresh_wide_incremental(
        t, facts, lambda f: build_wide(f, dim_v2), delta_keys,
        dim_key="user_id", row_keys=["user_id", "login_dt"],
    )

    got = {r.user_id: r.member_level for r in t.read().collect()}
    want = {r.user_id: r.member_level
            for r in build_wide(facts, dim_v2).collect()}
    assert got == want == {"u1": "platinum", "u2": "silver", "u3": "gold"}


def test_incremental_refresh_preserves_multi_row_keys(spark, tmp_path):
    """A key with several wide rows keeps all of them through an
    incremental refresh (row identity ≠ dim key)."""
    from icebergproject_spark.plans.dws import refresh_wide_incremental

    facts = spark.createDataFrame(
        [("u1", "d1"), ("u1", "d2"), ("u2", "d1")], ["user_id", "login_dt"]
    )
    dim = {"u1": "bronze", "u2": "silver"}

    def build(f, d):
        m = spark.createDataFrame(list(d.items()), ["user_id", "member_level"])
        return f.join(m, "user_id", "left").select(
            "user_id", "login_dt", "member_level"
        )

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"), db="dws")
    t = catalog.table("WIDE2")
    t.overwrite(build(facts, dim))

    dim2 = {"u1": "gold", "u2": "silver"}
    refresh_wide_incremental(
        t, facts, lambda f: build(f, dim2),
        spark.createDataFrame([("u1",)], ["user_id"]),
        dim_key="user_id", row_keys=["user_id", "login_dt"],
    )
    rows = {(r.user_id, r.login_dt): r.member_level for r in t.read().collect()}
    assert rows == {("u1", "d1"): "gold", ("u1", "d2"): "gold",
                    ("u2", "d1"): "silver"}


def test_cdc_deletes_applied_via_equality_delete_files(spark, tmp_path):
    """K6/T8 extension: upsert_dims_with_deletes honors the CDC
    ``tp=delete`` records the reference drops (DimDataToHBase.scala:67)
    as Iceberg v2 equality-delete files — applied on read, folded by
    compaction, with time travel to the pre-delete state intact."""
    from icebergproject_spark.plans.dim import upsert_dims_with_deletes

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path), db="testdb")
    cfg = [{
        "tbl_name": "mc_member_info", "tbl_db": "lakehousedb",
        "pk_col": "user_id", "cols": "user_id,member_level",
        "sink_tbl_name": "DIM_MEMBER_INFO",
    }]
    schema = (
        "database string, table string, type string, ts string, "
        "data map<string,string>"
    )
    batch1 = spark.createDataFrame(
        [
            ("lakehousedb", "mc_member_info", "insert", "1",
             {"user_id": "u1", "member_level": "gold"}),
            ("lakehousedb", "mc_member_info", "insert", "2",
             {"user_id": "u2", "member_level": "silver"}),
        ],
        schema,
    )
    out1 = upsert_dims_with_deletes(catalog, batch1, cfg)
    assert out1 == {"DIM_MEMBER_INFO": {"merged": 2, "deleted": 0}}
    t = catalog.table("DIM_MEMBER_INFO")
    pre = t.current_snapshot()

    batch2 = spark.createDataFrame(
        [
            ("lakehousedb", "mc_member_info", "update", "3",
             {"user_id": "u1", "member_level": "platinum"}),
            ("lakehousedb", "mc_member_info", "delete", "4",
             {"user_id": "u2", "member_level": "silver"}),
        ],
        schema,
    )
    out2 = upsert_dims_with_deletes(catalog, batch2, cfg)
    assert out2 == {"DIM_MEMBER_INFO": {"merged": 1, "deleted": 1}}
    rows = {(r.user_id, r.member_level) for r in t.read().collect()}
    assert rows == {("u1", "platinum")}

    # compaction folds the equality delete; state unchanged
    t.compact()
    assert t.current_snapshot()["eq_delete_dirs"] == []
    assert {(r.user_id, r.member_level) for r in t.read().collect()} == rows
    # time travel to the pre-delete snapshot still sees u2
    old = {
        (r.user_id, r.member_level)
        for r in t.read(snapshot_id=pre["snapshot_id"]).collect()
    }
    assert old == {("u1", "gold"), ("u2", "silver")}


def test_cdc_delete_then_reinsert_ordered_by_seq(spark, tmp_path):
    """ADVICE r6 #4: with ``seq_col``, per-key CDC event order is
    honored — a delete followed by a re-insert of the same key within
    one batch ends INSERTED (the source stream's final state), and an
    insert followed by a delete ends deleted."""
    from icebergproject_spark.plans.dim import upsert_dims_with_deletes

    catalog = LakehouseCatalog(spark, warehouse=str(tmp_path), db="testdb")
    cfg = [{
        "tbl_name": "mc_member_info", "tbl_db": "lakehousedb",
        "pk_col": "user_id", "cols": "user_id,member_level",
        "sink_tbl_name": "DIM_MEMBER_SEQ",
    }]
    schema = (
        "database string, table string, type string, ts string, "
        "seq long, data map<string,string>"
    )
    batch1 = spark.createDataFrame(
        [
            ("lakehousedb", "mc_member_info", "insert", "1", 1,
             {"user_id": "u1", "member_level": "gold"}),
            ("lakehousedb", "mc_member_info", "insert", "1", 2,
             {"user_id": "u2", "member_level": "silver"}),
        ],
        schema,
    )
    upsert_dims_with_deletes(catalog, batch1, cfg, seq_col="seq")
    t = catalog.table("DIM_MEMBER_SEQ")

    # u1: delete (seq 3) then RE-INSERT (seq 4) → final state inserted;
    # u2: update (seq 5) then delete (seq 6) → final state deleted
    batch2 = spark.createDataFrame(
        [
            ("lakehousedb", "mc_member_info", "delete", "2", 3,
             {"user_id": "u1", "member_level": "gold"}),
            ("lakehousedb", "mc_member_info", "insert", "2", 4,
             {"user_id": "u1", "member_level": "platinum"}),
            ("lakehousedb", "mc_member_info", "update", "2", 5,
             {"user_id": "u2", "member_level": "bronze"}),
            ("lakehousedb", "mc_member_info", "delete", "2", 6,
             {"user_id": "u2", "member_level": "bronze"}),
        ],
        schema,
    )
    out = upsert_dims_with_deletes(catalog, batch2, cfg, seq_col="seq")
    assert out == {"DIM_MEMBER_SEQ": {"merged": 1, "deleted": 1}}
    rows = {(r.user_id, r.member_level) for r in t.read().collect()}
    assert rows == {("u1", "platinum")}

    # equal-seq tie breaks toward the delete (replayed tombstone)
    batch3 = spark.createDataFrame(
        [
            ("lakehousedb", "mc_member_info", "insert", "3", 7,
             {"user_id": "u1", "member_level": "gold"}),
            ("lakehousedb", "mc_member_info", "delete", "3", 7,
             {"user_id": "u1", "member_level": "gold"}),
        ],
        schema,
    )
    out3 = upsert_dims_with_deletes(catalog, batch3, cfg, seq_col="seq")
    assert out3 == {"DIM_MEMBER_SEQ": {"merged": 0, "deleted": 1}}
    assert t.read().count() == 0
