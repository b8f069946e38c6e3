"""r12 fixed-cost optimizations: load_df handle memo, temp-view memo, and
per-session UDF-registration memo. These cut driver-side py4j latency on
the client pg path; the tests pin the INVALIDATION semantics so the memos
can never serve a stale snapshot."""

import pytest


@pytest.fixture()
def client(spark, tmp_path):
    from xcube_geodb_spark.client import GeoDBSparkClient

    return GeoDBSparkClient(
        spark, warehouse=str(tmp_path / "wh"), user="memo"
    )


def _mk(client, spark):
    client.create_collection("nat", {"k": "int", "name": "text"})
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "k int, name string"
    )
    client.insert_into_collection("nat", df)


def test_load_df_memo_hit_and_dml_invalidation(client, spark):
    _mk(client, spark)
    cat = client.catalog
    a = cat.load_df("nat", "memo")
    b = cat.load_df("nat", "memo")
    assert a is b, "unchanged manifest must reuse the DataFrame handle"
    client.update_collection("nat", {"name": "GAMMA"}, "k=eq.1")
    c = cat.load_df("nat", "memo")
    assert c is not a, "a DML commit must invalidate the handle memo"
    got = {r["k"]: r["name"] for r in c.collect()}
    assert got == {1: "GAMMA", 2: "beta"}


def test_load_df_memo_keyed_on_flags(client, spark):
    _mk(client, spark)
    cat = client.catalog
    plain = cat.load_df("nat", "memo")
    system = cat.load_df("nat", "memo", include_system=True)
    assert plain is not system
    assert "__xmin" in system.columns and "__xmin" not in plain.columns


def test_pg_scan_sees_dml_and_rebind(client, spark):
    from xcube_geodb_spark.operators.scan import get_collection_pg, run_sql

    _mk(client, spark)
    r1 = get_collection_pg(
        client.catalog, "nat", database="memo", select="sum(k) AS s"
    ).collect()[0]["s"]
    assert r1 == 3
    # identical repeat goes through every memo; same result
    r2 = get_collection_pg(
        client.catalog, "nat", database="memo", select="sum(k) AS s"
    ).collect()[0]["s"]
    assert r2 == 3
    # DML invalidates both the handle memo and the view memo
    client.delete_from_collection("nat", "k=eq.2")
    r3 = get_collection_pg(
        client.catalog, "nat", database="memo", select="sum(k) AS s"
    ).collect()[0]["s"]
    assert r3 == 1
    # run_sql rebinding the same view name must not leave the memo stale
    other = spark.createDataFrame([(99,)], "k int")
    out = run_sql(
        client.catalog, "SELECT max(k) AS m FROM memo_nat", {"memo_nat": other}
    ).collect()[0]["m"]
    assert out == 99
    r4 = get_collection_pg(
        client.catalog, "nat", database="memo", select="max(k) AS m"
    ).collect()[0]["m"]
    assert r4 == 1, "pg scan must rebind its view after a run_sql override"


def test_udf_registration_memo_keeps_functions_usable(client, spark):
    from xcube_geodb_spark.functions.jsonsql import register_json_sql_functions
    from xcube_geodb_spark.functions.textsql import register_text_sql_functions

    # second registration is a no-op per session...
    register_text_sql_functions(spark)
    register_json_sql_functions(spark)
    register_text_sql_functions(spark)
    register_json_sql_functions(spark)
    # ...and the functions still resolve in SQL afterwards
    row = spark.sql(
        "SELECT jsonb_set('{\"a\": 1}', '{b}', '2') AS j, "
        "geodb_stem('running') AS s"
    ).collect()[0]
    assert row["s"] == "run"
    assert '"b": 2' in row["j"]
