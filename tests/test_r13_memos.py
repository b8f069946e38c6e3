"""r13 memo-identity and fast-path-parity regressions (r12 verdict order 6
+ ADVICE): the per-session UDF-registration memos must survive CPython id
reuse after a session is garbage-collected, the pg temp-view memo must heal
an out-of-band dropTempView, and the vectorized envelope fast paths must
match envelope(parse_wkb(...)) bit-for-bit when coordinates are NaN."""

import math
import struct

import pytest


class _NotASession:
    """Stand-in occupying a memo slot, simulating a dead session whose id
    was reused by a NEW session object."""


def _poison(memo, key, obj):
    memo[key] = obj


def test_registration_memos_reject_id_reuse(spark):
    """A memo entry left by a (simulated) garbage-collected session must
    not suppress registration for a different object with the same id."""
    from xcube_geodb_spark.functions import jsonsql, textsql
    from xcube_geodb_spark.geometry import sqlfuncs

    s2 = spark.newSession()
    imposter = _NotASession()
    for mod in (textsql, jsonsql, sqlfuncs):
        # WeakValueDictionary accepts our stand-in (it is weakref-able)
        _poison(mod._REGISTERED, id(s2), imposter)
    textsql.register_text_sql_functions(s2)
    jsonsql.register_json_sql_functions(s2)
    sqlfuncs.register_spatial_sql_functions(s2)
    row = s2.sql(
        "SELECT geodb_stem('running') AS s, "
        "jsonb_set('{\"a\": 1}', '{b}', '2') AS j, "
        "st_astext(st_makeenvelope(0.0, 0.0, 1.0, 1.0)) AS g"
    ).collect()[0]
    assert row["s"] == "run"
    assert '"b": 2' in row["j"]
    assert row["g"].startswith("POLYGON")
    # the memo now holds the live session itself (identity, not just id)
    assert textsql._REGISTERED.get(id(s2)) is s2
    assert jsonsql._REGISTERED.get(id(s2)) is s2
    assert sqlfuncs._REGISTERED.get(id(s2)) is s2


def test_view_memo_heals_external_drop(spark, tmp_path):
    from xcube_geodb_spark.client import GeoDBSparkClient
    from xcube_geodb_spark.operators.scan import _view_name, get_collection_pg

    client = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh"), user="m13")
    client.create_collection("nat", {"k": "int"})
    client.insert_into_collection(
        "nat", spark.createDataFrame([(1,), (2,)], "k int")
    )
    assert (
        get_collection_pg(
            client.catalog, "nat", database="m13", select="sum(k) AS s"
        ).collect()[0]["s"]
        == 3
    )
    # out-of-band drop: the memo still holds the handle, but the view is
    # gone — the next pg scan must re-bind instead of failing
    spark.catalog.dropTempView(_view_name("m13", "nat"))
    assert (
        get_collection_pg(
            client.catalog, "nat", database="m13", select="sum(k) AS s"
        ).collect()[0]["s"]
        == 3
    )


def _poly1(pts) -> bytes:
    out = b"\x01\x03\x00\x00\x00" + struct.pack("<II", 1, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def _point(x, y) -> bytes:
    return b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y)


def test_envelope_nan_fast_path_matches_scalar(spark):
    """NaN coordinates: numpy min/max propagate NaN, the scalar kernel's
    Python min/max against +/-inf yield inf/-inf. The fast paths must
    route such rows to the scalar fallback so identical WKB always gets
    identical __xmin/__xmax regardless of which path handled it."""
    from pyspark.sql import functions as F

    from xcube_geodb_spark.geometry.geom import envelope, parse_wkb
    from xcube_geodb_spark.geometry.udfs import envelope_udf

    nan = float("nan")
    wkbs = [
        _poly1([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]),  # clean square
        _poly1([(nan, 0), (1, 0), (1, 1), (0, 1), (nan, 0)]),  # NaN x
        _poly1([(0, nan), (1, 0), (1, 1), (0, 1), (0, nan)]),  # NaN y
        _point(2.0, 3.0),  # clean point
        _point(nan, 3.0),  # NaN point
        None,
    ]
    df = spark.createDataFrame([(b,) for b in wkbs], "geometry binary")
    rows = (
        df.select(envelope_udf(F.col("geometry")).alias("e"))
        .collect()
    )
    for wkb, row in zip(wkbs, rows):
        got = (row["e"]["xmin"], row["e"]["ymin"], row["e"]["xmax"], row["e"]["ymax"])
        if wkb is None:
            assert got == (None, None, None, None)
            continue
        exp = envelope(parse_wkb(wkb))
        for g, x in zip(got, exp):
            if g is None:
                assert math.isnan(x)
            else:
                assert g == x, (wkb[:9], got, exp)
    # the NaN rows must have produced the scalar path's inf folds, not NULLs
    assert rows[1]["e"]["xmin"] == math.inf and rows[1]["e"]["xmax"] == -math.inf
    assert rows[2]["e"]["ymin"] == math.inf and rows[2]["e"]["ymax"] == -math.inf
    assert rows[4]["e"]["xmin"] == math.inf and rows[4]["e"]["xmax"] == -math.inf
