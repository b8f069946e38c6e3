"""CRS transform self-consistency, filter-grammar edges, and catalog
concurrency."""

import pandas as pd
import pytest

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.geometry.crs import (
    check_crs,
    transform_bbox_crs,
    transform_point,
)


class TestCrs:
    def test_check_crs_forms(self):
        assert check_crs(4326) == 4326
        assert check_crs("EPSG:3857") == 3857
        assert check_crs("3794") == 3794
        with pytest.raises(GeoDBError):
            check_crs("not-a-crs")

    @pytest.mark.parametrize("code", [3857, 32633, 32733, 25832, 3794])
    def test_roundtrip_identity(self, code):
        # forward then inverse must reproduce the input to sub-mm accuracy
        lon, lat = 14.5, 46.05  # inside all the tested zones
        x, y = transform_point(lon, lat, 4326, code)
        lon2, lat2 = transform_point(x, y, code, 4326)
        assert abs(lon - lon2) < 1e-9
        assert abs(lat - lat2) < 1e-9

    def test_webmercator_known_values(self):
        # equator/meridian fixed points of the spherical mercator formulas
        x, y = transform_point(0.0, 0.0, 4326, 3857)
        assert abs(x) < 1e-6 and abs(y) < 1e-6
        x, y = transform_point(180.0, 0.0, 4326, 3857)
        assert abs(x - 20037508.342789244) < 1e-3

    def test_utm_central_meridian(self):
        # on the central meridian easting equals the 500 km false easting
        x, _y = transform_point(15.0, 10.0, 4326, 32633)
        assert abs(x - 500000.0) < 1e-3

    def test_bbox_lat_lon_order(self):
        out = transform_bbox_crs((10.0, 20.0, 11.0, 21.0), 4326, 4326, "lat_lon")
        assert out == (10.0, 20.0, 11.0, 21.0)  # swapped in, swapped back out

    def test_bbox_densification_keeps_extent(self):
        # a wide bbox through a curved projection must not shrink
        out = transform_bbox_crs((-20.0, 30.0, 40.0, 60.0), 4326, 3857)
        back = transform_bbox_crs(out, 3857, 4326)
        assert back[0] <= -20.0 + 1e-6 and back[2] >= 40.0 - 1e-6

    def test_unsupported_crs_raises(self):
        with pytest.raises(GeoDBError):
            transform_point(0, 0, 4326, 2154)


class TestGrammarEdges:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [(1, "Alpha", 1.5), (2, "beta", 2.5), (3, "gamma.delta", None)],
            "id long, name string, score double",
        )

    def test_match_imatch(self, df):
        from xcube_geodb_spark.filters import apply_postgrest_query

        assert apply_postgrest_query(df, "name=match.^Al").count() == 1
        assert apply_postgrest_query(df, "name=imatch.^al").count() == 1

    def test_value_containing_dots(self, df):
        from xcube_geodb_spark.filters import apply_postgrest_query

        assert apply_postgrest_query(df, "name=eq.gamma.delta").count() == 1
        assert apply_postgrest_query(df, "score=eq.2.5").count() == 1

    def test_nested_not_group(self, df):
        from xcube_geodb_spark.filters import apply_postgrest_query

        out = apply_postgrest_query(
            df, "and=(not.or(id.eq.1,id.eq.2),score.is.null)"
        )
        assert [r.id for r in out.collect()] == [3]


class TestConcurrency:
    def test_optimistic_version_check(self, spark, tmp_path):
        from xcube_geodb_spark.client import GeoDBSparkClient
        from xcube_geodb_spark.operators import dml

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh"), user="cc")
        c.create_collection("t", {"v": "int"})
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (0 0)"], "v": [1]})
        )
        m = c.catalog.meta("t", "cc")
        # a competing writer bumps the version underneath us
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (1 1)"], "v": [2]})
        )
        with pytest.raises(GeoDBError, match="Concurrent modification"):
            c.catalog.commit_version(
                "t", "cc", None, keep_files=[], expected_version=m.version
            )

    def test_stac_extent_in_4326(self, spark, tmp_path):
        from xcube_geodb_spark.client import GeoDBSparkClient

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh2"), user="cc")
        c.create_collection("t", {"v": "int"}, crs=3857)
        c.insert_into_collection(
            "t",
            pd.DataFrame(
                {"geometry": ["POINT (1113194.9 1118889.97)"], "v": [1]}
            ),
        )
        md = c.get_metadata("t")
        (bbox,) = md["spatial_extent"]
        # web-mercator meters transformed back to ~ (10 deg, 10 deg)
        assert abs(bbox[1] - 10.0) < 0.01 and abs(bbox[0] - 10.0) < 0.01


class TestRectFastPathDegenerate:
    def test_degenerate_ring_agrees_with_kernel(self, spark):
        # a closed 5-point out-and-back ring is 93 bytes like a rectangle but
        # has zero area; the vectorized fast path must reject it and fall
        # back to the exact kernel (its phantom envelope would say
        # 'intersects' for boxes the real geometry never touches)
        from xcube_geodb_spark.geometry.geom import parse_wkb, parse_wkt, to_wkb
        from xcube_geodb_spark.geometry.predicates import bbox_predicate
        from xcube_geodb_spark.geometry.udfs import bbox_predicate_column

        degenerate = "POLYGON ((0 0, 2 0, 2 2, 2 0, 0 0))"
        proper = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
        wkbs = [to_wkb(parse_wkt(w), srid=0) for w in (degenerate, proper)]
        assert all(len(b) == 93 for b in wkbs)
        df = spark.createDataFrame([(i, b) for i, b in enumerate(wkbs)], "i long, geometry binary")
        box = (0.5, 1.2, 1.5, 1.8)  # inside the phantom envelope, off the lines
        for mode in ("intersects", "contains", "within", "disjoint", "touches"):
            got = {
                r.i: r.p
                for r in df.select(
                    "i", bbox_predicate_column(mode, box).alias("p")
                ).collect()
            }
            want = {
                i: bbox_predicate(mode, parse_wkb(b), box)
                for i, b in enumerate(wkbs)
            }
            assert got == want, f"mode {mode}: {got} != {want}"


class TestStTransform:
    def test_polygon_roundtrip_4326_3857(self, spark):
        from xcube_geodb_spark.geometry.sqlfuncs import (
            register_spatial_sql_functions,
        )

        register_spatial_sql_functions(spark)
        row = spark.sql(
            """
            SELECT st_astext(
                st_transform(
                    st_transform(
                        st_geomfromtext('POLYGON ((10 45, 11 45, 11 46, 10 46, 10 45))'),
                        4326, 3857),
                    3857, 4326)
            ) AS wkt,
            st_x(st_centroid(st_transform(
                st_geomfromtext('POINT (10 45)'), 4326, 3857))) AS mx
            """
        ).collect()[0]
        # round-trip error far below 1e-6 deg
        import re

        nums = [float(v) for v in re.findall(r"-?\d+\.?\d*", row.wkt)]
        expect = [10, 45, 11, 45, 11, 46, 10, 46, 10, 45]
        assert all(abs(a - b) < 1e-6 for a, b in zip(nums, expect))
        # web-mercator x of lon 10 = 10/180 * 20037508.34
        assert abs(row.mx - 10 / 180 * 20037508.342789244) < 1.0
