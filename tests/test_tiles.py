"""Web-mercator tile indexing / pyramid (functions/tiles)."""

import math

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.tiles import (
    MAX_MERCATOR_LAT,
    tile_counts,
    tile_pyramid,
    with_tile,
)

SF = "/root/testdata/sf0.001"


def _ref_tile(lon, lat, z):
    n = 1 << z
    tx = math.floor((lon + 180.0) / 360.0 * n)
    merc = (
        1.0 - math.log(math.tan(math.radians(lat)) + 1.0 / math.cos(math.radians(lat))) / math.pi
    ) / 2.0
    ty = math.floor(merc * n)
    return min(tx, n - 1), min(max(ty, 0), n - 1)


def _pts(spark):
    from xcube_geodb_spark.suite.geo import _points

    return _points(spark, SF)


class TestWithTile:
    def test_known_fixed_points(self, spark):
        rows = [
            (0.0, 0.0),
            (-179.99, 80.0),
            (179.99, -80.0),
            (13.4, 52.5),  # Berlin-ish
            (-74.0, 40.7),  # NYC-ish
        ]
        df = spark.createDataFrame(rows, ["lon", "lat"])
        for z in (0, 3, 8):
            got = {
                (r["lon"], r["lat"]): (r["tile_x"], r["tile_y"])
                for r in with_tile(df, z, "lon", "lat").collect()
            }
            for lon, lat in rows:
                assert got[(lon, lat)] == _ref_tile(lon, lat, z), (lon, lat, z)

    def test_domain_filter_drops_polar_rows(self, spark):
        df = spark.createDataFrame(
            [(0.0, 89.0), (0.0, -89.0), (0.0, 10.0)], ["lon", "lat"]
        )
        out = with_tile(df, 2, "lon", "lat").collect()
        assert len(out) == 1 and out[0]["lat"] == 10.0
        assert abs(MAX_MERCATOR_LAT - 85.05112878) < 1e-9

    def test_envelope_midpoint_fallback(self, spark):
        via_env = {
            (r["c_custkey"], r["tile_x"], r["tile_y"])
            for r in with_tile(_pts(spark), 5).collect()
        }
        via_cols = {
            (r["c_custkey"], r["tile_x"], r["tile_y"])
            for r in with_tile(_pts(spark), 5, "x", "y").collect()
        }
        assert via_env == via_cols

    def test_bad_args(self, spark):
        df = _pts(spark).drop("__xmin")
        with pytest.raises(ValueError):
            with_tile(df.select("c_custkey", "x", "y"), 5)
        with pytest.raises(ValueError):
            with_tile(_pts(spark), 31)


class TestTilePyramid:
    def test_levels_sum_to_base_total(self, spark):
        pyr = tile_pyramid(_pts(spark), 6, 3, lon_col="x", lat_col="y")
        totals = {
            r["tile_z"]: r["total"]
            for r in pyr.groupBy("tile_z").agg(F.sum("n").alias("total")).collect()
        }
        assert len(totals) == 4
        assert len(set(totals.values())) == 1  # every level counts all rows

    def test_rollup_equals_direct_aggregation(self, spark):
        pyr = tile_pyramid(_pts(spark), 6, 4, lon_col="x", lat_col="y")
        rolled = {
            (r["tile_z"], r["tile_x"], r["tile_y"]): r["n"]
            for r in pyr.filter(F.col("tile_z") == 4).collect()
        }
        direct = {
            (4, r["tile_x"], r["tile_y"]): r["n"]
            for r in tile_counts(_pts(spark), 4, "x", "y").collect()
        }
        assert rolled == direct

    def test_parent_child_containment(self, spark):
        pyr = tile_pyramid(_pts(spark), 5, 4, lon_col="x", lat_col="y").collect()
        parents = {
            (r["tile_x"], r["tile_y"]): r["n"] for r in pyr if r["tile_z"] == 4
        }
        child_sum: dict = {}
        for r in pyr:
            if r["tile_z"] == 5:
                k = (r["tile_x"] // 2, r["tile_y"] // 2)
                child_sum[k] = child_sum.get(k, 0) + r["n"]
        assert child_sum == parents

    def test_no_python_udf_in_plan(self, spark):
        plan = (
            tile_counts(_pts(spark), 6, "x", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "HashAggregate" in plan

    def test_bad_zoom_order(self, spark):
        with pytest.raises(ValueError):
            tile_pyramid(_pts(spark), 3, 5, lon_col="x", lat_col="y")


class TestGeohash:
    def test_canonical_values(self, spark):
        from xcube_geodb_spark.functions.tiles import geohash_column

        rows = [
            (10.40744, 57.64911, "u4pruydqqvj"),  # the classic example
            (-5.6, 42.6, "ezs42"),
            (0.0, 0.0, "s0000"),
            (-180.0, -90.0, "00000"),
        ]
        df = spark.createDataFrame(rows, "lon double, lat double, expect string")
        for r in df.select(
            "expect", geohash_column(F.col("lon"), F.col("lat"), 11).alias("gh")
        ).collect():
            assert r["gh"].startswith(r["expect"]), (r["expect"], r["gh"])

    def test_precision_prefix_nesting(self, spark):
        # a coarser geohash is exactly the prefix of a finer one
        from xcube_geodb_spark.functions.tiles import geohash_column

        df = spark.createDataFrame(
            [(i * 1.7 - 80.0, i * 0.9 - 40.0) for i in range(50)],
            "lon double, lat double",
        )
        out = df.select(
            geohash_column(F.col("lon"), F.col("lat"), 4).alias("g4"),
            geohash_column(F.col("lon"), F.col("lat"), 9).alias("g9"),
        ).collect()
        assert all(r["g9"].startswith(r["g4"]) for r in out)

    def test_envelope_fallback_and_plan(self, spark):
        from xcube_geodb_spark.functions.tiles import with_geohash

        out = with_geohash(_pts(spark).drop("geometry"), precision=6)
        assert "geohash" in out.columns
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan

    def test_bad_precision(self, spark):
        import pytest as _pytest

        from xcube_geodb_spark.functions.tiles import with_geohash

        with _pytest.raises(ValueError):
            with_geohash(_pts(spark), precision=0)
        with _pytest.raises(ValueError):
            with_geohash(_pts(spark), precision=13)
