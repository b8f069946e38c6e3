"""Grid-partitioned distributed spatial join (functions/spatial_join).

Reference surface: PostGIS evaluates ``ST_Intersects(a.geom, b.geom)``
joins inside arbitrary SQL via the passthrough
(/root/reference/xcube_geodb/sql/geodb.sql:1123-1177); this engine's
equivalent must also hold at cluster scale, so these tests pin (a) exact
parity with a brute-force cross join, (b) exactly-once pair emission under
multi-cell replication, and (c) a shuffle-join physical plan (never a
cartesian product).
"""

import math

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.spatial_join import (
    derive_cell_size,
    spatial_join,
)
from xcube_geodb_spark.geometry.udfs import with_envelope_columns

SF = "/root/testdata/sf0.001"


def _squares(spark):
    from xcube_geodb_spark.suite.geo import _squares as f

    return f(spark, SF).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )


def _points(spark):
    from xcube_geodb_spark.suite.geo import _supplier_points as f

    return f(spark, SF).select(
        "s_suppkey", "px", "py", "geometry",
        "__xmin", "__ymin", "__xmax", "__ymax",
    )


def _cust_points(spark):
    from xcube_geodb_spark.suite.geo import _points as f

    return f(spark, SF).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )


def _points_raw(spark):
    from xcube_geodb_spark.suite.geo import _points as f

    return f(spark, SF).select("c_custkey", "x", "y")


def _brute_pairs(spark, predicate, d=0.0):
    sq = _squares(spark).select("c_custkey", "__xmin", "__ymin", "__xmax", "__ymax")
    pt = _points(spark).select("s_suppkey", "px", "py")
    out = set()
    for s in sq.collect():
        for p in pt.collect():
            if predicate == "intersects":
                hit = (s["__xmin"] <= p.px <= s["__xmax"]
                       and s["__ymin"] <= p.py <= s["__ymax"])
            else:
                dx = max(s["__xmin"] - p.px, 0.0, p.px - s["__xmax"])
                dy = max(s["__ymin"] - p.py, 0.0, p.py - s["__ymax"])
                hit = math.hypot(dx, dy) <= d
            if hit:
                out.add((s.c_custkey, p.s_suppkey))
    return out


class TestSpatialJoin:
    def test_intersects_matches_brute_force(self, spark):
        got = {
            (r.c_custkey, r.s_suppkey)
            for r in spatial_join(_squares(spark), _points(spark), "intersects")
            .select("c_custkey", "s_suppkey")
            .collect()
        }
        assert got == _brute_pairs(spark, "intersects")

    def test_dwithin_matches_brute_force(self, spark):
        got = {
            (r.c_custkey, r.s_suppkey)
            for r in spatial_join(
                _squares(spark), _points(spark), "dwithin", distance=3.0
            )
            .select("c_custkey", "s_suppkey")
            .collect()
        }
        assert got == _brute_pairs(spark, "dwithin", 3.0)

    def test_exactly_once_under_multicell_replication(self, spark):
        # cell far smaller than the squares: every envelope spans many
        # cells, so any dedup bug would emit duplicate pairs
        rows = (
            spatial_join(
                _squares(spark), _points(spark), "intersects", cell_size=1.5
            )
            .groupBy("c_custkey", "s_suppkey")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert rows == 0
        got = {
            (r.c_custkey, r.s_suppkey)
            for r in spatial_join(
                _squares(spark), _points(spark), "intersects", cell_size=1.5
            )
            .select("c_custkey", "s_suppkey")
            .collect()
        }
        assert got == _brute_pairs(spark, "intersects")

    @pytest.mark.slow
    def test_cell_size_invariance(self, spark):
        expected = _brute_pairs(spark, "intersects")
        for cell in (2.0, 25.0, 400.0):
            got = {
                (r.c_custkey, r.s_suppkey)
                for r in spatial_join(
                    _squares(spark), _points(spark), "intersects", cell_size=cell
                )
                .select("c_custkey", "s_suppkey")
                .collect()
            }
            assert got == expected, f"cell_size={cell}"

    def test_polygon_polygon_refinement(self, spark):
        # squares vs squares: diagonal neighbors' envelopes overlap only
        # when the geometries do (axis-aligned), but shifted copies force
        # the kernel refinement path (non-point WKB on both sides)
        sq = _squares(spark)
        other = sq.select(
            F.col("c_custkey").alias("o_key"),
            "geometry", "__xmin", "__ymin", "__xmax", "__ymax",
        )
        got = (
            spatial_join(sq, other, "intersects", cell_size=30.0)
            .select("c_custkey", "o_key")
            .collect()
        )
        pairs = {(r.c_custkey, r.o_key) for r in got}
        # self-pairs always intersect
        keys = [r.c_custkey for r in sq.select("c_custkey").collect()]
        assert all((k, k) in pairs for k in keys)
        # symmetric
        assert all((b, a) in pairs for a, b in pairs)
        # envelope-overlap == intersects for axis-aligned squares
        env = {
            r["c_custkey"]: (r["__xmin"], r["__ymin"], r["__xmax"], r["__ymax"])
            for r in sq.collect()
        }
        brute = {
            (a, b)
            for a in keys
            for b in keys
            if env[a][0] <= env[b][2]
            and env[b][0] <= env[a][2]
            and env[a][1] <= env[b][3]
            and env[b][1] <= env[a][3]
        }
        assert pairs == brute

    def test_plan_is_shuffle_join_not_cartesian(self, spark):
        plan = (
            spatial_join(_squares(spark), _points(spark), "intersects", cell_size=10.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
            "BroadcastHashJoin" in plan
        )

    def test_derive_cell_size_positive_and_bounded(self, spark):
        sq, pt = _squares(spark), _points(spark)
        cell = derive_cell_size(sq, pt)
        assert cell > 0.0
        # squares are 10-24 units wide; 4x mean extent stays in that decade
        assert 10.0 < cell < 200.0

    def test_envelope_autocompute(self, spark):
        # frames without precomputed envelope columns work (with_envelope
        # path), returning identical pairs
        sq = _squares(spark).select("c_custkey", "geometry")
        pt = _points(spark).select("s_suppkey", "geometry")
        got = {
            (r.c_custkey, r.s_suppkey)
            for r in spatial_join(sq, pt, "intersects").select(
                "c_custkey", "s_suppkey"
            ).collect()
        }
        assert got == _brute_pairs(spark, "intersects")

    def test_bad_args(self, spark):
        sq, pt = _squares(spark), _points(spark)
        with pytest.raises(ValueError):
            spatial_join(sq, pt, "nearby")  # not a predicate
        with pytest.raises(ValueError):
            spatial_join(sq, pt, "dwithin", distance=-1.0)
        with pytest.raises(ValueError):
            spatial_join(sq, pt, "intersects", cell_size=0.0)


class TestClientSpatialJoin:
    @pytest.mark.slow
    def test_collection_join_uses_persisted_envelopes(self, spark, tmp_path):
        from xcube_geodb_spark.client import GeoDBSparkClient

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path), user="sjtest")
        c.create_collection("sq", {"c_custkey": "int"})
        c.create_collection("pt", {"s_suppkey": "int"})
        c.insert_into_collection(
            "sq", _squares(spark).select("geometry", "c_custkey")
        )
        c.insert_into_collection(
            "pt", _points(spark).select("geometry", "s_suppkey")
        )
        out = c.spatial_join_collections("sq", "pt", "intersects")
        assert not [col for col in out.columns if col.startswith("__")]
        got = {(r["c_custkey"], r["s_suppkey"]) for r in out.collect()}
        assert got == _brute_pairs(spark, "intersects")


class TestSpatialKnnJoin:
    def _brute_knn(self, spark, k):
        sq = _points_raw(spark)
        pt = _points(spark).collect()
        out = {}
        for c in sq.collect():
            ds = sorted(
                (
                    (
                        math.hypot(c["x"] - p["px"], c["y"] - p["py"]),
                        p["s_suppkey"],
                    )
                    for p in pt
                )
            )[:k]
            out[c["c_custkey"]] = [s for _, s in ds]
        return out

    @pytest.mark.slow
    def test_matches_brute_force(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_knn_join

        cp = _cust_points(spark)
        sp = _points(spark).drop("px", "py")
        got_rows = spatial_knn_join(cp, sp, k=3, left_id="c_custkey").collect()
        got = {}
        for r in sorted(got_rows, key=lambda r: (r["c_custkey"], r["dist"], r["s_suppkey"])):
            got.setdefault(r["c_custkey"], []).append(r["s_suppkey"])
        assert got == self._brute_knn(spark, 3)

    @pytest.mark.slow
    def test_tiny_initial_radius_forces_expansion_rounds(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_knn_join

        cp = _cust_points(spark)
        sp = _points(spark).drop("px", "py")
        got_rows = spatial_knn_join(
            cp, sp, k=2, left_id="c_custkey", initial_radius=0.5, growth=8.0
        ).collect()
        got = {}
        for r in sorted(got_rows, key=lambda r: (r["c_custkey"], r["dist"], r["s_suppkey"])):
            got.setdefault(r["c_custkey"], []).append(r["s_suppkey"])
        assert got == self._brute_knn(spark, 2)

    def test_right_smaller_than_k_returns_all(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_knn_join

        cp = _cust_points(spark).limit(5)
        sp = _points(spark).drop("px", "py").filter(F.col("s_suppkey") <= 2)
        n_right = sp.count()
        out = spatial_knn_join(cp, sp, k=10, left_id="c_custkey")
        counts = (
            out.groupBy("c_custkey").count().select("count").distinct().collect()
        )
        assert [r["count"] for r in counts] == [n_right]

    def test_bad_k(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_knn_join

        with pytest.raises(ValueError):
            spatial_knn_join(_cust_points(spark), _points(spark), k=0)


class TestSpatialDbscan:
    @staticmethod
    def _pt(x, y):
        import numpy as np

        from xcube_geodb_spark.geometry.geom import Geometry, to_wkb

        return to_wkb(Geometry("Point", np.array([float(x), float(y)])))

    @pytest.fixture(scope="class")
    def labeled(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_dbscan

        rows = (
            # chain A: ends are border (2 neighbors incl. self), middle core
            [(i, self._pt(0.1 * i, 0)) for i in range(5)]
            + [(10 + i, self._pt(50 + 0.1 * i, 50)) for i in range(4)]
            + [(99, self._pt(-90, -80)), (98, self._pt(90, 80))]  # noise
            + [(50, self._pt(0.52, 0))]  # border: near core 4 only
        )
        df = spark.createDataFrame(rows, "pid long, geometry binary")
        out = spatial_dbscan(df, eps=0.15, min_pts=3, id_col="pid")
        return {r["pid"]: (r["cluster_id"], r["role"]) for r in out.collect()}

    def test_core_border_noise_roles(self, labeled):
        assert labeled[2] == (1, "core")
        assert labeled[0] == (1, "border")  # chain end: only 2 in eps-ball
        assert labeled[50] == (1, "border")  # reachable via core 4 only
        assert labeled[99] == (None, "noise")
        assert labeled[98] == (None, "noise")

    def test_clusters_are_separate_and_min_id_labeled(self, labeled):
        a = {p for p, (c, _) in labeled.items() if c == 1}
        b = {p for p, (c, _) in labeled.items() if c == 11}
        assert a == {0, 1, 2, 3, 4, 50}
        assert b == {10, 11, 12, 13}  # min CORE id labels the cluster

    def test_row_per_input_feature(self, labeled):
        assert len(labeled) == 12

    def test_isolated_core_is_singleton_cluster(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_dbscan

        # 3 coincident points: each has 3 neighbors -> all core, one cluster
        df = spark.createDataFrame(
            [(7, self._pt(1, 1)), (8, self._pt(1, 1)), (9, self._pt(1, 1))],
            "pid long, geometry binary",
        )
        out = {
            r["pid"]: (r["cluster_id"], r["role"])
            for r in spatial_dbscan(
                df, eps=0.1, min_pts=3, id_col="pid"
            ).collect()
        }
        assert out == {7: (7, "core"), 8: (7, "core"), 9: (7, "core")}

    def test_validates_params(self, spark):
        from xcube_geodb_spark.functions.spatial_join import spatial_dbscan

        df = spark.createDataFrame(
            [(1, self._pt(0, 0))], "pid long, geometry binary"
        )
        with pytest.raises(ValueError):
            spatial_dbscan(df, eps=0.0, min_pts=3, id_col="pid")
        with pytest.raises(ValueError):
            spatial_dbscan(df, eps=1.0, min_pts=0, id_col="pid")


class TestRelatePredicateJoin:
    """within/contains/touches/overlaps/crosses/equals joins must equal a
    brute-force cross product refined by the authoritative DE-9IM kernel
    (geometry/relate.geom_predicate) on a fixture that mixes strict
    containment, boundary contact, partial overlap, and equality."""

    MODES = ("within", "contains", "touches", "overlaps", "crosses",
             "equals")

    @pytest.fixture(scope="class")
    def frames(self, spark):
        from xcube_geodb_spark.geometry.geom import Geometry, to_wkb
        import numpy as np

        def rect(x0, y0, x1, y1):
            return to_wkb(Geometry("Polygon", [np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                dtype=np.float64)]))

        def point(x, y):
            return to_wkb(Geometry("Point", [float(x), float(y)]))

        # left: points + small rects + a line; right: container rects
        left = []
        k = 0
        for x, y in [(1.0, 1.0), (2.0, 2.0), (4.0, 1.0), (0.0, 0.0),
                     (10.0, 10.0), (3.0, 0.0)]:
            left.append((k, point(x, y))); k += 1
        for r in [rect(0.5, 0.5, 1.5, 1.5), rect(3.5, 0.5, 5.5, 2.5),
                  rect(0.0, 0.0, 4.0, 3.0), rect(4.0, 0.0, 6.0, 3.0),
                  rect(-2.0, -2.0, -1.0, -1.0)]:
            left.append((k, r)); k += 1
        from xcube_geodb_spark.geometry.geom import parse_wkt
        left.append((k, to_wkb(parse_wkt("LINESTRING (-1 1.5, 7 1.5)"))))
        k += 1
        right = [
            (100, rect(0.0, 0.0, 4.0, 3.0)),
            (101, rect(4.0, 0.0, 6.0, 3.0)),
            (102, rect(1.0, 1.0, 2.0, 2.0)),
            (103, rect(20.0, 20.0, 21.0, 21.0)),
        ]
        lf = spark.createDataFrame(left, "lid int, geometry binary")
        rf = spark.createDataFrame(right, "rid int, geometry binary")
        return lf, rf

    def _brute(self, spark, frames, mode):
        from xcube_geodb_spark.geometry.geom import parse_wkb
        from xcube_geodb_spark.geometry.relate import geom_predicate

        lf, rf = frames
        ls = [(r["lid"], parse_wkb(bytes(r["geometry"])))
              for r in lf.collect()]
        rs = [(r["rid"], parse_wkb(bytes(r["geometry"])))
              for r in rf.collect()]
        return {
            (li, ri)
            for li, lg in ls
            for ri, rg in rs
            if geom_predicate(mode, lg, rg)
        }

    @pytest.mark.parametrize("mode", MODES)
    def test_matches_kernel_brute_force(self, spark, frames, mode):
        lf, rf = frames
        got = {
            (r["lid"], r["rid"])
            for r in spatial_join(
                lf, rf, predicate=mode, cell_size=2.0
            ).collect()
        }
        want = self._brute(spark, frames, mode)
        assert got == want, f"{mode}: {got ^ want}"
        if mode == "within":
            assert got, "fixture must produce at least one within pair"

    def test_cell_size_invariance_within(self, spark, frames):
        lf, rf = frames
        a = {(r["lid"], r["rid"]) for r in spatial_join(
            lf, rf, predicate="within", cell_size=0.7).collect()}
        b = {(r["lid"], r["rid"]) for r in spatial_join(
            lf, rf, predicate="within", cell_size=5.0).collect()}
        assert a == b

    def test_include_distance_rejected(self, spark, frames):
        lf, rf = frames
        with pytest.raises(ValueError):
            spatial_join(lf, rf, predicate="within",
                         include_distance="dist")
