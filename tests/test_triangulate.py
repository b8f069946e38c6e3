"""Delaunay triangulation kernel (geometry/triangulate.py).

The oracle-grade invariants: for ANY valid triangulation of n distinct
sites whose hull has h boundary sites, T = 2n - 2 - h and the triangles
tile the hull (area sum = hull area, no overlaps) — robust to
cocircular tie-breaking, which is exactly what the degenerate fixtures
here exercise.
"""

import math

import numpy as np
import pytest

from xcube_geodb_spark.geometry.geom import area, parse_wkt, to_wkt
from xcube_geodb_spark.geometry.triangulate import delaunay_geometry


def _multipoint(pts):
    return parse_wkt(
        "MULTIPOINT (" + ", ".join(f"({x:.17g} {y:.17g})" for x, y in pts) + ")"
    )


class TestDelaunay:
    def test_square_corners(self):
        out = delaunay_geometry(
            parse_wkt("MULTIPOINT ((0 0), (1 0), (1 1), (0 1))")
        )
        assert out.kind == "MultiPolygon" and len(out.parts) == 2
        assert abs(area(out) - 1.0) < 1e-12

    def test_euler_counts_generic(self):
        rng = np.random.default_rng(11)
        pts = [tuple(p) for p in rng.random((50, 2)) * 8 + 1]
        pts += [(0, 0), (10, 0), (10, 10), (0, 10)]
        out = delaunay_geometry(_multipoint(pts))
        n, h = 54, 4
        assert len(out.parts) == 2 * n - 2 - h
        assert abs(area(out) - 100.0) < 1e-6
        assert min(area(m) for m in out.parts) > 0
        # edges form: Euler E = T + n - 1
        e = delaunay_geometry(_multipoint(pts), flags=1)
        assert len(e.parts) == len(out.parts) + n - 1

    def test_degenerate_grid_cocircular(self):
        # a 5x5 integer lattice is maximally cocircular; the count
        # formula holds for any valid triangulation regardless of ties
        pts = [(x, y) for x in range(5) for y in range(5)]
        out = delaunay_geometry(_multipoint(pts))
        n, h = 25, 16
        assert len(out.parts) == 2 * n - 2 - h
        assert abs(area(out) - 16.0) < 1e-9

    def test_cocircular_ring(self):
        ring = [
            (math.cos(2 * math.pi * k / 12), math.sin(2 * math.pi * k / 12))
            for k in range(12)
        ]
        out = delaunay_geometry(_multipoint(ring))
        assert len(out.parts) == 2 * 12 - 2 - 12
        assert abs(area(out) - 12 * 0.5 * math.sin(2 * math.pi / 12)) < 1e-9

    def test_degenerate_inputs(self):
        assert delaunay_geometry(None) is None
        assert delaunay_geometry(parse_wkt("POINT (1 1)")) is None
        assert (
            delaunay_geometry(parse_wkt("MULTIPOINT ((0 0), (1 1), (2 2))"))
            is None
        )

    def test_duplicate_sites_dedup(self):
        out = delaunay_geometry(
            parse_wkt("MULTIPOINT ((0 0), (0 0), (1 0), (1 1), (1 1))")
        )
        assert len(out.parts) == 1
        assert abs(area(out) - 0.5) < 1e-12

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        pts = [tuple(p) for p in rng.random((30, 2)) * 100]
        g = _multipoint(pts)
        assert to_wkt(delaunay_geometry(g)) == to_wkt(delaunay_geometry(g))

    def test_polygon_input_uses_vertices(self):
        # PostGIS triangulates the input's vertices whatever the kind
        out = delaunay_geometry(
            parse_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        )
        assert len(out.parts) == 2
        assert abs(area(out) - 4.0) < 1e-12


class TestVoronoi:
    def test_cells_tile_envelope(self):
        from xcube_geodb_spark.geometry.triangulate import voronoi_polygons

        g = parse_wkt("MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2))")
        out = voronoi_polygons(g)
        assert out.kind == "MultiPolygon" and len(out.parts) == 5
        assert abs(area(out) - 16.0) < 1e-9
        # the center site's cell is the bisector square
        areas = sorted(round(area(m), 9) for m in out.parts)
        assert areas == [2.0, 2.0, 2.0, 2.0, 8.0]

    def test_generic_tiling_and_count(self):
        from xcube_geodb_spark.geometry.triangulate import voronoi_polygons

        rng = np.random.default_rng(13)
        pts = [tuple(p) for p in rng.random((40, 2)) * 8 + 1]
        pts += [(0, 0), (10, 0), (10, 10), (0, 10)]
        out = voronoi_polygons(_multipoint(pts))
        assert len(out.parts) == 44
        assert abs(area(out) - 100.0) < 1e-6

    def test_degenerate(self):
        from xcube_geodb_spark.geometry.triangulate import voronoi_polygons

        assert voronoi_polygons(None) is None
        assert voronoi_polygons(parse_wkt("POINT (1 1)")) is None
        # zero-area envelope (collinear sites) -> None, documented
        assert voronoi_polygons(parse_wkt("MULTIPOINT ((0 0), (0 5))")) is None

    def test_deterministic(self):
        from xcube_geodb_spark.geometry.triangulate import voronoi_polygons

        rng = np.random.default_rng(17)
        pts = [tuple(p) for p in rng.random((25, 2)) * 50]
        g = _multipoint(pts)
        assert to_wkt(voronoi_polygons(g)) == to_wkt(voronoi_polygons(g))


class TestConcaveHull:
    def test_pct_one_is_convex_hull(self):
        from xcube_geodb_spark.geometry.geom import convex_hull
        from xcube_geodb_spark.geometry.triangulate import concave_hull

        rng = np.random.default_rng(3)
        g = _multipoint([tuple(p) for p in rng.random((40, 2)) * 10])
        assert abs(area(concave_hull(g, 1.0)) - area(convex_hull(g))) < 1e-9

    def test_c_shape_carves(self):
        from xcube_geodb_spark.geometry.geom import convex_hull
        from xcube_geodb_spark.geometry.triangulate import concave_hull

        cpts = [
            (5 + 4 * math.cos(a), 5 + 4 * math.sin(a))
            for a in np.linspace(0.6, 2 * math.pi - 0.6, 60)
        ] + [
            (5 + 3 * math.cos(a), 5 + 3 * math.sin(a))
            for a in np.linspace(0.6, 2 * math.pi - 0.6, 50)
        ]
        g = _multipoint(cpts)
        a_convex = area(convex_hull(g))
        a_concave = area(concave_hull(g, 0.1))
        # the chi-shape recovers the C: most of the bite is carved away
        assert a_concave < 0.5 * a_convex
        # monotone in pct
        assert area(concave_hull(g, 0.5)) <= a_convex + 1e-9
        assert a_concave <= area(concave_hull(g, 0.5)) + 1e-9

    def test_hull_contains_all_points(self):
        from xcube_geodb_spark.geometry.geom import _point_in_rings
        from xcube_geodb_spark.geometry.overlay import _polygons_of
        from xcube_geodb_spark.geometry.triangulate import concave_hull

        rng = np.random.default_rng(9)
        pts = [tuple(p) for p in rng.random((30, 2)) * 10]
        hull = concave_hull(_multipoint(pts), 0.3)
        polys = _polygons_of(hull)
        for x, y in pts:
            assert any(
                _point_in_rings(x, y, rings) for rings in polys
            ) or any(
                min(
                    math.hypot(x - rx, y - ry)
                    for ring in rings
                    for rx, ry in ring
                ) < 1e-9
                for rings in polys
            )

    def test_degenerate_and_validation(self):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.geometry.triangulate import concave_hull

        assert concave_hull(None, 0.5) is None
        assert concave_hull(parse_wkt("POINT (0 0)"), 0.5) is None
        with pytest.raises(GeoDBError, match="param_pctconvex"):
            concave_hull(parse_wkt("MULTIPOINT ((0 0), (1 0), (0 1))"), 2.0)


class TestTriangulatePolygon:
    def test_counts_and_tiling(self):
        from xcube_geodb_spark.geometry.triangulate import (
            triangulate_polygon,
        )

        sq = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        out = triangulate_polygon(sq)
        assert len(out.parts) == 2 and abs(area(out) - 16) < 1e-9
        # concave L: n - 2 triangles, exact tiling
        L = parse_wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
        out = triangulate_polygon(L)
        assert len(out.parts) == 4 and abs(area(out) - 12) < 1e-9
        # donut: bridge makes it n + 2*holes - 2
        ph = parse_wkt(
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), "
            "(2 2, 4 2, 4 4, 2 4, 2 2))"
        )
        out = triangulate_polygon(ph)
        assert len(out.parts) == 8 and abs(area(out) - 32) < 1e-9
        # every triangle has positive area (no slivers emitted)
        assert min(area(m) for m in out.parts) > 0

    def test_reflex_and_validation(self):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.geometry.triangulate import (
            triangulate_polygon,
        )
        import pytest as _pytest

        # deep notch: the reflex vertex must never be clipped across
        c = parse_wkt("POLYGON ((0 0, 8 0, 8 6, 4 3, 0 6, 0 0))")
        out = triangulate_polygon(c)
        assert len(out.parts) == 3 and abs(area(out) - 36) < 1e-9
        assert triangulate_polygon(None) is None
        with _pytest.raises(GeoDBError, match="polygonal"):
            triangulate_polygon(parse_wkt("LINESTRING (0 0, 1 1)"))

    def test_deterministic(self):
        from xcube_geodb_spark.geometry.triangulate import (
            triangulate_polygon,
        )

        rng = np.random.default_rng(2)
        # a star polygon (always simple) with 12 vertices
        angles = np.sort(rng.random(12)) * 2 * math.pi
        radii = rng.random(12) * 3 + 1
        pts = [(5 + r * math.cos(a), 5 + r * math.sin(a))
               for r, a in zip(radii, angles)]
        ring = ", ".join(f"{x:.17g} {y:.17g}" for x, y in pts)
        g = parse_wkt(f"POLYGON (({ring}, {pts[0][0]:.17g} {pts[0][1]:.17g}))")
        a1 = triangulate_polygon(g)
        a2 = triangulate_polygon(g)
        assert to_wkt(a1) == to_wkt(a2)
        assert len(a1.parts) == 10  # n - 2
        assert abs(area(a1) - area(g)) < 1e-9


class TestInscribedCircles:
    @pytest.mark.slow
    def test_mic_square_and_strip(self):
        from xcube_geodb_spark.geometry.triangulate import (
            maximum_inscribed_circle,
        )

        x, y, r = maximum_inscribed_circle(
            parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        )
        assert abs(x - 2) < 1e-4 and abs(y - 2) < 1e-4 and abs(r - 2) < 1e-4
        # wide strip: radius = half the height
        x, y, r = maximum_inscribed_circle(
            parse_wkt("POLYGON ((0 0, 10 0, 10 2, 0 2, 0 0))")
        )
        assert abs(y - 1) < 1e-4 and abs(r - 1) < 1e-4

    def test_mic_donut_corner_pocket(self):
        from xcube_geodb_spark.geometry.triangulate import (
            maximum_inscribed_circle,
        )

        # outer 8x8, hole [3,5]^2: the corner pocket beats the ring
        # width — t (1 + sqrt(2)) = 3 sqrt(2) => r = 1.757359...
        ph = parse_wkt(
            "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
            "(3 3, 5 3, 5 5, 3 5, 3 3))"
        )
        _, _, r = maximum_inscribed_circle(ph)
        assert abs(r - 3 * math.sqrt(2) / (1 + math.sqrt(2))) < 1e-4

    def test_lec_corner_obstacles(self):
        from xcube_geodb_spark.geometry.triangulate import (
            largest_empty_circle,
        )

        obs = parse_wkt("MULTIPOINT ((0 0), (4 0), (4 4), (0 4))")
        x, y, r = largest_empty_circle(obs)
        assert abs(x - 2) < 1e-4 and abs(y - 2) < 1e-4
        assert abs(r - 2 * math.sqrt(2)) < 1e-4

    def test_validation(self):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.geometry.triangulate import (
            maximum_inscribed_circle,
        )
        import pytest as _pytest

        assert maximum_inscribed_circle(None) is None
        with _pytest.raises(GeoDBError, match="polygonal"):
            maximum_inscribed_circle(parse_wkt("POINT (0 0)"))
