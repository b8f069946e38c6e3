"""Property-based tests (hypothesis) for the geometry kernel.

Invariants that must hold for ANY geometry/box pair:

- WKB/WKT round-trips are lossless
- disjoint == NOT intersects
- touches => intersects and NOT overlaps
- contains/within/overlaps/equals => intersects
- equals(box, geom) => contains(box, geom)
- predicates agree with a brute-force interval oracle for axis-aligned
  squares (the fully-decidable subcase)
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xcube_geodb_spark.geometry import (
    bbox_predicate,
    envelope,
    parse_wkb,
    parse_wkt,
    to_wkb,
    to_wkt,
)
from xcube_geodb_spark.geometry.geom import Geometry, bbox_polygon

coord = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 3))


@st.composite
def boxes(draw):
    x1, x2 = sorted((draw(coord), draw(coord)))
    y1, y2 = sorted((draw(coord), draw(coord)))
    return (x1, y1, x2 + 1.0, y2 + 1.0)  # non-degenerate


@st.composite
def points(draw):
    return Geometry("Point", np.array([draw(coord), draw(coord)]))


@st.composite
def squares(draw):
    x, y = draw(coord), draw(coord)
    h = draw(st.floats(min_value=0.5, max_value=50).map(lambda v: round(v, 2)))
    return bbox_polygon(x - h, y - h, x + h, y + h)


@st.composite
def linestrings(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    pts = np.array([[draw(coord), draw(coord)] for _ in range(n)])
    return Geometry("LineString", pts)


geoms = st.one_of(points(), squares(), linestrings())


@settings(max_examples=150, deadline=None)
@given(g=geoms)
def test_wkb_roundtrip(g):
    assert to_wkt(parse_wkb(to_wkb(g))) == to_wkt(g)


@settings(max_examples=150, deadline=None)
@given(g=geoms)
def test_wkt_roundtrip(g):
    assert to_wkt(parse_wkt(to_wkt(g))) == to_wkt(g)


@settings(max_examples=200, deadline=None)
@given(g=geoms, box=boxes())
def test_disjoint_is_not_intersects(g, box):
    assert bbox_predicate("disjoint", g, box) != bbox_predicate(
        "intersects", g, box
    )


@settings(max_examples=200, deadline=None)
@given(g=geoms, box=boxes())
def test_touches_implies_intersects_not_overlaps(g, box):
    if bbox_predicate("touches", g, box):
        assert bbox_predicate("intersects", g, box)
        assert not bbox_predicate("overlaps", g, box)


@settings(max_examples=200, deadline=None)
@given(g=geoms, box=boxes())
def test_containment_implies_intersects(g, box):
    for mode in ("contains", "within", "overlaps", "equals"):
        if bbox_predicate(mode, g, box):
            assert bbox_predicate("intersects", g, box), mode


@settings(max_examples=200, deadline=None)
@given(g=squares(), box=boxes())
def test_equals_implies_contains_and_within(g, box):
    if bbox_predicate("equals", g, box):
        assert bbox_predicate("contains", g, box)
        assert bbox_predicate("within", g, box)


@settings(max_examples=200, deadline=None)
@given(g=geoms, box=boxes())
def test_contains_implies_envelope_inside(g, box):
    if bbox_predicate("contains", g, box):
        e = envelope(g)
        eps = 1e-6
        assert e[0] >= box[0] - eps and e[2] <= box[2] + eps
        assert e[1] >= box[1] - eps and e[3] <= box[3] + eps


def _interval_oracle(mode, sq_env, box, eps=1e-9):
    """Brute-force interval arithmetic for axis-aligned square vs box."""
    gx0, gy0, gx1, gy1 = sq_env
    ix = min(box[2], gx1) - max(box[0], gx0)
    iy = min(box[3], gy1) - max(box[1], gy0)
    intersects = ix >= -eps and iy >= -eps
    ii = ix > eps and iy > eps
    sq_in_box = (
        gx0 >= box[0] - eps
        and gx1 <= box[2] + eps
        and gy0 >= box[1] - eps
        and gy1 <= box[3] + eps
    )
    box_in_sq = (
        gx0 <= box[0] + eps
        and gx1 >= box[2] - eps
        and gy0 <= box[1] + eps
        and gy1 >= box[3] - eps
    )
    if mode == "intersects":
        return intersects
    if mode == "disjoint":
        return not intersects
    if mode == "contains":
        return sq_in_box and ii
    if mode == "within":
        return box_in_sq
    if mode == "touches":
        return intersects and not ii
    if mode == "overlaps":
        return ii and not sq_in_box and not box_in_sq
    if mode == "equals":
        return sq_in_box and box_in_sq
    if mode == "crosses":
        return False
    raise AssertionError(mode)


@settings(max_examples=300, deadline=None)
@given(g=squares(), box=boxes())
def test_squares_match_interval_oracle(g, box):
    env = envelope(g)
    # skip near-tangent configurations where kernel eps and oracle eps can
    # legitimately classify differently (coords rounded to 1e-3 -> gaps are
    # either ~0 or >= 5e-4)
    for edge_gap in (
        abs(env[0] - box[2]),
        abs(env[2] - box[0]),
        abs(env[1] - box[3]),
        abs(env[3] - box[1]),
        abs(env[0] - box[0]),
        abs(env[2] - box[2]),
        abs(env[1] - box[1]),
        abs(env[3] - box[3]),
    ):
        if 0 < edge_gap < 1e-4:
            return
    for mode in (
        "intersects",
        "disjoint",
        "contains",
        "within",
        "touches",
        "overlaps",
        "equals",
        "crosses",
    ):
        assert bbox_predicate(mode, g, box) == _interval_oracle(mode, env, box), mode


def test_tiny_overlap_against_large_box_is_overlap_not_touch():
    """Regression (r11 Hypothesis falsifying example): a genuine 1e-6 corner
    overlap between square (-1.08..1.08)^2 and box (1.079, 1.079, 33, 33)
    must classify as overlapping interiors.  The old tolerance scaled with
    the QUERY BOX's area (~1019), swallowing the real overlap and reporting
    `touches`."""
    g = bbox_polygon(-1.08, -1.08, 1.08, 1.08)
    box = (1.079, 1.079, 33.0, 33.0)
    assert not bbox_predicate("touches", g, box)
    assert bbox_predicate("overlaps", g, box)
    assert bbox_predicate("intersects", g, box)
    # genuine touch (shared corner, zero-area contact) still classifies touch
    g2 = bbox_polygon(-1.0, -1.0, 1.079, 1.079)
    assert bbox_predicate("touches", g2, box)
    assert not bbox_predicate("overlaps", g2, box)
    # genuine touch (shared edge, zero-area contact) still classifies touch
    g3 = bbox_polygon(-1.0, 2.0, 1.079, 5.0)
    assert bbox_predicate("touches", g3, box)
    assert not bbox_predicate("overlaps", g3, box)


class TestDistanceProperties:
    """Invariants of the exact distance kernel for ANY inputs."""

    @given(squares(), squares())
    @settings(max_examples=150, deadline=None)
    def test_symmetric_and_nonnegative(self, a, b):
        from xcube_geodb_spark.geometry.geom import distance

        d1, d2 = distance(a, b), distance(b, a)
        assert d1 >= 0.0
        assert abs(d1 - d2) < 1e-9

    @given(squares())
    @settings(max_examples=50, deadline=None)
    def test_self_distance_zero(self, g):
        from xcube_geodb_spark.geometry.geom import distance

        assert distance(g, g) == 0.0

    @given(points(), squares())
    @settings(max_examples=150, deadline=None)
    def test_point_to_square_matches_closed_form(self, p, sq):
        import math

        from xcube_geodb_spark.geometry.geom import distance, envelope

        x0, y0, x1, y1 = envelope(sq)
        px, py = float(p.parts[0]), float(p.parts[1])
        dx = max(x0 - px, px - x1, 0.0)
        dy = max(y0 - py, py - y1, 0.0)
        assert abs(distance(p, sq) - math.hypot(dx, dy)) < 1e-9

    @given(points(), points(), coord, coord)
    @settings(max_examples=100, deadline=None)
    def test_translation_invariance(self, a, b, tx, ty):
        import numpy as np

        from xcube_geodb_spark.geometry.geom import Geometry, distance

        shift = np.array([tx, ty])
        a2 = Geometry("Point", a.parts + shift)
        b2 = Geometry("Point", b.parts + shift)
        assert abs(distance(a, b) - distance(a2, b2)) < 1e-6

    @given(points(), squares())
    @settings(max_examples=100, deadline=None)
    def test_zero_iff_intersects(self, p, sq):
        from xcube_geodb_spark.geometry.geom import distance, envelope

        x0, y0, x1, y1 = envelope(sq)
        px, py = float(p.parts[0]), float(p.parts[1])
        inside_or_on = x0 <= px <= x1 and y0 <= py <= y1
        d = distance(p, sq)
        assert (d == 0.0) == inside_or_on


@st.composite
def polylines(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    xs = draw(st.lists(coord, min_size=n, max_size=n))
    ys = draw(st.lists(coord, min_size=n, max_size=n))
    arr = np.stack([np.array(xs), np.array(ys)], axis=1)
    return Geometry("LineString", arr)


class TestSimplifyProperties:
    @given(polylines(), st.floats(min_value=0.0, max_value=100.0))
    @settings(max_examples=120, deadline=None)
    def test_dropped_vertices_stay_within_tolerance(self, g, tol):
        from xcube_geodb_spark.geometry.geom import (
            _all_segments,
            _point_seg_dist_min,
            simplify,
        )

        out = simplify(g, tol)
        # endpoints always pinned
        assert (out.parts[0] == g.parts[0]).all()
        assert (out.parts[-1] == g.parts[-1]).all()
        # kept vertices are a subsequence of the input
        assert len(out.parts) <= len(g.parts)
        segs = _all_segments(out)
        if len(segs):
            for pt in g.parts:
                assert _point_seg_dist_min(pt[None, :], segs) <= tol + 1e-9

    @given(polylines())
    @settings(max_examples=60, deadline=None)
    def test_idempotent(self, g):
        from xcube_geodb_spark.geometry.geom import simplify, to_wkt as _wkt

        once = simplify(g, 0.5)
        twice = simplify(once, 0.5)
        assert _wkt(once) == _wkt(twice)


class TestSphereProperties:
    lonlat = st.tuples(
        st.floats(min_value=-180, max_value=180, allow_nan=False),
        st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    )

    @given(lonlat, lonlat)
    @settings(max_examples=150, deadline=None)
    def test_symmetric_nonnegative_bounded(self, p, q):
        from xcube_geodb_spark.geometry.geom import (
            EARTH_RADIUS_M,
            Geometry as G,
            distance_sphere,
        )

        a = G("Point", np.array(p))
        b = G("Point", np.array(q))
        d = distance_sphere(a, b)
        assert d == distance_sphere(b, a)
        assert 0.0 <= d <= np.pi * EARTH_RADIUS_M + 1e-6
        if p == q:
            assert d == 0.0

    @given(lonlat, lonlat, lonlat)
    @settings(max_examples=100, deadline=None)
    def test_triangle_inequality(self, p, q, r):
        from xcube_geodb_spark.geometry.geom import Geometry as G, distance_sphere

        a, b, c = (G("Point", np.array(v)) for v in (p, q, r))
        # 1 m slack, not 1e-6: haversine loses precision near antipodal
        # pairs (asin'(x) blows up as x -> 1), and hypothesis finds
        # midpoints lying exactly on a near-antipodal geodesic where the
        # float error reaches ~1e-5 m — a precision artifact, not a
        # violation of the metric
        assert distance_sphere(a, c) <= (
            distance_sphere(a, b) + distance_sphere(b, c) + 1.0
        )


class TestClipProperties:
    @given(squares(), boxes())
    @settings(max_examples=120, deadline=None)
    def test_clip_stays_inside_and_loses_no_interior(self, g, box):
        from xcube_geodb_spark.geometry.geom import area, clip_by_box

        out = clip_by_box(g, box)
        gx0, gy0, gx1, gy1 = envelope(g)
        ix = min(box[2], gx1) - max(box[0], gx0)
        iy = min(box[3], gy1) - max(box[1], gy0)
        want = max(ix, 0.0) * max(iy, 0.0)
        if out is None:
            # fully outside (or touching with zero overlap area)
            assert want <= 1e-9
            return
        ex0, ey0, ex1, ey1 = envelope(out)
        eps = 1e-9
        assert ex0 >= box[0] - eps and ey0 >= box[1] - eps
        assert ex1 <= box[2] + eps and ey1 <= box[3] + eps
        # axis-aligned square: clipped area is the exact interval product
        assert area(out) == pytest.approx(want, rel=1e-9, abs=1e-9)

    @given(squares(), boxes())
    @settings(max_examples=60, deadline=None)
    def test_clip_idempotent(self, g, box):
        from xcube_geodb_spark.geometry.geom import clip_by_box, to_wkt as _wkt

        once = clip_by_box(g, box)
        if once is None:
            return
        twice = clip_by_box(once, box)
        assert twice is not None and _wkt(twice) == _wkt(once)


class TestConvexHullProperties:
    @given(
        st.lists(
            st.tuples(coord, coord), min_size=1, max_size=30, unique=True
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_hull_is_convex_contains_all_and_idempotent(self, pts):
        from xcube_geodb_spark.geometry.geom import (
            _ring_shoelace,
            convex_hull,
            distance,
        )

        g = Geometry(
            "MultiPoint",
            [Geometry("Point", np.array(p, dtype=float)) for p in pts],
        )
        hull = convex_hull(g)
        # every input point lies on or inside the hull
        for p in pts:
            assert distance(Geometry("Point", np.array(p, dtype=float)), hull) == 0.0
        if hull.kind == "Polygon":
            ring = hull.parts[0]
            # CCW orientation and convexity: every turn is a left turn
            assert _ring_shoelace(ring) > 0
            ext = np.vstack([ring[:-1], ring[:2]])
            for i in range(len(ring) - 1):
                o, a, b = ext[i], ext[i + 1], ext[i + 2]
                cross = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
                    b[0] - o[0]
                )
                assert cross > 0
        # idempotence: the hull of the hull is the hull
        assert to_wkt(convex_hull(hull)) == to_wkt(hull)
