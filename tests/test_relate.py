"""Geometry–geometry binary predicates (geometry/relate.py) and their SQL
surface dispatch (st_intersects(wkb, wkb) etc.).

Reference parity: the raw-SQL passthrough
(/root/reference/xcube_geodb/sql/geodb.sql:1147-1167) admits any PostGIS
binary predicate between two geometry columns; the bbox-first dispatch
(geodb.sql:1204-1214) stays on the existing (bbox_wkt, wkb) form."""

import pytest

from xcube_geodb_spark.geometry.geom import bbox_polygon, parse_wkt
from xcube_geodb_spark.geometry.predicates import COMPARISON_MODES, bbox_predicate
from xcube_geodb_spark.geometry.relate import geom_predicate


def P(wkt):
    return parse_wkt(wkt)


def sq(x0, y0, x1, y1):
    return P(
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def rel(mode, a, b):
    return geom_predicate(mode, a, b)


class TestPolygonPolygon:
    def test_disjoint_squares(self):
        a, b = sq(0, 0, 1, 1), sq(5, 5, 6, 6)
        assert rel("disjoint", a, b)
        assert not rel("intersects", a, b)
        assert not rel("touches", a, b)
        assert not rel("overlaps", a, b)

    def test_edge_touching_squares(self):
        a, b = sq(0, 0, 2, 2), sq(2, 0, 4, 2)
        assert rel("intersects", a, b)
        assert rel("touches", a, b)
        assert not rel("overlaps", a, b)
        assert not rel("within", a, b)
        assert not rel("crosses", a, b)

    def test_corner_touching_squares(self):
        a, b = sq(0, 0, 2, 2), sq(2, 2, 4, 4)
        assert rel("touches", a, b)
        assert not rel("overlaps", a, b)

    def test_overlapping_squares(self):
        a, b = sq(0, 0, 2, 2), sq(1, 1, 3, 3)
        assert rel("intersects", a, b)
        assert rel("overlaps", a, b)
        assert rel("overlaps", b, a)
        assert not rel("touches", a, b)
        assert not rel("within", a, b)
        assert not rel("equals", a, b)

    def test_contained_square(self):
        outer, inner = sq(0, 0, 10, 10), sq(2, 2, 4, 4)
        assert rel("within", inner, outer)
        assert rel("contains", outer, inner)
        assert not rel("within", outer, inner)
        assert not rel("overlaps", inner, outer)
        assert not rel("touches", inner, outer)
        assert rel("intersects", inner, outer)

    def test_contained_sharing_edge(self):
        # grid-aligned half: covered, shares boundary, no proper crossing
        outer, half = sq(0, 0, 2, 2), sq(0, 0, 1, 2)
        assert rel("within", half, outer)
        assert rel("contains", outer, half)
        assert not rel("overlaps", half, outer)
        assert not rel("touches", half, outer)

    def test_grid_aligned_partial_overlap(self):
        # collinear edges, no vertex strictly inside either — the case a
        # vertex/crossing heuristic misses; the overlay kernel does not
        a, b = sq(0, 0, 2, 1), sq(1, 0, 3, 1)
        assert rel("overlaps", a, b)
        assert not rel("touches", a, b)
        assert not rel("within", a, b)

    def test_equal_squares(self):
        a, b = sq(1, 1, 3, 3), sq(1, 1, 3, 3)
        assert rel("equals", a, b)
        assert rel("within", a, b)
        assert rel("contains", a, b)
        assert not rel("overlaps", a, b)
        assert not rel("touches", a, b)

    def test_hole_separates(self):
        donut = P(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
            "(3 3, 7 3, 7 7, 3 7, 3 3))"
        )
        island = sq(4, 4, 6, 6)
        assert rel("disjoint", island, donut)
        filling = sq(3, 3, 7, 7)
        assert rel("touches", filling, donut)
        assert not rel("within", filling, donut)

    def test_multipolygon_coverage(self):
        mp = P(
            "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "((2 0, 4 0, 4 2, 2 2, 2 0)))"
        )
        # covered only by the UNION of the two members
        spanning = sq(1, 0, 3, 2)
        assert rel("within", spanning, mp)
        assert rel("contains", mp, spanning)


class TestPointOthers:
    def test_point_polygon(self):
        poly = sq(0, 0, 2, 2)
        assert rel("within", P("POINT (1 1)"), poly)
        assert rel("contains", poly, P("POINT (1 1)"))
        assert rel("touches", P("POINT (2 1)"), poly)  # on boundary
        assert not rel("within", P("POINT (2 1)"), poly)
        assert rel("disjoint", P("POINT (5 5)"), poly)

    def test_point_line(self):
        ln = P("LINESTRING (0 0, 2 0, 2 2)")
        assert rel("within", P("POINT (1 0)"), ln)
        assert rel("touches", P("POINT (0 0)"), ln)  # line endpoint
        assert not rel("within", P("POINT (0 0)"), ln)
        assert rel("within", P("POINT (2 0)"), ln)  # interior vertex
        assert rel("disjoint", P("POINT (1 1)"), ln)

    def test_point_point(self):
        assert rel("equals", P("POINT (1 1)"), P("POINT (1 1)"))
        assert rel("intersects", P("POINT (1 1)"), P("POINT (1 1)"))
        assert rel("disjoint", P("POINT (1 1)"), P("POINT (1 2)"))

    def test_multipoint_overlaps(self):
        a = P("MULTIPOINT (0 0, 1 1)")
        b = P("MULTIPOINT (1 1, 2 2)")
        assert rel("overlaps", a, b)
        assert not rel("within", a, b)
        assert rel("within", P("MULTIPOINT (0 0)"), a)

    def test_point_crosses_nothing(self):
        assert not rel("crosses", P("POINT (1 1)"), sq(0, 0, 2, 2))


class TestLineLine:
    def test_proper_crossing(self):
        a = P("LINESTRING (0 0, 2 2)")
        b = P("LINESTRING (0 2, 2 0)")
        assert rel("crosses", a, b)
        assert rel("intersects", a, b)
        assert not rel("touches", a, b)
        assert not rel("overlaps", a, b)

    def test_endpoint_touch(self):
        a = P("LINESTRING (0 0, 1 1)")
        b = P("LINESTRING (1 1, 2 0)")
        assert rel("touches", a, b)
        assert not rel("crosses", a, b)

    def test_t_junction_touch(self):
        # a's endpoint lands on b's interior: II empty -> touches
        a = P("LINESTRING (1 0, 1 1)")
        b = P("LINESTRING (0 1, 2 1)")
        assert rel("touches", a, b)
        assert not rel("crosses", a, b)

    def test_interior_vertex_contact_crosses(self):
        # contact at an interior VERTEX of both, no proper crossing:
        # dim(II)=0 -> crosses per DE-9IM
        a = P("LINESTRING (0 0, 1 1, 2 0)")
        b = P("LINESTRING (0 2, 1 1, 2 2)")
        assert rel("crosses", a, b)
        assert not rel("touches", a, b)

    def test_collinear_overlap(self):
        a = P("LINESTRING (0 0, 2 0)")
        b = P("LINESTRING (1 0, 3 0)")
        assert rel("overlaps", a, b)
        assert not rel("crosses", a, b)
        assert not rel("within", a, b)

    def test_sub_line_within(self):
        a = P("LINESTRING (0.5 0, 1.5 0)")
        b = P("LINESTRING (0 0, 2 0)")
        assert rel("within", a, b)
        assert rel("contains", b, a)
        assert not rel("overlaps", a, b)

    def test_equal_lines(self):
        a = P("LINESTRING (0 0, 1 0, 2 0)")
        b = P("LINESTRING (0 0, 2 0)")  # same point set, different vertices
        assert rel("equals", a, b)

    def test_crossing_plus_overlap_is_not_crosses(self):
        # shares a 1-D run: dim(II)=1, so crosses is false, overlaps true
        a = P("LINESTRING (0 0, 2 0, 2 2)")
        b = P("LINESTRING (1 0, 3 0)")
        assert not rel("crosses", a, b)
        assert rel("overlaps", a, b)


class TestLinePolygon:
    def test_line_crosses_polygon(self):
        poly = sq(0, 0, 2, 2)
        ln = P("LINESTRING (-1 1, 3 1)")
        assert rel("crosses", ln, poly)
        assert rel("intersects", ln, poly)
        assert not rel("within", ln, poly)
        assert not rel("touches", ln, poly)

    def test_line_within_polygon(self):
        poly = sq(0, 0, 4, 4)
        ln = P("LINESTRING (1 1, 3 3)")
        assert rel("within", ln, poly)
        assert rel("contains", poly, ln)
        assert not rel("crosses", ln, poly)

    def test_line_on_boundary_touches(self):
        poly = sq(0, 0, 2, 2)
        ln = P("LINESTRING (0 0, 2 0)")  # along the bottom edge
        assert rel("touches", ln, poly)
        assert not rel("within", ln, poly)
        assert not rel("crosses", ln, poly)

    def test_line_poking_in_crosses(self):
        poly = sq(0, 0, 2, 2)
        ln = P("LINESTRING (1 1, 5 1)")  # starts inside, exits
        assert rel("crosses", ln, poly)

    def test_polygon_never_within_line(self):
        assert not rel("within", sq(0, 0, 1, 1), P("LINESTRING (0 0, 9 9)"))


class TestBboxParity:
    """A bbox expressed as a POLYGON through the geom–geom kernel must
    classify exactly like the bbox fast path (predicates.bbox_predicate)
    — byte-parity between the two dispatch arms of st_<mode>."""

    BOX = (0.0, 0.0, 10.0, 10.0)

    GEOMS = [
        "POINT (5 5)", "POINT (10 5)", "POINT (15 15)", "POINT (0 0)",
        "LINESTRING (2 2, 8 8)", "LINESTRING (-5 5, 15 5)",
        "LINESTRING (0 0, 10 0)", "LINESTRING (-5 -5, -1 -1)",
        "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))",
        "POLYGON ((-2 -2, 12 -2, 12 12, -2 12, -2 -2))",
        "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",
        "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "MULTIPOINT (1 1, 11 11)",
    ]

    @pytest.mark.parametrize("mode", COMPARISON_MODES)
    def test_parity(self, mode):
        box_poly = bbox_polygon(*self.BOX)
        for wkt in self.GEOMS:
            g = P(wkt)
            want = bbox_predicate(mode, g, self.BOX)
            got = geom_predicate(mode, box_poly, g)
            assert got == want, f"{mode} mismatch on {wkt}: {got} != {want}"


class TestSqlSurface:
    def test_geom_geom_and_bbox_first_dispatch(self, spark):
        from xcube_geodb_spark.geometry.sqlfuncs import (
            register_spatial_sql_functions,
        )

        register_spatial_sql_functions(spark)
        row = spark.sql(
            """
            SELECT
              st_intersects(st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                            st_geomfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')) AS gg_hit,
              st_intersects(st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                            st_geomfromtext('POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))')) AS gg_miss,
              st_within(st_geomfromtext('POINT (1 1)'),
                        st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS pt_in,
              st_crosses(st_geomfromtext('LINESTRING (-1 1, 3 1)'),
                         st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS ln_x,
              st_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
                            st_geomfromtext('POINT (1 1)')) AS bbox_form
            """
        ).collect()[0]
        assert row["gg_hit"] is True
        assert row["gg_miss"] is False
        assert row["pt_in"] is True
        assert row["ln_x"] is True
        assert row["bbox_form"] is True

    def test_geom_geom_matches_engine_operator(self, spark):
        """Byte-parity: the SQL-surface geom–geom predicate classifies a
        join exactly like the engine's bbox predicate operators for box
        arguments (the two arms share kernels, not just answers)."""
        from xcube_geodb_spark.geometry.sqlfuncs import (
            register_spatial_sql_functions,
        )

        register_spatial_sql_functions(spark)
        rows = spark.sql(
            """
            WITH g AS (
              SELECT id,
                     st_geomfromtext(concat('POLYGON ((', x, ' 0, ', x + 2,
                       ' 0, ', x + 2, ' 2, ', x, ' 2, ', x, ' 0))')) AS geom
              FROM VALUES (0, 0.0), (1, 1.0), (2, 3.0), (3, 9.0) AS t(id, x)
            )
            SELECT a.id AS ia, b.id AS ib,
                   st_intersects(a.geom, b.geom) AS hit,
                   st_intersects(st_astext(st_envelope(a.geom)), b.geom) AS bbox_hit
            FROM g a JOIN g b ON a.id < b.id
            ORDER BY ia, ib
            """
        ).collect()
        for r in rows:
            assert r["hit"] == r["bbox_hit"], (r["ia"], r["ib"])
        hits = {(r["ia"], r["ib"]): r["hit"] for r in rows}
        assert hits[(0, 1)] is True   # overlap
        assert hits[(1, 2)] is True   # edge touch at x=3
        assert hits[(0, 2)] is False
        assert hits[(2, 3)] is False


# ---------------------------------------------------------------------------
# property-based invariants (pure kernel, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

# half-integer grid coordinates: touching edges, shared corners, collinear
# overlaps, and exact containment occur constantly — exactly the degenerate
# branches a float fuzzer would almost never hit
_coord = st.integers(min_value=-8, max_value=8).map(lambda v: v / 2.0)


@st.composite
def _rects(draw):
    x0 = draw(_coord)
    y0 = draw(_coord)
    w = draw(st.integers(min_value=1, max_value=8))
    h = draw(st.integers(min_value=1, max_value=8))
    return (x0, y0, x0 + w / 2.0, y0 + h / 2.0)


def _rect_geom(r):
    return sq(*r)


@st.composite
def _geoms(draw):
    kind = draw(st.sampled_from(["point", "line", "rect", "tri"]))
    if kind == "point":
        return P(f"POINT ({draw(_coord)} {draw(_coord)})")
    if kind == "line":
        x0, y0, x1, y1 = (draw(_coord) for _ in range(4))
        if (x0, y0) == (x1, y1):
            x1 += 1.0
        return P(f"LINESTRING ({x0} {y0}, {x1} {y1})")
    if kind == "rect":
        return _rect_geom(draw(_rects()))
    # constructed non-degenerate: base edge of length >= 0.5 along x,
    # apex strictly off the base line — no duplicate vertices, area > 0
    ax, ay = draw(_coord), draw(_coord)
    w = draw(st.integers(min_value=1, max_value=8)) / 2.0
    cx = draw(_coord)
    ch = draw(st.integers(min_value=1, max_value=8)) / 2.0
    return P(
        f"POLYGON (({ax} {ay}, {ax + w} {ay}, {cx} {ay + ch}, {ax} {ay}))"
    )


class TestRelateProperties:
    @settings(max_examples=200, deadline=None)
    @given(_geoms(), _geoms())
    def test_symmetry_and_duality(self, a, b):
        for mode in ("intersects", "disjoint", "touches", "overlaps",
                     "equals", "crosses"):
            assert rel(mode, a, b) == rel(mode, b, a), mode
        assert rel("within", a, b) == rel("contains", b, a)
        assert rel("within", b, a) == rel("contains", a, b)

    @settings(max_examples=200, deadline=None)
    @given(_geoms(), _geoms())
    def test_predicate_algebra(self, a, b):
        r = {m: rel(m, a, b) for m in COMPARISON_MODES}
        assert r["disjoint"] == (not r["intersects"])
        if r["equals"]:
            assert r["within"] and r["contains"]
        if r["within"] or r["contains"] or r["overlaps"] or r["crosses"]:
            assert r["intersects"]
        if r["touches"]:
            # touches = contact without interior intersection; every
            # interior-requiring predicate must be false
            assert r["intersects"]
            assert not (r["within"] or r["overlaps"] or r["crosses"])
        if r["overlaps"]:
            assert not (r["within"] or r["contains"] or r["touches"])

    @settings(max_examples=300, deadline=None)
    @given(_rects(), _rects())
    def test_rect_rect_interval_oracle(self, ra, rb):
        """Axis-aligned rectangles have a closed-form DE-9IM: every mode
        reduces to interval arithmetic. The kernel must reproduce it."""
        ax0, ay0, ax1, ay1 = ra
        bx0, by0, bx1, by1 = rb
        ix = (max(ax0, bx0), min(ax1, bx1))
        iy = (max(ay0, by0), min(ay1, by1))
        intersects = ix[0] <= ix[1] and iy[0] <= iy[1]
        ii = ix[0] < ix[1] and iy[0] < iy[1]
        within = bx0 <= ax0 and ax1 <= bx1 and by0 <= ay0 and ay1 <= by1
        contains = ax0 <= bx0 and bx1 <= ax1 and ay0 <= by0 and by1 <= ay1
        want = {
            "intersects": intersects,
            "disjoint": not intersects,
            "touches": intersects and not ii,
            "within": within,
            "contains": contains,
            "equals": ra == rb,
            "overlaps": ii and not within and not contains,
            "crosses": False,  # equal-dimension areal pair, PostGIS false
        }
        a = _rect_geom(ra)
        b = _rect_geom(rb)
        for mode, exp in want.items():
            assert rel(mode, a, b) == exp, (mode, ra, rb)


class TestRelateMatrix:
    """relate_matrix (ST_Relate) — canonical PostGIS matrices, transpose
    involution, and full cross-validation against geom_predicate through
    the OGC DE-9IM mode patterns."""

    CANON = [
        # (a, b, expected) — all verified against published PostGIS output
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "212101212"),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF2FF1212"),
        ("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
         "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "2FF1FF212"),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))", "FF2F11212"),
        ("POINT (1 1)",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "0FFFFF212"),
        ("LINESTRING (-1 1, 3 1)",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "101FF0212"),
        ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", "0F1FF0102"),
        ("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)", "1010F0102"),
        ("LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 3 0)", "FF1F00102"),
        ("POINT (1 1)", "POINT (1 1)", "0FFFFFFF2"),
        ("POINT (1 1)", "POINT (2 2)", "FF0FFF0F2"),
        ("POINT (0 0)", "LINESTRING (0 0, 2 0)", "F0FFFF102"),
        ("POINT (1 0)", "LINESTRING (0 0, 2 0)", "0FFFFF102"),
    ]

    @pytest.mark.parametrize("a,b,want", CANON)
    def test_canonical_matrices(self, a, b, want):
        from xcube_geodb_spark.geometry.relate import relate_matrix

        assert relate_matrix(P(a), P(b)) == want


    MULTI_CANON = [
        # closed ring ON its polygon's boundary: line interior = the whole
        # ring, line boundary empty (OGC mod-2)
        ("LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "F1FFFF2F2"),
        # multipoint with one member in / on / out
        ("MULTIPOINT (1 1, 2 1, 5 5)",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "000FFF212"),
        # closed ring crossed twice by an open line
        ("LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)",
         "LINESTRING (1 -1, 1 3)", "0F1FFF102"),
        # square spanning a two-member multipolygon (members adjacent:
        # boundary = union of member rings, so the shared seam counts as
        # boundary inside a — consistent with geom_predicate, which also
        # reports within(a, b) here)
        ("POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))",
         "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
         "((2 0, 4 0, 4 2, 2 2, 2 0)))", "21F11F212"),
    ]

    @pytest.mark.parametrize("a,b,want", MULTI_CANON)
    def test_multi_and_ring_matrices(self, a, b, want):
        from xcube_geodb_spark.geometry.relate import relate_matrix

        assert relate_matrix(P(a), P(b)) == want

    def test_heterogeneous_raises(self):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.geometry.relate import relate_matrix

        gc = P("GEOMETRYCOLLECTION (POINT (0 0), "
               "LINESTRING (0 0, 1 1))")
        with pytest.raises(GeoDBError):
            relate_matrix(gc, P("POINT (0 0)"))

    def test_pattern_match(self):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.geometry.relate import de9im_match

        assert de9im_match("212101212", "T*T***T**")
        assert de9im_match("212101212", "212101212")
        assert not de9im_match("FF2FF1212", "T********")
        assert de9im_match("FF2FF1212", "FF*FF****")
        assert not de9im_match("212101212", "F********")
        with pytest.raises(GeoDBError):
            de9im_match("212101212", "T*")

    @staticmethod
    def _modes_from_matrix(m, da, db):
        II, IB, IE, BI, BB, BE, EI, EB, _ = m
        f = "F"
        inter = not (II == f and IB == f and BI == f and BB == f)
        within = II != f and IE == f and BE == f
        contains = II != f and EI == f and EB == f
        if da == db == 1:
            overlaps = II == "1" and IE != f and EI != f
        elif da == db:
            overlaps = II != f and IE != f and EI != f
        else:
            overlaps = False
        if da < db:
            crosses = II != f and IE != f
        elif da > db:
            crosses = II != f and EI != f
        elif da == 1:
            crosses = II == "0"
        else:
            crosses = False
        return {
            "intersects": inter,
            "disjoint": not inter,
            "within": within,
            "contains": contains,
            "equals": II != f and IE == f and BE == f
            and EI == f and EB == f,
            "touches": II == f and (IB != f or BI != f or BB != f),
            "overlaps": overlaps,
            "crosses": crosses,
        }

    @settings(max_examples=250, deadline=None)
    @given(_geoms(), _geoms())
    def test_matrix_agrees_with_predicates(self, a, b):
        from xcube_geodb_spark.geometry.relate import relate_matrix

        m = relate_matrix(a, b)
        derived = self._modes_from_matrix(m, a.dimension, b.dimension)
        for mode in COMPARISON_MODES:
            assert derived[mode] == rel(mode, a, b), (mode, m)

    @settings(max_examples=200, deadline=None)
    @given(_geoms(), _geoms())
    def test_transpose_involution(self, a, b):
        from xcube_geodb_spark.geometry.relate import relate_matrix

        TR = (0, 3, 6, 1, 4, 7, 2, 5, 8)
        m_ab = relate_matrix(a, b)
        m_ba = relate_matrix(b, a)
        assert "".join(m_ab[i] for i in TR) == m_ba
