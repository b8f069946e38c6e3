"""Geometry–geometry binary predicates (DE-9IM-derived).

The reference's raw-SQL passthrough admits any PostGIS call
(``/root/reference/xcube_geodb/sql/geodb.sql:1147-1167``), and
``ST_Intersects(a.geometry, b.geometry)`` between two geometry columns is
the most common PostGIS idiom in raw SQL.  :mod:`predicates` covers the
bbox-vs-geometry forms the reference's bbox dispatch emits
(``geodb.sql:1204-1214``); this module evaluates the same eight
predicates between two ARBITRARY geometries, so the SQL surface can
dispatch ``st_<mode>(wkb, wkb)`` next to the existing
``st_<mode>(bbox_wkt, wkb)`` form.

Everything reduces to four primitive relations, each computed from the
audited kernels this package already trusts:

- ``cc``      — closures share a point (``geom.distance == 0``: exact for
                vertex/segment contact by the cross-product form)
- ``ii``      — interiors share a point, and ``ii_dim`` — the dimension of
                that shared set (0/1/2), needed by overlaps/crosses on lines
- ``covered`` — a ⊆ closure(b), per leaf: split a's segments at every
                meet with b's segments so membership is invariant within a
                piece, then one midpoint test per piece; polygon leaves go
                through the boolean overlay (difference empty)

Predicate algebra (PostGIS semantics):

- intersects = cc                      - disjoint = !cc
- within(a,b) = covered(a,b) && ii     - contains = within flipped
- touches = cc && !ii
- equals = covered(a,b) && covered(b,a)
- overlaps = dim(a)==dim(b) && ii_dim==dim(a) && !covered either way
- crosses: dim(a)<dim(b): ii && !covered(a,b); mirrored; line/line:
  ii_dim == 0

Tolerance: the same relative epsilon family as :mod:`predicates`
(``1e-9 * coordinate scale``), so a bbox expressed as a polygon through
this kernel classifies identically to the bbox fast path.
"""

from __future__ import annotations

import math

import numpy as np

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.geometry.geom import (
    Geometry,
    _all_segments,
    area,
    distance,
    envelope,
)
from xcube_geodb_spark.geometry.predicates import (
    COMPARISON_MODES,
    _point_in_polygon,
)

_REL_EPS = 1e-9


def _scale_eps(a: Geometry, b: Geometry) -> float:
    ea, eb = envelope(a), envelope(b)
    scale = max(
        1.0, *(abs(v) for v in ea if not math.isnan(v)),
        *(abs(v) for v in eb if not math.isnan(v)),
    )
    return _REL_EPS * scale


def _split_leaves(g: Geometry):
    pts, lines, polys = [], [], []
    for leaf in g.children():
        if leaf.kind == "Point":
            pts.append(leaf)
        elif leaf.kind == "LineString":
            lines.append(leaf)
        else:
            polys.append(leaf)
    return pts, lines, polys


def _pt_on_segments(x: float, y: float, segs: np.ndarray, eps: float) -> bool:
    """Point within ``eps`` of any segment (cross-product interior form,
    exact 0 for points ON a segment — same construction as
    geom._point_seg_dist_min, scalar-point special case)."""
    if not len(segs):
        return False
    ax, ay = segs[:, 0], segs[:, 1]
    bx, by = segs[:, 2], segs[:, 3]
    abx, aby = bx - ax, by - ay
    apx, apy = x - ax, y - ay
    denom = abx * abx + aby * aby
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(denom > 0, (apx * abx + apy * aby) / denom, 0.0)
    t = np.clip(t, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return bool((dx * dx + dy * dy <= eps * eps).any())


def _line_boundary(leaf: Geometry) -> list[tuple[float, float]]:
    """The linestring's boundary points — empty for a closed line (ring),
    per the OGC mod-2 rule."""
    arr = leaf.parts
    if len(arr) < 2:
        return []
    if arr[0, 0] == arr[-1, 0] and arr[0, 1] == arr[-1, 1]:
        return []
    return [(float(arr[0, 0]), float(arr[0, 1])),
            (float(arr[-1, 0]), float(arr[-1, 1]))]


def _pt_interior_of_line(
    x: float, y: float, leaf: Geometry, segs: np.ndarray, eps: float
) -> bool:
    if not _pt_on_segments(x, y, segs, eps):
        return False
    return all(
        math.hypot(x - bx, y - by) > eps for bx, by in _line_boundary(leaf)
    )


def _pt_in_closure(
    x: float, y: float, pts, lines_segs, polys, eps: float
) -> bool:
    """Membership of one point in the CLOSURE of a leaf-split geometry
    (pts: Point leaves; lines_segs: list of (leaf, segs); polys: Polygon
    leaves)."""
    for p in pts:
        if math.hypot(x - float(p.parts[0]), y - float(p.parts[1])) <= eps:
            return True
    for _, segs in lines_segs:
        if _pt_on_segments(x, y, segs, eps):
            return True
    for poly in polys:
        if _point_in_polygon(x, y, poly.parts) != 0:
            return True
    return False


def _seg_meet_params(
    px: float, py: float, qx: float, qy: float, segs: np.ndarray, eps: float
) -> list[float]:
    """All parameters t in (0,1) where segment p->q meets any of ``segs``:
    proper crossings, endpoint touches, and collinear-overlap boundaries.
    Complete event set — between consecutive events the segment's
    membership in the closure of the other geometry cannot change."""
    if not len(segs):
        return []
    rx, ry = qx - px, qy - py
    ts: list[float] = []
    ax, ay = segs[:, 0], segs[:, 1]
    bx, by = segs[:, 2], segs[:, 3]
    sx, sy = bx - ax, by - ay
    denom = rx * sy - ry * sx
    qpx, qpy = ax - px, ay - py
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(denom != 0, (qpx * sy - qpy * sx) / denom, np.nan)
        u = np.where(denom != 0, (qpx * ry - qpy * rx) / denom, np.nan)
    ok = (
        np.isfinite(t) & np.isfinite(u)
        & (t > 0.0) & (t < 1.0) & (u >= -1e-12) & (u <= 1.0 + 1e-12)
    )
    ts.extend(float(v) for v in t[ok])
    # collinear / parallel-touching cases: project the other segment's
    # endpoints onto p->q where they lie on it
    rlen2 = rx * rx + ry * ry
    if rlen2 > 0:
        for ex, ey in ((ax, ay), (bx, by)):
            tproj = ((ex - px) * rx + (ey - py) * ry) / rlen2
            ddx = px + tproj * rx - ex
            ddy = py + tproj * ry - ey
            on = (
                (ddx * ddx + ddy * ddy <= eps * eps)
                & (tproj > 0.0) & (tproj < 1.0)
            )
            ts.extend(float(v) for v in tproj[on])
    return ts


def _leaf_line_covered(
    leaf: Geometry, b_pts, b_lines, b_polys, b_segs: np.ndarray, eps: float
) -> bool:
    """LineString leaf ⊆ closure(b): split each segment at every meet with
    b's segments, then test piece midpoints (and vertices)."""
    arr = leaf.parts
    lines_segs = b_lines
    for i in range(len(arr) - 1):
        px, py = float(arr[i, 0]), float(arr[i, 1])
        qx, qy = float(arr[i + 1, 0]), float(arr[i + 1, 1])
        if not _pt_in_closure(px, py, b_pts, lines_segs, b_polys, eps):
            return False
        ts = sorted(set([0.0, 1.0] + _seg_meet_params(px, py, qx, qy, b_segs, eps)))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            tm = (t0 + t1) / 2.0
            mx, my = px + tm * (qx - px), py + tm * (qy - py)
            if not _pt_in_closure(mx, my, b_pts, lines_segs, b_polys, eps):
                return False
    qx, qy = float(arr[-1, 0]), float(arr[-1, 1])
    return _pt_in_closure(qx, qy, b_pts, lines_segs, b_polys, eps)


def _poly_geom(polys: list[Geometry]) -> Geometry | None:
    if not polys:
        return None
    if len(polys) == 1:
        return polys[0]
    return Geometry("MultiPolygon", polys)


def _covered(a: Geometry, b: Geometry, eps: float) -> bool:
    """a ⊆ closure(b)."""
    a_pts, a_lines, a_polys = _split_leaves(a)
    b_pts, b_lines, b_polys = _split_leaves(b)
    b_lines_segs = [(ln, _all_segments(ln)) for ln in b_lines]
    b_segs = _all_segments(b)  # lines + polygon rings: the full event set
    for p in a_pts:
        if not _pt_in_closure(
            float(p.parts[0]), float(p.parts[1]),
            b_pts, b_lines_segs, b_polys, eps,
        ):
            return False
    for ln in a_lines:
        if not _leaf_line_covered(ln, b_pts, b_lines_segs, b_polys, b_segs, eps):
            return False
    if a_polys:
        bp = _poly_geom(b_polys)
        if bp is None:
            return False  # a 2-D interior can't be covered by dim < 2
        from xcube_geodb_spark.geometry.overlay import overlay

        ap = _poly_geom(a_polys)
        diff = overlay(ap, bp, "difference")
        if diff is not None and area(diff) > eps * max(area(ap), 1.0):
            return False
    return True


def _interiors(a: Geometry, b: Geometry, eps: float) -> tuple[bool, int]:
    """(interiors intersect, max dimension of the shared interior set)."""
    a_pts, a_lines, a_polys = _split_leaves(a)
    b_pts, b_lines, b_polys = _split_leaves(b)
    ii, dim = False, -1

    def hit(d: int):
        nonlocal ii, dim
        ii = True
        dim = max(dim, d)

    # point interiors (the point itself)
    for p in a_pts:
        x, y = float(p.parts[0]), float(p.parts[1])
        for q in b_pts:
            if math.hypot(x - float(q.parts[0]), y - float(q.parts[1])) <= eps:
                hit(0)
        for ln in b_lines:
            if _pt_interior_of_line(x, y, ln, _all_segments(ln), eps):
                hit(0)
        for poly in b_polys:
            if _point_in_polygon(x, y, poly.parts) == 2:
                hit(0)
    for q in b_pts:
        x, y = float(q.parts[0]), float(q.parts[1])
        for ln in a_lines:
            if _pt_interior_of_line(x, y, ln, _all_segments(ln), eps):
                hit(0)
        for poly in a_polys:
            if _point_in_polygon(x, y, poly.parts) == 2:
                hit(0)

    # line × line
    for la in a_lines:
        sa = _all_segments(la)
        for lb in b_lines:
            sb = _all_segments(lb)
            d = _line_line_interior_dim(la, sa, lb, sb, eps)
            if d >= 0:
                hit(d)
            if dim >= 1:
                break

    # line × polygon (either orientation): a 1-D piece strictly inside
    for lines, polys in ((a_lines, b_polys), (b_lines, a_polys)):
        if dim >= 1:
            break
        for ln in lines:
            if _line_hits_polygon_interior(ln, polys, eps):
                hit(1)
                break

    # polygon × polygon through the boolean overlay kernel
    if a_polys and b_polys and dim < 2:
        from xcube_geodb_spark.geometry.overlay import overlay

        ap, bp = _poly_geom(a_polys), _poly_geom(b_polys)
        inter = overlay(ap, bp, "intersection")
        if inter is not None:
            # anchor on the smaller area (intersection can't exceed it) —
            # max() would let a huge polygon swallow a genuine tiny overlap
            tol = max(_REL_EPS * min(area(ap), area(bp)), eps * eps)
            if area(inter) > tol:
                hit(2)
    return ii, dim


def _line_line_interior_dim(
    la: Geometry, sa: np.ndarray, lb: Geometry, sb: np.ndarray, eps: float
) -> int:
    """Dimension of interior(la) ∩ interior(lb): -1 empty, 0 point
    contacts only, 1 a collinear overlap of positive length."""
    best = -1
    # collinear overlap of positive length between any segment pair -> 1
    for i in range(len(sa)):
        px, py, qx, qy = sa[i]
        rx, ry = qx - px, qy - py
        rlen2 = rx * rx + ry * ry
        if rlen2 <= 0:
            continue
        ax, ay, bx, by = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
        # both endpoints of the b segment within eps of the a segment's
        # LINE, and the projected intervals overlap by more than eps
        ca = np.abs(rx * (ay - py) - ry * (ax - px)) / math.sqrt(rlen2)
        cb = np.abs(rx * (by - py) - ry * (bx - px)) / math.sqrt(rlen2)
        collinear = (ca <= eps) & (cb <= eps)
        if collinear.any():
            ta = ((ax - px) * rx + (ay - py) * ry) / rlen2
            tb = ((bx - px) * rx + (by - py) * ry) / rlen2
            lo = np.maximum(np.minimum(ta, tb), 0.0)
            hi = np.minimum(np.maximum(ta, tb), 1.0)
            if bool(((hi - lo) * math.sqrt(rlen2) > eps)[collinear].any()):
                return 1
    # point contacts: any closure contact between the two lines that is
    # interior to both (proper crossings are; vertex touches checked
    # explicitly)
    if distance(la, lb) <= eps:
        from xcube_geodb_spark.geometry.geom import _segments_cross

        if _segments_cross(sa, sb):
            best = 0
        else:
            for src, other_leaf, other_segs in (
                (la, lb, sb), (lb, la, sa),
            ):
                arr = src.parts
                bpts = _line_boundary(src)
                for i in range(len(arr)):
                    x, y = float(arr[i, 0]), float(arr[i, 1])
                    if any(
                        math.hypot(x - ex, y - ey) <= eps for ex, ey in bpts
                    ):
                        continue
                    if _pt_interior_of_line(x, y, other_leaf, other_segs, eps):
                        best = max(best, 0)
                        break
                if best >= 0:
                    break
    return best


def _line_hits_polygon_interior(
    ln: Geometry, polys: list[Geometry], eps: float
) -> bool:
    """Some positive-length portion of the line lies strictly inside a
    polygon: split at every ring meet, test piece midpoints."""
    if not polys:
        return False
    ring_segs = _all_segments(_poly_geom(polys))
    arr = ln.parts
    for i in range(len(arr) - 1):
        px, py = float(arr[i, 0]), float(arr[i, 1])
        qx, qy = float(arr[i + 1, 0]), float(arr[i + 1, 1])
        ts = sorted(set([0.0, 1.0] + _seg_meet_params(px, py, qx, qy, ring_segs, eps)))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            tm = (t0 + t1) / 2.0
            mx, my = px + tm * (qx - px), py + tm * (qy - py)
            for poly in polys:
                if _point_in_polygon(mx, my, poly.parts) == 2:
                    return True
    return False


def _env_disjoint(a: Geometry, b: Geometry, eps: float) -> bool:
    ea, eb = envelope(a), envelope(b)
    return (
        ea[2] < eb[0] - eps or ea[0] > eb[2] + eps
        or ea[3] < eb[1] - eps or ea[1] > eb[3] + eps
    )


def geom_predicate(mode: str, a: Geometry, b: Geometry) -> bool:
    """Evaluate ``ST_<mode>(a, b)`` between two arbitrary geometries
    (PostGIS argument order — e.g. within = "a within b")."""
    if mode not in COMPARISON_MODES:
        raise GeoDBError(
            f"Unknown comparison mode: {mode!r} (expected one of "
            f"{COMPARISON_MODES})"
        )
    eps = _scale_eps(a, b)
    if _env_disjoint(a, b, eps):
        # envelope short-circuit: every relation except disjoint is false
        return mode == "disjoint"
    if mode == "intersects":
        return distance(a, b) <= eps
    if mode == "disjoint":
        return distance(a, b) > eps
    if mode == "within":
        return _covered(a, b, eps) and _interiors(a, b, eps)[0]
    if mode == "contains":
        return _covered(b, a, eps) and _interiors(a, b, eps)[0]
    if mode == "equals":
        return _covered(a, b, eps) and _covered(b, a, eps)
    if mode == "touches":
        if distance(a, b) > eps:
            return False
        return not _interiors(a, b, eps)[0]
    da, db = a.dimension, b.dimension
    if mode == "overlaps":
        if da != db:
            return False
        ii, dim = _interiors(a, b, eps)
        if not ii or dim != da:
            return False
        return not _covered(a, b, eps) and not _covered(b, a, eps)
    # crosses
    if da == db == 1:
        ii, dim = _interiors(a, b, eps)
        return ii and dim == 0
    if da < db:
        return _interiors(a, b, eps)[0] and not _covered(a, b, eps)
    if db < da:
        return _interiors(a, b, eps)[0] and not _covered(b, a, eps)
    return False


# ---------------------------------------------------------------------------
# ST_Relate: the full DE-9IM matrix
# ---------------------------------------------------------------------------
#
# relate_matrix(a, b) returns the 9-character intersection matrix
# [II IB IE / BI BB BE / EI EB EE] with entries F/0/1/2 — the dimension
# of each Interior/Boundary/Exterior pairwise intersection (PostGIS
# ST_Relate, reference-reachable through the same raw-SQL passthrough as
# the boolean predicates, geodb.sql:1147-1167). Heterogeneous
# GEOMETRYCOLLECTION inputs raise, matching GEOS. Every cell reduces to
# the same audited primitives the boolean predicates use: _covered /
# _interiors / _seg_meet_params splitting + midpoint location. The
# boolean predicates and the matrix are cross-validated against each
# other through the OGC mode patterns in tests/test_relate.py.

_TRANSPOSE = (0, 3, 6, 1, 4, 7, 2, 5, 8)


def _dim_char(d: int) -> str:
    return "F" if d < 0 else str(d)


def _only_type(pts, lines, polys, side: str) -> str:
    kinds = (bool(pts), bool(lines), bool(polys))
    if sum(kinds) != 1:
        raise GeoDBError(
            f"st_relate: {side} operand must be a single-type geometry "
            "(point/line/polygon or their multis); heterogeneous "
            "collections are not supported (GEOS parity)"
        )
    return "P" if kinds[0] else ("L" if kinds[1] else "A")


def _pieces_midpoints(leaf_arrays, other_segs: np.ndarray, eps: float):
    """Split every segment of the given polylines at each meet with
    ``other_segs``; yield piece midpoints. Between consecutive events a
    piece's membership in the other geometry's I/B/E cannot change."""
    for arr in leaf_arrays:
        for i in range(len(arr) - 1):
            px, py = float(arr[i, 0]), float(arr[i, 1])
            qx, qy = float(arr[i + 1, 0]), float(arr[i + 1, 1])
            if px == qx and py == qy:
                continue
            ts = sorted(
                set([0.0, 1.0] + _seg_meet_params(px, py, qx, qy, other_segs, eps))
            )
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                tm = (t0 + t1) / 2.0
                yield px + tm * (qx - px), py + tm * (qy - py)


def _meet_events(leaf_arrays, other_segs: np.ndarray, eps: float):
    """Coordinates where the polylines meet ``other_segs``: split-param
    events plus own vertices lying on the other segments (a vertex touch
    produces no (0,1) param on its own segments)."""
    out = []
    for arr in leaf_arrays:
        for i in range(len(arr) - 1):
            px, py = float(arr[i, 0]), float(arr[i, 1])
            qx, qy = float(arr[i + 1, 0]), float(arr[i + 1, 1])
            for t in _seg_meet_params(px, py, qx, qy, other_segs, eps):
                out.append((px + t * (qx - px), py + t * (qy - py)))
        for vx, vy in arr:
            if _pt_on_segments(float(vx), float(vy), other_segs, eps):
                out.append((float(vx), float(vy)))
    return out


def _pt_loc_areal(x: float, y: float, polys, ring_segs, eps: float) -> str:
    if _pt_on_segments(x, y, ring_segs, eps):
        return "on"
    for poly in polys:
        if _point_in_polygon(x, y, poly.parts) != 0:
            return "in"
    return "out"


def _ring_arrays(polys) -> list[np.ndarray]:
    return [np.asarray(r, dtype=np.float64) for p in polys for r in p.parts]


def _lines_geom(arrays) -> Geometry:
    legs = [Geometry("LineString", a) for a in arrays]
    return legs[0] if len(legs) == 1 else Geometry("MultiLineString", legs)


def _relate_AA(a_polys, b_polys, eps: float) -> list[int]:
    from xcube_geodb_spark.geometry.overlay import overlay

    ap, bp = _poly_geom(a_polys), _poly_geom(b_polys)
    a_rings, b_rings = _ring_arrays(a_polys), _ring_arrays(b_polys)
    a_segs = _all_segments(ap)
    b_segs = _all_segments(bp)

    inter = overlay(ap, bp, "intersection")
    # min-anchored: the shared-interior area is bounded by the smaller polygon
    tol = max(_REL_EPS * min(area(ap), area(bp)), eps * eps)
    ii = 2 if inter is not None and area(inter) > tol else -1

    def rings_inside(rings, polys, ring_segs_other, other_segs):
        for mx, my in _pieces_midpoints(rings, other_segs, eps):
            if _pt_loc_areal(mx, my, polys, ring_segs_other, eps) == "in":
                return 1
        return -1

    ib = rings_inside(b_rings, a_polys, a_segs, a_segs)
    bi = rings_inside(a_rings, b_polys, b_segs, b_segs)
    ie = -1 if _covered(ap, bp, eps) else 2
    ei = -1 if _covered(bp, ap, eps) else 2

    # BB: collinear shared ring pieces -> 1; any ring contact -> 0
    bb = -1
    for mx, my in _pieces_midpoints(a_rings, b_segs, eps):
        if _pt_on_segments(mx, my, b_segs, eps):
            bb = 1
            break
    if bb < 0 and distance(_lines_geom(a_rings), _lines_geom(b_rings)) <= eps:
        bb = 0

    def rings_escape(rings, polys_other, other_segs):
        for mx, my in _pieces_midpoints(rings, other_segs, eps):
            if _pt_loc_areal(mx, my, polys_other, other_segs, eps) == "out":
                return 1
        return -1

    be = rings_escape(a_rings, b_polys, b_segs)
    eb = rings_escape(b_rings, a_polys, a_segs)
    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _relate_LA(a_lines, b_polys, eps: float) -> list[int]:
    """a = lineal, b = areal; returns a's-perspective matrix."""
    bp = _poly_geom(b_polys)
    b_segs = _all_segments(bp)
    a_arrays = [ln.parts for ln in a_lines]
    a_segs = _all_segments(_lines_geom(a_arrays))
    bpts = [pt for ln in a_lines for pt in _line_boundary(ln)]

    ii = 1 if any(
        _line_hits_polygon_interior(ln, b_polys, eps) for ln in a_lines
    ) else -1

    # IB: collinear pieces of a on b's rings -> 1; else interior-of-a
    # meet points with the rings -> 0
    ib = -1
    for mx, my in _pieces_midpoints(a_arrays, b_segs, eps):
        if _pt_on_segments(mx, my, b_segs, eps):
            ib = 1
            break
    if ib < 0:
        for mx, my in _meet_events(a_arrays, b_segs, eps):
            if all(math.hypot(mx - ex, my - ey) > eps for ex, ey in bpts):
                ib = 0
                break

    ie = -1
    for mx, my in _pieces_midpoints(a_arrays, b_segs, eps):
        if _pt_loc_areal(mx, my, b_polys, b_segs, eps) == "out":
            ie = 1
            break

    bi = bb = be = -1
    for ex, ey in bpts:
        loc = _pt_loc_areal(ex, ey, b_polys, b_segs, eps)
        if loc == "in":
            bi = 0
        elif loc == "on":
            bb = 0
        else:
            be = 0

    # EB: pieces of b's rings not on closure(a)
    eb = -1
    b_rings = _ring_arrays(b_polys)
    for mx, my in _pieces_midpoints(b_rings, a_segs, eps):
        if not _pt_on_segments(mx, my, a_segs, eps):
            eb = 1
            break
    return [ii, ib, ie, bi, bb, be, 2, eb, 2]


def _relate_PA(a_pts, b_polys, eps: float) -> list[int]:
    b_segs = _all_segments(_poly_geom(b_polys))
    ii = ib = ie = -1
    for p in a_pts:
        loc = _pt_loc_areal(
            float(p.parts[0]), float(p.parts[1]), b_polys, b_segs, eps
        )
        if loc == "in":
            ii = 0
        elif loc == "on":
            ib = 0
        else:
            ie = 0
    return [ii, ib, ie, -1, -1, -1, 2, 1, 2]


def _relate_LL(a_lines, b_lines, eps: float) -> list[int]:
    a_arrays = [ln.parts for ln in a_lines]
    b_arrays = [ln.parts for ln in b_lines]
    a_segs = _all_segments(_lines_geom(a_arrays))
    b_segs = _all_segments(_lines_geom(b_arrays))
    a_bnd = [pt for ln in a_lines for pt in _line_boundary(ln)]
    b_bnd = [pt for ln in b_lines for pt in _line_boundary(ln)]

    ii = -1
    for la in a_lines:
        sa = _all_segments(la)
        for lb in b_lines:
            d = _line_line_interior_dim(la, sa, lb, _all_segments(lb), eps)
            ii = max(ii, d)
        if ii >= 1:
            break

    def pt_interior_of(pt, lines):
        x, y = pt
        return any(
            _pt_interior_of_line(x, y, ln, _all_segments(ln), eps)
            for ln in lines
        )

    ib = 0 if any(pt_interior_of(p, a_lines) for p in b_bnd) else -1
    bi = 0 if any(pt_interior_of(p, b_lines) for p in a_bnd) else -1
    bb = 0 if any(
        math.hypot(ax - bx, ay - by) <= eps
        for ax, ay in a_bnd for bx, by in b_bnd
    ) else -1
    be = 0 if any(
        not _pt_on_segments(x, y, b_segs, eps) for x, y in a_bnd
    ) else -1
    eb = 0 if any(
        not _pt_on_segments(x, y, a_segs, eps) for x, y in b_bnd
    ) else -1

    def escapes(arrays, other_segs):
        for mx, my in _pieces_midpoints(arrays, other_segs, eps):
            if not _pt_on_segments(mx, my, other_segs, eps):
                return 1
        return -1

    ie = escapes(a_arrays, b_segs)
    ei = escapes(b_arrays, a_segs)
    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _relate_PL(a_pts, b_lines, eps: float) -> list[int]:
    b_bnd = [pt for ln in b_lines for pt in _line_boundary(ln)]
    b_lines_segs = [(ln, _all_segments(ln)) for ln in b_lines]
    ii = ib = ie = -1
    covered_bnd = set()
    for p in a_pts:
        x, y = float(p.parts[0]), float(p.parts[1])
        on_bnd = [
            i for i, (ex, ey) in enumerate(b_bnd)
            if math.hypot(x - ex, y - ey) <= eps
        ]
        if on_bnd:
            ib = 0
            covered_bnd.update(on_bnd)
        elif any(
            _pt_on_segments(x, y, segs, eps) for _, segs in b_lines_segs
        ):
            ii = 0
        else:
            ie = 0
    eb = 0 if len(covered_bnd) < len(b_bnd) else -1
    return [ii, ib, ie, -1, -1, -1, 1, eb, 2]


def _relate_PP(a_pts, b_pts, eps: float) -> list[int]:
    def key(p):
        return (float(p.parts[0]), float(p.parts[1]))

    ii = ie = ei = -1
    for p in a_pts:
        x, y = key(p)
        if any(math.hypot(x - qx, y - qy) <= eps
               for qx, qy in map(key, b_pts)):
            ii = 0
        else:
            ie = 0
    for q in b_pts:
        x, y = key(q)
        if not any(math.hypot(x - px, y - py) <= eps
                   for px, py in map(key, a_pts)):
            ei = 0
    return [ii, -1, ie, -1, -1, -1, ei, -1, 2]


def relate_matrix(a: Geometry, b: Geometry) -> str:
    """The DE-9IM intersection matrix of two single-type geometries as a
    9-character string (``ST_Relate(a, b)``)."""
    eps = _scale_eps(a, b)
    a_pts, a_lines, a_polys = _split_leaves(a)
    b_pts, b_lines, b_polys = _split_leaves(b)
    ta = _only_type(a_pts, a_lines, a_polys, "left")
    tb = _only_type(b_pts, b_lines, b_polys, "right")

    if (ta, tb) == ("A", "A"):
        cells = _relate_AA(a_polys, b_polys, eps)
    elif (ta, tb) == ("L", "A"):
        cells = _relate_LA(a_lines, b_polys, eps)
    elif (ta, tb) == ("A", "L"):
        cells = [_relate_LA(b_lines, a_polys, eps)[i] for i in _TRANSPOSE]
    elif (ta, tb) == ("P", "A"):
        cells = _relate_PA(a_pts, b_polys, eps)
    elif (ta, tb) == ("A", "P"):
        cells = [_relate_PA(b_pts, a_polys, eps)[i] for i in _TRANSPOSE]
    elif (ta, tb) == ("L", "L"):
        cells = _relate_LL(a_lines, b_lines, eps)
    elif (ta, tb) == ("P", "L"):
        cells = _relate_PL(a_pts, b_lines, eps)
    elif (ta, tb) == ("L", "P"):
        cells = [_relate_PL(b_pts, a_lines, eps)[i] for i in _TRANSPOSE]
    else:
        cells = _relate_PP(a_pts, b_pts, eps)
    return "".join(_dim_char(d) for d in cells)


def de9im_match(matrix: str, pattern: str) -> bool:
    """PostGIS 3-argument ``ST_Relate(a, b, pattern)``: T = any non-F,
    F = F, * = anything, 0/1/2 = exact dimension."""
    if len(pattern) != 9:
        raise GeoDBError("st_relate: pattern must be 9 characters")
    for m, p in zip(matrix, pattern.upper()):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif m != p:
            return False
    return True
