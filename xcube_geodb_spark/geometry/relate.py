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
            tol = _REL_EPS * max(area(ap), area(bp), 1.0)
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
