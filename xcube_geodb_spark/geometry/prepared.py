"""Prepared (struct-column) geometries for the st_* SQL surface.

``st_prepare(geometry)`` parses WKB ONCE into a flattened-arrays struct
that crosses UDF boundaries as Arrow columns. Every registered st_*
function then accepts the struct anywhere a geometry argument is
expected (sqlfuncs._vec detects the struct batch and bridges), so a
chained expression like::

    SELECT st_area(st_intersection(g, st_makeenvelope(...))),
           st_astext(st_centroid(g))
    FROM (SELECT st_prepare(geometry) AS g FROM t)

parses each WKB exactly once instead of once per st_* call, and the hot
terminal kernels (area / perimeter / length / envelope bounds /
box predicates / centroid / rect clip) run numpy-VECTORIZED over the
whole Arrow batch — no per-row Python in the common case.

Why a struct and not the WKB cache alone: the LRU in
geom.parse_wkb_cached already de-duplicates parses within a worker, but
every st_* call still pays per-row Python dispatch plus bytes hashing,
and every constructive st_* output re-serializes. The struct keeps the
coordinates as Arrow double arrays end to end — the batch enters numpy
without any per-row decode — which is the same reason columnar geometry
formats (GeoArrow) exist.

Representation (PREP_SCHEMA):

- ``kind``: WKB type code 1-6 (GeometryCollection is rejected —
  heterogeneous children cannot flatten into one offsets family).
- ``rp``: rings per part (polygons); 1 per part for points/lines.
- ``pn``: points per ring, flattened across parts in order.
- ``xs`` / ``ys``: all coordinates, flattened in the same order.

Scale shape: a prepared column is ordinary columnar data — it shuffles,
spills, and prunes like any other struct column; nothing here is
driver-side.
"""

from __future__ import annotations

import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.geometry.geom import (
    Geometry,
    _CODE_BY_KIND,
    _KIND_BY_CODE,
    parse_wkb_cached,
    to_wkb_seeded,
)

PREP_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType()),
        T.StructField("srid", T.IntegerType()),
        T.StructField("rp", T.ArrayType(T.IntegerType())),
        T.StructField("pn", T.ArrayType(T.IntegerType())),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ]
)


def _isna(v) -> bool:
    return v is None or v is pd.NA or (isinstance(v, float) and v != v)


# ---------------------------------------------------------------------------
# Geometry <-> struct row
# ---------------------------------------------------------------------------


def geom_to_row(g: Geometry) -> dict:
    kind = g.kind
    if kind == "GeometryCollection":
        raise GeoDBError(
            "st_prepare does not support GeometryCollection (heterogeneous "
            "children; pass the collection as WKB instead)"
        )
    rp: list[int] = []
    pn: list[int] = []
    chunks_x: list[np.ndarray] = []
    chunks_y: list[np.ndarray] = []

    def _leaf(leaf: Geometry) -> None:
        if leaf.kind == "Point":
            rp.append(1)
            pn.append(1)
            chunks_x.append(np.asarray(leaf.parts[:1], dtype=np.float64))
            chunks_y.append(np.asarray(leaf.parts[1:2], dtype=np.float64))
        elif leaf.kind == "LineString":
            rp.append(1)
            pn.append(len(leaf.parts))
            arr = np.asarray(leaf.parts, dtype=np.float64)
            chunks_x.append(arr[:, 0])
            chunks_y.append(arr[:, 1])
        else:  # Polygon
            rp.append(len(leaf.parts))
            for ring in leaf.parts:
                pn.append(len(ring))
                arr = np.asarray(ring, dtype=np.float64)
                chunks_x.append(arr[:, 0])
                chunks_y.append(arr[:, 1])

    for leaf in g.children():
        _leaf(leaf)
    return {
        "kind": _CODE_BY_KIND[kind],
        "srid": int(g.srid or 0),
        "rp": rp,
        "pn": pn,
        "xs": np.concatenate(chunks_x) if chunks_x else np.empty(0),
        "ys": np.concatenate(chunks_y) if chunks_y else np.empty(0),
    }


def row_to_geom(kind, srid, rp, pn, xs, ys) -> Geometry:
    kind = int(kind)
    name = _KIND_BY_CODE[kind]
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    pn = [int(v) for v in pn]
    rp = [int(v) for v in rp]
    srid = int(srid or 0)
    pos = 0
    ring_arrays: list[np.ndarray] = []
    for n in pn:
        ring_arrays.append(
            np.column_stack((xs[pos: pos + n], ys[pos: pos + n]))
        )
        pos += n
    if name == "Point":
        return Geometry("Point", ring_arrays[0][0], srid)
    if name == "LineString":
        return Geometry("LineString", ring_arrays[0], srid)
    if name == "Polygon":
        return Geometry("Polygon", ring_arrays, srid)
    # multis: slice rings per part
    parts: list[Geometry] = []
    r = 0
    for nrings in rp:
        rings = ring_arrays[r: r + nrings]
        r += nrings
        if name == "MultiPoint":
            parts.append(Geometry("Point", rings[0][0], srid))
        elif name == "MultiLineString":
            parts.append(Geometry("LineString", rings[0], srid))
        else:  # MultiPolygon
            parts.append(Geometry("Polygon", rings, srid))
    return Geometry(name, parts, srid)


def prep_to_geoms(pdf: pd.DataFrame) -> list:
    """Struct batch -> list[Geometry | None] (None for null rows)."""
    out = []
    for kind, srid, rp, pn, xs, ys in zip(
        pdf["kind"], pdf["srid"], pdf["rp"], pdf["pn"], pdf["xs"], pdf["ys"]
    ):
        out.append(
            None if _isna(kind) else row_to_geom(kind, srid, rp, pn, xs, ys)
        )
    return out


def prep_to_wkb_list(pdf: pd.DataFrame) -> list:
    """Struct batch -> list[bytes | None], SEEDING the parse cache so the
    downstream scalar kernel's parse is a dict hit — this is the generic
    bridge that makes every registered st_* function prepared-aware."""
    out = []
    for g in prep_to_geoms(pdf):
        out.append(None if g is None else to_wkb_seeded(g))
    return out


# ---------------------------------------------------------------------------
# st_prepare batch builder
# ---------------------------------------------------------------------------

_EMPTY_ROW = {
    "kind": None, "srid": None, "rp": None, "pn": None, "xs": None,
    "ys": None,
}


def _uniform_decode(vals: list) -> pd.DataFrame | None:
    """Vectorized decode when every WKB in the batch shares one layout
    (same length + identical header bytes, little-endian, simple kind) —
    the common shape for machine-generated geometry columns (all points,
    or all single-ring polygons of equal vertex count). One frombuffer
    and two strided views replace len(batch) parses."""
    n = len(vals)
    if n == 0 or vals[0] is None:
        return None
    L = len(vals[0])
    for v in vals:
        if v is None or len(v) != L:
            return None
    raw = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(n, L)
    if raw[0, 0] != 1:  # big-endian: rare, leave to the row path
        return None
    code = int.from_bytes(bytes(raw[0, 1:5]), "little")
    if code == 1 and L == 21:
        hdr, npts = 5, 1
    elif code == 2 and L >= 9:
        hdr = 9
        # the DECLARED count must match the 2-D byte budget: a 3-D
        # linestring of even length would otherwise misdecode (L-9 is
        # divisible by 16 whenever n*24 is)
        npts = int.from_bytes(bytes(raw[0, 5:9]), "little")
    elif code == 3 and L >= 13:
        if int.from_bytes(bytes(raw[0, 5:9]), "little") != 1:
            return None  # multi-ring: row path
        hdr = 13
        npts = int.from_bytes(bytes(raw[0, 9:13]), "little")
    else:
        return None
    if not (raw[:, :hdr] == raw[0, :hdr]).all():
        return None
    if hdr + npts * 16 != L or npts < 1:
        return None
    coords = (
        np.ascontiguousarray(raw[:, hdr:]).view("<f8").reshape(n, npts, 2)
    )
    xs = coords[:, :, 0]
    ys = coords[:, :, 1]
    pn_val = [npts]
    return pd.DataFrame(
        {
            "kind": np.full(n, code, dtype=np.int32),
            "srid": np.zeros(n, dtype=np.int32),
            "rp": [[1]] * n,
            "pn": [pn_val] * n,
            "xs": list(xs),
            "ys": list(ys),
        }
    )


def prepare_series(col: pd.Series) -> pd.DataFrame:
    vals = [
        None if v is None else (v if isinstance(v, bytes) else bytes(v))
        for v in col.tolist()
    ]
    fast = _uniform_decode(vals)
    if fast is not None:
        return fast
    rows = []
    for v in vals:
        rows.append(_EMPTY_ROW if v is None else geom_to_row(
            parse_wkb_cached(v)
        ))
    return pd.DataFrame(rows, columns=list(_EMPTY_ROW))


# ---------------------------------------------------------------------------
# flattened batch view + vectorized kernels
# ---------------------------------------------------------------------------


class _Flat:
    """One batch flattened to global arrays + offsets. Sentinel element
    appended so reduceat indices are always in-bounds."""

    __slots__ = (
        "n", "valid", "kind", "x", "y", "ring_start", "ring_len",
        "row_ring_start", "row_nrings", "row_pt_start", "row_npts",
        "shell",
    )

    def __init__(self, pdf: pd.DataFrame):
        kinds = pdf["kind"].tolist()
        self.n = len(kinds)
        self.valid = np.array([not _isna(k) for k in kinds], dtype=bool)
        self.kind = np.array(
            [0 if _isna(k) else int(k) for k in kinds], dtype=np.int32
        )
        xs_l, ys_l, pn_l, shell_l = [], [], [], []
        row_nrings = np.zeros(self.n, dtype=np.int64)
        row_npts = np.zeros(self.n, dtype=np.int64)
        for i, (ok, rp, pn, xs, ys) in enumerate(
            zip(self.valid, pdf["rp"], pdf["pn"], pdf["xs"], pdf["ys"])
        ):
            if not ok:
                continue
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            xs_l.append(xs)
            ys_l.append(ys)
            pn_i = np.asarray(pn, dtype=np.int64)
            pn_l.append(pn_i)
            row_nrings[i] = len(pn_i)
            row_npts[i] = len(xs)
            for nr in rp:
                shell_l.append(True)
                shell_l.extend([False] * (int(nr) - 1))
        self.x = np.concatenate(xs_l) if xs_l else np.empty(0)
        self.y = np.concatenate(ys_l) if ys_l else np.empty(0)
        ring_len = (
            np.concatenate(pn_l) if pn_l else np.empty(0, dtype=np.int64)
        )
        self.ring_len = ring_len
        self.ring_start = np.concatenate(
            ([0], np.cumsum(ring_len)[:-1])
        ).astype(np.int64) if len(ring_len) else np.empty(0, dtype=np.int64)
        self.row_nrings = row_nrings
        self.row_ring_start = np.concatenate(
            ([0], np.cumsum(row_nrings)[:-1])
        ).astype(np.int64)
        self.row_npts = row_npts
        self.row_pt_start = np.concatenate(
            ([0], np.cumsum(row_npts)[:-1])
        ).astype(np.int64)
        self.shell = np.array(shell_l, dtype=bool) if shell_l else np.empty(
            0, dtype=bool
        )

    def _per_ring_sum(self, pairvals: np.ndarray) -> np.ndarray:
        """Sum a per-pair array (len == len(x), sentinel-padded) over each
        ring's OWN pairs [start, start+len-1) — alternating reduceat
        segments so every segment has exactly the scalar kernel's length
        (len-1 pairs), which keeps numpy's pairwise summation tree — and
        therefore the rounding — identical to geom._seq_sum on a single
        ring."""
        ns = len(self.ring_start)
        if ns == 0:
            return np.empty(0)
        ends = self.ring_start + self.ring_len - 1
        idx = np.empty(2 * ns, dtype=np.intp)
        idx[0::2] = self.ring_start
        idx[1::2] = ends
        sums = np.add.reduceat(pairvals, idx)[0::2]
        # L==1 rings have no pairs; reduceat's empty-segment quirk
        # returns a[start] — force the true empty sum
        return np.where(self.ring_len > 1, sums, 0.0)

    def _rows_from_rings(self, per_ring: np.ndarray) -> np.ndarray:
        """Per-row accumulation of per-ring contributions in STRICTLY
        sequential order — the scalar kernels accumulate `total += term`
        ring by ring, and pairwise summation would round differently
        beyond 8 rings."""
        out = np.zeros(self.n)
        if len(per_ring) == 0:
            return out
        vals = per_ring.tolist()
        pos = 0
        nr = self.row_nrings
        for i in range(self.n):
            k = int(nr[i])
            acc = 0.0
            for j in range(pos, pos + k):
                acc += vals[j]
            out[i] = acc
            pos += k
        return out

    def ring_shoelace(self) -> np.ndarray:
        """Signed 2*area per ring (wrap pair included, so open rings work
        like the scalar kernel's np.roll formulation)."""
        x, y = self.x, self.y
        if len(x) == 0:
            return np.empty(0)
        cross = np.empty(len(x))
        cross[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
        cross[-1] = 0.0
        ends = self.ring_start + self.ring_len - 1
        cross[ends] = 0.0  # zero the pair that crosses into the next ring
        s = self._per_ring_sum(cross)
        # wrap pair: last point -> first point of each ring
        s += x[ends] * y[self.ring_start] - x[self.ring_start] * y[ends]
        return s

    def seg_length(self) -> np.ndarray:
        """Per-ring polyline length (no wrap; rings arrive closed)."""
        x, y = self.x, self.y
        if len(x) == 0:
            return np.empty(0)
        d = np.empty(len(x))
        d[:-1] = np.hypot(x[1:] - x[:-1], y[1:] - y[:-1])
        d[-1] = 0.0
        ends = self.ring_start + self.ring_len - 1
        d[ends] = 0.0
        return self._per_ring_sum(d)

    def envelopes(self) -> tuple[np.ndarray, ...]:
        """Per-row (xmin, ymin, xmax, ymax); nan for invalid rows."""
        out = [np.full(self.n, np.nan) for _ in range(4)]
        if len(self.x) == 0:
            return tuple(out)
        # reduceat indices must come from rows that actually own points:
        # a zero-point row's start equals the NEXT row's start (or len(x)
        # for trailing rows), and clamping it in-bounds would split — and
        # truncate — the preceding valid row's segment.
        has = self.row_npts > 0
        starts = self.row_pt_start[has]
        xmin = np.minimum.reduceat(self.x, starts)
        xmax = np.maximum.reduceat(self.x, starts)
        ymin = np.minimum.reduceat(self.y, starts)
        ymax = np.maximum.reduceat(self.y, starts)
        for o, v in zip(out, (xmin, ymin, xmax, ymax)):
            o[has] = v
        return tuple(out)


_POLY_KINDS = (3, 6)
_LINE_KINDS = (2, 5)


def v_area(pdf: pd.DataFrame) -> pd.Series:
    f = _Flat(pdf)
    s = f.ring_shoelace()
    contrib = np.abs(s) / 2.0 * np.where(f.shell, 1.0, -1.0)
    rows = f._rows_from_rings(contrib)
    rows[~np.isin(f.kind, _POLY_KINDS)] = 0.0
    return pd.Series(np.where(f.valid, rows, np.nan), dtype="float64")


def v_perimeter(pdf: pd.DataFrame) -> pd.Series:
    f = _Flat(pdf)
    rows = f._rows_from_rings(f.seg_length())
    rows[~np.isin(f.kind, _POLY_KINDS)] = 0.0
    return pd.Series(np.where(f.valid, rows, np.nan), dtype="float64")


def v_length(pdf: pd.DataFrame) -> pd.Series:
    f = _Flat(pdf)
    rows = f._rows_from_rings(f.seg_length())
    rows[~np.isin(f.kind, _LINE_KINDS)] = 0.0
    return pd.Series(np.where(f.valid, rows, np.nan), dtype="float64")


def v_envelope_bound(pdf: pd.DataFrame, which: int) -> pd.Series:
    f = _Flat(pdf)
    return pd.Series(f.envelopes()[which], dtype="float64")


def v_box_predicate(mode: str, box, pdf: pd.DataFrame) -> pd.Series | None:
    """Vectorized bbox-vs-geometry predicate for the envelope-decidable
    modes; rows the envelope cannot decide fall back to the exact scalar
    kernel (tiny fraction on real data). Returns None when the mode has
    no envelope shortcut — caller bridges everything."""
    if mode not in ("intersects", "disjoint", "within"):
        return None
    from xcube_geodb_spark.geometry.predicates import bbox_predicate

    f = _Flat(pdf)
    bxmin, bymin, bxmax, bymax = box
    xmin, ymin, xmax, ymax = f.envelopes()
    env_disjoint = (
        (xmax < bxmin) | (xmin > bxmax) | (ymax < bymin) | (ymin > bymax)
    )
    env_inside = (
        (xmin >= bxmin) & (xmax <= bxmax) & (ymin >= bymin) & (ymax <= bymax)
    )
    if mode == "intersects":
        res = np.where(env_disjoint, False, np.where(env_inside, True, False))
        undecided = ~env_disjoint & ~env_inside
    elif mode == "disjoint":
        res = np.where(env_disjoint, True, np.where(env_inside, False, True))
        undecided = ~env_disjoint & ~env_inside
    else:  # within: env inside is necessary; env not inside -> False
        res = np.zeros(f.n, dtype=bool)
        undecided = env_inside & f.valid
    und_idx = np.flatnonzero(undecided & f.valid)
    if len(und_idx):
        sub = pdf.iloc[und_idx]
        for j, g in zip(und_idx, prep_to_geoms(sub)):
            res[j] = bbox_predicate(mode, g, box)
    # null geometry -> False (matches the scalar _pred contract)
    res = np.where(f.valid, res, False)
    return pd.Series(list(res), dtype="object")


def v_centroid_wkb(pdf: pd.DataFrame) -> pd.Series:
    """Per-row centroid as a 21-byte WKB point. Polygon rows are
    vectorized with EXACTLY the scalar kernel's summation order
    (geom._ring_centroid_terms documents the contract: in-ring pairs
    left to right via reduceat, wrap pair added last, per-ring /6 before
    the cross-ring sum), so the bytes are bit-identical to the WKB path.
    Non-polygon and zero-area rows run the scalar kernel; every output
    seeds the parse cache for the chained consumer (st_astext/st_x)."""
    from xcube_geodb_spark.geometry.geom import centroid as _centroid

    f = _Flat(pdf)
    n_all = f.n
    out: list = [None] * n_all
    x, y = f.x, f.y
    if len(x):
        ends = f.ring_start + f.ring_len - 1
        first = f.ring_start
        cross = np.empty(len(x))
        cross[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
        cross[-1] = 0.0
        cross[ends] = 0.0
        wrap = x[ends] * y[first] - x[first] * y[ends]
        s = f._per_ring_sum(cross) + wrap

        tx = np.empty(len(x))
        tx[:-1] = (x[:-1] + x[1:]) * cross[:-1]
        tx[-1] = 0.0
        cx6 = f._per_ring_sum(tx) + (x[ends] + x[first]) * wrap
        ty = np.empty(len(x))
        ty[:-1] = (y[:-1] + y[1:]) * cross[:-1]
        ty[-1] = 0.0
        cy6 = f._per_ring_sum(ty) + (y[ends] + y[first]) * wrap

        ring_sgn = np.where(f.shell, 1.0, -1.0)
        orient = np.where(s >= 0, 1.0, -1.0)
        live = s != 0.0
        a_r = np.where(live, np.abs(s) / 2.0 * ring_sgn, 0.0)
        ax_r = np.where(live, (cx6 / 6.0) * orient * ring_sgn, 0.0)
        ay_r = np.where(live, (cy6 / 6.0) * orient * ring_sgn, 0.0)
        a_sum = f._rows_from_rings(a_r)
        ax = f._rows_from_rings(ax_r)
        ay = f._rows_from_rings(ay_r)
    else:
        a_sum = ax = ay = np.zeros(n_all)
    poly = np.isin(f.kind, _POLY_KINDS) & (a_sum != 0.0) & f.valid
    hdr = b"\x01\x01\x00\x00\x00"
    pack = _struct.pack
    for i in np.flatnonzero(poly):
        px, py = ax[i] / a_sum[i], ay[i] / a_sum[i]
        out[i] = to_wkb_seeded(
            Geometry("Point", np.array((px, py))),
            wkb=hdr + pack("<2d", px, py),
        )
    rest = np.flatnonzero(f.valid & ~poly)
    if len(rest):
        for i, g in zip(rest, prep_to_geoms(pdf.iloc[rest])):
            out[i] = to_wkb_seeded(
                Geometry("Point", np.array(_centroid(g)))
            )
    return pd.Series(out, dtype="object")


def v_clip_rect_wkb(pdf: pd.DataFrame, box) -> pd.Series:
    """st_intersection(prepared, constant-rectangle) without the WKB
    round trip: rows whose envelope lies inside the box pass through
    (serialize only), envelope-disjoint rows are NULL (empty
    intersection, the scalar kernel's contract), and only the
    boundary-straddling remainder runs the per-row clip kernel. Outputs
    seed the parse cache for the chained consumer (e.g. st_area)."""
    from xcube_geodb_spark.geometry.geom import clip_by_box

    f = _Flat(pdf)
    bxmin, bymin, bxmax, bymax = box
    xmin, ymin, xmax, ymax = f.envelopes()
    inside = (
        (xmin >= bxmin) & (xmax <= bxmax) & (ymin >= bymin) & (ymax <= bymax)
        & f.valid
    )
    disjoint = (
        ((xmax < bxmin) | (xmin > bxmax) | (ymax < bymin) | (ymin > bymax))
        & f.valid
    )
    out: list = [None] * f.n
    idx_in = np.flatnonzero(inside)
    if len(idx_in):
        for i, g in zip(idx_in, prep_to_geoms(pdf.iloc[idx_in])):
            out[i] = to_wkb_seeded(g)
    rest = np.flatnonzero(f.valid & ~inside & ~disjoint)
    if len(rest):
        for i, g in zip(rest, prep_to_geoms(pdf.iloc[rest])):
            clipped = clip_by_box(g, box)
            out[i] = None if clipped is None else to_wkb_seeded(clipped)
    return pd.Series(out, dtype="object")
