"""Geometry model + WKB/EWKB/WKT/GeoJSON codecs (pure Python + numpy).

Wire-format parity with the reference:

- PostgREST returns geometries as hex-encoded EWKB which the reference
  client decodes with ``shapely.wkb.loads(hex=True)``
  (``xcube_geodb/core/geodb.py:2148``) or as GeoJSON dicts
  (``geodb.py:2144-2146``).
- Inserts attach ``SRID=<srid>;<WKT>`` strings
  (``xcube_geodb/core/geodb.py:1401-1425``).

This module supports all of those forms, 2D coordinates (Z/M are parsed
and dropped), both byte orders, and the EWKB SRID flag.
"""

from __future__ import annotations

import math
import re
import struct
from typing import Iterator

import numpy as np

from xcube_geodb_spark.errors import GeoDBError

# WKB geometry type codes (ISO); EWKB adds flag bits.
_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_COLLECTION = 7

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

_KIND_BY_CODE = {
    _WKB_POINT: "Point",
    _WKB_LINESTRING: "LineString",
    _WKB_POLYGON: "Polygon",
    _WKB_MULTIPOINT: "MultiPoint",
    _WKB_MULTILINESTRING: "MultiLineString",
    _WKB_MULTIPOLYGON: "MultiPolygon",
    _WKB_COLLECTION: "GeometryCollection",
}
_CODE_BY_KIND = {v: k for k, v in _KIND_BY_CODE.items()}

# kinds whose `parts` is a list of child Geometry objects
_MULTI_KINDS = frozenset(
    {"MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"}
)

_DIM_BY_KIND = {
    "Point": 0,
    "MultiPoint": 0,
    "LineString": 1,
    "MultiLineString": 1,
    "Polygon": 2,
    "MultiPolygon": 2,
}


class Geometry:
    """A parsed geometry.

    ``kind``: one of Point/LineString/Polygon/Multi*/GeometryCollection.
    ``parts``:
      - Point       -> ndarray shape (2,)
      - LineString  -> ndarray shape (n, 2)
      - Polygon     -> list[ndarray (n, 2)]  (first ring outer, rest holes)
      - Multi*/GeometryCollection -> list[Geometry]
    ``srid``: EWKB SRID if present, else 0.
    """

    __slots__ = ("kind", "parts", "srid")

    def __init__(self, kind: str, parts, srid: int = 0):
        self.kind = kind
        self.parts = parts
        self.srid = srid

    def __repr__(self) -> str:  # pragma: no cover
        return f"Geometry({to_wkt(self)!r}, srid={self.srid})"

    def __eq__(self, other) -> bool:
        if not isinstance(other, Geometry):
            return NotImplemented
        return to_wkt(self) == to_wkt(other)

    def __hash__(self) -> int:
        return hash(to_wkt(self))

    @property
    def dimension(self) -> int:
        if self.kind == "GeometryCollection":
            return max((g.dimension for g in self.parts), default=0)
        return _DIM_BY_KIND[self.kind]

    def children(self) -> Iterator["Geometry"]:
        """Iterate leaf (non-multi) geometries."""
        if self.kind in _MULTI_KINDS:
            for child in self.parts:
                yield from child.children()
        else:
            yield self


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> Geometry:
        byte_order = self.buf[self.pos]
        self.pos += 1
        endian = "<" if byte_order == 1 else ">"
        (raw_type,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4

        srid = 0
        ndims = 2
        type_code = raw_type
        if raw_type & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flags
            if raw_type & _EWKB_SRID:
                (srid,) = struct.unpack_from(endian + "I", self.buf, self.pos)
                self.pos += 4
            ndims = 2 + bool(raw_type & _EWKB_Z) + bool(raw_type & _EWKB_M)
            type_code = raw_type & 0xFF
        elif raw_type >= 1000:  # ISO WKB: 1000=Z, 2000=M, 3000=ZM
            iso = raw_type // 1000
            ndims = {1: 3, 2: 3, 3: 4}[iso]
            type_code = raw_type % 1000

        kind = _KIND_BY_CODE.get(type_code)
        if kind is None:
            raise GeoDBError(f"Unsupported WKB geometry type code: {raw_type}")

        if kind == "Point":
            parts = self._coords(1, ndims, endian)[0]
        elif kind == "LineString":
            parts = self._linestring(ndims, endian)
        elif kind == "Polygon":
            (nrings,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            parts = [self._linestring(ndims, endian) for _ in range(nrings)]
        else:  # multi / collection: children carry their own headers
            (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            parts = [self.geometry() for _ in range(n)]
        return Geometry(kind, parts, srid)

    def _linestring(self, ndims: int, endian: str) -> np.ndarray:
        (npoints,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        return self._coords(npoints, ndims, endian)

    def _coords(self, n: int, ndims: int, endian: str) -> np.ndarray:
        nbytes = n * ndims * 8
        dt = np.dtype("<f8" if endian == "<" else ">f8")
        arr = np.frombuffer(self.buf, dtype=dt, count=n * ndims, offset=self.pos)
        self.pos += nbytes
        arr = arr.reshape(n, ndims)
        # explicit copy, never a view: (a) WKB payloads start at odd byte
        # offsets, and numpy's SIMD reductions round differently on
        # unaligned buffers — a copy pins one deterministic result for
        # identical coordinates regardless of buffer offset (the prepared
        # path in geometry/prepared.py relies on this to stay
        # bit-identical with the WKB path); (b) the parse cache shares
        # `parts` across callers, so no ring may alias the input buffer.
        # The copy is then frozen: the cache hands the SAME arrays to
        # every later parse of identical bytes, so an accidental in-place
        # mutation must raise instead of silently poisoning the cache.
        out = arr[:, :2].astype(np.float64, copy=True)
        out.setflags(write=False)
        return out


def parse_wkb(buf: bytes) -> Geometry:
    if not buf:
        raise GeoDBError("Empty WKB buffer")
    return _Reader(bytes(buf)).geometry()


_PARSE_CACHE: "OrderedDict[bytes, Geometry]" = __import__(
    "collections"
).OrderedDict()
_PARSE_CACHE_MAX = 8192


def parse_wkb_cached(buf: bytes) -> Geometry:
    """:func:`parse_wkb` through a bounded per-process LRU keyed by the
    raw WKB bytes. Chained SQL calls — ``st_area(g), st_perimeter(g)`` or
    ``st_area(st_intersection(g, d))`` — re-parse the same buffer once
    per expression; within one Arrow batch (and across the UDFs of one
    projection, which share the Python worker) the repeat parses become
    dict hits. Returns a FRESH ``Geometry`` wrapper per call (kind/parts
    shared, ``srid`` private) so callers that set ``.srid``
    (st_setsrid/st_transform) cannot pollute the cache; kernel code never
    mutates ``parts`` in place (accessors copy)."""
    b = bytes(buf) if not isinstance(buf, bytes) else buf
    g = _PARSE_CACHE.get(b)
    if g is None:
        g = parse_wkb(b)
        _PARSE_CACHE[b] = g
        if len(_PARSE_CACHE) > _PARSE_CACHE_MAX:
            _PARSE_CACHE.popitem(last=False)
    else:
        _PARSE_CACHE.move_to_end(b)
    return Geometry(g.kind, g.parts, g.srid)


def parse_wkb_hex(s: str) -> Geometry:
    return parse_wkb(bytes.fromhex(s))


def to_wkb_seeded(
    geom: Geometry, srid: int | None = None, wkb: bytes | None = None
) -> bytes:
    """:func:`to_wkb` that also SEEDS the parse cache with the geometry it
    just serialized. Constructive st_* kernels (intersection, centroid,
    buffer, ...) emit WKB that the next call in a chained expression
    immediately re-parses — chained Python UDFs evaluate inside one
    worker, so seeding turns that re-parse into a dict hit. ``wkb`` may
    be supplied when the caller already built the buffer."""
    if wkb is None:
        wkb = to_wkb(geom, srid=srid)
    use = (srid if srid is not None else geom.srid) or 0
    _PARSE_CACHE[wkb] = Geometry(geom.kind, geom.parts, use)
    if len(_PARSE_CACHE) > _PARSE_CACHE_MAX:
        _PARSE_CACHE.popitem(last=False)
    return wkb


def to_wkb(geom: Geometry, srid: int | None = None, _nested: bool = False) -> bytes:
    """Serialize little-endian; EWKB with SRID when ``srid`` is truthy."""
    out = bytearray()
    out.append(1)
    code = _CODE_BY_KIND[geom.kind]
    use_srid = (srid if srid is not None else geom.srid) or 0
    if use_srid and not _nested:
        out += struct.pack("<I", code | _EWKB_SRID)
        out += struct.pack("<I", use_srid)
    else:
        out += struct.pack("<I", code)

    if geom.kind == "Point":
        out += struct.pack("<2d", float(geom.parts[0]), float(geom.parts[1]))
    elif geom.kind == "LineString":
        out += struct.pack("<I", len(geom.parts))
        out += np.asarray(geom.parts, dtype="<f8").tobytes()
    elif geom.kind == "Polygon":
        out += struct.pack("<I", len(geom.parts))
        for ring in geom.parts:
            out += struct.pack("<I", len(ring))
            out += np.asarray(ring, dtype="<f8").tobytes()
    else:
        out += struct.pack("<I", len(geom.parts))
        for child in geom.parts:
            out += to_wkb(child, srid=0, _nested=True)
    return bytes(out)


def to_wkb_hex(geom: Geometry, srid: int | None = None) -> str:
    return to_wkb(geom, srid=srid).hex().upper()


def geometry_type_wkb(buf: bytes) -> str:
    """PostGIS ``GeometryType(geometry)`` parity: 'POINT', 'MULTIPOLYGON', ...

    Reads only the WKB header (``geodb_geometry_types`` semantics,
    ``xcube_geodb/sql/geodb.sql:460-482``).
    """
    endian = "<" if buf[0] == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", bytes(buf[:5]), 1)
    code = (raw_type & 0xFF) if raw_type & 0xF0000000 else raw_type % 1000
    kind = _KIND_BY_CODE.get(code)
    if kind is None:
        raise GeoDBError(f"Unsupported WKB geometry type code: {raw_type}")
    return kind.upper()


# ---------------------------------------------------------------------------
# WKT / EWKT
# ---------------------------------------------------------------------------

_WKT_HEAD = re.compile(
    r"^\s*(?:SRID=(\d+)\s*;\s*)?([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY|\()", re.IGNORECASE
)


def parse_wkt(text: str) -> Geometry:
    m = _WKT_HEAD.match(text)
    if not m:
        raise GeoDBError(f"Invalid WKT: {text[:80]!r}")
    srid = int(m.group(1)) if m.group(1) else 0
    name = m.group(2).strip().lower()
    kind_map = {k.lower(): k for k in _CODE_BY_KIND}
    kind = kind_map.get(name)
    if kind is None:
        raise GeoDBError(f"Unsupported WKT geometry type: {name!r}")
    if m.group(4).upper() == "EMPTY":
        raise GeoDBError("EMPTY geometries are not supported")
    body = text[m.end() - 1 :]  # from the opening paren
    parts, _ = _parse_wkt_body(kind, body, 0)
    return Geometry(kind, parts, srid)


def _parse_parenthesized(s: str, i: int) -> tuple[str, int]:
    """Return the contents of the balanced paren group starting at s[i]=='('."""
    assert s[i] == "("
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
    raise GeoDBError("Unbalanced parentheses in WKT")


def _coords_from_text(s: str) -> np.ndarray:
    pts = []
    for chunk in s.split(","):
        vals = chunk.split()
        if len(vals) < 2:
            raise GeoDBError(f"Bad WKT coordinate: {chunk!r}")
        pts.append((float(vals[0]), float(vals[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_top_level(s: str) -> list[str]:
    out, depth, start = [], 0, 0
    for j, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:j])
            start = j + 1
    out.append(s[start:])
    return [x.strip() for x in out]


def _parse_wkt_body(kind: str, s: str, i: int):
    inner, end = _parse_parenthesized(s, s.index("(", i))
    if kind == "Point":
        return _coords_from_text(inner)[0], end
    if kind == "LineString":
        return _coords_from_text(inner), end
    if kind == "Polygon":
        rings = [
            _coords_from_text(_parse_parenthesized(part, part.index("("))[0])
            for part in _split_top_level(inner)
        ]
        return rings, end
    if kind == "MultiPoint":
        children = []
        for part in _split_top_level(inner):
            part = part.strip()
            txt = _parse_parenthesized(part, part.index("("))[0] if "(" in part else part
            children.append(Geometry("Point", _coords_from_text(txt)[0]))
        return children, end
    if kind == "MultiLineString":
        children = [
            Geometry(
                "LineString",
                _coords_from_text(_parse_parenthesized(part, part.index("("))[0]),
            )
            for part in _split_top_level(inner)
        ]
        return children, end
    if kind == "MultiPolygon":
        children = []
        for part in _split_top_level(inner):
            rings = [
                _coords_from_text(_parse_parenthesized(rp, rp.index("("))[0])
                for rp in _split_top_level(
                    _parse_parenthesized(part, part.index("("))[0]
                )
            ]
            children.append(Geometry("Polygon", rings))
        return children, end
    if kind == "GeometryCollection":
        children = [parse_wkt(part) for part in _split_top_level(inner)]
        return children, end
    raise GeoDBError(f"Unsupported WKT kind: {kind}")


def _fmt(v: float) -> str:
    if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in np.atleast_2d(arr))


def to_wkt(geom: Geometry) -> str:
    k = geom.kind.upper()
    if geom.kind == "Point":
        return f"POINT ({_fmt(geom.parts[0])} {_fmt(geom.parts[1])})"
    if geom.kind == "LineString":
        return f"LINESTRING ({_fmt_coords(geom.parts)})"
    if geom.kind == "Polygon":
        rings = ", ".join(f"({_fmt_coords(r)})" for r in geom.parts)
        return f"POLYGON ({rings})"
    if geom.kind == "MultiPoint":
        pts = ", ".join(f"({_fmt(g.parts[0])} {_fmt(g.parts[1])})" for g in geom.parts)
        return f"MULTIPOINT ({pts})"
    if geom.kind == "MultiLineString":
        ls = ", ".join(f"({_fmt_coords(g.parts)})" for g in geom.parts)
        return f"MULTILINESTRING ({ls})"
    if geom.kind == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in g.parts) + ")"
            for g in geom.parts
        )
        return f"MULTIPOLYGON ({polys})"
    if geom.kind == "GeometryCollection":
        return f"GEOMETRYCOLLECTION ({', '.join(to_wkt(g) for g in geom.parts)})"
    raise GeoDBError(f"Unsupported kind: {k}")


# ---------------------------------------------------------------------------
# GeoJSON
# ---------------------------------------------------------------------------


def from_geojson(obj: dict) -> Geometry:
    t = obj.get("type")
    c = obj.get("coordinates")
    if t == "Point":
        return Geometry("Point", np.asarray(c[:2], dtype=np.float64))
    if t == "LineString":
        return Geometry("LineString", np.asarray([p[:2] for p in c], dtype=np.float64))
    if t == "Polygon":
        return Geometry(
            "Polygon", [np.asarray([p[:2] for p in r], dtype=np.float64) for r in c]
        )
    if t == "MultiPoint":
        return Geometry(
            "MultiPoint",
            [Geometry("Point", np.asarray(p[:2], dtype=np.float64)) for p in c],
        )
    if t == "MultiLineString":
        return Geometry(
            "MultiLineString",
            [
                Geometry("LineString", np.asarray([p[:2] for p in ls], dtype=np.float64))
                for ls in c
            ],
        )
    if t == "MultiPolygon":
        return Geometry(
            "MultiPolygon",
            [
                Geometry(
                    "Polygon",
                    [np.asarray([p[:2] for p in r], dtype=np.float64) for r in poly],
                )
                for poly in c
            ],
        )
    if t == "GeometryCollection":
        return Geometry(
            "GeometryCollection", [from_geojson(g) for g in obj["geometries"]]
        )
    raise GeoDBError(f"Unsupported GeoJSON type: {t!r}")


def to_geojson(geom: Geometry) -> dict:
    if geom.kind == "Point":
        return {"type": "Point", "coordinates": [float(geom.parts[0]), float(geom.parts[1])]}
    if geom.kind == "LineString":
        return {"type": "LineString", "coordinates": geom.parts.tolist()}
    if geom.kind == "Polygon":
        return {"type": "Polygon", "coordinates": [r.tolist() for r in geom.parts]}
    if geom.kind == "MultiPoint":
        return {
            "type": "MultiPoint",
            "coordinates": [[float(g.parts[0]), float(g.parts[1])] for g in geom.parts],
        }
    if geom.kind == "MultiLineString":
        return {
            "type": "MultiLineString",
            "coordinates": [g.parts.tolist() for g in geom.parts],
        }
    if geom.kind == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in g.parts] for g in geom.parts],
        }
    if geom.kind == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [to_geojson(g) for g in geom.parts],
        }
    raise GeoDBError(f"Unsupported kind: {geom.kind}")


# ---------------------------------------------------------------------------
# Envelope
# ---------------------------------------------------------------------------


def envelope(geom: Geometry) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax)."""
    xmin = ymin = math.inf
    xmax = ymax = -math.inf
    for leaf in geom.children():
        if leaf.kind == "Point":
            x, y = float(leaf.parts[0]), float(leaf.parts[1])
            xmin, ymin = min(xmin, x), min(ymin, y)
            xmax, ymax = max(xmax, x), max(ymax, y)
        else:
            arrays = leaf.parts if leaf.kind == "Polygon" else [leaf.parts]
            for arr in arrays:
                xmin = min(xmin, float(arr[:, 0].min()))
                ymin = min(ymin, float(arr[:, 1].min()))
                xmax = max(xmax, float(arr[:, 0].max()))
                ymax = max(ymax, float(arr[:, 1].max()))
    return xmin, ymin, xmax, ymax


def _ring_shoelace(arr: np.ndarray) -> float:
    """Signed double-area of a ring (positive = counter-clockwise).

    Fixed summation order (in-ring pairs left to right, wrap pair last)
    — the same order np.add.reduceat produces, so the vectorized batch
    kernels in geometry/prepared.py are bit-identical to this one. Do
    not rewrite with np.dot/np.roll: BLAS dot reorders the accumulation."""
    x, y = arr[:, 0], arr[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    wrap = x[-1] * y[0] - x[0] * y[-1]
    return _seq_sum(cross) + wrap


def area(geom: Geometry) -> float:
    """Planar area (PostGIS ``ST_Area`` semantics: polygons contribute,
    holes subtract, points/lines are 0). Cartesian in the collection's
    CRS units, like PostGIS on a non-geography column."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            rings = leaf.parts
            total += abs(_ring_shoelace(rings[0])) / 2.0
            for hole in rings[1:]:
                total -= abs(_ring_shoelace(hole)) / 2.0
    return total


def _line_length(arr: np.ndarray) -> float:
    # sequential sum over CONTIGUOUS 1-D diffs: np.hypot's rounding
    # differs between strided and contiguous SIMD paths, and the
    # prepared-path batch kernel (contiguous flat arrays) must stay
    # bit-identical to this one
    x = np.ascontiguousarray(arr[:, 0])
    y = np.ascontiguousarray(arr[:, 1])
    return _seq_sum(np.hypot(x[1:] - x[:-1], y[1:] - y[:-1]))


def length(geom: Geometry) -> float:
    """``ST_Length``: LineString/MultiLineString length; 0 for points and
    polygons (use :func:`perimeter` for ring length, as PostGIS does)."""
    return sum(
        _line_length(leaf.parts)
        for leaf in geom.children()
        if leaf.kind == "LineString"
    )


def perimeter(geom: Geometry) -> float:
    """``ST_Perimeter``: total ring length of polygons (holes included);
    0 for points and lines. Flat ring-by-ring accumulation (no per-part
    subtotal) so the prepared-path batch kernel rounds identically."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            for r in leaf.parts:
                total += _line_length(r)
    return total


def _ring_centroid_terms(ring: np.ndarray) -> tuple[float, float, float]:
    """(signed 2A, 6*Cx*2A, 6*Cy*2A) for one closed-or-open ring, computed
    in a FIXED summation order (in-ring pairs left to right, wrap pair
    added last). The vectorized batch kernel in geometry/prepared.py
    reproduces exactly this order via np.add.reduceat, so the prepared
    path is bit-identical to the WKB path — do not \"simplify\" back to
    np.roll + .sum(), whose unrolled accumulators round differently."""
    x, y = ring[:, 0], ring[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    wrap = x[-1] * y[0] - x[0] * y[-1]
    s = _seq_sum(cross) + wrap
    cx = _seq_sum((x[:-1] + x[1:]) * cross) + (x[-1] + x[0]) * wrap
    cy = _seq_sum((y[:-1] + y[1:]) * cross) + (y[-1] + y[0]) * wrap
    return s, cx, cy


def _seq_sum(a: np.ndarray) -> float:
    """Float sum in np.add.reduceat's per-segment order (pairwise over
    the segment, independent of the segment's offset in a larger array)
    — the batch kernels in geometry/prepared.py sum ring segments with
    reduceat over flat arrays, and the scalar kernels must round
    identically. ``a`` must be contiguous float64."""
    if not len(a):
        return 0.0
    return float(np.add.reduceat(a, _ZERO_IDX)[0])


_ZERO_IDX = np.zeros(1, dtype=np.intp)


def centroid(geom: Geometry) -> tuple[float, float]:
    """``ST_Centroid`` of the highest-dimension component set: area-weighted
    for polygons (holes subtract), length-weighted for lines, mean for
    points — PostGIS picks the highest dimension present in a mix."""
    a_sum = ax = ay = 0.0
    l_sum = lx = ly = 0.0
    n_pts = px = py = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            for i, ring in enumerate(leaf.parts):
                s, cx6, cy6 = _ring_centroid_terms(ring)
                if s == 0.0:
                    # degenerate (zero-area) ring, e.g. a bowtie: it must
                    # carry zero weight, but its cx/cy moments can be
                    # nonzero and would skew valid sibling rings
                    continue
                # Shell adds, hole subtracts — independent of ring winding,
                # matching area(). cx/cy carry the ring's own orientation
                # sign, so normalize by orient before applying shell/hole.
                ring_sgn = 1.0 if i == 0 else -1.0
                orient = 1.0 if s >= 0 else -1.0
                cx = cx6 / 6.0
                cy = cy6 / 6.0
                a_sum += abs(s) / 2.0 * ring_sgn
                ax += cx * orient * ring_sgn
                ay += cy * orient * ring_sgn
        elif leaf.kind == "LineString":
            arr = leaf.parts
            d = np.diff(arr, axis=0)
            seg_len = np.hypot(d[:, 0], d[:, 1])
            mids = (arr[:-1] + arr[1:]) / 2.0
            l_sum += float(seg_len.sum())
            lx += float((mids[:, 0] * seg_len).sum())
            ly += float((mids[:, 1] * seg_len).sum())
        elif leaf.kind == "Point":
            n_pts += 1
            px += float(leaf.parts[0])
            py += float(leaf.parts[1])
    if a_sum != 0.0:
        return ax / a_sum, ay / a_sum
    if l_sum != 0.0:
        return lx / l_sum, ly / l_sum
    if n_pts:
        return px / n_pts, py / n_pts
    return math.nan, math.nan


def _all_vertices(geom: Geometry) -> np.ndarray:
    """Every coordinate of the geometry as an (n, 2) array."""
    out = []
    for leaf in geom.children():
        if leaf.kind == "Point":
            out.append(np.asarray(leaf.parts, dtype=np.float64).reshape(1, 2))
        elif leaf.kind == "LineString":
            out.append(leaf.parts)
        elif leaf.kind == "Polygon":
            out.extend(leaf.parts)
    if not out:
        return np.empty((0, 2), dtype=np.float64)
    return np.concatenate(out, axis=0)


def _all_segments(geom: Geometry) -> np.ndarray:
    """Every line/ring segment as an (n, 4) array of (x0, y0, x1, y1)."""
    out = []
    for leaf in geom.children():
        arrays = []
        if leaf.kind == "LineString":
            arrays = [leaf.parts]
        elif leaf.kind == "Polygon":
            arrays = leaf.parts
        for arr in arrays:
            if len(arr) >= 2:
                out.append(np.concatenate([arr[:-1], arr[1:]], axis=1))
    if not out:
        return np.empty((0, 4), dtype=np.float64)
    return np.concatenate(out, axis=0)


def _point_seg_dist_min(pts: np.ndarray, segs: np.ndarray) -> float:
    """min over all (point, segment) pairs of point-to-segment distance.

    Interior projections use the cross-product form |ab x ap| / |ab| —
    exact (0.0, not ~1e-16) for points lying ON the segment, which the
    clip-and-project form misses by one rounding of t; clamped cases hit
    an endpoint exactly either way."""
    if not len(pts) or not len(segs):
        return math.inf
    p = pts[:, None, :]  # (n, 1, 2)
    a = segs[None, :, 0:2]  # (1, m, 2)
    ab = segs[None, :, 2:4] - a
    ap = p - a
    denom = (ab * ab).sum(-1)  # (1, m)
    dots = (ap * ab).sum(-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        t_raw = np.where(denom > 0, dots / denom, 0.0)
    interior = (t_raw > 0.0) & (t_raw < 1.0) & (denom > 0)
    cross = ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]
    with np.errstate(invalid="ignore", divide="ignore"):
        d_int = np.abs(cross) / np.sqrt(np.where(denom > 0, denom, 1.0))
    t = np.clip(t_raw, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d_clip = np.hypot(p[..., 0] - proj[..., 0], p[..., 1] - proj[..., 1])
    d = np.where(interior, d_int, d_clip)
    return float(d.min())


def _segments_cross(sa: np.ndarray, sb: np.ndarray) -> bool:
    """True iff any segment of ``sa`` properly crosses any of ``sb``
    (shared endpoints / touching cases are covered by the zero
    point-to-segment distance, so only proper crossings matter here)."""
    if not len(sa) or not len(sb):
        return False

    a0 = sa[:, None, 0:2]
    a1 = sa[:, None, 2:4]
    b0 = sb[None, :, 0:2]
    b1 = sb[None, :, 2:4]

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    d1 = cross(a0, a1, b0)
    d2 = cross(a0, a1, b1)
    d3 = cross(b0, b1, a0)
    d4 = cross(b0, b1, a1)
    proper = (
        ((d1 > 0) != (d2 > 0))
        & (d1 != 0)
        & (d2 != 0)
        & ((d3 > 0) != (d4 > 0))
        & (d3 != 0)
        & (d4 != 0)
    )
    return bool(proper.any())


def _point_in_rings(x: float, y: float, rings: list[np.ndarray]) -> bool:
    """Even-odd ray casting over a polygon's rings (holes flip parity)."""
    inside = False
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        straddles = (y0 > y) != (y1 > y)
        with np.errstate(invalid="ignore", divide="ignore"):
            xs = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
        hits = straddles & (x < xs)
        if int(hits.sum()) % 2:
            inside = not inside
    return inside


def _any_point_inside(geom: Geometry, other: Geometry) -> bool:
    """True iff a representative point of each connected piece of ``other``
    lies inside a polygon of ``geom`` (enough for distance-zero detection:
    if no boundary crossing exists, each piece is entirely in or out)."""
    polys = [leaf for leaf in geom.children() if leaf.kind == "Polygon"]
    if not polys:
        return False
    for leaf in other.children():
        if leaf.kind == "Point":
            x, y = float(leaf.parts[0]), float(leaf.parts[1])
        else:
            arr = leaf.parts[0] if leaf.kind == "Polygon" else leaf.parts
            x, y = float(arr[0, 0]), float(arr[0, 1])
        for poly in polys:
            if _point_in_rings(x, y, poly.parts):
                return True
    return False


def distance(a: Geometry, b: Geometry) -> float:
    """``ST_Distance``: minimum planar distance between two geometries,
    0 when they intersect. Cartesian in CRS units, like PostGIS on a
    geometry (non-geography) column.

    Exact: the minimum between two non-crossing geometries is attained at
    a vertex of one against a segment (or vertex) of the other, so the
    vertex/segment sweep below is the complete candidate set; crossings
    and full containment (either direction) short-circuit to 0.
    """
    sa, sb = _all_segments(a), _all_segments(b)
    if _segments_cross(sa, sb):
        return 0.0
    if _any_point_inside(a, b) or _any_point_inside(b, a):
        return 0.0
    pa, pb = _all_vertices(a), _all_vertices(b)
    best = _point_seg_dist_min(pa, sb)
    best = min(best, _point_seg_dist_min(pb, sa))
    if len(pa) and len(pb):
        d = pa[:, None, :] - pb[None, :, :]
        best = min(best, float(np.hypot(d[..., 0], d[..., 1]).min()))
    return best if best is not math.inf else math.nan


def map_coordinates(geom: Geometry, fn) -> Geometry:
    """Structure-preserving coordinate transform: ``fn(x, y) -> (x, y)``
    applied to every vertex (used by st_transform for CRS reprojection)."""

    def _arr(arr: np.ndarray) -> np.ndarray:
        out = np.empty_like(arr)
        for i in range(len(arr)):
            out[i, 0], out[i, 1] = fn(float(arr[i, 0]), float(arr[i, 1]))
        return out

    if geom.kind == "Point":
        x, y = fn(float(geom.parts[0]), float(geom.parts[1]))
        return Geometry("Point", np.array([x, y], dtype=np.float64), geom.srid)
    if geom.kind == "LineString":
        return Geometry("LineString", _arr(geom.parts), geom.srid)
    if geom.kind == "Polygon":
        return Geometry("Polygon", [_arr(r) for r in geom.parts], geom.srid)
    return Geometry(
        geom.kind, [map_coordinates(g, fn) for g in geom.parts], geom.srid
    )


def buffer_point(x: float, y: float, radius: float, quad_segs: int = 8) -> Geometry:
    """``ST_Buffer`` of a POINT: a regular ``4*quad_segs``-gon inscribed in
    the radius circle (PostGIS's default quad_segs=8 -> 32 vertices).
    Buffering lines/polygons needs a Minkowski union the engine does not
    implement; the point case covers the radius-search idiom
    ``st_intersects(st_buffer(pt, r), geometry)``."""
    n = max(4, 4 * int(quad_segs))
    ang = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
    ring = np.empty((n + 1, 2), dtype=np.float64)
    ring[:n, 0] = x + radius * np.cos(ang)
    ring[:n, 1] = y + radius * np.sin(ang)
    ring[n] = ring[0]
    return Geometry("Polygon", [ring])


def bbox_polygon(
    minx: float, miny: float, maxx: float, maxy: float, srid: int = 0
) -> Geometry:
    """The inline bbox POLYGON the reference builds
    (``xcube_geodb/sql/geodb.sql:1228-1239``)."""
    ring = np.asarray(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)],
        dtype=np.float64,
    )
    return Geometry("Polygon", [ring], srid)


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """Proper self-crossing of a closed ring (bowtie detection): any
    non-adjacent segment pair that strictly crosses. Adjacent segments
    share an endpoint by construction and are skipped."""
    n = len(ring) - 1  # closed ring: last point repeats the first
    if n < 4:
        return False
    segs = np.concatenate([ring[:-1], ring[1:]], axis=1)
    for i in range(n):
        # skip neighbors (i-1, i, i+1) modulo the ring
        js = [j for j in range(i + 2, n) if not (i == 0 and j == n - 1)]
        if js and _segments_cross(segs[i : i + 1], segs[js]):
            return True
    return False


def is_valid(geom: Geometry) -> bool:
    """``ST_IsValid`` (the OGC checks that matter for this kernel's
    operators): rings are closed with >= 4 points, no ring properly
    self-intersects (bowties), no zero-area rings, and holes lie inside
    their shell. Points/lines are always valid (OGC: a line may
    self-intersect)."""
    for leaf in geom.children():
        if leaf.kind != "Polygon":
            continue
        if not leaf.parts:
            return False
        for ring in leaf.parts:
            if len(ring) < 4:
                return False
            if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
                return False
            if _ring_shoelace(ring) == 0.0:
                return False
            if _ring_self_intersects(ring):
                return False
        shell = leaf.parts[0]
        if leaf.parts[1:]:
            from xcube_geodb_spark.geometry.predicates import _point_in_ring

            for hole in leaf.parts[1:]:
                # every hole vertex inside-or-on the shell (0 = outside)
                for px, py in hole[:-1]:
                    if _point_in_ring(float(px), float(py), shell) == 0:
                        return False
    return True


def _dp_keep_mask(arr: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker vertex-keep mask with pinned endpoints, iterative
    (no recursion limit) and numpy-vectorized per span: the perpendicular
    distance of every interior point to the anchor chord is one cross
    product over the span."""
    n = len(arr)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = tolerance * tolerance
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = arr[j] - arr[i]
        pts = arr[i + 1 : j] - arr[i]
        l2 = float(seg[0] * seg[0] + seg[1] * seg[1])
        if l2 == 0.0:
            # degenerate chord (closed ring anchors): radial distance
            d2 = pts[:, 0] * pts[:, 0] + pts[:, 1] * pts[:, 1]
        else:
            # distance to the chord SEGMENT, not the infinite line (GEOS
            # semantics): a spike collinear with the chord but beyond its
            # endpoints must still be retained
            t = np.clip((pts[:, 0] * seg[0] + pts[:, 1] * seg[1]) / l2, 0.0, 1.0)
            dx = pts[:, 0] - t * seg[0]
            dy = pts[:, 1] - t * seg[1]
            d2 = dx * dx + dy * dy
        k = int(np.argmax(d2))
        if float(d2[k]) > tol2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify(geom: Geometry, tolerance: float) -> Geometry | None:
    """``ST_Simplify`` (Douglas-Peucker, PostGIS semantics): vertices
    closer than ``tolerance`` to the retained chord are dropped; endpoints
    are pinned (for rings, the closure point anchors a degenerate chord so
    the farthest vertex from the start is retained first, mirroring the
    standard closed-ring treatment). Points/MultiPoints pass through.
    Collapsed holes (< 4 points after simplification) are dropped;
    a collapsed shell collapses its polygon, and a geometry whose every
    part collapses returns ``None`` (SQL NULL) — PostGIS similarly may
    emit EMPTY/invalid results rather than guaranteeing validity.
    """
    if tolerance < 0:
        raise GeoDBError("simplify tolerance must be >= 0")
    if geom.kind == "Point":
        return geom
    if geom.kind == "LineString":
        if len(geom.parts) <= 2:
            return geom
        out = geom.parts[_dp_keep_mask(geom.parts, tolerance)]
        return Geometry("LineString", out, geom.srid)
    if geom.kind == "Polygon":
        rings = []
        for idx, ring in enumerate(geom.parts):
            out = ring[_dp_keep_mask(ring, tolerance)]
            if len(out) < 4:
                if idx == 0:
                    return None  # shell collapsed
                continue  # hole collapsed: drop it
            rings.append(out)
        return Geometry("Polygon", rings, geom.srid)
    if geom.kind == "MultiPoint":
        return geom
    kept = [
        s for g in geom.parts if (s := simplify(g, tolerance)) is not None
    ]
    if not kept:
        return None
    return Geometry(geom.kind, kept, geom.srid)


# mean Earth radius (IUGG R1), the constant PostGIS documents for
# ST_DistanceSphere-style spherical math
EARTH_RADIUS_M = 6371008.8


def distance_sphere(a: Geometry, b: Geometry) -> float:
    """``ST_DistanceSphere`` for POINT operands: great-circle meters via
    the haversine formula on the mean-radius sphere. Non-point geometries
    raise (documented deviation: PostGIS accepts any geometry; the
    engine's planar ``distance`` covers those — spherical min-distance
    between arbitrary shapes needs geodesic segment math out of scope for
    this kernel)."""
    if a.kind != "Point" or b.kind != "Point":
        raise GeoDBError("distance_sphere supports Point geometries only")
    lon1, lat1 = float(a.parts[0]), float(a.parts[1])
    lon2, lat2 = float(b.parts[0]), float(b.parts[1])
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2.0) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(math.sqrt(min(h, 1.0)))


def clip_by_box(geom: Geometry, box: tuple) -> Geometry | None:
    """``ST_ClipByBox2D``: geometry ∩ axis-aligned box, computed by the
    predicate kernel's clipping primitives (Sutherland-Hodgman for rings —
    the box is convex — Liang-Barsky for segments). Points filter, lines
    may split into MultiLineString parts, polygons clip per ring with
    collapsed holes dropped; a fully-outside geometry returns ``None``
    (SQL NULL). Like PostGIS, this is the fast planar clip: output
    validity is not guaranteed for pathological inputs."""
    from xcube_geodb_spark.geometry.predicates import (
        _clip_ring_to_box,
        _segment_box_clip,
    )

    xmin, ymin, xmax, ymax = (float(v) for v in box)
    bx = (xmin, ymin, xmax, ymax)

    if geom.kind == "Point":
        x, y = float(geom.parts[0]), float(geom.parts[1])
        if xmin <= x <= xmax and ymin <= y <= ymax:
            return geom
        return None

    if geom.kind == "LineString":
        parts: list[list] = []
        cur: list = []
        coords = geom.parts
        for i in range(len(coords) - 1):
            clip = _segment_box_clip(
                float(coords[i, 0]), float(coords[i, 1]),
                float(coords[i + 1, 0]), float(coords[i + 1, 1]), bx,
            )
            if clip is None:
                if len(cur) >= 2:
                    parts.append(cur)
                cur = []
                continue
            t0, t1 = clip
            ax, ay = float(coords[i, 0]), float(coords[i, 1])
            bx2, by2 = float(coords[i + 1, 0]), float(coords[i + 1, 1])
            dx, dy = bx2 - ax, by2 - ay
            # reuse the ORIGINAL endpoints at t==0/1: recomputing
            # ax + 1.0*dx drifts an ulp, which used to split a fully
            # inside polyline into per-segment fragments
            px, py = (ax, ay) if t0 == 0.0 else (ax + t0 * dx, ay + t0 * dy)
            qx, qy = (
                (bx2, by2) if t1 == 1.0 else (ax + t1 * dx, ay + t1 * dy)
            )
            if cur and cur[-1] == (px, py):
                cur.append((qx, qy))
            else:
                if len(cur) >= 2:
                    parts.append(cur)
                cur = [(px, py), (qx, qy)]
        if len(cur) >= 2:
            parts.append(cur)
        lines = [
            Geometry("LineString", np.asarray(p, dtype=np.float64))
            for p in parts
            # drop degenerate (single touch point) pieces
            if not (len(p) == 2 and p[0] == p[1])
        ]
        if not lines:
            return None
        if len(lines) == 1:
            lines[0].srid = geom.srid
            return lines[0]
        return Geometry("MultiLineString", lines, geom.srid)

    if geom.kind == "Polygon":
        rings = []
        for idx, ring in enumerate(geom.parts):
            out = _clip_ring_to_box(ring, bx)
            if len(out) < 3:
                if idx == 0:
                    return None
                continue  # hole entirely outside the box
            closed = np.vstack([out, out[:1]])
            rings.append(closed)
        return Geometry("Polygon", rings, geom.srid)

    if geom.kind in _MULTI_KINDS or geom.kind == "GeometryCollection":
        kept = []
        for child in geom.parts:
            c = clip_by_box(child, bx)
            if c is None:
                continue
            if c.kind in _MULTI_KINDS and geom.kind != "GeometryCollection":
                # a clipped line can split into a MultiLineString: flatten
                # so a Multi* never nests another Multi* (WKT/WKB model)
                kept.extend(c.parts)
            else:
                kept.append(c)
        if not kept:
            return None
        return Geometry(geom.kind, kept, geom.srid)
    return None


def convex_hull(geom: Geometry) -> Geometry | None:
    """Convex hull via Andrew's monotone chain over every vertex.

    PostGIS/GEOS ``ST_ConvexHull`` degenerate-type parity: a single
    distinct vertex yields a Point, collinear input a LineString, and
    anything else a Polygon. The polygon shell is produced
    counter-clockwise starting at the lexicographically smallest
    (x, then y) vertex — a deterministic canonical form (GEOS's start
    vertex / orientation is an implementation detail; documented
    normalization, not a semantic deviation). Returns ``None`` for an
    empty geometry.

    Reference surface: arbitrary PostGIS via the raw-SQL passthrough
    (/root/reference/xcube_geodb/sql/geodb.sql:1123-1177).
    """
    pts = _all_vertices(geom)
    if len(pts) == 0:
        return None
    pts = np.unique(pts, axis=0)  # lexicographic sort + dedup
    if len(pts) == 1:
        return Geometry("Point", pts[0].copy(), geom.srid)

    def _cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) == 2:
        return Geometry("LineString", np.asarray(hull, dtype=np.float64), geom.srid)
    ring = np.asarray(hull + [hull[0]], dtype=np.float64)
    return Geometry("Polygon", [ring], geom.srid)


def _sphere_seg_m(lon1, lat1, lon2, lat2) -> float:
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2.0) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(math.sqrt(min(h, 1.0)))


def length_sphere(geom: Geometry) -> float:
    """``ST_LengthSpheroid``-family companion to :func:`distance_sphere`:
    great-circle meters summed over every line segment (haversine per
    segment on the mean-radius sphere — each vertex pair joined by its
    geodesic, the standard GIS approximation for lon/lat linework).
    Points contribute 0; polygons contribute their ring perimeters
    (PostGIS ST_LengthSphere measures lines only and returns 0 for
    polygons — use :func:`perimeter_sphere` semantics explicitly here:
    this function measures LineString/MultiLineString, returns 0 for
    points and polygons, matching PostGIS ST_Length(geography) applied
    to lines)."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "LineString":
            arr = leaf.parts
            for i in range(len(arr) - 1):
                total += _sphere_seg_m(
                    float(arr[i, 0]), float(arr[i, 1]),
                    float(arr[i + 1, 0]), float(arr[i + 1, 1]),
                )
    return total


def perimeter_sphere(geom: Geometry) -> float:
    """Great-circle meters around every polygon ring (outer + holes)."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            for ring in leaf.parts:
                for i in range(len(ring) - 1):
                    total += _sphere_seg_m(
                        float(ring[i, 0]), float(ring[i, 1]),
                        float(ring[i + 1, 0]), float(ring[i + 1, 1]),
                    )
    return total


def _ring_solid_angle(ring: np.ndarray) -> float:
    """Signed solid angle (steradians) subtended by a lon/lat ring whose
    vertices are joined by great-circle arcs: fan triangulation from the
    first vertex, each triangle's SIGNED spherical excess via the
    van Oosterom & Strackee formula ``tan(Ω/2) = a·(b×c) /
    (1 + a·b + b·c + c·a)`` over the unit vectors — exact for
    geodesic-edge polygons (an octant triangle yields exactly π/2),
    orientation-signed like the planar shoelace."""
    lon = np.radians(ring[:, 0])
    lat = np.radians(ring[:, 1])
    v = np.column_stack(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
    )
    if np.array_equal(v[0], v[-1]):
        v = v[:-1]
    if len(v) < 3:
        return 0.0
    a = v[0]
    total = 0.0
    for i in range(1, len(v) - 1):
        b, c = v[i], v[i + 1]
        num = float(np.dot(a, np.cross(b, c)))
        den = 1.0 + float(np.dot(a, b)) + float(np.dot(b, c)) + float(np.dot(c, a))
        total += 2.0 * math.atan2(num, den)
    return total


def area_sphere(geom: Geometry) -> float:
    """Geodesic area in m² on the mean-radius sphere (``ST_Area`` on a
    geography column, sphere mode): spherical excess per ring — outer
    rings contribute, holes subtract. Exact for polygons whose edges are
    great-circle arcs and smaller than a hemisphere; PostGIS geography
    defaults to the WGS84 spheroid (GeographicLib), a ≤0.3% deviation
    documented in COVERAGE.md. Points/lines contribute 0."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            rings = leaf.parts
            if not rings:
                continue
            total += abs(_ring_solid_angle(rings[0])) * EARTH_RADIUS_M**2
            for hole in rings[1:]:
                total -= abs(_ring_solid_angle(hole)) * EARTH_RADIUS_M**2
    return total


# WGS84 ellipsoid
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def area_spheroid(geom: Geometry) -> float:
    """Polygon area in m² on the WGS84 ELLIPSOID (PostGIS
    ``ST_Area(geography)`` default mode) via the authalic
    transformation — public math from Snyder, *Map Projections: A
    Working Manual* (USGS PP 1395, eqs. 3-11/3-12): geodetic latitude
    maps to authalic latitude ``β = asin(q(φ)/q_p)``, which by
    construction preserves the area of any region between parallels;
    the spherical-excess kernel then runs on the authalic sphere
    ``R_A² = a²·q_p/2``.

    Exactness: meridians and the equator map to great circles, so
    regions bounded by meridians/parallels (graticule cells, caps,
    zones) are EXACT (the WGS84 octant evaluates to exactly 1/8 of the
    ellipsoid's 510 065 621.72 km²). General geodesic edges differ from
    the mapped great-circle edges by O(f·sagitta) — orders of magnitude
    under the ≤0.3 % whole-sphere error of :func:`area_sphere`, and
    vanishing as edges shorten. Points/lines contribute 0."""
    e2 = _WGS84_F * (2.0 - _WGS84_F)
    e = math.sqrt(e2)

    def _q(s: float) -> float:
        return (1.0 - e2) * (
            s / (1.0 - e2 * s * s) + math.atanh(e * s) / e
        )

    qp = _q(1.0)
    r_a2 = _WGS84_A * _WGS84_A * qp / 2.0

    def _authalic(ring: np.ndarray) -> np.ndarray:
        out = ring.copy()
        s = np.sin(np.radians(ring[:, 1]))
        qv = (1.0 - e2) * (
            s / (1.0 - e2 * s * s) + np.arctanh(e * s) / e
        )
        out[:, 1] = np.degrees(np.arcsin(np.clip(qv / qp, -1.0, 1.0)))
        return out

    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            rings = leaf.parts
            if not rings:
                continue
            total += abs(_ring_solid_angle(_authalic(rings[0]))) * r_a2
            for hole in rings[1:]:
                total -= abs(_ring_solid_angle(_authalic(hole))) * r_a2
    return total


def distance_spheroid(a: Geometry, b: Geometry) -> float:
    """``ST_DistanceSpheroid``: geodesic meters between two POINTS on the
    WGS84 ellipsoid — Vincenty's inverse formula (sub-millimeter except
    near-antipodal pairs, which fall back to the sphere). Non-point
    operands raise: spheroid distance between extended geometries needs
    a geodesic overlay this kernel scopes out (use st_distancesphere for
    the sphere approximation)."""
    if a.kind != "Point" or b.kind != "Point":
        raise GeoDBError(
            "st_distancespheroid requires Point operands "
            f"(got {a.kind}, {b.kind})"
        )
    return _vincenty_m(
        float(a.parts[0]), float(a.parts[1]),
        float(b.parts[0]), float(b.parts[1]),
    )


def _vincenty_m(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Vincenty inverse between lon/lat pairs on WGS84 (meters);
    near-antipodal non-convergence falls back to the haversine sphere."""
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    f = _WGS84_F
    b_axis = _WGS84_A * (1.0 - f)
    u1 = math.atan((1.0 - f) * math.tan(math.radians(lat1)))
    u2 = math.atan((1.0 - f) * math.tan(math.radians(lat2)))
    big_l = math.radians(lon2 - lon1)
    sin_u1, cos_u1 = math.sin(u1), math.cos(u1)
    sin_u2, cos_u2 = math.sin(u2), math.cos(u2)
    lam = big_l
    for _ in range(200):
        sin_lam, cos_lam = math.sin(lam), math.cos(lam)
        sin_sigma = math.sqrt(
            (cos_u2 * sin_lam) ** 2
            + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        if sin_sigma == 0.0:
            return 0.0
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_lam / sin_sigma
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        if cos2_alpha == 0.0:  # equatorial line
            cos_2sm = 0.0
        else:
            cos_2sm = cos_sigma - 2.0 * sin_u1 * sin_u2 / cos2_alpha
        c = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_prev = lam
        lam = big_l + (1.0 - c) * f * sin_alpha * (
            sigma
            + c
            * sin_sigma
            * (cos_2sm + c * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
        )
        if abs(lam - lam_prev) < 1e-12:
            break
    else:
        # Vincenty fails to converge only near-antipodally: the sphere
        # answer is within ~0.5% there, better than failing the query
        return _sphere_seg_m(lon1, lat1, lon2, lat2)
    u_sq = cos2_alpha * (_WGS84_A**2 - b_axis**2) / b_axis**2
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = (
        big_b
        * sin_sigma
        * (
            cos_2sm
            + big_b
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm**2)
                - big_b
                / 6.0
                * cos_2sm
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos_2sm**2)
            )
        )
    )
    return b_axis * big_a * (sigma - delta_sigma)


def length_spheroid(geom: Geometry) -> float:
    """``ST_LengthSpheroid``: WGS84 geodesic meters summed over every
    LineString segment (Vincenty per vertex pair — the standard GIS
    spheroidal line measure); points and polygons contribute 0 like
    :func:`length_sphere`."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "LineString":
            arr = leaf.parts
            for i in range(len(arr) - 1):
                total += _vincenty_m(
                    float(arr[i, 0]), float(arr[i, 1]),
                    float(arr[i + 1, 0]), float(arr[i + 1, 1]),
                )
    return total


def perimeter_spheroid(geom: Geometry) -> float:
    """WGS84 geodesic meters around every polygon ring (outer + holes) —
    the spheroidal companion of :func:`perimeter_sphere`."""
    total = 0.0
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            for ring in leaf.parts:
                for i in range(len(ring) - 1):
                    total += _vincenty_m(
                        float(ring[i, 0]), float(ring[i, 1]),
                        float(ring[i + 1, 0]), float(ring[i + 1, 1]),
                    )
    return total


def project_point(lon: float, lat: float, distance_m: float, azimuth_rad: float):
    """``ST_Project(geography)``: the destination point ``distance_m``
    meters from (lon, lat) along the given north-based clockwise bearing,
    on the mean-radius sphere (the closed-form great-circle destination
    formula — inverse of :func:`distance_sphere` + st_azimuth)."""
    d = distance_m / EARTH_RADIUS_M
    lat1 = math.radians(lat)
    lon1 = math.radians(lon)
    lat2 = math.asin(
        math.sin(lat1) * math.cos(d)
        + math.cos(lat1) * math.sin(d) * math.cos(azimuth_rad)
    )
    lon2 = lon1 + math.atan2(
        math.sin(azimuth_rad) * math.sin(d) * math.cos(lat1),
        math.cos(d) - math.sin(lat1) * math.sin(lat2),
    )
    lon2 = (lon2 + math.pi) % (2.0 * math.pi) - math.pi  # normalize to ±180
    return math.degrees(lon2), math.degrees(lat2)


def _vertex_count(geom: Geometry) -> int:
    n = 0
    for leaf in geom.children():
        if leaf.kind == "Point":
            n += 1
        elif leaf.kind == "LineString":
            n += len(leaf.parts)
        else:  # Polygon
            n += sum(len(r) for r in leaf.parts)
    return n


def subdivide(geom: Geometry, max_vertices: int = 256) -> list[Geometry]:
    """``ST_Subdivide``: split a geometry into pieces of at most
    ``max_vertices`` vertices by recursive halving of the envelope's
    longer axis + :func:`clip_by_box` — the standard PostGIS prep that
    keeps grid-partitioned spatial joins balanced when polygons are huge
    (a giant polygon otherwise lands every one of its grid cells' work
    on one comparison).  The union of the pieces covers the input
    exactly; piece boundaries are axis-parallel cut lines.  Like
    PostGIS, requires ``max_vertices >= 5``; multi-geometries are split
    into their components first.  Like PostGIS, the cut pivot consults
    the VERTEX ORDINATE DISTRIBUTION: the cut snaps to the vertex
    ordinate nearest the envelope midpoint whenever one lies strictly
    inside the middle half of the span (falling back to the midpoint
    otherwise — symmetric shapes keep their minimal splits).  A pure
    midpoint cut can never reach a reflex corner whose ordinate has a
    non-terminating binary expansion of the span, recursing to float
    exhaustion and emitting ulp-wide slivers; snapping reaches every
    corner in O(log) cuts (each halving doubles the corner's relative
    offset until it enters the middle half).  A relative-epsilon extent
    stop backs the pivot up — a piece whose envelope has collapsed is
    emitted as-is.  (Piece COUNTS still differ from PostGIS; the
    coverage contract is the same.)"""
    from xcube_geodb_spark.errors import GeoDBError

    if max_vertices < 5:
        raise GeoDBError("st_subdivide requires max_vertices >= 5")
    out: list[Geometry] = []
    stack = list(geom.children())
    while stack:
        g = stack.pop()
        n = _vertex_count(g)
        if n <= max_vertices:
            out.append(g)
            continue
        xmin, ymin, xmax, ymax = envelope(g)
        if xmax - xmin >= ymax - ymin:
            axis, lo, hi = 0, xmin, xmax
        else:
            axis, lo, hi = 1, ymin, ymax
        eps = 1e-9 * max(abs(lo), abs(hi), 1.0)
        if hi - lo <= eps:
            # envelope extent exhausted: emit rather than split slivers
            out.append(g)
            continue
        ords = _all_vertices(g)[:, axis]
        center = (lo + hi) / 2.0
        quarter = (hi - lo) / 4.0
        # vertex ordinates strictly inside the MIDDLE HALF of the span:
        # snap the cut to the one nearest the midpoint (ties -> lower)
        cand = ords[(ords > center - quarter) & (ords < center + quarter)]
        if len(cand):
            mid = float(cand[np.lexsort((cand, np.abs(cand - center)))[0]])
        else:
            mid = center
        if axis == 0:
            boxes = ((xmin, ymin, mid, ymax), (mid, ymin, xmax, ymax))
        else:
            boxes = ((xmin, ymin, xmax, mid), (xmin, mid, xmax, ymax))
        pieces = [clip_by_box(g, b) for b in boxes]
        pieces = [p for p in pieces if p is not None]
        progressed = any(_vertex_count(p) < n for p in pieces)
        if not progressed:
            # degenerate (e.g. everything on the cut line): emit as-is
            out.append(g)
            continue
        for p in pieces:
            stack.extend(p.children())
    return out


def _interior_point_polygon(rings: list[np.ndarray]) -> tuple[float, float, float]:
    """(x, y, interval width) of the widest horizontal-bisector chord of
    one polygon — the JTS/GEOS InteriorPointArea construction PostGIS
    uses: the scanline y bisects the gap between the vertex ordinates
    nearest the envelope's vertical center (so it never passes through a
    vertex), crossings pair up even-odd, and the point is the midpoint
    of the widest inside interval."""
    ys_all = np.concatenate([r[:, 1] for r in rings])
    lo_env, hi_env = float(ys_all.min()), float(ys_all.max())
    center = (lo_env + hi_env) / 2.0
    above = ys_all[(ys_all > center) & (ys_all < hi_env)]
    below = ys_all[(ys_all < center) & (ys_all > lo_env)]
    hi = float(above.min()) if len(above) else hi_env
    lo = float(below.max()) if len(below) else lo_env
    y = (hi + lo) / 2.0
    xs: list[float] = []
    for r in rings:
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        straddles = (y0 > y) != (y1 > y)
        with np.errstate(invalid="ignore", divide="ignore"):
            cx = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
        xs.extend(cx[straddles].tolist())
    xs.sort()
    best_x, best_w = None, -1.0
    for a, b in zip(xs[0::2], xs[1::2]):
        if b - a > best_w:
            best_w, best_x = b - a, (a + b) / 2.0
    if best_x is None:  # fully degenerate polygon: fall back to a vertex
        return float(rings[0][0, 0]), float(rings[0][0, 1]), 0.0
    return best_x, y, best_w


def point_on_surface(geom: Geometry) -> tuple[float, float]:
    """``ST_PointOnSurface``: a point guaranteed on the geometry —
    polygons get the widest-bisector-chord interior point (the JTS
    construction, see :func:`_interior_point_polygon`; for multipolygons
    the widest chord across components wins), lines the interior vertex
    closest to the centroid (endpoints only for 2-point lines), points
    the member closest to the centroid."""
    polys = [leaf for leaf in geom.children() if leaf.kind == "Polygon"]
    if polys:
        best = None
        for leaf in polys:
            x, y, w = _interior_point_polygon(leaf.parts)
            if best is None or w > best[2]:
                best = (x, y, w)
        return best[0], best[1]
    cx, cy = centroid(geom)
    lines = [leaf for leaf in geom.children() if leaf.kind == "LineString"]
    if lines:
        best = None
        for leaf in lines:
            arr = leaf.parts
            cand = arr[1:-1] if len(arr) > 2 else arr
            d2 = (cand[:, 0] - cx) ** 2 + (cand[:, 1] - cy) ** 2
            k = int(np.argmin(d2))
            if best is None or float(d2[k]) < best[2]:
                best = (float(cand[k, 0]), float(cand[k, 1]), float(d2[k]))
        return best[0], best[1]
    best = None
    for leaf in geom.children():
        x, y = float(leaf.parts[0]), float(leaf.parts[1])
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        if best is None or d2 < best[2]:
            best = (x, y, d2)
    return best[0], best[1]


# ---------------------------------------------------------------------------
# linear referencing (ST_LineInterpolatePoint / ST_LineLocatePoint /
# ST_LineSubstring) + closest-point pair (ST_ClosestPoint/ST_ShortestLine)
# + ST_Boundary
# ---------------------------------------------------------------------------


def _line_cumlen(arr: np.ndarray) -> np.ndarray:
    """Cumulative 2D length at each vertex (cum[0] = 0)."""
    d = np.hypot(np.diff(arr[:, 0]), np.diff(arr[:, 1]))
    return np.concatenate(([0.0], np.cumsum(d)))


def line_interpolate_point(geom: Geometry, frac: float) -> tuple[float, float]:
    """``ST_LineInterpolatePoint``: the point at ``frac`` of the line's
    2D length. PostGIS semantics: LINESTRING input only, frac in [0, 1]."""
    if geom.kind != "LineString":
        raise GeoDBError(
            "st_lineinterpolatepoint requires a LINESTRING, got "
            f"{geom.kind}"
        )
    if not 0.0 <= frac <= 1.0:
        raise GeoDBError("st_lineinterpolatepoint fraction must be in [0,1]")
    arr = geom.parts
    cum = _line_cumlen(arr)
    total = float(cum[-1])
    if total == 0.0:
        return float(arr[0, 0]), float(arr[0, 1])
    target = frac * total
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(arr) - 2)
    seg = float(cum[i + 1] - cum[i])
    t = 0.0 if seg == 0.0 else (target - float(cum[i])) / seg
    return (
        float(arr[i, 0]) + t * (float(arr[i + 1, 0]) - float(arr[i, 0])),
        float(arr[i, 1]) + t * (float(arr[i + 1, 1]) - float(arr[i, 1])),
    )


def line_locate_point(geom: Geometry, x: float, y: float) -> float:
    """``ST_LineLocatePoint``: the fraction of the line's length at the
    point closest to (x, y). LINESTRING input only (PostGIS)."""
    if geom.kind != "LineString":
        raise GeoDBError(
            f"st_linelocatepoint requires a LINESTRING, got {geom.kind}"
        )
    arr = geom.parts
    x0, y0 = arr[:-1, 0], arr[:-1, 1]
    dx, dy = np.diff(arr[:, 0]), np.diff(arr[:, 1])
    ln2 = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.clip(
            ((x - x0) * dx + (y - y0) * dy) / np.where(ln2 == 0, 1, ln2),
            0.0, 1.0,
        )
    cx, cy = x0 + t * dx, y0 + t * dy
    d2 = (x - cx) ** 2 + (y - cy) ** 2
    i = int(np.argmin(d2))
    cum = _line_cumlen(arr)
    total = float(cum[-1])
    if total == 0.0:
        return 0.0
    return (float(cum[i]) + float(t[i]) * math.hypot(
        float(dx[i]), float(dy[i])
    )) / total


def line_substring(geom: Geometry, f0: float, f1: float) -> Geometry:
    """``ST_LineSubstring``: the part of the line between fractions
    ``f0 <= f1`` of its 2D length; a zero-length range returns a POINT
    (PostGIS semantics). LINESTRING input only."""
    if geom.kind != "LineString":
        raise GeoDBError(
            f"st_linesubstring requires a LINESTRING, got {geom.kind}"
        )
    if not (0.0 <= f0 <= f1 <= 1.0):
        raise GeoDBError(
            "st_linesubstring requires 0 <= startfraction <= endfraction "
            "<= 1"
        )
    if f0 == f1:
        x, y = line_interpolate_point(geom, f0)
        return Geometry("Point", np.array([x, y]), geom.srid)
    arr = geom.parts
    cum = _line_cumlen(arr)
    total = float(cum[-1])
    if total == 0.0:
        return Geometry("Point", arr[0].copy(), geom.srid)
    lo, hi = f0 * total, f1 * total
    pts: list[tuple[float, float]] = [line_interpolate_point(geom, f0)]
    inside = (cum > lo) & (cum < hi)
    for i in np.flatnonzero(inside):
        p = (float(arr[i, 0]), float(arr[i, 1]))
        if p != pts[-1]:
            pts.append(p)
    end = line_interpolate_point(geom, f1)
    if end != pts[-1]:
        pts.append(end)
    if len(pts) < 2:
        pts.append(pts[-1])  # degenerate: duplicate the single point
    return Geometry("LineString", np.asarray(pts, dtype=np.float64),
                    geom.srid)


def _crossing_point(sa: np.ndarray, sb: np.ndarray) -> tuple | None:
    """One proper-crossing point between segment sets, or None."""
    if not len(sa) or not len(sb):
        return None
    a0, a1 = sa[:, None, 0:2], sa[:, None, 2:4]
    b0, b1 = sb[None, :, 0:2], sb[None, :, 2:4]
    d1 = ((a1 - a0)[..., 0] * (b0 - a0)[..., 1]
          - (a1 - a0)[..., 1] * (b0 - a0)[..., 0])
    d2 = ((a1 - a0)[..., 0] * (b1 - a0)[..., 1]
          - (a1 - a0)[..., 1] * (b1 - a0)[..., 0])
    d3 = ((b1 - b0)[..., 0] * (a0 - b0)[..., 1]
          - (b1 - b0)[..., 1] * (a0 - b0)[..., 0])
    d4 = ((b1 - b0)[..., 0] * (a1 - b0)[..., 1]
          - (b1 - b0)[..., 1] * (a1 - b0)[..., 0])
    proper = (
        ((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
        & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0)
    )
    idx = np.argwhere(proper)
    if not len(idx):
        return None
    i, j = int(idx[0, 0]), int(idx[0, 1])
    p0, p1 = sa[i, 0:2], sa[i, 2:4]
    q0, q1 = sb[j, 0:2], sb[j, 2:4]
    px, py = p1[0] - p0[0], p1[1] - p0[1]
    qx, qy = q1[0] - q0[0], q1[1] - q0[1]
    denom = px * qy - py * qx
    t = ((q0[0] - p0[0]) * qy - (q0[1] - p0[1]) * qx) / denom
    return float(p0[0] + t * px), float(p0[1] + t * py)


def closest_point_pair(
    a: Geometry, b: Geometry
) -> tuple[tuple[float, float], tuple[float, float]]:
    """The pair (point on ``a``, point on ``b``) attaining
    ``distance(a, b)`` — the kernel behind ``ST_ClosestPoint`` (first
    element) and ``ST_ShortestLine`` (both). Intersecting inputs return
    a shared point (distance 0), matching the distance kernel's
    short-circuits."""
    sa, sb = _all_segments(a), _all_segments(b)
    cp = _crossing_point(sa, sb)
    if cp is not None:
        return cp, cp
    for g, other in ((a, b), (b, a)):
        polys = [leaf for leaf in g.children() if leaf.kind == "Polygon"]
        if not polys:
            continue
        for leaf in other.children():
            if leaf.kind == "Point":
                v = (float(leaf.parts[0]), float(leaf.parts[1]))
            else:
                arr = leaf.parts[0] if leaf.kind == "Polygon" else leaf.parts
                v = (float(arr[0, 0]), float(arr[0, 1]))
            for poly in polys:
                if _point_in_rings(v[0], v[1], poly.parts):
                    return v, v
    pa, pb = _all_vertices(a), _all_vertices(b)

    def _best_vertex_vs_segs(pts, segs):
        """(d, point, projection) of the closest vertex/segment pair."""
        if not len(pts) or not len(segs):
            return math.inf, None, None
        p = pts[:, None, :]
        s0 = segs[None, :, 0:2]
        sv = segs[None, :, 2:4] - s0
        ln2 = (sv * sv).sum(-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.clip(
                ((p - s0) * sv).sum(-1) / np.where(ln2 > 0, ln2, 1), 0, 1
            )
        proj = s0 + t[..., None] * sv
        d = np.hypot(p[..., 0] - proj[..., 0], p[..., 1] - proj[..., 1])
        i, j = np.unravel_index(int(np.argmin(d)), d.shape)
        return (
            float(d[i, j]),
            (float(pts[i, 0]), float(pts[i, 1])),
            (float(proj[i, j, 0]), float(proj[i, j, 1])),
        )

    best = (math.inf, None, None)
    d, p, q = _best_vertex_vs_segs(pa, sb)
    if d < best[0]:
        best = (d, p, q)
    d, p, q = _best_vertex_vs_segs(pb, sa)
    if d < best[0]:
        best = (d, q, p)  # swap: first element must lie on a
    if len(pa) and len(pb):
        diff = pa[:, None, :] - pb[None, :, :]
        dd = np.hypot(diff[..., 0], diff[..., 1])
        i, j = np.unravel_index(int(np.argmin(dd)), dd.shape)
        if float(dd[i, j]) < best[0]:
            best = (
                float(dd[i, j]),
                (float(pa[i, 0]), float(pa[i, 1])),
                (float(pb[j, 0]), float(pb[j, 1])),
            )
    if best[1] is None:
        raise GeoDBError("st_closestpoint: empty geometry operand")
    return best[1], best[2]


def boundary(geom: Geometry) -> Geometry | None:
    """``ST_Boundary``: polygons -> their rings as (Multi)LineString,
    lines -> endpoint MultiPoint (closed lines have an EMPTY boundary ->
    None, the engine's SQL-NULL spelling of EMPTY), points -> None."""
    rings: list[np.ndarray] = []
    ends: list[np.ndarray] = []
    for leaf in geom.children():
        if leaf.kind == "Polygon":
            rings.extend(np.asarray(r, dtype=np.float64) for r in leaf.parts)
        elif leaf.kind == "LineString":
            arr = leaf.parts
            if len(arr) and not (
                arr[0, 0] == arr[-1, 0] and arr[0, 1] == arr[-1, 1]
            ):
                ends.append(arr[0].copy())
                ends.append(arr[-1].copy())
    if rings:
        lines = [Geometry("LineString", r) for r in rings]
        if len(lines) == 1:
            out = lines[0]
            out.srid = geom.srid
            return out
        return Geometry("MultiLineString", lines, geom.srid)
    if ends:
        if len(ends) == 1:
            return Geometry("Point", ends[0], geom.srid)
        return Geometry(
            "MultiPoint",
            [Geometry("Point", e) for e in ends],
            geom.srid,
        )
    return None


def make_line(geoms: list["Geometry"]) -> Geometry | None:
    """PostGIS ``ST_MakeLine``: concatenate Point / MultiPoint /
    LineString coordinates in INPUT ORDER into one LineString (the
    trajectory-building aggregate — reference passthrough admits the
    SQL form, geodb.sql:1147-1167). Duplicate consecutive vertices are
    preserved exactly as PG does; other kinds raise; fewer than two
    resulting vertices -> None (PG would emit a degenerate single-point
    line that nothing downstream accepts — DOCUMENTED DEVIATION,
    COVERAGE.md)."""
    coords: list[np.ndarray] = []
    srid = 0
    for g in geoms:
        if g is None:
            continue
        srid = srid or g.srid
        if g.kind == "Point":
            coords.append(g.parts.reshape(1, 2))
        elif g.kind == "LineString":
            coords.append(g.parts)
        elif g.kind == "MultiPoint":
            coords.extend(p.parts.reshape(1, 2) for p in g.parts)
        else:
            raise GeoDBError(
                f"st_makeline: unsupported input kind {g.kind} (PostGIS "
                "accepts Point, MultiPoint and LineString)"
            )
    if not coords:
        return None
    arr = np.concatenate(coords, axis=0)
    if len(arr) < 2:
        return None
    return Geometry("LineString", np.ascontiguousarray(arr, dtype=np.float64), srid)


def line_merge(geom: Geometry) -> Geometry | None:
    """``ST_LineMerge``: sew the input's linework together wherever
    exactly two line ends meet (the GEOS LineMerger contract): chains
    walk through degree-2 endpoint nodes, reversing member direction as
    needed; a node shared by 1 or 3+ ends stops the chain (T-junctions
    are preserved); pure degree-2 cycles close into rings. Endpoint
    equality is EXACT (PostGIS parity — no snapping). Non-lineal members
    are ignored; an input with no linework returns None (the engine's
    SQL-NULL spelling of PostGIS' GEOMETRYCOLLECTION EMPTY). Output
    member order is deterministic (sorted by first coordinate)."""
    lines: list[np.ndarray] = []
    for leaf in geom.children():
        if leaf.kind != "LineString":
            continue
        arr = np.asarray(leaf.parts, dtype=np.float64)
        keep = [0] + [
            i for i in range(1, len(arr))
            if arr[i, 0] != arr[i - 1, 0] or arr[i, 1] != arr[i - 1, 1]
        ]
        arr = arr[keep]
        if len(arr) >= 2:
            lines.append(arr)
    if not lines:
        return None

    def key(pt) -> tuple[float, float]:
        return (float(pt[0]), float(pt[1]))

    # node -> list of (line index, end: 0=start, 1=last)
    incident: dict[tuple[float, float], list[tuple[int, int]]] = {}
    for i, arr in enumerate(lines):
        incident.setdefault(key(arr[0]), []).append((i, 0))
        incident.setdefault(key(arr[-1]), []).append((i, 1))

    used = [False] * len(lines)
    merged: list[np.ndarray] = []

    def walk(i: int, end: int) -> np.ndarray:
        """Consume the chain starting with line i oriented so that
        ``end`` is its tail; extend through degree-2 nodes."""
        used[i] = True
        coords = lines[i] if end == 0 else lines[i][::-1]
        out = [coords]
        cur = key(coords[-1])
        while True:
            inc = incident[cur]
            if len(inc) != 2:
                break
            nxt = [(j, e) for j, e in inc if not used[j]]
            if not nxt:
                break
            j, e = nxt[0]
            used[j] = True
            seg = lines[j] if e == 0 else lines[j][::-1]
            out.append(seg[1:])
            cur = key(seg[-1])
        return np.concatenate(out)

    # open chains first: start at every node whose degree != 2
    for node, inc in incident.items():
        if len(inc) == 2:
            continue
        for i, end in inc:
            if not used[i]:
                merged.append(walk(i, end))
    # what remains are pure degree-2 cycles
    for i in range(len(lines)):
        if not used[i]:
            merged.append(walk(i, 0))

    merged.sort(key=lambda a: (float(a[0, 0]), float(a[0, 1]), len(a)))
    out = [Geometry("LineString", a) for a in merged]
    if len(out) == 1:
        g = out[0]
        g.srid = geom.srid
        return g
    return Geometry("MultiLineString", out, geom.srid)


# ---------------------------------------------------------------------------
# ST_MinimumBoundingCircle / ST_OrientedEnvelope
# ---------------------------------------------------------------------------


def _circumcircle(p, q, r):
    """Circumcircle of three points, or None when collinear."""
    ax, ay = p
    bx, by = q
    cx, cy = r
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    return ux, uy, math.hypot(ax - ux, ay - uy)


def minimum_bounding_circle(geom: Geometry) -> tuple[float, float, float]:
    """(cx, cy, radius) of the exact minimum enclosing circle of the
    geometry's vertices — the deterministic incremental Welzl scheme
    (points in stored order; each point outside the current circle
    rebuilds it with that point pinned to the boundary). Vertex counts
    per geometry are small, so the worst-case quadratic rebuild is
    irrelevant; no randomness, so results are replayable."""
    pts = [
        (float(x), float(y)) for x, y in _all_vertices(geom)
    ]
    if not pts:
        raise GeoDBError("st_minimumboundingcircle: empty geometry")
    # dedupe, keep first-seen order (closure points would re-trigger)
    seen: set = set()
    P = []
    for p in pts:
        if p not in seen:
            seen.add(p)
            P.append(p)

    def _in(c, p, eps=1e-9):
        return math.hypot(p[0] - c[0], p[1] - c[1]) <= c[2] * (1 + eps) + 1e-300

    def _two(p, q):
        return (
            (p[0] + q[0]) / 2.0,
            (p[1] + q[1]) / 2.0,
            math.hypot(p[0] - q[0], p[1] - q[1]) / 2.0,
        )

    def _with_two(pts2, p, q):
        c = _two(p, q)
        for r in pts2:
            if not _in(c, r):
                cc = _circumcircle(p, q, r)
                if cc is not None:
                    c = cc
        return c

    def _with_one(pts1, p):
        c = _two(pts1[0], p) if pts1 else (p[0], p[1], 0.0)
        for i, q in enumerate(pts1):
            if not _in(c, q):
                c = _with_two(pts1[:i], q, p)
        return c

    c = (P[0][0], P[0][1], 0.0)
    for i, p in enumerate(P):
        if not _in(c, p):
            c = _with_one(P[:i], p)
    return c


def oriented_envelope(geom: Geometry) -> Geometry:
    """``ST_OrientedEnvelope``: the minimum-AREA rotated rectangle
    containing the geometry — rotating calipers over the convex hull
    (the optimum is flush with a hull edge). Degenerate hulls (point /
    segment) return the hull itself, PostGIS behavior."""
    hull = convex_hull(geom)
    if hull is None or hull.kind != "Polygon":
        return hull  # point or segment
    ring = hull.parts[0]
    pts = ring[:-1]
    best = None
    for i in range(len(pts)):
        ex = float(pts[(i + 1) % len(pts), 0] - pts[i, 0])
        ey = float(pts[(i + 1) % len(pts), 1] - pts[i, 1])
        ln = math.hypot(ex, ey)
        if ln == 0.0:
            continue
        c, s = ex / ln, ey / ln
        # rotate every hull point by the edge's inverse angle
        xs = pts[:, 0] * c + pts[:, 1] * s
        ys = -pts[:, 0] * s + pts[:, 1] * c
        x0, x1 = float(xs.min()), float(xs.max())
        y0, y1 = float(ys.min()), float(ys.max())
        a = (x1 - x0) * (y1 - y0)
        if best is None or a < best[0]:
            best = (a, c, s, x0, x1, y0, y1)
    _, c, s, x0, x1, y0, y1 = best
    corners = [
        (x0 * c - y0 * s, x0 * s + y0 * c),
        (x1 * c - y0 * s, x1 * s + y0 * c),
        (x1 * c - y1 * s, x1 * s + y1 * c),
        (x0 * c - y1 * s, x0 * s + y1 * c),
    ]
    corners.append(corners[0])
    return Geometry(
        "Polygon", [np.asarray(corners, dtype=np.float64)], geom.srid
    )


# ---------------------------------------------------------------------------
# scalar kit: ST_IsClosed / ST_IsSimple / ST_IsRing / ST_Multi /
# ST_CollectionExtract / ST_RemoveRepeatedPoints / ST_Segmentize /
# ST_HausdorffDistance / ST_Angle  (PostGIS basics over the kernel model)
# ---------------------------------------------------------------------------


def is_closed(geom: Geometry) -> bool:
    """``ST_IsClosed``: every lineal member starts where it ends;
    points and polygons answer True like PostGIS."""
    for leaf in geom.children():
        if leaf.kind == "LineString":
            arr = leaf.parts
            if len(arr) < 2 or not (
                arr[0, 0] == arr[-1, 0] and arr[0, 1] == arr[-1, 1]
            ):
                return False
    return True


def is_simple(geom: Geometry) -> bool:
    """``ST_IsSimple`` (SFS semantics, like GEOS): no self-intersection
    points except boundary endpoints. Points: always simple; MultiPoint:
    simple iff no duplicates; polygonal: delegates to :func:`is_valid`
    (for polygons SFS simplicity and validity coincide on this kernel's
    model — documented). Lineal rules checked: (1) proper crossings,
    (2) a coordinate revisited by any non-boundary vertex occurrence
    (closed rings' start=end counts once), (3) a vertex in the strict
    interior of a non-incident segment, (4) collinear segment overlap."""
    kinds = {leaf.kind for leaf in geom.children()}
    if kinds <= {"Point"}:
        pts = _all_vertices(geom)
        return len(np.unique(pts, axis=0)) == len(pts)
    if "Polygon" in kinds:
        return is_valid(geom)
    lines = [
        np.asarray(leaf.parts, dtype=np.float64)
        for leaf in geom.children()
        if leaf.kind == "LineString" and len(leaf.parts) >= 2
    ]
    segs = _all_segments(geom)
    # (1) any proper crossing anywhere
    if _crossing_point(segs, segs) is not None:
        return False
    # (2) coordinate multiplicity: every extra visit must be a boundary
    # endpoint; a closed ring's start=end pair is one interior occurrence
    occ: dict[tuple[float, float], list[bool]] = {}
    for arr in lines:
        closed = bool(
            arr[0, 0] == arr[-1, 0] and arr[0, 1] == arr[-1, 1]
        )
        last = len(arr) - (1 if closed else 0)
        for i in range(last):
            key = (float(arr[i, 0]), float(arr[i, 1]))
            boundary = (not closed) and (i == 0 or i == len(arr) - 1)
            occ.setdefault(key, []).append(boundary)
    for flags in occ.values():
        if len(flags) > 1 and not all(flags):
            return False
    # (3) vertex strictly inside a non-incident segment (T-touch)
    a = segs[:, 0:2]
    ab = segs[:, 2:4] - a
    denom = (ab * ab).sum(-1)
    for key in occ:
        vx, vy = key
        ap0 = vx - a[:, 0]
        ap1 = vy - a[:, 1]
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (ap0 * ab[:, 0] + ap1 * ab[:, 1]) / np.where(
                denom > 0, denom, 1.0
            )
        cross = ab[:, 0] * ap1 - ab[:, 1] * ap0
        ln = np.sqrt(np.where(denom > 0, denom, 1.0))
        hit = (
            (np.abs(cross) / ln < 1e-12)
            & (t > 1e-12)
            & (t < 1 - 1e-12)
            & (denom > 0)
        )
        if bool(hit.any()):
            return False
    # (4) collinear overlapping segments (identical/partial overlaps
    # whose endpoints are all shared vertices slip past 2 and 3) — a
    # min-x sweep: segments sorted by their left x, the inner loop
    # breaks once the next segment starts past the current one's right
    # x, so the pair loop is O(n log n + n*k) for k x-overlapping pairs
    # instead of a blind O(n^2)
    minx = np.minimum(segs[:, 0], segs[:, 2])
    maxx = np.maximum(segs[:, 0], segs[:, 2])
    order = np.argsort(minx, kind="stable")
    s = segs[order]
    smin, smax = minx[order], maxx[order]
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            if smin[j] > smax[i] + 1e-12:
                break
            p0, p1 = s[i, 0:2], s[i, 2:4]
            q0, q1 = s[j, 0:2], s[j, 2:4]
            d = p1 - p0
            c1 = d[0] * (q0[1] - p0[1]) - d[1] * (q0[0] - p0[0])
            c2 = d[0] * (q1[1] - p0[1]) - d[1] * (q1[0] - p0[0])
            scale = max(1.0, abs(d[0]) + abs(d[1]))
            if abs(c1) > 1e-12 * scale or abs(c2) > 1e-12 * scale:
                continue
            ll = float((d * d).sum())
            if ll == 0:
                continue
            t0 = float((q0 - p0) @ d) / ll
            t1 = float((q1 - p0) @ d) / ll
            if min(t0, t1) < 1 - 1e-12 and max(t0, t1) > 1e-12:
                return False
    return True


def is_ring(geom: Geometry) -> bool:
    """``ST_IsRing``: a closed AND simple LineString."""
    return geom.kind == "LineString" and is_closed(geom) and is_simple(geom)


_MULTI_OF = {
    "Point": "MultiPoint",
    "LineString": "MultiLineString",
    "Polygon": "MultiPolygon",
}


def multi(geom: Geometry) -> Geometry:
    """``ST_Multi``: promote a single geometry to its Multi* wrapper;
    Multi*/collections pass through unchanged."""
    if geom.kind in _MULTI_OF:
        return Geometry(
            _MULTI_OF[geom.kind],
            [Geometry(geom.kind, geom.parts)],
            geom.srid,
        )
    return geom


def collection_extract(geom: Geometry, dim: int) -> Geometry | None:
    """``ST_CollectionExtract(g, type)``: the members of the requested
    type (1=Point, 2=LineString, 3=Polygon) as a Multi* — PostGIS'
    always-multi spelling; none -> None (the engine's EMPTY)."""
    kind = {1: "Point", 2: "LineString", 3: "Polygon"}.get(int(dim))
    if kind is None:
        raise GeoDBError(
            f"st_collectionextract: type must be 1, 2 or 3 (got {dim})"
        )
    members = [
        Geometry(leaf.kind, leaf.parts)
        for leaf in geom.children()
        if leaf.kind == kind
    ]
    if not members:
        return None
    return Geometry(_MULTI_OF[kind], members, geom.srid)


def remove_repeated_points(
    geom: Geometry, tolerance: float = 0.0
) -> Geometry:
    """``ST_RemoveRepeatedPoints``: drop consecutive vertices within
    ``tolerance`` of their predecessor (0 -> exact duplicates only).
    Lines keep at least their two end vertices and rings their minimal
    closure, like PostGIS."""

    def _dedupe(arr: np.ndarray, closed: bool) -> np.ndarray:
        keep = [0]
        for i in range(1, len(arr)):
            dx = arr[i, 0] - arr[keep[-1], 0]
            dy = arr[i, 1] - arr[keep[-1], 1]
            if math.hypot(dx, dy) > tolerance:
                keep.append(i)
        out = arr[keep]
        if closed and (
            out[0, 0] != out[-1, 0] or out[0, 1] != out[-1, 1]
        ):
            out = np.vstack([out, out[:1]])
        if closed and len(out) < 4:
            # PostGIS ring floor: a tolerance larger than the ring's
            # extent must NOT collapse it below a structurally valid
            # 4-point ring — keep the first 3 pairwise-distinct original
            # vertices plus closure; fewer than 3 distinct vertices ->
            # the original (already-degenerate) ring unchanged
            uniq = [0]
            for i in range(1, len(arr)):
                if all(
                    arr[i, 0] != arr[k, 0] or arr[i, 1] != arr[k, 1]
                    for k in uniq
                ):
                    uniq.append(i)
                if len(uniq) == 3:
                    break
            if len(uniq) < 3:
                return arr
            out = np.vstack([arr[uniq], arr[uniq[0]: uniq[0] + 1]])
        if not closed and len(out) == 1 and len(arr) >= 2:
            out = np.vstack([out, out])  # PG keeps 2-point degenerate lines
        return out

    if geom.kind == "LineString":
        return Geometry("LineString", _dedupe(geom.parts, False), geom.srid)
    if geom.kind == "Polygon":
        return Geometry(
            "Polygon", [_dedupe(r, True) for r in geom.parts], geom.srid
        )
    if geom.kind in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return Geometry(
            geom.kind,
            [remove_repeated_points(m, tolerance) for m in geom.parts],
            geom.srid,
        )
    return geom


def segmentize(geom: Geometry, max_length: float) -> Geometry:
    """``ST_Segmentize``: insert vertices so no segment exceeds
    ``max_length`` (each segment splits into ceil(len/max) EQUAL
    pieces, the PostGIS planar behavior)."""
    if max_length <= 0:
        raise GeoDBError("st_segmentize: max_length must be positive")

    def _densify(arr: np.ndarray) -> np.ndarray:
        out = [arr[:1]]
        for i in range(len(arr) - 1):
            p, q = arr[i], arr[i + 1]
            ln = math.hypot(q[0] - p[0], q[1] - p[1])
            k = max(1, math.ceil(ln / max_length - 1e-12))
            ts = np.linspace(0.0, 1.0, k + 1)[1:]
            out.append(p[None, :] + ts[:, None] * (q - p)[None, :])
        return np.concatenate(out, axis=0)

    if geom.kind == "LineString":
        return Geometry("LineString", _densify(geom.parts), geom.srid)
    if geom.kind == "Polygon":
        return Geometry(
            "Polygon", [_densify(r) for r in geom.parts], geom.srid
        )
    if geom.kind in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return Geometry(
            geom.kind,
            [segmentize(m, max_length) for m in geom.parts],
            geom.srid,
        )
    return geom


def _vertex_dists_to(geom_pts: np.ndarray, other: Geometry) -> np.ndarray:
    """Per-vertex exact distance to ``other`` (nearest point ON it)."""
    segs = _all_segments(other)
    if len(segs):
        p = geom_pts[:, None, :]
        a = segs[None, :, 0:2]
        ab = segs[None, :, 2:4] - a
        denom = (ab * ab).sum(-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.clip(
                ((p - a) * ab).sum(-1) / np.where(denom > 0, denom, 1.0),
                0.0,
                1.0,
            )
        proj = a + t[..., None] * ab
        return np.hypot(
            p[..., 0] - proj[..., 0], p[..., 1] - proj[..., 1]
        ).min(axis=1)
    verts = _all_vertices(other)
    p = geom_pts[:, None, :]
    return np.hypot(
        p[..., 0] - verts[None, :, 0], p[..., 1] - verts[None, :, 1]
    ).min(axis=1)


def hausdorff_distance(a: Geometry, b: Geometry) -> float:
    """``ST_HausdorffDistance``: the discrete Hausdorff distance GEOS
    computes without densification — max over either geometry's
    VERTICES of the exact distance to the other geometry."""
    da = _vertex_dists_to(_all_vertices(a), b)
    db = _vertex_dists_to(_all_vertices(b), a)
    return float(max(da.max() if len(da) else 0.0,
                     db.max() if len(db) else 0.0))


def angle_3pt(p1: Geometry, p2: Geometry, p3: Geometry) -> float | None:
    """``ST_Angle(P1, P2, P3)``: the clockwise angle at P2 from ray
    P2->P1 to ray P2->P3, in [0, 2*pi) — pinned to the PostGIS doc
    example ST_Angle(P(5 0), P(0 0), P(5 5)) = pi/4."""
    for g in (p1, p2, p3):
        if g.kind != "Point":
            raise GeoDBError("st_angle: all three arguments must be points")
    ox, oy = float(p2.parts[0]), float(p2.parts[1])
    a1 = math.atan2(float(p1.parts[0]) - ox, float(p1.parts[1]) - oy)
    a3 = math.atan2(float(p3.parts[0]) - ox, float(p3.parts[1]) - oy)
    if (p1.parts[0] == ox and p1.parts[1] == oy) or (
        p3.parts[0] == ox and p3.parts[1] == oy
    ):
        return None
    return (a1 - a3) % (2.0 * math.pi)


def _splitmix64(state: int) -> tuple[int, int]:
    """One splitmix64 step (Steele, Lea & Flood 2014 — the public-domain
    PRNG): returns (next_state, output). Pure integer arithmetic, fully
    deterministic across platforms."""
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, z ^ (z >> 31)


def generate_points(geom: Geometry, n: int, seed: int = 0) -> Geometry | None:
    """``ST_GeneratePoints(g, n, seed)``: n uniform points inside the
    (multi)polygon — rejection sampling over the envelope with a seeded
    splitmix64 stream, so the result is bit-deterministic per (geometry,
    n, seed) on every platform (the engine's oracle-gate contract; the
    seedless PostGIS 2-arg form is deliberately not registered).
    Envelope rejection IS area-uniform across members, like PostGIS.
    Degenerate/empty input or n <= 0 -> None; an acceptance rate below
    1/1000 (pathologically thin polygons) raises instead of spinning."""
    if geom is None or n <= 0:
        return None
    polys = [
        leaf.parts for leaf in geom.children() if leaf.kind == "Polygon"
    ]
    if not polys:
        return None
    x0, y0, x1, y1 = envelope(geom)
    if x1 - x0 <= 0 or y1 - y0 <= 0:
        return None
    rings = [r for p in polys for r in p]
    state = (int(seed) * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    pts: list[tuple[float, float]] = []
    tries = 0
    limit = max(1000, n * 1000)
    while len(pts) < n:
        tries += 1
        if tries > limit:
            raise GeoDBError(
                f"st_generatepoints: acceptance below 1/1000 after "
                f"{tries} draws — polygon too thin for envelope rejection"
            )
        state, u = _splitmix64(state)
        state, v = _splitmix64(state)
        px = x0 + (u / 2.0**64) * (x1 - x0)
        py = y0 + (v / 2.0**64) * (y1 - y0)
        # even-odd across ALL rings: holes reject, any member accepts
        if any(
            _point_in_rings(px, py, p) for p in polys
        ):
            pts.append((px, py))
    members = [
        Geometry("Point", np.asarray(p, dtype=np.float64)) for p in pts
    ]
    if len(members) == 1:
        out = members[0]
        out.srid = geom.srid
        return out
    return Geometry("MultiPoint", members, geom.srid)


def snap_geometry(
    geom: Geometry, reference: Geometry, tolerance: float
) -> Geometry:
    """``ST_Snap(input, reference, tolerance)`` — the two GEOS snapping
    rules: (1) every input vertex within ``tolerance`` of a reference
    VERTEX moves onto the nearest one; (2) a reference vertex within
    ``tolerance`` of an input SEGMENT's interior is inserted into it.
    Ring closure is preserved (first/last snap together)."""
    if tolerance < 0:
        raise GeoDBError("st_snap: tolerance must be non-negative")
    ref = _all_vertices(reference)
    if not len(ref):
        return geom

    def _snap_arr(arr: np.ndarray, closed: bool) -> np.ndarray:
        a = np.asarray(arr, dtype=np.float64).copy()
        # rule 1: vertex -> nearest reference vertex within tolerance
        d = np.hypot(
            a[:, None, 0] - ref[None, :, 0], a[:, None, 1] - ref[None, :, 1]
        )
        j = d.argmin(axis=1)
        hit = d[np.arange(len(a)), j] <= tolerance
        a[hit] = ref[j[hit]]
        if closed:
            a[-1] = a[0]
        # rule 2: insert unsnapped-to reference vertices lying near a
        # segment interior, at their projection parameter order
        out = [a[0]]
        for i in range(len(a) - 1):
            p, q = a[i], a[i + 1]
            dseg = q - p
            ll = float(dseg @ dseg)
            inserts: list[tuple[float, np.ndarray]] = []
            if ll > 0:
                t = ((ref - p) @ dseg) / ll
                proj = p[None, :] + t[:, None] * dseg[None, :]
                dist = np.hypot(ref[:, 0] - proj[:, 0], ref[:, 1] - proj[:, 1])
                near = (
                    (t > 1e-9) & (t < 1 - 1e-9) & (dist <= tolerance)
                )
                for k in np.nonzero(near)[0]:
                    # skip reference vertices already equal to an endpoint
                    if (ref[k] == p).all() or (ref[k] == q).all():
                        continue
                    inserts.append((float(t[k]), ref[k]))
            for _, rv in sorted(inserts, key=lambda x: x[0]):
                if not (out[-1] == rv).all():
                    out.append(rv.copy())
            if not (out[-1] == q).all() or i == len(a) - 2:
                out.append(q)
        return np.asarray(out, dtype=np.float64)

    if geom.kind == "Point":
        snapped = _snap_arr(geom.parts.reshape(1, 2), False)[0]
        return Geometry("Point", snapped, geom.srid)
    if geom.kind == "LineString":
        return Geometry("LineString", _snap_arr(geom.parts, False), geom.srid)
    if geom.kind == "Polygon":
        return Geometry(
            "Polygon",
            [_snap_arr(r, True) for r in geom.parts],
            geom.srid,
        )
    return Geometry(
        geom.kind,
        [snap_geometry(m, reference, tolerance) for m in geom.parts],
        geom.srid,
    )


def frechet_distance(a: Geometry, b: Geometry) -> float:
    """``ST_FrechetDistance``: the DISCRETE Fréchet distance over the two
    vertex sequences (Eiter & Mannila 1994 coupling DP — exactly what
    GEOS computes without densification). Point/line inputs use their
    vertex order; O(n*m) table, numpy row sweep."""
    p = _all_vertices(a)
    q = _all_vertices(b)
    if not len(p) or not len(q):
        return float("nan")
    d = np.hypot(
        p[:, None, 0] - q[None, :, 0], p[:, None, 1] - q[None, :, 1]
    )
    n, m = d.shape
    row = np.empty(m, dtype=np.float64)
    row[0] = d[0, 0]
    for j in range(1, m):
        row[j] = max(row[j - 1], d[0, j])
    for i in range(1, n):
        prev = row.copy()
        row[0] = max(prev[0], d[i, 0])
        for j in range(1, m):
            row[j] = max(min(prev[j], prev[j - 1], row[j - 1]), d[i, j])
    return float(row[-1])


def unary_union(geom: Geometry) -> Geometry | None:
    """``ST_UnaryUnion``: dissolve a geometry's own members — polygonal
    members through the overlay union fold, lineal members through full
    noding (PostGIS nodes linework under unary union), point members by
    exact dedup. Mixed collections resolve per dimension and return the
    highest-dimension result's collection (the engine's homogeneous
    spelling; COVERAGE.md)."""
    from xcube_geodb_spark.geometry.overlay import node_linework, union_all

    polys = [leaf for leaf in geom.children() if leaf.kind == "Polygon"]
    lines = [leaf for leaf in geom.children() if leaf.kind == "LineString"]
    points = [leaf for leaf in geom.children() if leaf.kind == "Point"]
    if polys:
        out = union_all(
            [Geometry("Polygon", p.parts) for p in polys]
        )
        if out is not None:
            out.srid = geom.srid
        return out
    if lines:
        return node_linework(
            Geometry(
                "MultiLineString",
                [Geometry("LineString", li.parts) for li in lines],
                geom.srid,
            )
        )
    if points:
        uniq = np.unique(
            np.asarray([p.parts for p in points], dtype=np.float64), axis=0
        )
        if len(uniq) == 1:
            return Geometry("Point", uniq[0], geom.srid)
        return Geometry(
            "MultiPoint",
            [Geometry("Point", u) for u in uniq],
            geom.srid,
        )
    return None


def add_point(geom: Geometry, pt: Geometry, position: int = -1) -> Geometry:
    """``ST_AddPoint(line, point[, position])``: insert before the
    0-based ``position`` (-1 appends, PG's default)."""
    if geom.kind != "LineString" or pt.kind != "Point":
        raise GeoDBError("st_addpoint: (LineString, Point) required")
    arr = geom.parts
    n = len(arr)
    p = pt.parts.reshape(1, 2)
    if position == -1 or position == n:
        out = np.vstack([arr, p])
    elif 0 <= position < n:
        out = np.vstack([arr[:position], p, arr[position:]])
    else:
        raise GeoDBError(
            f"st_addpoint: position {position} out of range [0, {n}]"
        )
    return Geometry("LineString", out, geom.srid)


def remove_point(geom: Geometry, offset: int) -> Geometry:
    """``ST_RemovePoint(line, offset)``: drop the 0-based vertex; like
    PG, removing below two remaining vertices is an error."""
    if geom.kind != "LineString":
        raise GeoDBError("st_removepoint: LineString required")
    arr = geom.parts
    n = len(arr)
    if not 0 <= offset < n:
        raise GeoDBError(
            f"st_removepoint: offset {offset} out of range [0, {n})"
        )
    if n <= 2:
        raise GeoDBError("st_removepoint: a line needs at least 2 points")
    return Geometry(
        "LineString",
        np.vstack([arr[:offset], arr[offset + 1:]]),
        geom.srid,
    )


def set_point(geom: Geometry, index: int, pt: Geometry) -> Geometry:
    """``ST_SetPoint(line, index, point)``: replace the vertex at the
    0-based index (negative counts from the end, like PG)."""
    if geom.kind != "LineString" or pt.kind != "Point":
        raise GeoDBError("st_setpoint: (LineString, Point) required")
    arr = geom.parts.copy()
    n = len(arr)
    i = index if index >= 0 else n + index
    if not 0 <= i < n:
        raise GeoDBError(
            f"st_setpoint: index {index} out of range for {n} points"
        )
    arr[i] = pt.parts
    return Geometry("LineString", arr, geom.srid)


def offset_curve(
    geom: Geometry, distance_off: float, quad_segs: int = 8
) -> Geometry | None:
    """``ST_OffsetCurve(line, d)``: the parallel curve at signed offset
    ``d`` — positive to the LEFT of travel direction, like PostGIS.
    Per-segment translation along the left normal; at each interior
    vertex the joint is TRIMMED (line-line intersection) when the path
    turns toward the offset side and joined with a circular arc
    (``quad_segs`` points per quarter circle) when it turns away —
    exactly the closed forms: a right-angle inner joint shortens each
    leg by |d|, an outer joint adds (pi/2)|d| of arc. Degenerate trims
    (offset deeper than the local feature, near-parallel joints) fall
    back to a direct connection rather than folding the curve —
    DOCUMENTED simplification vs GEOS' full self-intersection cleanup
    (COVERAGE.md). d = 0 returns the input; non-lineal input raises."""
    if geom.kind == "MultiLineString":
        members = [
            offset_curve(m, distance_off, quad_segs) for m in geom.parts
        ]
        members = [m for m in members if m is not None]
        if not members:
            return None
        return Geometry("MultiLineString", members, geom.srid)
    if geom.kind != "LineString":
        raise GeoDBError("st_offsetcurve: lineal input required")
    if distance_off == 0:
        return Geometry("LineString", geom.parts.copy(), geom.srid)
    arr = np.asarray(geom.parts, dtype=np.float64)
    # collapse exact duplicate consecutive vertices first
    keep = [0] + [
        i for i in range(1, len(arr))
        if arr[i, 0] != arr[i - 1, 0] or arr[i, 1] != arr[i - 1, 1]
    ]
    arr = arr[keep]
    if len(arr) < 2:
        return None
    d = float(distance_off)
    segs = []
    for i in range(len(arr) - 1):
        p, q = arr[i], arr[i + 1]
        ln = math.hypot(q[0] - p[0], q[1] - p[1])
        nx, ny = -(q[1] - p[1]) / ln, (q[0] - p[0]) / ln  # left normal
        segs.append(
            (p + d * np.array([nx, ny]), q + d * np.array([nx, ny]),
             (q - p) / ln)
        )
    out = [segs[0][0]]
    for i in range(len(segs) - 1):
        a1, b1, dir1 = segs[i]
        a2, b2, dir2 = segs[i + 1]
        cross = dir1[0] * dir2[1] - dir1[1] * dir2[0]
        turn_toward = cross * d > 0  # turning into the offset side
        if abs(cross) < 1e-12:
            out.append(b1)  # straight-through joint
            continue
        if turn_toward:
            # trim: intersect the two offset support lines
            denom = dir1[0] * dir2[1] - dir1[1] * dir2[0]
            t = (
                (a2[0] - a1[0]) * dir2[1] - (a2[1] - a1[1]) * dir2[0]
            ) / denom
            x = a1 + t * dir1
            seg1_len = math.hypot(b1[0] - a1[0], b1[1] - a1[1])
            if -1e-9 <= t <= seg1_len + 1e-9:
                out.append(x)
            else:  # offset deeper than the feature: direct connect
                out.append(b1)
                out.append(a2)
        else:
            # round join: arc about the input vertex, radius |d|
            v = arr[i + 1]
            ang1 = math.atan2(b1[1] - v[1], b1[0] - v[0])
            ang2 = math.atan2(a2[1] - v[1], a2[0] - v[0])
            sweep = ang2 - ang1
            ccw = d < 0  # right offset: outer arcs run counter-clockwise
            if ccw and sweep < 0:
                sweep += 2 * math.pi
            if not ccw and sweep > 0:
                sweep -= 2 * math.pi
            n_pts = max(1, int(math.ceil(abs(sweep) / (math.pi / 2)
                                         * quad_segs)))
            out.append(b1)
            for k in range(1, n_pts):
                a = ang1 + sweep * k / n_pts
                out.append(
                    v + abs(d) * np.array([math.cos(a), math.sin(a)])
                )
            out.append(a2)
    out.append(segs[-1][1])
    # drop consecutive duplicates the trims may have produced
    cleaned = [out[0]]
    for p in out[1:]:
        if p[0] != cleaned[-1][0] or p[1] != cleaned[-1][1]:
            cleaned.append(p)
    if len(cleaned) < 2:
        return None
    return Geometry(
        "LineString", np.asarray(cleaned, dtype=np.float64), geom.srid
    )


def force_polygon_orientation(geom: Geometry, shell_cw: bool) -> Geometry:
    """``ST_ForcePolygonCW`` / ``ST_ForcePolygonCCW``: orient every
    exterior ring the requested way and every hole the opposite way;
    non-polygonal members pass through."""

    def _oriented(ring: np.ndarray, want_cw: bool) -> np.ndarray:
        signed = _ring_shoelace(np.asarray(ring, dtype=np.float64))
        is_cw = signed < 0
        return ring[::-1].copy() if is_cw != want_cw else ring

    if geom.kind == "Polygon":
        rings = [_oriented(geom.parts[0], shell_cw)] + [
            _oriented(r, not shell_cw) for r in geom.parts[1:]
        ]
        return Geometry("Polygon", rings, geom.srid)
    if geom.kind in ("MultiPolygon", "GeometryCollection"):
        return Geometry(
            geom.kind,
            [force_polygon_orientation(m, shell_cw) for m in geom.parts],
            geom.srid,
        )
    return geom


def polygon_orientation_is(geom: Geometry, shell_cw: bool) -> bool | None:
    """``ST_IsPolygonCW`` / ``ST_IsPolygonCCW``: True when every shell
    has the requested orientation and every hole the opposite; True for
    non-areal inputs, like PostGIS."""
    ok = True
    for leaf in geom.children():
        if leaf.kind != "Polygon":
            continue
        shell_is_cw = _ring_shoelace(
            np.asarray(leaf.parts[0], dtype=np.float64)
        ) < 0
        if shell_is_cw != shell_cw:
            ok = False
        for r in leaf.parts[1:]:
            if (_ring_shoelace(np.asarray(r, dtype=np.float64)) < 0) == shell_cw:
                ok = False
    return ok


def bounding_diagonal(geom: Geometry) -> Geometry | None:
    """``ST_BoundingDiagonal``: the (xmin ymin) -> (xmax ymax) line."""
    x0, y0, x1, y1 = envelope(geom)
    return Geometry(
        "LineString",
        np.asarray([[x0, y0], [x1, y1]], dtype=np.float64),
        geom.srid,
    )


def minimum_clearance(geom: Geometry) -> float:
    """``ST_MinimumClearance`` (GEOS semantics): the smallest of (a) the
    distance between any two DISTINCT vertices and (b) the distance from
    any vertex to any non-incident segment — the largest perturbation
    radius that provably cannot create a self-touch. Degenerate inputs
    with no positive clearance answer infinity, like GEOS."""
    pts = _all_vertices(geom)
    if len(pts) < 2:
        return math.inf
    best = math.inf
    d = np.hypot(
        pts[:, None, 0] - pts[None, :, 0], pts[:, None, 1] - pts[None, :, 1]
    )
    pos = d[np.triu_indices(len(pts), k=1)]
    pos = pos[pos > 0]
    if len(pos):
        best = float(pos.min())
    segs = _all_segments(geom)
    for i in range(len(pts)):
        px, py = pts[i]
        for s in segs:
            if (s[0] == px and s[1] == py) or (s[2] == px and s[3] == py):
                continue  # incident endpoint
            dd = _point_seg_dist_min(
                pts[i: i + 1], s.reshape(1, 4)
            )
            if 0 < dd < best:
                best = dd
    return best


def geometric_median(
    geom: Geometry, tolerance: float = 1e-9, max_iter: int = 200
) -> tuple[float, float]:
    """``ST_GeometricMedian``: the point minimizing the sum of distances
    to the input points — Weiszfeld's algorithm (1937) with the standard
    coincident-point guard, run to a scale-relative tolerance. Fixed
    iteration cap keeps it deterministic; the centroid seeds."""
    pts = _all_vertices(geom)
    if len(pts) == 0:
        raise GeoDBError("st_geometricmedian: empty input")
    if len(pts) == 1:
        return float(pts[0, 0]), float(pts[0, 1])
    x = pts.mean(axis=0)
    span = max(float(np.ptp(pts[:, 0])), float(np.ptp(pts[:, 1])), 1e-300)
    tol = tolerance * span
    for _ in range(max_iter):
        d = np.hypot(pts[:, 0] - x[0], pts[:, 1] - x[1])
        hit = d < tol
        if hit.any():
            # at an input point: it is the median if the pull of the
            # others does not exceed unity (Weiszfeld's vertex test)
            rest = ~hit
            if not rest.any():
                return float(x[0]), float(x[1])
            r = ((pts[rest] - x) / d[rest, None]).sum(axis=0)
            if np.hypot(r[0], r[1]) <= hit.sum():
                return float(x[0]), float(x[1])
            d = np.where(hit, tol, d)
        w = 1.0 / d
        nxt = (pts * w[:, None]).sum(axis=0) / w.sum()
        if math.hypot(nxt[0] - x[0], nxt[1] - x[1]) < tol:
            return float(nxt[0]), float(nxt[1])
        x = nxt
    return float(x[0]), float(x[1])


def shift_longitude(geom: Geometry) -> Geometry:
    """``ST_ShiftLongitude``: longitudes in [-180, 0) shift to
    [180, 360) — the Pacific-centered rendering transform."""
    return map_coordinates(
        geom, lambda x, y: (x + 360.0 if x < 0 else x, y)
    )


def _vw_keep(arr: np.ndarray, threshold: float, closed: bool) -> np.ndarray:
    """Visvalingam–Whyatt: repeatedly drop the vertex whose triangle
    with its neighbors has the smallest effective area, while that
    area is below ``threshold``. Endpoints of open lines always stay;
    rings keep at least 4 points (3 distinct + closure)."""
    pts = list(range(len(arr)))
    if closed:
        pts = pts[:-1]  # operate on the open ring

    def _area(i0, i1, i2):
        a, b, c = arr[pts[i0]], arr[pts[i1]], arr[pts[i2]]
        return abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        ) / 2.0

    min_keep = 3 if closed else 2
    while len(pts) > min_keep:
        best_i, best_a = None, None
        rng = range(len(pts)) if closed else range(1, len(pts) - 1)
        for i in rng:
            a = _area((i - 1) % len(pts), i, (i + 1) % len(pts))
            if best_a is None or a < best_a:
                best_i, best_a = i, a
        if best_a is None or best_a >= threshold:
            break
        pts.pop(best_i)
    out = arr[pts]
    if closed:
        out = np.vstack([out, out[:1]])
    return out


def simplify_vw(geom: Geometry, threshold: float) -> Geometry | None:
    """``ST_SimplifyVW``: Visvalingam–Whyatt simplification with the
    effective-area ``threshold`` (same units as coordinate area)."""
    if geom.kind == "LineString":
        return Geometry(
            "LineString", _vw_keep(geom.parts, threshold, False), geom.srid
        )
    if geom.kind == "Polygon":
        return Geometry(
            "Polygon",
            [_vw_keep(r, threshold, True) for r in geom.parts],
            geom.srid,
        )
    if geom.kind in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return Geometry(
            geom.kind,
            [simplify_vw(m, threshold) for m in geom.parts],
            geom.srid,
        )
    return geom


def chaikin_smoothing(
    geom: Geometry, n_iter: int = 1, preserve_end_points: bool = True
) -> Geometry:
    """``ST_ChaikinSmoothing``: corner cutting (Chaikin 1974) — every
    corner is replaced by the 1/4 and 3/4 points of its incident
    segments. Open lines keep their endpoints when
    ``preserve_end_points`` (the PostGIS default); rings cut every
    corner and re-close."""
    if n_iter < 1 or n_iter > 5:
        raise GeoDBError("st_chaikinsmoothing: 1..5 iterations (PG limit)")

    def _cut(arr: np.ndarray, closed: bool) -> np.ndarray:
        for _ in range(n_iter):
            pts = arr[:-1] if closed else arr
            out = []
            n = len(pts)
            if closed:
                for i in range(n):
                    p, q = pts[i], pts[(i + 1) % n]
                    out.append(p * 0.75 + q * 0.25)
                    out.append(p * 0.25 + q * 0.75)
                arr = np.vstack([out, out[:1]])
            else:
                if preserve_end_points:
                    out.append(pts[0])
                for i in range(n - 1):
                    p, q = pts[i], pts[i + 1]
                    out.append(p * 0.75 + q * 0.25)
                    out.append(p * 0.25 + q * 0.75)
                if preserve_end_points:
                    out.append(pts[-1])
                arr = np.asarray(out, dtype=np.float64)
        return arr

    if geom.kind == "LineString":
        return Geometry("LineString", _cut(geom.parts, False), geom.srid)
    if geom.kind == "Polygon":
        return Geometry(
            "Polygon",
            [_cut(r, True) for r in geom.parts],
            geom.srid,
        )
    if geom.kind in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return Geometry(
            geom.kind,
            [chaikin_smoothing(m, n_iter, preserve_end_points)
             for m in geom.parts],
            geom.srid,
        )
    return geom


def shared_paths(a: Geometry, b: Geometry) -> Geometry | None:
    """``ST_SharedPaths(lineal1, lineal2)``: the linework the two inputs
    share, split by traversal direction — PostGIS returns
    GEOMETRYCOLLECTION(MULTILINESTRING <same direction>,
    MULTILINESTRING <opposite direction>) and so does this kernel (an
    empty side contributes an empty MultiLineString spelled as a
    0-member MULTILINESTRING). Collinear overlapping (sub)segments are
    found pairwise with interval arithmetic on the supporting line;
    touching at a point is NOT a shared path."""
    segs_a = _all_segments(a)
    segs_b = _all_segments(b)
    same: list[np.ndarray] = []
    opposite: list[np.ndarray] = []
    for sa in segs_a:
        p0, p1 = sa[0:2], sa[2:4]
        d = p1 - p0
        ll = float(d @ d)
        if ll == 0:
            continue
        scale = max(1.0, abs(d[0]) + abs(d[1]))
        for sb in segs_b:
            q0, q1 = sb[0:2], sb[2:4]
            c1 = d[0] * (q0[1] - p0[1]) - d[1] * (q0[0] - p0[0])
            c2 = d[0] * (q1[1] - p0[1]) - d[1] * (q1[0] - p0[0])
            if abs(c1) > 1e-12 * scale or abs(c2) > 1e-12 * scale:
                continue  # not collinear
            t0 = float((q0 - p0) @ d) / ll
            t1 = float((q1 - p0) @ d) / ll
            lo, hi = min(t0, t1), max(t0, t1)
            lo, hi = max(lo, 0.0), min(hi, 1.0)
            if hi - lo <= 1e-12:
                continue  # point contact only
            piece = np.vstack([p0 + lo * d, p0 + hi * d])
            (same if t1 >= t0 else opposite).append(piece)

    def _mls(pieces: list[np.ndarray]) -> Geometry:
        members = [
            Geometry("LineString", np.asarray(p, dtype=np.float64))
            for p in sorted(
                pieces,
                key=lambda q: (q[0, 0], q[0, 1], q[1, 0], q[1, 1]),
            )
        ]
        return Geometry("MultiLineString", members)

    if not same and not opposite:
        return None  # the engine's SQL-NULL spelling of EMPTY
    return Geometry(
        "GeometryCollection", [_mls(same), _mls(opposite)], a.srid
    )


def line_extend(
    geom: Geometry, distance_forward: float, distance_backward: float = 0.0
) -> Geometry:
    """``ST_LineExtend`` (PostGIS 3.4): prolong the last segment by
    ``distance_forward`` and the first by ``distance_backward`` along
    their own directions."""
    if geom.kind != "LineString" or len(geom.parts) < 2:
        raise GeoDBError("st_lineextend: LineString of >= 2 points")
    if distance_forward < 0 or distance_backward < 0:
        raise GeoDBError("st_lineextend: distances must be non-negative")
    arr = geom.parts.copy()
    if distance_forward > 0:
        d = arr[-1] - arr[-2]
        ln = math.hypot(*d)
        if ln > 0:
            arr[-1] = arr[-1] + d / ln * distance_forward
    if distance_backward > 0:
        d = arr[0] - arr[1]
        ln = math.hypot(*d)
        if ln > 0:
            arr[0] = arr[0] + d / ln * distance_backward
    return Geometry("LineString", arr, geom.srid)


def dump_rings(geom: Geometry) -> list[Geometry]:
    """``ST_DumpRings``: the shell then each hole of every polygon
    member, each as its own single-ring Polygon (PostGIS' row set
    spelled as an array on the fixed-arity SQL surface)."""
    out = []
    for leaf in geom.children():
        if leaf.kind != "Polygon":
            continue
        for r in leaf.parts:
            out.append(Geometry("Polygon", [np.asarray(r).copy()], geom.srid))
    return out


def ordering_equals(a: Geometry, b: Geometry) -> bool:
    """``ST_OrderingEquals``: same geometry AND same coordinate order —
    byte-level structural equality of the canonical text forms."""
    return to_wkt(a) == to_wkt(b)
