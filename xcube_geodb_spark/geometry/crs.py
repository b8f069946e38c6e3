"""Minimal CRS transforms (driver-side, facade-level — like the reference).

The reference reprojects query bboxes client-side with pyproj
(``xcube_geodb/core/geodb.py:1535-1575``, ``transform_bbox_crs``) including
the EPSG:4326 axis-order switch (``wsg84_order`` 'lat_lon' vs 'lon_lat',
``geodb.py:1565-1573``). pyproj is not available in this environment, so we
implement the projections the test surface needs from published formulas:

- EPSG:4326 (WGS84 geographic)
- EPSG:3857 (spherical web mercator)
- Transverse Mercator (Karney-Krüger series, 6th order) for UTM zones
  (EPSG:326xx/327xx, 258xx ETRS89) and EPSG:3794 (Slovene TM)

Unknown CRS pairs raise ``GeoDBError`` (documented deviation).
"""

from __future__ import annotations

import math

from xcube_geodb_spark.errors import GeoDBError

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_GRS80_F = 1 / 298.257222101


def check_crs(crs) -> int:
    """Normalize 'EPSG:4326' / 4326 / '4326' -> 4326
    (reference ``geodb.py:121-132``)."""
    if isinstance(crs, int):
        return crs
    s = str(crs).strip()
    if s.upper().startswith("EPSG:"):
        s = s[5:]
    try:
        return int(s)
    except ValueError:
        raise GeoDBError(f"Invalid CRS: {crs!r}") from None


class _TM:
    """Transverse Mercator via the Krüger series (public formulas; see
    Karney 2011, 'Transverse Mercator with an accuracy of a few
    nanometers')."""

    def __init__(self, a, f, lon0, lat0, k0, x0, y0):
        self.a, self.f = a, f
        self.lon0, self.lat0, self.k0, self.x0, self.y0 = lon0, lat0, k0, x0, y0
        n = f / (2 - f)
        self.n = n
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        self.alpha = [
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880,
            49561 * n**4 / 161280 - 179 * n**5 / 168,
            34729 * n**5 / 80640,
        ]
        self.beta = [
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - 1 * n**4 / 360 - 81 * n**5 / 512,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480,
            4397 * n**4 / 161280 - 11 * n**5 / 504,
            4583 * n**5 / 161280,
        ]
        self.delta = [
            2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45 + 26 * n**5 / 45,
            7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315,
            56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105,
            4279 * n**4 / 630 - 332 * n**5 / 35,
            4174 * n**5 / 315,
        ]
        self._m0 = self._meridian_arc(math.radians(lat0)) if lat0 else 0.0

    def _conformal_lat(self, phi):
        e = math.sqrt(self.f * (2 - self.f))
        return math.atan(math.sinh(math.asinh(math.tan(phi)) - e * math.atanh(e * math.sin(phi))))

    def _meridian_arc(self, phi):
        t = self._conformal_lat(phi)
        xi = t
        for j, a in enumerate(self.alpha, start=1):
            xi += a * math.sin(2 * j * t)
        return self.A * xi

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        phi = math.radians(lat)
        lam = math.radians(lon - self.lon0)
        t = math.tan(self._conformal_lat(phi))
        xi_p = math.atan2(t, math.cos(lam))
        eta_p = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
        xi, eta = xi_p, eta_p
        for j, a in enumerate(self.alpha, start=1):
            xi += a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
            eta += a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
        x = self.x0 + self.k0 * self.A * eta
        y = self.y0 + self.k0 * (self.A * xi - self._m0)
        return x, y

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        xi = (y - self.y0 + self.k0 * self._m0) / (self.k0 * self.A)
        eta = (x - self.x0) / (self.k0 * self.A)
        xi_p, eta_p = xi, eta
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            eta_p -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
        phi = chi
        for j, d in enumerate(self.delta, start=1):
            phi += d * math.sin(2 * j * chi)
        lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
        return self.lon0 + math.degrees(lam), math.degrees(phi)


def _tm_for_epsg(code: int) -> _TM | None:
    if 32601 <= code <= 32660:  # WGS84 UTM north
        return _TM(_WGS84_A, _WGS84_F, (code - 32600) * 6 - 183, 0, 0.9996, 500000, 0)
    if 32701 <= code <= 32760:  # WGS84 UTM south
        return _TM(_WGS84_A, _WGS84_F, (code - 32700) * 6 - 183, 0, 0.9996, 500000, 1e7)
    if 25828 <= code <= 25838:  # ETRS89 UTM (GRS80)
        return _TM(_WGS84_A, _GRS80_F, (code - 25800) * 6 - 183, 0, 0.9996, 500000, 0)
    if code == 3794:  # Slovene TM (D96/TM), GRS80
        return _TM(_WGS84_A, _GRS80_F, 15.0, 0.0, 0.9999, 500000, -5000000)
    return None


def _to_4326(code: int, x: float, y: float) -> tuple[float, float]:
    if code == 4326:
        return x, y
    if code == 3857:
        lon = math.degrees(x / _WGS84_A)
        lat = math.degrees(2 * math.atan(math.exp(y / _WGS84_A)) - math.pi / 2)
        return lon, lat
    tm = _tm_for_epsg(code)
    if tm is not None:
        return tm.inverse(x, y)
    raise GeoDBError(f"Unsupported source CRS: EPSG:{code}")


def _from_4326(code: int, lon: float, lat: float) -> tuple[float, float]:
    if code == 4326:
        return lon, lat
    if code == 3857:
        x = _WGS84_A * math.radians(lon)
        y = _WGS84_A * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
        return x, y
    tm = _tm_for_epsg(code)
    if tm is not None:
        return tm.forward(lon, lat)
    raise GeoDBError(f"Unsupported target CRS: EPSG:{code}")


def transform_point(x: float, y: float, from_crs, to_crs) -> tuple[float, float]:
    src, dst = check_crs(from_crs), check_crs(to_crs)
    if src == dst:
        return x, y
    lon, lat = _to_4326(src, x, y)
    return _from_4326(dst, lon, lat)


def transform_bbox_crs(
    bbox: tuple[float, float, float, float],
    from_crs,
    to_crs,
    wsg84_order: str = "lon_lat",
) -> tuple[float, float, float, float]:
    """Reproject a bbox, densifying edges so curved projections keep the true
    extent. Axis-order parity with the reference (``geodb.py:1535-1575``):
    when the source or target is EPSG:4326 and ``wsg84_order == 'lat_lon'``,
    coordinates are interpreted/returned as (lat, lon)."""
    src, dst = check_crs(from_crs), check_crs(to_crs)
    minx, miny, maxx, maxy = (float(v) for v in bbox)
    if src == 4326 and wsg84_order == "lat_lon":
        minx, miny, maxx, maxy = miny, minx, maxy, maxx
    if src == dst:
        out = (minx, miny, maxx, maxy)
    else:
        n = 12
        pts = []
        for i in range(n + 1):
            t = i / n
            pts.append((minx + t * (maxx - minx), miny))
            pts.append((minx + t * (maxx - minx), maxy))
            pts.append((minx, miny + t * (maxy - miny)))
            pts.append((maxx, miny + t * (maxy - miny)))
        tx = [transform_point(x, y, src, dst) for x, y in pts]
        xs = [p[0] for p in tx]
        ys = [p[1] for p in tx]
        out = (min(xs), min(ys), max(xs), max(ys))
    if dst == 4326 and wsg84_order == "lat_lon":
        out = (out[1], out[0], out[3], out[2])
    return out


def haversine_meters_col(lon1, lat1, lon2, lat2):
    """Great-circle meters between two (lon, lat) column pairs — the
    column-algebra twin of ``geom.distance_sphere`` for the 100 TB path:
    pure JVM math that fuses into whole-stage codegen (geo-distance
    filters/joins over point tables never need the row UDF). Same fixed
    float association as the kernel (agreement to libm precision, ~1 ulp
    per transcendental call)."""
    from pyspark.sql import functions as F

    from xcube_geodb_spark.geometry.geom import EARTH_RADIUS_M

    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / 2.0), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlon / 2.0), 2)
    )
    return 2.0 * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))
