"""Spatial functions registered into Spark SQL.

SURVEY.md §4: the reference's ``get_collection_pg`` path admits any
Postgres built-in, including PostGIS ``ST_*`` functions, inside raw
``select``/``where`` strings. ``spark.udf.register`` is sufficient to give
the Spark SQL dialect the same capability — no Catalyst extension needed.

Registered names (PostGIS-compatible lowercase):

- codecs/constructors: ``st_astext`` / ``st_geomfromtext`` /
  ``st_asgeojson`` / ``st_geomfromgeojson`` / ``st_makepoint`` /
  ``st_point`` / ``st_makeenvelope`` / ``st_setsrid``
- inspectors: ``st_geometrytype`` (returns 'POINT', 'POLYGON', ...),
  ``st_xmin/st_ymin/st_xmax/st_ymax``, ``st_x/st_y``, ``st_isvalid``,
  ``st_srid``, ``st_npoints``/``st_numpoints``, ``st_numgeometries``,
  ``st_pointn/st_startpoint/st_endpoint``, ``st_exteriorring/
  st_numinteriorrings/st_interiorringn``
- structure edits: ``st_reverse``, ``st_flipcoordinates``
- predicates: ``st_within/st_contains/st_intersects/st_touches/
  st_overlaps/st_crosses/st_disjoint/st_equals`` — TYPE-DISPATCHED on
  the first argument: ``(bbox_wkt, wkb)`` keeps the bbox-first argument
  order of the reference's CASE dispatch (geodb.sql:1204-1214), while
  ``(wkb, wkb)`` evaluates the general geometry–geometry relation
  (geometry/relate.py) with PostGIS argument order — and ``st_dwithin``
- measures: ``st_area/st_length/st_perimeter/st_centroid``,
  ``st_distance`` (planar exact), ``st_distancesphere`` (haversine),
  ``st_distancespheroid`` (WGS84 Vincenty), ``st_lengthsphere`` /
  ``st_lengthspheroid`` / ``st_perimetersphere`` /
  ``st_perimeterspheroid`` (per-segment geodesics), ``st_areasphere``
  (spherical-excess geodesic area), ``st_areaspheroid`` (authalic WGS84
  ellipsoid area), ``st_azimuth``
- transforms: ``st_transform`` (CRS), ``st_buffer`` (points, lines,
  polygons incl. holes, positive and negative radius —
  overlay.buffer_geometry),
  ``st_simplify`` (Douglas-Peucker), ``st_snaptogrid``, ``st_envelope``,
  ``st_expand``, ``st_clipbybox2d``, ``st_convexhull`` (monotone chain),
  ``st_makevalid`` (planar-subdivision repair — overlay.make_valid),
  ``st_subdivide`` (recursive envelope-halving clip; returns
  array<binary>, explode() for PostGIS' set shape),
  ``st_pointonsurface`` (JTS widest-bisector-chord interior point)
- overlay (geometry/overlay.py planar boolean kernel):
  ``st_intersection`` (rect operand -> fast clip, else general polygon
  overlay), ``st_union``, ``st_difference``, ``st_symdifference``
- r9 session 2 additions: ``st_split``/``st_geometryn``,
  ``st_delaunaytriangles``/``st_delaunayedges``/``st_voronoipolygons``/
  ``st_concavehull`` (geometry/triangulate.py), the SFS scalar kit
  (``st_issimple/isclosed/isring``, ``st_multi``,
  ``st_collectionextract``, ``st_removerepeatedpoints``,
  ``st_segmentize``, ``st_hausdorffdistance``/``st_frechetdistance``,
  ``st_angle``, scalar ``st_collect``, ``st_unaryunion``),
  ``st_makeline`` (scalar + _agg), ``st_generatepoints`` (seeded),
  ``st_snap``, ``st_offsetcurve``, ``st_buffer_style`` (3-arg styles via
  the pg shim), ``st_clusterwithin_agg``, ``st_affine``/
  ``st_maxdistance``/``st_longestline``, orientation + grid kit
  (``st_forcepolygoncw/ccw``, ``st_ispolygoncw/ccw``,
  ``st_boundingdiagonal``, ``st_minimumclearance``,
  ``st_tileenvelope``, ``st_hexagon``), smoothing kit
  (``st_chaikinsmoothing``, ``st_simplifyvw``, ``st_geometricmedian``,
  ``st_shiftlongitude``, ``st_reduceprecision``), ``st_sharedpaths``,
  ``st_lineextend``/``st_dumprings``/``st_orderingequals``,
  ``st_triangulatepolygon`` (ear clipping, hole-bridged),
  ``st_maximuminscribedcircle/-radius`` and
  ``st_largestemptycircle/-radius`` (quadtree refinement), codec
  aliases (``st_pointfromtext`` family, ``st_geomfromwkb``/
  ``st_asbinary``, ``st_dimension``, ``st_force2d``)

Every function is registered as an Arrow-batched ``pandas_udf`` (scalar
kernels applied per batch element): the plan shows ``ArrowEvalPython``,
values cross the JVM/Python boundary as Arrow columns, and WKB parses are
amortized across chained calls by :func:`geom.parse_wkb_cached` — no
per-value pickling anywhere on the SQL path. (Engine operators still use
the dedicated vectorized kernels in udfs.py.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from xcube_geodb_spark.geometry.geom import (
    envelope,
    geometry_type_wkb,
    parse_wkb_cached as parse_wkb,
    parse_wkt,
    to_wkb_seeded,
    to_wkt,
)
from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.geometry.predicates import bbox_predicate


from functools import lru_cache


@lru_cache(maxsize=256)
def _box_of_wkt(bbox_wkt: str):
    """Envelope of a WKT box argument — the box side of every st_*
    predicate call is almost always a per-query CONSTANT, re-sent for
    every row of the batch; without this cache each row re-parses it."""
    return envelope(parse_wkt(bbox_wkt))


def _pred(mode: str):
    """Type-dispatched predicate: ``st_<mode>(bbox_wkt, wkb)`` keeps the
    reference's bbox-first CASE semantics (geodb.sql:1204-1214), while
    ``st_<mode>(wkb, wkb)`` — two geometry columns, the everyday PostGIS
    idiom the reference's passthrough admits (geodb.sql:1147-1167) — goes
    through the geometry–geometry relate kernel."""

    def f(first, wkb: bytes) -> bool:
        if first is None or wkb is None:
            return False
        if isinstance(first, (bytes, bytearray)):
            from xcube_geodb_spark.geometry.relate import geom_predicate

            return geom_predicate(mode, parse_wkb(bytes(first)), parse_wkb(wkb))
        return bbox_predicate(mode, parse_wkb(wkb), _box_of_wkt(first))

    return f


def _pylist(c: pd.Series) -> list:
    """Series -> plain Python values with missing normalized to None (a
    nullable numeric arg arrives from Arrow as float NaN; the scalar
    kernels test ``is None``).

    DOCUMENTED DEVIATION: Arrow hands both SQL NULL and a literal double
    NaN to Python as float NaN, so they are indistinguishable here —
    ``st_makepoint(double('nan'), y)`` returns SQL NULL where PostGIS
    would propagate ``POINT(NaN y)``. NULL-in -> NULL-out is by far the
    more common contract to preserve; callers that genuinely need NaN
    coordinates must inject them inside the kernel (e.g. via WKT:
    ``st_geomfromtext('POINT(NaN 1)')`` also raises, as parse rejects
    non-numeric), so NaN geometry coordinates are effectively
    unsupported on the SQL surface. COVERAGE.md records this."""
    return [
        None if v is None or (isinstance(v, float) and v != v) else v
        for v in c.tolist()
    ]


def _vec(fn, ret: T.DataType, prep=None):
    """Arrow-batched wrapper around a scalar kernel: one pandas_udf call
    per batch, the kernel applied element-wise inside it. This keeps the
    (audited, shared-with-the-engine) scalar kernels as the single source
    of truth while moving serialization from per-value pickle to Arrow
    columns — the per-row Python remains, the per-row *boundary cost*
    does not.

    PREPARED input (st_prepare struct columns arrive as pd.DataFrame
    batches): ``prep``, when given, is a batch-vectorized implementation
    tried first — it returns the result Series, or None when the argument
    pattern is outside its fast path. Whatever prep declines (and every
    function without a prep impl) goes through the GENERIC bridge:
    struct -> Geometry -> WKB with the parse cache seeded, so the
    unchanged scalar kernel runs parse-free. One mechanism makes the
    whole st_* surface prepared-aware."""
    if isinstance(ret, T.DoubleType):
        dtype = "float64"
    elif isinstance(ret, T.IntegerType):
        dtype = "Int32"  # pandas nullable int: None survives to Arrow
    else:
        dtype = "object"  # bytes / str / bool (+ None)

    @pandas_udf(ret)
    def v(*cols: pd.Series) -> pd.Series:
        if any(isinstance(c, pd.DataFrame) for c in cols):
            if prep is not None:
                out = prep(*cols)
                if out is not None:
                    return out
            from xcube_geodb_spark.geometry.prepared import prep_to_wkb_list

            cols = tuple(
                pd.Series(prep_to_wkb_list(c), dtype="object")
                if isinstance(c, pd.DataFrame)
                else c
                for c in cols
            )
        args = [_pylist(c) for c in cols]
        return pd.Series([fn(*row) for row in zip(*args)], dtype=dtype)

    return v


import weakref

# id(session) -> weakref to the session (see textsql._REGISTERED: a bare
# id set goes stale under id reuse after a session is garbage-collected)
_REGISTERED: "weakref.WeakValueDictionary[int, SparkSession]" = (
    weakref.WeakValueDictionary()
)


def register_spatial_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration of the st_* functions on a session."""
    key = id(spark)
    if _REGISTERED.get(key) is spark:
        return
    _REGISTERED[key] = spark

    def _register(name: str, fn, ret: T.DataType, prep=None) -> None:
        spark.udf.register(name, _vec(fn, ret, prep=prep))

    # --- prepared-geometry support (geometry/prepared.py) -----------------
    from xcube_geodb_spark.geometry import prepared as _pp

    @pandas_udf(_pp.PREP_SCHEMA)
    def _st_prepare(b: pd.Series) -> pd.DataFrame:
        return _pp.prepare_series(b)

    spark.udf.register("st_prepare", _st_prepare)

    def _prep1(vfn):
        """Single-geometry-arg vectorized dispatch."""
        def p(*cols):
            if len(cols) == 1 and isinstance(cols[0], pd.DataFrame):
                return vfn(cols[0])
            return None
        return p

    def _const_of(series: pd.Series):
        """The single constant value of a per-row-identical argument
        column, or None when the column varies or has nulls."""
        vals = series.tolist()
        if not vals or vals[0] is None:
            return None
        first = vals[0]
        for v in vals[1:]:
            if v is None or v != first:
                return None
        return first

    _register(
        "st_astext", lambda b: to_wkt(parse_wkb(b)) if b is not None else None,
        T.StringType(),
    )
    _register(
        "st_geomfromtext",
        lambda s: to_wkb_seeded(parse_wkt(s)) if s is not None else None,
        T.BinaryType(),
    )

    def _as_geojson(b):
        if b is None:
            return None
        import json as _json

        from xcube_geodb_spark.geometry.geom import to_geojson

        return _json.dumps(to_geojson(parse_wkb(b)), separators=(",", ":"))

    def _from_geojson(s):
        if s is None:
            return None
        import json as _json

        from xcube_geodb_spark.geometry.geom import from_geojson

        return to_wkb_seeded(from_geojson(_json.loads(s)))

    _register("st_asgeojson", _as_geojson, T.StringType())
    _register("st_geomfromgeojson", _from_geojson, T.BinaryType())
    _register(
        "st_geometrytype",
        lambda b: geometry_type_wkb(b) if b is not None else None,
        T.StringType(),
    )
    for i, name in enumerate(("st_xmin", "st_ymin", "st_xmax", "st_ymax")):
        _register(
            name,
            (lambda i: lambda b: envelope(parse_wkb(b))[i] if b is not None else None)(i),
            T.DoubleType(),
            prep=_prep1(
                (lambda i: lambda pdf: _pp.v_envelope_bound(pdf, i))(i)
            ),
        )

    def _prep_pred(mode):
        def p(bbox_col, geom_col):
            if not isinstance(geom_col, pd.DataFrame) or isinstance(
                bbox_col, pd.DataFrame
            ):
                return None
            const = _const_of(bbox_col)
            if not isinstance(const, str):
                return None
            return _pp.v_box_predicate(mode, _box_of_wkt(const), geom_col)
        return p

    for mode in (
        "within",
        "contains",
        "intersects",
        "touches",
        "overlaps",
        "crosses",
        "disjoint",
        "equals",
    ):
        _register(
            f"st_{mode}", _pred(mode), T.BooleanType(),
            prep=_prep_pred(mode),
        )
    # NOTE: do NOT import to_wkb here — a function-local rebinding would turn
    # the module-global reference in the lambdas ABOVE into an (empty-at-
    # registration) closure cell, which Spark pickles eagerly.
    from xcube_geodb_spark.geometry.geom import area, centroid, length, perimeter
    from xcube_geodb_spark.geometry.geom import Geometry as _G
    import numpy as _np

    for name, fn, vfn in (
        ("st_area", area, _pp.v_area),
        ("st_length", length, _pp.v_length),
        ("st_perimeter", perimeter, _pp.v_perimeter),
    ):
        _register(
            name,
            (lambda fn: lambda b: fn(parse_wkb(b)) if b is not None else None)(fn),
            T.DoubleType(),
            prep=_prep1(vfn),
        )
    _register(
        "st_centroid",
        lambda b: to_wkb_seeded(_G("Point", _np.array(centroid(parse_wkb(b)))))
        if b is not None
        else None,
        T.BinaryType(),
        prep=_prep1(_pp.v_centroid_wkb),
    )
    _register(
        "st_x",
        lambda b: float(parse_wkb(b).parts[0])
        if b is not None and parse_wkb(b).kind == "Point"
        else None,
        T.DoubleType(),
    )
    _register(
        "st_y",
        lambda b: float(parse_wkb(b).parts[1])
        if b is not None and parse_wkb(b).kind == "Point"
        else None,
        T.DoubleType(),
    )
    from xcube_geodb_spark.geometry.geom import is_valid

    _register(
        "st_isvalid",
        lambda b: is_valid(parse_wkb(b)) if b is not None else None,
        T.BooleanType(),
    )
    from xcube_geodb_spark.geometry.geom import distance

    _register(
        "st_distance",
        lambda a, b: distance(parse_wkb(a), parse_wkb(b))
        if a is not None and b is not None
        else None,
        T.DoubleType(),
    )

    _register(
        "st_dwithin",
        lambda a, b, r: (distance(parse_wkb(a), parse_wkb(b)) <= r)
        if a is not None and b is not None and r is not None
        else False,
        T.BooleanType(),
    )

    def _buffer(b: bytes, radius: float):
        if b is None or radius is None:
            return None
        from xcube_geodb_spark.geometry.overlay import buffer_geometry

        g = buffer_geometry(parse_wkb(b), float(radius))
        # over-eroded polygon vanishes -> SQL NULL (PostGIS answers
        # POLYGON EMPTY; documented deviation)
        return to_wkb_seeded(g) if g is not None else None

    _register("st_buffer", _buffer, T.BinaryType())

    def _buffer_style(b: bytes, radius: float, style: str):
        # the 3-arg PostGIS form; the pg shim rewrites
        # st_buffer(g, d, 'style') to this name (fixed-arity UDFs)
        if b is None or radius is None or style is None:
            return None
        from xcube_geodb_spark.geometry.overlay import buffer_with_style

        g = buffer_with_style(parse_wkb(b), float(radius), str(style))
        return to_wkb_seeded(g) if g is not None else None

    _register("st_buffer_style", _buffer_style, T.BinaryType())

    from xcube_geodb_spark.geometry.geom import simplify

    def _simplify(b: bytes, tolerance: float):
        if b is None or tolerance is None:
            return None
        out = simplify(parse_wkb(b), float(tolerance))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_simplify", _simplify, T.BinaryType())

    from xcube_geodb_spark.geometry.geom import convex_hull

    def _convexhull(b):
        if b is None:
            return None
        out = convex_hull(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_convexhull", _convexhull, T.BinaryType())

    def _makevalid(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.overlay import make_valid

        out = make_valid(parse_wkb(b))
        # fully-degenerate input -> SQL NULL (PostGIS answers EMPTY;
        # same documented deviation as st_buffer over-erosion)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_makevalid", _makevalid, T.BinaryType())

    def _node_sql(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.overlay import node_linework

        out = node_linework(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_node", _node_sql, T.BinaryType())

    def _polygonize_sql(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.overlay import polygonize

        out = polygonize(parse_wkb(b))
        # no bounded face -> SQL NULL (PostGIS answers EMPTY; documented)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_polygonize", _polygonize_sql, T.BinaryType())

    def _linemerge_sql(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import line_merge

        out = line_merge(parse_wkb(b))
        # no linework -> SQL NULL (PostGIS answers GEOMETRYCOLLECTION
        # EMPTY; the engine's documented EMPTY spelling)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_linemerge", _linemerge_sql, T.BinaryType())

    def _split_sql(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.overlay import split_geometry

        out = split_geometry(parse_wkb(a), parse_wkb(bytes(b)))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_split", _split_sql, T.BinaryType())

    def _geometryn(b, n):
        """1-based member of a Multi*/GeometryCollection (PostGIS
        ST_GeometryN); the geometry itself for n=1 on singles; NULL
        off-range."""
        if b is None or n is None:
            return None
        from xcube_geodb_spark.geometry.geom import Geometry as _G

        g = parse_wkb(b)
        n = int(n)
        if g.kind in (
            "MultiPoint", "MultiLineString", "MultiPolygon",
            "GeometryCollection",
        ):
            if not 1 <= n <= len(g.parts):
                return None
            out = g.parts[n - 1]
            return to_wkb_seeded(_G(out.kind, out.parts, g.srid))
        return to_wkb_seeded(g) if n == 1 else None

    _register("st_geometryn", _geometryn, T.BinaryType())

    def _delaunay(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.triangulate import delaunay_geometry

        out = delaunay_geometry(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    def _delaunay_edges(b):
        # PostGIS spells this ST_DelaunayTriangles(g, 0.0, 1); Spark UDF
        # registration is fixed-arity, so the flags=1 form gets its own
        # name (documented dialect spelling, COVERAGE.md)
        if b is None:
            return None
        from xcube_geodb_spark.geometry.triangulate import delaunay_geometry

        out = delaunay_geometry(parse_wkb(b), flags=1)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_delaunaytriangles", _delaunay, T.BinaryType())
    _register("st_delaunayedges", _delaunay_edges, T.BinaryType())

    def _force_orient(shell_cw):
        def f(b):
            if b is None:
                return None
            from xcube_geodb_spark.geometry.geom import (
                force_polygon_orientation,
            )

            return to_wkb_seeded(
                force_polygon_orientation(parse_wkb(b), shell_cw)
            )

        return f

    _register("st_forcepolygoncw", _force_orient(True), T.BinaryType())
    _register("st_forcepolygonccw", _force_orient(False), T.BinaryType())

    def _is_orient(shell_cw):
        def f(b):
            if b is None:
                return None
            from xcube_geodb_spark.geometry.geom import (
                polygon_orientation_is,
            )

            return polygon_orientation_is(parse_wkb(b), shell_cw)

        return f

    _register("st_ispolygoncw", _is_orient(True), T.BooleanType())
    _register("st_ispolygonccw", _is_orient(False), T.BooleanType())

    def _bounding_diag(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import bounding_diagonal

        out = bounding_diagonal(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_boundingdiagonal", _bounding_diag, T.BinaryType())

    def _min_clearance(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import minimum_clearance

        v = minimum_clearance(parse_wkb(b))
        # GEOS answers infinity for degenerate inputs; SQL spells it NULL
        return None if v == float("inf") else v

    _register("st_minimumclearance", _min_clearance, T.DoubleType())

    def _tile_envelope(z, xt, yt):
        """``ST_TileEnvelope(z, x, y)``: web-mercator XYZ tile bounds
        (EPSG:3857, the standard +/-20037508.342789244 world frame)."""
        if z is None or xt is None or yt is None:
            return None
        from xcube_geodb_spark.geometry.geom import Geometry as _G

        import numpy as _np

        world = 20037508.342789244
        n = 1 << int(z)
        size = 2.0 * world / n
        x0 = -world + int(xt) * size
        y1 = world - int(yt) * size
        y0 = y1 - size
        ring = _np.asarray(
            [[x0, y0], [x0 + size, y0], [x0 + size, y1], [x0, y1],
             [x0, y0]],
            dtype=_np.float64,
        )
        return to_wkb_seeded(_G("Polygon", [ring], 3857))

    _register("st_tileenvelope", _tile_envelope, T.BinaryType())

    def _hexagon(size, ci, cj):
        """``ST_Hexagon(size, cell_i, cell_j)``: the flat-topped hexagon
        of edge length ``size`` on the axial grid (center at
        (1.5*size*i, sqrt(3)*size*(j + (i mod 2)/2)) — the same lattice
        PostGIS tiles; the exact cell addressing convention is
        documented in COVERAGE.md)."""
        if size is None or ci is None or cj is None:
            return None
        import math as _m

        import numpy as _np

        from xcube_geodb_spark.geometry.geom import Geometry as _G

        s = float(size)
        i, jj = int(ci), int(cj)
        cx = 1.5 * s * i
        cy = _m.sqrt(3.0) * s * (jj + (0.5 if i % 2 else 0.0))
        ring = []
        for k in range(6):
            a = _m.pi / 3.0 * k
            ring.append([cx + s * _m.cos(a), cy + s * _m.sin(a)])
        ring.append(ring[0])
        return to_wkb_seeded(
            _G("Polygon", [_np.asarray(ring, dtype=_np.float64)])
        )

    _register("st_hexagon", _hexagon, T.BinaryType())

    def _lineextend(b, fwd, back):
        if b is None or fwd is None:
            return None
        from xcube_geodb_spark.geometry.geom import line_extend

        return to_wkb_seeded(
            line_extend(
                parse_wkb(b), float(fwd),
                float(back) if back is not None else 0.0,
            )
        )

    _register("st_lineextend", _lineextend, T.BinaryType())

    def _dumprings(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import dump_rings

        return [to_wkb_seeded(r) for r in dump_rings(parse_wkb(b))]

    _register("st_dumprings", _dumprings, T.ArrayType(T.BinaryType()))

    def _ordering_equals(ga, gb):
        if ga is None or gb is None:
            return None
        from xcube_geodb_spark.geometry.geom import ordering_equals

        return ordering_equals(parse_wkb(ga), parse_wkb(bytes(gb)))

    _register("st_orderingequals", _ordering_equals, T.BooleanType())

    def _mic_parts(kind):
        # PostGIS returns a record (center, nearest, radius); the
        # fixed-arity surface splits it like the existing
        # st_minimumboundingcircle / st_minimumboundingradius pair
        def f(b):
            if b is None:
                return None
            import numpy as _np

            from xcube_geodb_spark.geometry.geom import Geometry as _G
            from xcube_geodb_spark.geometry.triangulate import (
                maximum_inscribed_circle,
            )

            out = maximum_inscribed_circle(parse_wkb(b))
            if out is None:
                return None
            x, y, r = out
            if kind == "radius":
                return float(r)
            return to_wkb_seeded(
                _G("Point", _np.asarray([x, y], dtype=_np.float64))
            )

        return f

    _register(
        "st_maximuminscribedcircle", _mic_parts("center"), T.BinaryType()
    )
    _register(
        "st_maximuminscribedradius", _mic_parts("radius"), T.DoubleType()
    )

    def _lec_parts(kind):
        def f(b):
            if b is None:
                return None
            import numpy as _np

            from xcube_geodb_spark.geometry.geom import Geometry as _G
            from xcube_geodb_spark.geometry.triangulate import (
                largest_empty_circle,
            )

            out = largest_empty_circle(parse_wkb(b))
            if out is None:
                return None
            x, y, r = out
            if kind == "radius":
                return float(r)
            return to_wkb_seeded(
                _G("Point", _np.asarray([x, y], dtype=_np.float64))
            )

        return f

    _register(
        "st_largestemptycircle", _lec_parts("center"), T.BinaryType()
    )
    _register(
        "st_largestemptyradius", _lec_parts("radius"), T.DoubleType()
    )

    def _triangulate_poly(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.triangulate import (
            triangulate_polygon,
        )

        out = triangulate_polygon(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_triangulatepolygon", _triangulate_poly, T.BinaryType())

    def _sharedpaths(ga, gb):
        if ga is None or gb is None:
            return None
        from xcube_geodb_spark.geometry.geom import shared_paths

        out = shared_paths(parse_wkb(ga), parse_wkb(bytes(gb)))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_sharedpaths", _sharedpaths, T.BinaryType())

    def _geometric_median(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import (
            Geometry as _G,
            geometric_median,
        )

        import numpy as _np

        x, y = geometric_median(parse_wkb(b))
        return to_wkb_seeded(
            _G("Point", _np.asarray([x, y], dtype=_np.float64))
        )

    _register("st_geometricmedian", _geometric_median, T.BinaryType())

    def _shiftlongitude(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import shift_longitude

        return to_wkb_seeded(shift_longitude(parse_wkb(b)))

    _register("st_shiftlongitude", _shiftlongitude, T.BinaryType())

    def _simplifyvw(b, thr):
        if b is None or thr is None:
            return None
        from xcube_geodb_spark.geometry.geom import simplify_vw

        out = simplify_vw(parse_wkb(b), float(thr))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_simplifyvw", _simplifyvw, T.BinaryType())

    def _chaikin(b, n):
        if b is None or n is None:
            return None
        from xcube_geodb_spark.geometry.geom import chaikin_smoothing

        return to_wkb_seeded(chaikin_smoothing(parse_wkb(b), int(n)))

    _register("st_chaikinsmoothing", _chaikin, T.BinaryType())

    def _reduceprecision(b, grid):
        """``ST_ReducePrecision``: grid snap + validity repair (the
        PostGIS 3.1 semantics composed from the engine's own kernels)."""
        if b is None or grid is None or float(grid) <= 0:
            return None
        from xcube_geodb_spark.geometry.geom import (
            is_valid,
            map_coordinates,
        )
        from xcube_geodb_spark.geometry.overlay import make_valid

        s = float(grid)
        g = map_coordinates(
            parse_wkb(b), lambda x, y: (round(x / s) * s, round(y / s) * s)
        )
        if not is_valid(g):
            g = make_valid(g)
        return to_wkb_seeded(g) if g is not None else None

    _register("st_reduceprecision", _reduceprecision, T.BinaryType())

    def _dimension(b):
        # ST_Dimension: topological dimension (0 points, 1 lines, 2 areas)
        return parse_wkb(b).dimension if b is not None else None

    _register("st_dimension", _dimension, T.IntegerType())

    def _typed_from_text(kinds):
        def f(s):
            if s is None:
                return None
            g = parse_wkt(s)
            # PG: typed constructors return NULL on a kind mismatch
            return to_wkb_seeded(g) if g.kind in kinds else None

        return f

    # SQL/MM typed constructors (PostGIS ST_PointFromText family)
    _register(
        "st_pointfromtext", _typed_from_text({"Point"}), T.BinaryType()
    )
    _register(
        "st_linefromtext", _typed_from_text({"LineString"}), T.BinaryType()
    )
    _register(
        "st_polygonfromtext", _typed_from_text({"Polygon"}), T.BinaryType()
    )
    _register(
        "st_mpointfromtext", _typed_from_text({"MultiPoint"}), T.BinaryType()
    )

    def _from_wkb(b):
        # parse + reserialize: validates and canonicalizes byte order
        return to_wkb_seeded(parse_wkb(bytes(b))) if b is not None else None

    _register("st_geomfromwkb", _from_wkb, T.BinaryType())
    _register("st_asbinary", _from_wkb, T.BinaryType())

    def _force2d(b):
        # the kernel model is strictly 2D: Force2D is the identity
        # (documented — Z/M inputs are rejected at parse, COVERAGE.md)
        return to_wkb_seeded(parse_wkb(b)) if b is not None else None

    _register("st_force2d", _force2d, T.BinaryType())

    def _concavehull(b, pct):
        if b is None or pct is None:
            return None
        from xcube_geodb_spark.geometry.triangulate import concave_hull

        out = concave_hull(parse_wkb(b), float(pct))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_concavehull", _concavehull, T.BinaryType())

    def _voronoi(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.triangulate import voronoi_polygons

        out = voronoi_polygons(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_voronoipolygons", _voronoi, T.BinaryType())

    # --- scalar kit: SFS predicates + structure edits ------------------
    def _unary_geom(fn_name):
        def f(b):
            if b is None:
                return None
            import xcube_geodb_spark.geometry.geom as _gm

            out = getattr(_gm, fn_name)(parse_wkb(b))
            if isinstance(out, bool):
                return out
            return to_wkb_seeded(out) if out is not None else None

        return f

    _register("st_issimple", _unary_geom("is_simple"), T.BooleanType())
    _register("st_isclosed", _unary_geom("is_closed"), T.BooleanType())
    _register("st_isring", _unary_geom("is_ring"), T.BooleanType())
    _register("st_multi", _unary_geom("multi"), T.BinaryType())

    def _collextract(b, dim):
        if b is None or dim is None:
            return None
        from xcube_geodb_spark.geometry.geom import collection_extract

        out = collection_extract(parse_wkb(b), int(dim))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_collectionextract", _collextract, T.BinaryType())

    def _rmrepeated(b, tol):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import remove_repeated_points

        out = remove_repeated_points(
            parse_wkb(b), float(tol) if tol is not None else 0.0
        )
        return to_wkb_seeded(out)

    _register("st_removerepeatedpoints", _rmrepeated, T.BinaryType())

    def _segmentize_sql(b, mx):
        if b is None or mx is None:
            return None
        from xcube_geodb_spark.geometry.geom import segmentize

        return to_wkb_seeded(segmentize(parse_wkb(b), float(mx)))

    _register("st_segmentize", _segmentize_sql, T.BinaryType())

    def _hausdorff(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.geom import hausdorff_distance

        return hausdorff_distance(parse_wkb(a), parse_wkb(bytes(b)))

    _register("st_hausdorffdistance", _hausdorff, T.DoubleType())

    def _angle_sql(a, b, c):
        if a is None or b is None or c is None:
            return None
        from xcube_geodb_spark.geometry.geom import angle_3pt

        return angle_3pt(
            parse_wkb(a), parse_wkb(bytes(b)), parse_wkb(bytes(c))
        )

    _register("st_angle", _angle_sql, T.DoubleType())

    def _genpoints(b, n, seed):
        if b is None or n is None:
            return None
        from xcube_geodb_spark.geometry.geom import generate_points

        out = generate_points(
            parse_wkb(b), int(n), int(seed) if seed is not None else 0
        )
        return to_wkb_seeded(out) if out is not None else None

    _register("st_generatepoints", _genpoints, T.BinaryType())

    def _snap_sql(a, b, tol):
        if a is None or b is None or tol is None:
            return None
        from xcube_geodb_spark.geometry.geom import snap_geometry

        return to_wkb_seeded(
            snap_geometry(parse_wkb(a), parse_wkb(bytes(b)), float(tol))
        )

    _register("st_snap", _snap_sql, T.BinaryType())

    def _offsetcurve(b, d):
        if b is None or d is None:
            return None
        from xcube_geodb_spark.geometry.geom import offset_curve

        out = offset_curve(parse_wkb(b), float(d))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_offsetcurve", _offsetcurve, T.BinaryType())

    def _frechet(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.geom import frechet_distance

        v = frechet_distance(parse_wkb(a), parse_wkb(bytes(b)))
        return None if v != v else v

    _register("st_frechetdistance", _frechet, T.DoubleType())

    def _unaryunion(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import unary_union

        out = unary_union(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_unaryunion", _unaryunion, T.BinaryType())

    def _cluster_within_agg(arr, d):
        if arr is None:
            return None
        from xcube_geodb_spark.functions.geo_agg import (
            cluster_within_members,
        )

        clusters = cluster_within_members(
            [parse_wkb(bytes(b)) for b in arr if b is not None],
            float(d) if d is not None else 0.0,
        )
        return [to_wkb_seeded(c) for c in clusters]

    _register(
        "st_clusterwithin_agg",
        _cluster_within_agg,
        T.ArrayType(T.BinaryType()),
    )

    def _addpoint(b, p, pos):
        # PG's 2-arg append form is spelled with position -1 here
        # (fixed-arity UDF registration, same note as st_delaunayedges)
        if b is None or p is None:
            return None
        from xcube_geodb_spark.geometry.geom import add_point

        return to_wkb_seeded(
            add_point(
                parse_wkb(b), parse_wkb(bytes(p)),
                int(pos) if pos is not None else -1,
            )
        )

    _register("st_addpoint", _addpoint, T.BinaryType())

    def _removepoint(b, i):
        if b is None or i is None:
            return None
        from xcube_geodb_spark.geometry.geom import remove_point

        return to_wkb_seeded(remove_point(parse_wkb(b), int(i)))

    _register("st_removepoint", _removepoint, T.BinaryType())

    def _setpoint(b, i, p):
        if b is None or i is None or p is None:
            return None
        from xcube_geodb_spark.geometry.geom import set_point

        return to_wkb_seeded(
            set_point(parse_wkb(b), int(i), parse_wkb(bytes(p)))
        )

    _register("st_setpoint", _setpoint, T.BinaryType())

    def _collect2(a, b):
        # the scalar two-argument ST_Collect the aggregate shim passes
        # through (operators/scan._rewrite_spatial_aggs)
        if a is None and b is None:
            return None
        from xcube_geodb_spark.functions.geo_agg import collect_members

        members = [
            parse_wkb(bytes(x)) for x in (a, b) if x is not None
        ]
        if len(members) == 1:  # PG: ST_Collect(g, NULL) is g
            return to_wkb_seeded(members[0])
        out = collect_members(members)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_collect", _collect2, T.BinaryType())

    def _relate_sql(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.relate import relate_matrix

        return relate_matrix(parse_wkb(a), parse_wkb(b))

    # ST_Relate(a, b) -> the 9-char DE-9IM matrix. The 3-argument boolean
    # form is spelled as the (real PostGIS) composition
    # ST_RelateMatch(ST_Relate(a, b), pattern) — Spark registers one
    # return type per function name, so the text and boolean forms are
    # separate functions exactly as PostGIS also provides.
    _register("st_relate", _relate_sql, T.StringType())

    def _relatematch_sql(m, pattern):
        if m is None or pattern is None:
            return None
        from xcube_geodb_spark.geometry.relate import de9im_match

        return de9im_match(str(m), str(pattern))

    _register("st_relatematch", _relatematch_sql, T.BooleanType())

    def _subdivide_sql(b, mv):
        if b is None or mv is None:
            return None
        from xcube_geodb_spark.geometry.geom import subdivide

        return [
            to_wkb_seeded(p) for p in subdivide(parse_wkb(b), int(mv))
        ]

    # returns array<binary>: explode() to get PostGIS' set-returning shape
    _register("st_subdivide", _subdivide_sql, T.ArrayType(T.BinaryType()))

    def _pointonsurface(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import point_on_surface

        x, y = point_on_surface(parse_wkb(b))
        return to_wkb_seeded(_G("Point", _np.array((x, y))))

    _register("st_pointonsurface", _pointonsurface, T.BinaryType())

    def _line_interp(b, frac):
        if b is None or frac is None:
            return None
        from xcube_geodb_spark.geometry.geom import line_interpolate_point

        x, y = line_interpolate_point(parse_wkb(b), float(frac))
        return to_wkb_seeded(_G("Point", _np.array((x, y))))

    _register("st_lineinterpolatepoint", _line_interp, T.BinaryType())

    def _line_locate(b, p):
        if b is None or p is None:
            return None
        from xcube_geodb_spark.geometry.geom import line_locate_point

        pt = parse_wkb(p)
        if pt.kind != "Point":
            return None
        return line_locate_point(
            parse_wkb(b), float(pt.parts[0]), float(pt.parts[1])
        )

    _register("st_linelocatepoint", _line_locate, T.DoubleType())

    def _line_substr(b, f0, f1):
        if b is None or f0 is None or f1 is None:
            return None
        from xcube_geodb_spark.geometry.geom import line_substring

        return to_wkb_seeded(
            line_substring(parse_wkb(b), float(f0), float(f1))
        )

    _register("st_linesubstring", _line_substr, T.BinaryType())

    def _closestpoint(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.geom import closest_point_pair

        (x, y), _ = closest_point_pair(parse_wkb(a), parse_wkb(b))
        return to_wkb_seeded(_G("Point", _np.array((x, y))))

    _register("st_closestpoint", _closestpoint, T.BinaryType())

    def _shortestline(a, b):
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.geom import closest_point_pair

        pa, pb = closest_point_pair(parse_wkb(a), parse_wkb(b))
        return to_wkb_seeded(
            _G("LineString", _np.array([pa, pb], dtype=_np.float64))
        )

    _register("st_shortestline", _shortestline, T.BinaryType())

    def _boundary(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import boundary

        out = boundary(parse_wkb(b))
        # EMPTY boundary (points, closed lines) -> SQL NULL (the
        # engine's documented EMPTY spelling)
        return to_wkb_seeded(out) if out is not None else None

    _register("st_boundary", _boundary, T.BinaryType())

    # --- affine transforms (PostGIS ST_Translate/ST_Scale/ST_Rotate) ---
    from xcube_geodb_spark.geometry.geom import map_coordinates as _mapc

    def _translate(b, dx, dy):
        if b is None or dx is None or dy is None:
            return None
        dx, dy = float(dx), float(dy)  # DECIMAL literals arrive as Decimal
        return to_wkb_seeded(
            _mapc(parse_wkb(b), lambda x, y: (x + dx, y + dy))
        )

    _register("st_translate", _translate, T.BinaryType())

    def _scale(b, xs, ys):
        if b is None or xs is None or ys is None:
            return None
        xs, ys = float(xs), float(ys)
        return to_wkb_seeded(
            _mapc(parse_wkb(b), lambda x, y: (x * xs, y * ys))
        )

    _register("st_scale", _scale, T.BinaryType())

    def _rotate(b, rad, x0=0.0, y0=0.0):
        """CCW rotation about the origin, or about (x0, y0) when the
        4-arg PostGIS form is used."""
        if b is None or rad is None:
            return None
        import math as _m

        c, s = _m.cos(float(rad)), _m.sin(float(rad))
        ox = 0.0 if x0 is None else float(x0)
        oy = 0.0 if y0 is None else float(y0)
        return to_wkb_seeded(
            _mapc(
                parse_wkb(b),
                lambda x, y: (
                    (x - ox) * c - (y - oy) * s + ox,
                    (x - ox) * s + (y - oy) * c + oy,
                ),
            )
        )

    _register("st_rotate", _rotate, T.BinaryType())

    def _affine(b, a, bb, d, e, xoff, yoff):
        """The 2D PostGIS ST_Affine: x' = a*x + b*y + xoff,
        y' = d*x + e*y + yoff."""
        if b is None or None in (a, bb, d, e, xoff, yoff):
            return None
        a, bb, d, e = float(a), float(bb), float(d), float(e)
        xoff, yoff = float(xoff), float(yoff)
        return to_wkb_seeded(
            _mapc(
                parse_wkb(b),
                lambda x, y: (a * x + bb * y + xoff, d * x + e * y + yoff),
            )
        )

    _register("st_affine", _affine, T.BinaryType())

    def _maxdistance(ga, gb):
        """ST_MaxDistance: the 2D max distance is attained at a vertex
        pair, so the vectorized vertex cross-product suffices."""
        if ga is None or gb is None:
            return None
        import numpy as _np

        from xcube_geodb_spark.geometry.geom import _all_vertices

        pa = _all_vertices(parse_wkb(ga))
        pb = _all_vertices(parse_wkb(bytes(gb)))
        if not len(pa) or not len(pb):
            return None
        dd = _np.hypot(
            pa[:, None, 0] - pb[None, :, 0], pa[:, None, 1] - pb[None, :, 1]
        )
        return float(dd.max())

    _register("st_maxdistance", _maxdistance, T.DoubleType())

    def _longestline(ga, gb):
        """ST_LongestLine: the 2-point line attaining st_maxdistance
        (first maximal pair in vertex order — deterministic)."""
        if ga is None or gb is None:
            return None
        import numpy as _np

        from xcube_geodb_spark.geometry.geom import (
            Geometry as _G,
            _all_vertices,
        )

        A = parse_wkb(ga)
        pa = _all_vertices(A)
        pb = _all_vertices(parse_wkb(bytes(gb)))
        if not len(pa) or not len(pb):
            return None
        dd = _np.hypot(
            pa[:, None, 0] - pb[None, :, 0], pa[:, None, 1] - pb[None, :, 1]
        )
        i, j = _np.unravel_index(int(dd.argmax()), dd.shape)
        return to_wkb_seeded(
            _G(
                "LineString",
                _np.asarray([pa[i], pb[j]], dtype=_np.float64),
                A.srid,
            )
        )

    _register("st_longestline", _longestline, T.BinaryType())

    def _points(b):
        """``ST_Points``: every vertex (duplicates kept, PostGIS
        semantics) as a MULTIPOINT."""
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import _all_vertices

        g = parse_wkb(b)
        verts = _all_vertices(g)
        if not len(verts):
            return None
        pts = [_G("Point", v.copy()) for v in verts]
        if len(pts) == 1:
            out = pts[0]
            out.srid = g.srid
            return to_wkb_seeded(out)
        return to_wkb_seeded(_G("MultiPoint", pts, g.srid))

    _register("st_points", _points, T.BinaryType())

    def _mbc(b, quad_segs=12):
        """``ST_MinimumBoundingCircle(geom[, num_segs_per_qt])``: the
        exact MEC approximated as the inscribed 4*segs-gon (PostGIS
        default 48 per quarter is overkill for parity tests; 12 here,
        pass the arg for more)."""
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import (
            buffer_point,
            minimum_bounding_circle,
        )

        cx, cy, r = minimum_bounding_circle(parse_wkb(b))
        if r == 0.0:
            return to_wkb_seeded(_G("Point", _np.array((cx, cy))))
        return to_wkb_seeded(
            buffer_point(cx, cy, r, int(quad_segs or 12))
        )

    _register("st_minimumboundingcircle", _mbc, T.BinaryType())

    def _mbr(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import minimum_bounding_circle

        return minimum_bounding_circle(parse_wkb(b))[2]

    # the radius half of PostGIS' ST_MinimumBoundingRadius record
    _register("st_minimumboundingradius", _mbr, T.DoubleType())

    def _oriented_env(b):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.geom import oriented_envelope

        out = oriented_envelope(parse_wkb(b))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_orientedenvelope", _oriented_env, T.BinaryType())

    from xcube_geodb_spark.geometry.geom import distance_sphere

    _register(
        "st_distancesphere",
        lambda a, b: distance_sphere(parse_wkb(a), parse_wkb(b))
        if a is not None and b is not None
        else None,
        T.DoubleType(),
    )

    from xcube_geodb_spark.geometry.geom import (
        length_sphere,
        length_spheroid,
        perimeter_sphere,
        perimeter_spheroid,
    )

    _register(
        "st_lengthsphere",
        lambda b: length_sphere(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )
    _register(
        "st_perimetersphere",
        lambda b: perimeter_sphere(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )
    _register(
        "st_lengthspheroid",
        lambda b: length_spheroid(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )
    _register(
        "st_perimeterspheroid",
        lambda b: perimeter_spheroid(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )

    from xcube_geodb_spark.geometry.geom import (
        area_sphere,
        area_spheroid,
        distance_spheroid,
    )

    _register(
        "st_areasphere",
        lambda b: area_sphere(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )
    _register(
        "st_areaspheroid",
        lambda b: area_spheroid(parse_wkb(b)) if b is not None else None,
        T.DoubleType(),
    )
    _register(
        "st_distancespheroid",
        lambda a, b: distance_spheroid(parse_wkb(a), parse_wkb(b))
        if a is not None and b is not None
        else None,
        T.DoubleType(),
    )

    from xcube_geodb_spark.geometry.geom import project_point

    def _project(b, dist, azimuth):
        if b is None or dist is None or azimuth is None:
            return None
        g = parse_wkb(b)
        if g.kind != "Point":
            raise GeoDBError("st_project supports Point geometries only")
        import numpy as __np

        x, y = project_point(
            float(g.parts[0]), float(g.parts[1]), float(dist), float(azimuth)
        )
        from xcube_geodb_spark.geometry.geom import Geometry as __G

        return to_wkb_seeded(__G("Point", __np.array([x, y]), g.srid))

    _register("st_project", _project, T.BinaryType())

    import math as _math

    import numpy as _np

    from xcube_geodb_spark.geometry.geom import Geometry as _Geometry

    def _makepoint(x, y):
        if x is None or y is None:
            return None
        return to_wkb_seeded(_Geometry("Point", _np.array([float(x), float(y)])))

    _register("st_makepoint", _makepoint, T.BinaryType())
    _register("st_point", _makepoint, T.BinaryType())

    def _setsrid(b: bytes, srid: int):
        if b is None:
            return None
        g = parse_wkb(b)
        g.srid = int(srid)
        return to_wkb_seeded(g, srid=int(srid))

    _register("st_setsrid", _setsrid, T.BinaryType())

    def _azimuth(a: bytes, b: bytes):
        """North-based clockwise bearing between two points, radians in
        [0, 2pi) — PostGIS ST_Azimuth; NULL for coincident points."""
        if a is None or b is None:
            return None
        ga, gb = parse_wkb(a), parse_wkb(b)
        if ga.kind != "Point" or gb.kind != "Point":
            raise GeoDBError("st_azimuth supports Point geometries only")
        dx = float(gb.parts[0]) - float(ga.parts[0])
        dy = float(gb.parts[1]) - float(ga.parts[1])
        if dx == 0.0 and dy == 0.0:
            return None
        return _math.atan2(dx, dy) % (2.0 * _math.pi)

    _register("st_azimuth", _azimuth, T.DoubleType())

    from xcube_geodb_spark.geometry.geom import bbox_polygon, clip_by_box

    def _makeenvelope(xmin, ymin, xmax, ymax, srid=None):
        if None in (xmin, ymin, xmax, ymax):
            return None
        g = bbox_polygon(float(xmin), float(ymin), float(xmax), float(ymax))
        return to_wkb_seeded(g, srid=int(srid) if srid else None)

    _register("st_makeenvelope", _makeenvelope, T.BinaryType())

    def _clipbybox2d(b: bytes, env: bytes):
        """PostGIS ST_ClipByBox2D(geom, box2d): the box argument is any
        geometry's 2D envelope (pair with st_makeenvelope)."""
        if b is None or env is None:
            return None
        out = clip_by_box(parse_wkb(b), envelope(parse_wkb(env)))
        return to_wkb_seeded(out) if out is not None else None

    _register("st_clipbybox2d", _clipbybox2d, T.BinaryType())

    from xcube_geodb_spark.geometry.geom import map_coordinates

    def _snaptogrid(b: bytes, size: float):
        """PostGIS ST_SnapToGrid(geom, size): coordinates rounded to the
        origin-anchored grid. Consecutive duplicate vertices produced by
        snapping are NOT removed (PostGIS removes them; documented
        deviation — pair with st_simplify(0) to collapse them)."""
        if b is None or size is None or float(size) <= 0:
            return None
        s = float(size)
        out = map_coordinates(
            parse_wkb(b), lambda x, y: (round(x / s) * s, round(y / s) * s)
        )
        return to_wkb_seeded(out)

    _register("st_snaptogrid", _snaptogrid, T.BinaryType())

    def _envelope_poly(b: bytes):
        """ST_Envelope: the geometry's axis-aligned bounding rectangle
        (degenerate inputs still return the 5-point ring, unlike PostGIS
        which degrades to POINT/LINESTRING — documented deviation)."""
        if b is None:
            return None
        return to_wkb_seeded(bbox_polygon(*envelope(parse_wkb(b))))

    _register("st_envelope", _envelope_poly, T.BinaryType())

    def _expand(b: bytes, dist: float):
        """ST_Expand: the envelope grown by ``dist`` on every side."""
        if b is None or dist is None:
            return None
        xmin, ymin, xmax, ymax = envelope(parse_wkb(b))
        d = float(dist)
        return to_wkb_seeded(bbox_polygon(xmin - d, ymin - d, xmax + d, ymax + d))

    _register("st_expand", _expand, T.BinaryType())

    def _is_rect(g) -> bool:
        if g.kind != "Polygon" or len(g.parts) != 1:
            return False
        ring = g.parts[0]
        if len(ring) != 5:
            return False
        xmin, ymin, xmax, ymax = envelope(g)
        xs = {float(p[0]) for p in ring}
        ys = {float(p[1]) for p in ring}
        return xs <= {xmin, xmax} and ys <= {ymin, ymax}

    def _intersection(a: bytes, b: bytes):
        """ST_Intersection: an axis-aligned rectangular operand (either
        side) takes the fast clip path for ANY geometry kind; otherwise
        the general polygon overlay kernel (geometry/overlay.py) computes
        the boolean — polygonal operands, polygonal output."""
        if a is None or b is None:
            return None
        ga, gb = parse_wkb(a), parse_wkb(b)
        if _is_rect(gb):
            out = clip_by_box(ga, envelope(gb))
        elif _is_rect(ga):
            out = clip_by_box(gb, envelope(ga))
        else:
            from xcube_geodb_spark.geometry.overlay import overlay

            out = overlay(ga, gb, "intersection")
        return to_wkb_seeded(out) if out is not None else None

    def _prep_intersection(a, b):
        """st_intersection(prepared, constant-rectangle): vectorized
        envelope triage (pass-through / NULL / clip only the straddlers)
        — see prepared.v_clip_rect_wkb. Any other pattern bridges."""
        if isinstance(a, pd.DataFrame) and not isinstance(b, pd.DataFrame):
            const = _const_of(b)
            if const is not None:
                gb = parse_wkb(
                    const if isinstance(const, bytes) else bytes(const)
                )
                if _is_rect(gb):
                    return _pp.v_clip_rect_wkb(a, envelope(gb))
        elif isinstance(b, pd.DataFrame) and not isinstance(a, pd.DataFrame):
            const = _const_of(a)
            if const is not None:
                ga = parse_wkb(
                    const if isinstance(const, bytes) else bytes(const)
                )
                if _is_rect(ga):
                    return _pp.v_clip_rect_wkb(b, envelope(ga))
        return None

    _register(
        "st_intersection", _intersection, T.BinaryType(),
        prep=_prep_intersection,
    )

    def _overlay_udf(op: str):
        from xcube_geodb_spark.geometry.overlay import overlay

        def f(a: bytes, b: bytes):
            if a is None or b is None:
                # ST_Union(g, NULL) = g per PostGIS; intersection-like
                # ops return NULL
                if op == "union":
                    return a if a is not None else b
                if op == "difference" and a is not None:
                    return a
                return None
            out = overlay(parse_wkb(a), parse_wkb(b), op)
            return to_wkb_seeded(out) if out is not None else None

        return f

    _register("st_union", _overlay_udf("union"), T.BinaryType())
    _register("st_difference", _overlay_udf("difference"), T.BinaryType())
    _register(
        "st_symdifference", _overlay_udf("symdifference"), T.BinaryType()
    )

    # --- aggregate companions (operators/scan._rewrite_spatial_aggs) ------
    # Python UDFs can't register as Spark aggregates, so the pg dialect
    # shim rewrites ST_Union(g) / ST_Collect(g) in aggregate position
    # (reference passthrough: geodb.sql:1169) into collect_list + these
    # array<binary> -> binary scalar kernels — the same union_all /
    # promotion kernels the engine's dissolve / collect_geometries
    # operators fold with, so the SQL and Python-API paths are
    # byte-identical. Also directly callable: the PostGIS
    # ST_Union(geometry[]) array variant.
    def _union_agg(arr):
        if arr is None:
            return None
        from xcube_geodb_spark.geometry.overlay import union_all

        members = [parse_wkb(bytes(b)) for b in arr if b is not None]
        merged = union_all(members)
        return to_wkb_seeded(merged) if merged is not None else None

    def _collect_agg(arr):
        if arr is None:
            return None
        from xcube_geodb_spark.functions.geo_agg import collect_members

        g = collect_members([parse_wkb(bytes(b)) for b in arr if b is not None])
        return to_wkb_seeded(g) if g is not None else None

    def _makeline_agg(arr):
        if arr is None:
            return None
        from xcube_geodb_spark.geometry.geom import make_line

        g = make_line([parse_wkb(bytes(b)) for b in arr if b is not None])
        return to_wkb_seeded(g) if g is not None else None

    def _makeline2(a, b):
        # the scalar two-argument PostGIS form (point/line pairs)
        if a is None or b is None:
            return None
        from xcube_geodb_spark.geometry.geom import make_line

        g = make_line([parse_wkb(bytes(a)), parse_wkb(bytes(b))])
        return to_wkb_seeded(g) if g is not None else None

    _register("st_union_agg", _union_agg, T.BinaryType())
    _register("st_collect_agg", _collect_agg, T.BinaryType())
    _register("st_makeline_agg", _makeline_agg, T.BinaryType())
    _register("st_makeline", _makeline2, T.BinaryType())

    def _transform(b: bytes, from_srid: int, to_srid: int):
        if b is None:
            return None
        from xcube_geodb_spark.geometry.crs import transform_point
        from xcube_geodb_spark.geometry.geom import map_coordinates

        out = map_coordinates(
            parse_wkb(b),
            lambda x, y: transform_point(x, y, int(from_srid), int(to_srid)),
        )
        out.srid = int(to_srid)
        return to_wkb_seeded(out)

    _register("st_transform", _transform, T.BinaryType())

    # --- structural accessors (PostGIS basics over the kernel model) ------
    from xcube_geodb_spark.geometry.geom import _all_vertices

    def _npoints(b):
        return int(len(_all_vertices(parse_wkb(b)))) if b is not None else None

    _register("st_npoints", _npoints, T.IntegerType())
    _register("st_numpoints", _npoints, T.IntegerType())

    def _srid(b):
        return int(parse_wkb(b).srid) if b is not None else None

    _register("st_srid", _srid, T.IntegerType())

    def _numgeometries(b):
        if b is None:
            return None
        g = parse_wkb(b)
        # PostGIS >= 2.0: 1 for single geometries, member count for Multi*
        return len(g.parts) if g.kind in (
            "MultiPoint", "MultiLineString", "MultiPolygon",
            "GeometryCollection",
        ) else 1

    _register("st_numgeometries", _numgeometries, T.IntegerType())

    def _line_point(b, n):
        """1-based vertex of a LineString; negative n counts from the end
        (PostGIS ST_PointN); NULL off-range or for non-lines."""
        if b is None or n is None or n == 0:
            return None
        n = int(n)
        g = parse_wkb(b)
        if g.kind != "LineString":
            return None
        k = len(g.parts)
        i = n - 1 if n > 0 else k + n
        if not 0 <= i < k:
            return None
        return to_wkb_seeded(_Geometry("Point", g.parts[i].copy(), g.srid))

    _register("st_pointn", _line_point, T.BinaryType())
    _register(
        "st_startpoint", lambda b: _line_point(b, 1), T.BinaryType()
    )
    _register(
        "st_endpoint", lambda b: _line_point(b, -1), T.BinaryType()
    )

    def _exteriorring(b):
        if b is None:
            return None
        g = parse_wkb(b)
        if g.kind != "Polygon":
            return None
        return to_wkb_seeded(_Geometry("LineString", g.parts[0].copy(), g.srid))

    _register("st_exteriorring", _exteriorring, T.BinaryType())

    def _numinteriorrings(b):
        if b is None:
            return None
        g = parse_wkb(b)
        return len(g.parts) - 1 if g.kind == "Polygon" else None

    _register(
        "st_numinteriorrings", _numinteriorrings, T.IntegerType()
    )

    def _interiorringn(b, n):
        if b is None or n is None or n < 1:
            return None
        n = int(n)
        g = parse_wkb(b)
        if g.kind != "Polygon" or n >= len(g.parts):
            return None
        return to_wkb_seeded(_Geometry("LineString", g.parts[n].copy(), g.srid))

    _register("st_interiorringn", _interiorringn, T.BinaryType())

    def _reverse_geom(g):
        if g.kind == "Point":
            return g
        if g.kind == "LineString":
            return _Geometry("LineString", g.parts[::-1].copy(), g.srid)
        if g.kind == "Polygon":
            return _Geometry(
                "Polygon", [r[::-1].copy() for r in g.parts], g.srid
            )
        return _Geometry(g.kind, [_reverse_geom(c) for c in g.parts], g.srid)

    def _reverse(b):
        return to_wkb_seeded(_reverse_geom(parse_wkb(b))) if b is not None else None

    _register("st_reverse", _reverse, T.BinaryType())

    from xcube_geodb_spark.geometry.geom import map_coordinates as _mapc

    def _flip(b):
        if b is None:
            return None
        return to_wkb_seeded(_mapc(parse_wkb(b), lambda x, y: (y, x)))

    _register("st_flipcoordinates", _flip, T.BinaryType())
