"""Geo queries for the driver contract (SURVEY.md §2.3).

The driver's tables carry no geometry column (TESTDATA.md), so geometry is
synthesized deterministically from keys (FIXTURES.md §5 suggests exactly
this): each customer key maps to a point on a 0.01-degree grid, and to an
axis-aligned square of integer half-width. The Spark side runs the REAL
engine path — WKB via the geometry kernel, persisted envelope columns,
envelope pre-filter + exact predicate UDF — while the DuckDB oracle
evaluates the same predicates as pure interval arithmetic (with a 1e-6
tolerance mirroring the kernel's epsilon; the data grid guarantees any
tolerance in [1e-10, 1e-3] classifies identically).

    x = (c_custkey * 7919  % 36000) / 100.0 - 180.0
    y = (c_custkey * 104729 % 18000) / 100.0 - 90.0
    h = c_custkey % 7 + 5          (square half-width)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_geodb_spark.geometry.geom import bbox_polygon  # noqa: F401 (docs)
from xcube_geodb_spark.geometry.udfs import (
    bbox_predicate_column,
    envelope_prefilter,
    geom_type_udf,
)
from xcube_geodb_spark.suite.util import load

EPS = 1e-6

# boxes chosen so that no point/square edge can sit inside (eps, 1e-3) of a
# box edge: point coords are on the 0.01 grid, half-widths are integers
BOX_CONTAINS = (-90.005, -44.005, 30.005, 44.005)
BOX_SQUARES = (-50.0, -30.0, 50.0, 30.0)
BOX_WITHIN = (-2.005, -1.005, 2.005, 1.005)

# equals target: the square of c_custkey=43 (x=-14.83, y=-56.53, h=6)
BOX_EQUALS = (-20.83, -62.53, -8.83, -50.53)

# touches target: customer 7's square is x[9.33, 19.33], y[36.03, 46.03];
# this box shares exactly the x=19.33 edge with it
BOX_TOUCHES = (19.33, 30.0, 60.0, 50.0)

# crosses box: .005 offsets so no segment endpoint or y-level sits within
# 1e-3 of an edge (same classification for any kernel eps in [1e-10, 1e-3])
BOX_CROSSES = (-50.005, -30.005, 50.005, 30.005)


@F.pandas_udf(T.BinaryType())
def _point_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    # batch-assembled 21-byte point WKB (one numpy write per batch)
    import numpy as np

    n = len(x)
    arr = np.empty((n, 21), dtype=np.uint8)
    arr[:, 0] = 1
    arr[:, 1:5] = np.frombuffer(b"\x01\x00\x00\x00", dtype=np.uint8)
    coords = np.column_stack(
        [x.to_numpy(dtype=np.float64), y.to_numpy(dtype=np.float64)]
    )
    arr[:, 5:21] = np.ascontiguousarray(coords).view(np.uint8).reshape(n, 16)
    return pd.Series([arr[i].tobytes() for i in range(n)])


@F.pandas_udf(T.BinaryType())
def _square_wkb(x: pd.Series, y: pd.Series, h: pd.Series) -> pd.Series:
    # batch-assembled 93-byte rectangle-polygon WKB
    import numpy as np

    n = len(x)
    xv = x.to_numpy(dtype=np.float64)
    yv = y.to_numpy(dtype=np.float64)
    hv = h.to_numpy(dtype=np.float64)
    x0, y0, x1, y1 = xv - hv, yv - hv, xv + hv, yv + hv
    ring = np.empty((n, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = x0, y0
    ring[:, 2], ring[:, 3] = x1, y0
    ring[:, 4], ring[:, 5] = x1, y1
    ring[:, 6], ring[:, 7] = x0, y1
    ring[:, 8], ring[:, 9] = x0, y0
    arr = np.empty((n, 93), dtype=np.uint8)
    arr[:, :13] = np.frombuffer(
        b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00", dtype=np.uint8
    )
    arr[:, 13:] = ring.view(np.uint8).reshape(n, 80)
    return pd.Series([arr[i].tobytes() for i in range(n)])


@F.pandas_udf(T.BinaryType())
def _segment_wkb(x: pd.Series, y: pd.Series, h: pd.Series) -> pd.Series:
    # batch-assembled 41-byte horizontal-segment LineString WKB
    import numpy as np

    n = len(x)
    xv = x.to_numpy(dtype=np.float64)
    yv = y.to_numpy(dtype=np.float64)
    hv = h.to_numpy(dtype=np.float64)
    pts = np.empty((n, 4), dtype=np.float64)
    pts[:, 0], pts[:, 1] = xv - hv, yv
    pts[:, 2], pts[:, 3] = xv + hv, yv
    arr = np.empty((n, 41), dtype=np.uint8)
    arr[:, :9] = np.frombuffer(
        b"\x01\x02\x00\x00\x00\x02\x00\x00\x00", dtype=np.uint8
    )
    arr[:, 9:] = pts.view(np.uint8).reshape(n, 32)
    return pd.Series([arr[i].tobytes() for i in range(n)])


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # envelope columns computed alongside the geometry, exactly as the
    # engine persists them at ingest — the query path reads stored columns
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_acctbal",
            ((F.col("c_custkey") * 7919 % 36000) / 100.0 - 180.0).alias("x"),
            ((F.col("c_custkey") * 104729 % 18000) / 100.0 - 90.0).alias("y"),
        )
        .withColumn("geometry", _point_wkb("x", "y"))
        .withColumn("__xmin", F.col("x"))
        .withColumn("__ymin", F.col("y"))
        .withColumn("__xmax", F.col("x"))
        .withColumn("__ymax", F.col("y"))
    )


def _squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_acctbal",
            ((F.col("c_custkey") * 7919 % 36000) / 100.0 - 180.0).alias("x"),
            ((F.col("c_custkey") * 104729 % 18000) / 100.0 - 90.0).alias("y"),
            (F.col("c_custkey") % 7 + 5).cast("double").alias("h"),
        )
        .withColumn("geometry", _square_wkb("x", "y", "h"))
        .withColumn("__xmin", F.col("x") - F.col("h"))
        .withColumn("__ymin", F.col("y") - F.col("h"))
        .withColumn("__xmax", F.col("x") + F.col("h"))
        .withColumn("__ymax", F.col("y") + F.col("h"))
    )


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal segment per customer: (x-h, y) -> (x+h, y) — the 1-D
    geometry that exercises the ``crosses`` dispatch arm
    (``geodb.sql:1210``; crosses is always false for area-vs-area)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            ((F.col("c_custkey") * 7919 % 36000) / 100.0 - 180.0).alias("x"),
            ((F.col("c_custkey") * 104729 % 18000) / 100.0 - 90.0).alias("y"),
            (F.col("c_custkey") % 7 + 5).cast("double").alias("h"),
        )
        .withColumn("geometry", _segment_wkb("x", "y", "h"))
        .withColumn("__xmin", F.col("x") - F.col("h"))
        .withColumn("__ymin", F.col("y"))
        .withColumn("__xmax", F.col("x") + F.col("h"))
        .withColumn("__ymax", F.col("y"))
    )


def _bbox_query(df: DataFrame, mode: str, box) -> DataFrame:
    """The engine's spatial physical plan: envelope pre-filter on persisted
    columns (parquet-stat prunable range predicate) + exact kernel predicate
    evaluated only on survivors."""
    pre = envelope_prefilter(mode, box)
    if pre is not None:
        df = df.filter(pre)
    return df.filter(bbox_predicate_column(mode, box)).select("c_custkey")


def geo_bbox_contains_points(spark, sf_dir):
    return _bbox_query(_points(spark, sf_dir), "contains", BOX_CONTAINS)


def geo_bbox_disjoint_points(spark, sf_dir):
    return _bbox_query(_points(spark, sf_dir), "disjoint", BOX_CONTAINS)


def geo_bbox_intersects_squares(spark, sf_dir):
    df = _squares(spark, sf_dir).filter(F.col("c_acctbal") > 0)  # extra where, AND
    return _bbox_query(df, "intersects", BOX_SQUARES)


def geo_bbox_within_squares(spark, sf_dir):
    return _bbox_query(_squares(spark, sf_dir), "within", BOX_WITHIN)


def geo_bbox_touches_squares(spark, sf_dir):
    return _bbox_query(_squares(spark, sf_dir), "touches", BOX_TOUCHES)


def geo_bbox_overlaps_squares(spark, sf_dir):
    return _bbox_query(_squares(spark, sf_dir), "overlaps", BOX_SQUARES)


def geo_bbox_equals_squares(spark, sf_dir):
    return _bbox_query(_squares(spark, sf_dir), "equals", BOX_EQUALS)


def geo_bbox_crosses_segments(spark, sf_dir):
    return _bbox_query(_segments(spark, sf_dir), "crosses", BOX_CROSSES)


def geo_bbox_crs_transform(spark, sf_dir):
    """CRS auto-alignment parity (geodb.py:1630-1637): the query box arrives
    in EPSG:3857, the engine reprojects it to the collection CRS (4326)
    before filtering. The oracle uses the original 4326 box — the transform
    round-trip error (~1e-12 deg) is far below the 0.005-degree data-grid
    margin."""
    from xcube_geodb_spark.geometry.crs import transform_bbox_crs

    box_3857 = transform_bbox_crs(BOX_CONTAINS, 4326, 3857)
    box_back = transform_bbox_crs(box_3857, 3857, 4326)
    return _bbox_query(_points(spark, sf_dir), "contains", box_back)


def geo_bbox_modes(spark, sf_dir):
    """One driver gate for all eight bbox comparison modes (geodb
    comparison_mode parity, geodb.sql get_by_bbox): a tagged union of each
    mode's matching keys, so every mode's exact row membership stays
    driver-verified in a single 50-window slot."""
    mode_fns = {
        "contains": geo_bbox_contains_points,
        "disjoint": geo_bbox_disjoint_points,
        "intersects": geo_bbox_intersects_squares,
        "within": geo_bbox_within_squares,
        "touches": geo_bbox_touches_squares,
        "overlaps": geo_bbox_overlaps_squares,
        "equals": geo_bbox_equals_squares,
        "crosses": geo_bbox_crosses_segments,
    }
    out = None
    for mode, fn in mode_fns.items():
        part = fn(spark, sf_dir).select(
            F.lit(mode).alias("mode"), F.col("c_custkey")
        )
        out = part if out is None else out.unionByName(part)
    return out


def geo_count_by_bbox(spark, sf_dir):
    n = _bbox_query(_squares(spark, sf_dir), "intersects", BOX_SQUARES).count()
    return spark.createDataFrame([(n,)], "n bigint")


def geo_extent_squares(spark, sf_dir):
    """Collection extent over persisted envelope columns (ST_Extent parity)."""
    df = _squares(spark, sf_dir)
    return df.agg(
        F.round(F.min("__xmin"), 6).alias("xmin"),
        F.round(F.min("__ymin"), 6).alias("ymin"),
        F.round(F.max("__xmax"), 6).alias("xmax"),
        F.round(F.max("__ymax"), 6).alias("ymax"),
    )


def geo_geometry_types(spark, sf_dir):
    """Mixed collection: even keys are points, odd keys squares;
    geodb_geometry_types aggregate=true parity."""
    pts = _points(spark, sf_dir).filter(F.col("c_custkey") % 2 == 0)
    sqs = _squares(spark, sf_dir).filter(F.col("c_custkey") % 2 == 1)
    mixed = pts.select("c_custkey", "geometry").unionByName(
        sqs.select("c_custkey", "geometry")
    )
    return mixed.select(geom_type_udf("geometry").alias("geometrytype")).distinct()


# ---------------------------------------------------------------------------
# oracle SQL — pure interval arithmetic on the same synthesized geometry
# ---------------------------------------------------------------------------

_PTS = """
    SELECT c_custkey, c_acctbal,
           (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS x,
           (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS y
    FROM customer
"""

_SQS = f"SELECT *, CAST(c_custkey % 7 + 5 AS DOUBLE) AS h FROM ({_PTS})"


def _sq_rel(box) -> str:
    """Interval-overlap fragments for box vs square."""
    qx0, qy0, qx1, qy1 = box
    return (
        f"least({qx1}, x + h) - greatest({qx0}, x - h) AS ix, "
        f"least({qy1}, y + h) - greatest({qy0}, y - h) AS iy, "
        f"(x - h >= {qx0} - {EPS} AND x + h <= {qx1} + {EPS} AND "
        f" y - h >= {qy0} - {EPS} AND y + h <= {qy1} + {EPS}) AS sq_in_box, "
        f"(x - h <= {qx0} + {EPS} AND x + h >= {qx1} - {EPS} AND "
        f" y - h <= {qy0} + {EPS} AND y + h >= {qy1} - {EPS}) AS box_in_sq"
    )


def _sq_oracle(box, predicate: str, extra_where: str = "") -> str:
    return f"""
        SELECT c_custkey FROM (
            SELECT c_custkey, c_acctbal, x, y, h, {_sq_rel(box)}
            FROM ({_SQS})
        ) WHERE ({predicate}) {extra_where}
    """


_INTERSECTS = f"ix >= -{EPS} AND iy >= -{EPS}"
_II = f"ix > {EPS} AND iy > {EPS}"

def geo_buffer_squares(spark, sf_dir):
    """General polygon ST_Buffer (geometry/overlay.buffer_geometry): the
    polygon + per-edge offset rectangles + convex-vertex arc fans,
    dissolved through the overlay union kernel. On a square with
    radius r and quad_segs=8 the area is exactly
    ``4h^2 + 8h*r + 16 r^2 sin(pi/16)`` (4 corner wedges of 8 chords
    each) — the closed form the oracle computes per row."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_buffer")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(st_buffer(geometry, h / 4)), 6) AS barea
        FROM sq_buffer
        """
    )


def geo_erode_squares(spark, sf_dir):
    """Negative-radius ST_Buffer (erosion): P minus its boundary's
    Minkowski capsule (geometry/overlay.buffer_geometry, radius < 0).
    Eroding a square of side 2h by r leaves the exact inset square of
    side 2h - 2r — with r = h/4 the area is (3h/2)^2, the closed form
    the oracle computes per row."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_erode")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(st_buffer(geometry, -h / 4)), 6) AS earea
        FROM sq_erode
        """
    )


def geo_measures_squares(spark, sf_dir):
    """st_area / st_perimeter / st_centroid / st_x / st_y scalars through
    the raw-SQL path; the squares' closed-form (x, y, h) parameters give
    the oracle exact expected values (area 4h^2, perimeter 8h,
    centroid (x, y))."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_measures")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(geometry), 6) AS area,
               round(st_perimeter(geometry), 6) AS perim,
               round(st_x(st_centroid(geometry)), 6) AS cx,
               round(st_y(st_centroid(geometry)), 6) AS cy
        FROM sq_measures
        """
    )


GEO_ORACLES = {
    "geo_measures_squares": f"""
        SELECT c_custkey, round(4 * h * h, 6) AS area,
               round(8 * h, 6) AS perim,
               round(x, 6) AS cx, round(y, 6) AS cy
        FROM ({_SQS})
    """,
    # buffered-square closed form: A + P*r + 4 corner wedges of
    # quad_segs=8 chords each (nseg * r^2/2 * sin(sweep/nseg), sweep =
    # pi/2 at every square corner) with r = h/4
    "geo_buffer_squares": f"""
        SELECT c_custkey,
               round(4 * h * h + 8 * h * (h / 4)
                     + 16 * (h / 4) * (h / 4) * sin(pi() / 16), 6)
                   AS barea
        FROM ({_SQS})
    """,
    # inset square: side 2h - 2*(h/4) = 3h/2 exactly
    "geo_erode_squares": f"""
        SELECT c_custkey,
               round((1.5 * h) * (1.5 * h), 6) AS earea
        FROM ({_SQS})
    """,
    "geo_bbox_contains_points": f"""
        SELECT c_custkey FROM ({_PTS})
        WHERE x > {BOX_CONTAINS[0]} AND x < {BOX_CONTAINS[2]}
          AND y > {BOX_CONTAINS[1]} AND y < {BOX_CONTAINS[3]}
    """,
    "geo_bbox_crs_transform": f"""
        SELECT c_custkey FROM ({_PTS})
        WHERE x > {BOX_CONTAINS[0]} AND x < {BOX_CONTAINS[2]}
          AND y > {BOX_CONTAINS[1]} AND y < {BOX_CONTAINS[3]}
    """,
    "geo_bbox_disjoint_points": f"""
        SELECT c_custkey FROM ({_PTS})
        WHERE NOT (x >= {BOX_CONTAINS[0]} AND x <= {BOX_CONTAINS[2]}
               AND y >= {BOX_CONTAINS[1]} AND y <= {BOX_CONTAINS[3]})
    """,
    "geo_bbox_intersects_squares": _sq_oracle(
        BOX_SQUARES, _INTERSECTS, "AND c_acctbal > 0"
    ),
    "geo_bbox_within_squares": _sq_oracle(BOX_WITHIN, "box_in_sq"),
    "geo_bbox_touches_squares": _sq_oracle(
        BOX_TOUCHES, f"({_INTERSECTS}) AND NOT ({_II})"
    ),
    "geo_bbox_overlaps_squares": _sq_oracle(
        BOX_SQUARES, f"({_II}) AND NOT sq_in_box AND NOT box_in_sq"
    ),
    # crosses(box, segment): segment interior passes through the open box
    # but the segment is not fully inside — pure interval arithmetic on the
    # horizontal segment (y strictly inside, open x-overlap, not contained)
    "geo_bbox_crosses_segments": f"""
        SELECT c_custkey FROM ({_SQS})
        WHERE y > {BOX_CROSSES[1]} AND y < {BOX_CROSSES[3]}
          AND x + h > {BOX_CROSSES[0]} AND x - h < {BOX_CROSSES[2]}
          AND NOT (x - h >= {BOX_CROSSES[0]} AND x + h <= {BOX_CROSSES[2]})
    """,
    "geo_bbox_equals_squares": _sq_oracle(
        BOX_EQUALS,
        f"abs(x - h - ({BOX_EQUALS[0]})) < {EPS} AND abs(y - h - ({BOX_EQUALS[1]})) < {EPS}"
        f" AND abs(x + h - ({BOX_EQUALS[2]})) < {EPS} AND abs(y + h - ({BOX_EQUALS[3]})) < {EPS}",
    ),
    "geo_count_by_bbox": f"""
        SELECT count(*) AS n FROM (
            SELECT c_custkey, {_sq_rel(BOX_SQUARES)} FROM ({_SQS})
        ) WHERE {_INTERSECTS}
    """,
    "geo_extent_squares": f"""
        SELECT round(min(x - h), 6) AS xmin, round(min(y - h), 6) AS ymin,
               round(max(x + h), 6) AS xmax, round(max(y + h), 6) AS ymax
        FROM ({_SQS})
    """,
    "geo_geometry_types": """
        SELECT DISTINCT CASE WHEN c_custkey % 2 = 0 THEN 'POINT'
                             ELSE 'POLYGON' END AS geometrytype
        FROM customer
    """,
}

def geo_distance_knn(spark, sf_dir):
    """st_distance through the raw-SQL path: k nearest squares to a query
    point, with exact distances. The squares' closed form (center (x, y),
    half-width h) gives the oracle the textbook point-to-axis-aligned-box
    distance: hypot(max(|px-x|-h, 0), max(|py-y|-h, 0)); a square
    containing the point yields 0 (the kernel's containment path)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_dist")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_distance(st_geomfromtext('POINT (10 5)'), geometry),
                     6) AS dist
        FROM sq_dist
        ORDER BY dist, c_custkey
        LIMIT 25
        """
    )


def geo_knn_warehouse(spark, sf_dir):
    """Exact warehouse k-NN (operators/spatial.get_knn): nation points at
    POINT(k k); the oracle ranks the same closed-form distances."""
    import tempfile as _tf

    import pandas as _pd

    from xcube_geodb_spark.client import GeoDBSparkClient
    from xcube_geodb_spark.operators.spatial import get_knn

    c = GeoDBSparkClient(
        spark, warehouse=_tf.mkdtemp(prefix="geodb_knn_"), user="driver"
    )
    c.create_collection("natk", {"n_nationkey": "int"})
    nat = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey")
        .toPandas()
        .sort_values("n_nationkey")
    )
    nat["geometry"] = [f"POINT ({k} {k})" for k in nat["n_nationkey"]]
    c.insert_into_collection("natk", _pd.DataFrame(nat))
    out = get_knn(c.catalog, "natk", (10.3, 9.7), k=5, database="driver")
    return out.select("n_nationkey", F.round("dist", 6).alias("dist"))


def geo_transform_points(spark, sf_dir):
    """st_transform through the raw-SQL path: project the synthesized
    4326 points to web mercator; the oracle replays the closed-form
    spherical-mercator equations (a = 6378137)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    _points(spark, sf_dir).createOrReplaceTempView("pts_tx")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_x(st_transform(geometry, 4326, 3857)), 3) AS mx,
               round(st_y(st_transform(geometry, 4326, 3857)), 3) AS my
        FROM pts_tx
        WHERE c_custkey BETWEEN 1 AND 500
        """
    )  # custkey 0 sits exactly on the south pole, outside mercator's domain


GEO_ORACLES["geo_transform_points"] = f"""
    SELECT c_custkey,
           round(6378137.0 * radians(x), 3) AS mx,
           round(6378137.0 * ln(tan(pi() / 4 + radians(y) / 2)), 3) AS my
    FROM ({_PTS})
    WHERE c_custkey BETWEEN 1 AND 500
"""

GEO_ORACLES["geo_knn_warehouse"] = """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           round(sqrt((n_nationkey - 10.3) * (n_nationkey - 10.3)
                      + (n_nationkey - 9.7) * (n_nationkey - 9.7)), 6) AS dist
    FROM nation
    ORDER BY dist, n_nationkey
    LIMIT 5
"""

GEO_ORACLES["geo_bbox_modes"] = "\nUNION ALL\n".join(
    f"SELECT '{mode}' AS mode, c_custkey FROM ({GEO_ORACLES[f'geo_bbox_{name}']})"
    for mode, name in [
        ("contains", "contains_points"),
        ("disjoint", "disjoint_points"),
        ("intersects", "intersects_squares"),
        ("within", "within_squares"),
        ("touches", "touches_squares"),
        ("overlaps", "overlaps_squares"),
        ("equals", "equals_squares"),
        ("crosses", "crosses_segments"),
    ]
)

GEO_ORACLES["geo_distance_knn"] = f"""
    SELECT c_custkey,
           round(sqrt(greatest(abs(10 - x) - h, 0) * greatest(abs(10 - x) - h, 0)
                      + greatest(abs(5 - y) - h, 0) * greatest(abs(5 - y) - h, 0)),
                 6) AS dist
    FROM ({_SQS})
    ORDER BY dist, c_custkey
    LIMIT 25
"""

def geo_distance_sphere(spark, sf_dir):
    """Great-circle distances (geometry/crs.haversine_meters_col — the
    JVM column-algebra twin of the st_distancesphere kernel UDF): meters
    from Greenwich to every synthesized customer point, millimeter
    rounding. The oracle replays the haversine formula with the same
    float association; both engines' libm agree far inside the 1e-3
    rounding margin."""
    from xcube_geodb_spark.geometry.crs import haversine_meters_col

    pts = _points(spark, sf_dir)
    return pts.select(
        "c_custkey",
        F.round(
            haversine_meters_col(F.lit(0.0), F.lit(51.48), F.col("x"), F.col("y")),
            3,
        ).alias("meters"),
    )


GEO_ORACLES["geo_distance_sphere"] = f"""
    SELECT c_custkey,
           round(2.0 * 6371008.8 * asin(sqrt(least(
               pow(sin(radians(y - 51.48) / 2), 2)
               + cos(radians(51.48)) * cos(radians(y))
               * pow(sin(radians(x - 0.0) / 2), 2), 1.0))), 3) AS meters
    FROM ({_PTS})
"""


def geo_clip_squares(spark, sf_dir):
    """ST_ClipByBox2D through the raw-SQL path: squares clipped to the
    standard query box, keyed area of the clipped geometry. The squares'
    closed form gives the oracle the exact interval-intersection area
    ``ix * iy``; fully-outside squares clip to NULL on the engine side
    and are excluded by ``ix, iy > 0`` on both sides (touching squares
    clip to zero-area slivers, excluded identically)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_clip")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(st_clipbybox2d(
                   geometry, st_makeenvelope(-50, -30, 50, 30))), 6)
                   AS clip_area
        FROM sq_clip
        """
    ).filter("clip_area > 0")


GEO_ORACLES["geo_clip_squares"] = f"""
    SELECT c_custkey, round(ix * iy, 6) AS clip_area
    FROM (
        SELECT c_custkey,
               least(50.0, x + h) - greatest(-50.0, x - h) AS ix,
               least(30.0, y + h) - greatest(-30.0, y - h) AS iy
        FROM ({_SQS})
    ) WHERE ix > 0 AND iy > 0 AND round(ix * iy, 6) > 0
"""


def geo_prepared_chain(spark, sf_dir):
    """The PREPARED-geometry chain (geometry/prepared.py): st_prepare
    parses each WKB once into a flattened-arrays struct; the chained
    st_* calls consume the struct (vectorized batch kernels +
    cache-seeded bridge) and produce BIT-IDENTICAL results to the WKB
    path — this gate replays the same closed-form square algebra as
    geo_clip_squares / geo_measures_squares on top of the prepared
    column, covering predicate, overlay, measure, and accessor consumers
    in one expression tree."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_prep")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(st_intersection(
                   g, st_makeenvelope(-50.0, -30.0, 50.0, 30.0))), 6)
                   AS clip_area,
               round(st_x(st_centroid(g)), 6) AS cx,
               round(st_y(st_centroid(g)), 6) AS cy
        FROM (SELECT c_custkey, st_prepare(geometry) AS g FROM sq_prep)
        WHERE st_intersects(
            'POLYGON((-120 -60,120 -60,120 60,-120 60,-120 -60))', g)
        """
    ).filter("clip_area > 0")


GEO_ORACLES["geo_prepared_chain"] = f"""
    SELECT c_custkey, round(ix * iy, 6) AS clip_area,
           round(x, 6) AS cx, round(y, 6) AS cy
    FROM (
        SELECT c_custkey, x, y,
               least(50.0, x + h) - greatest(-50.0, x - h) AS ix,
               least(30.0, y + h) - greatest(-30.0, y - h) AS iy
        FROM ({_SQS})
        WHERE x - h <= 120 AND x + h >= -120
          AND y - h <= 60 AND y + h >= -60
    ) WHERE ix > 0 AND iy > 0 AND round(ix * iy, 6) > 0
"""


def geo_collect_points(spark, sf_dir):
    """ST_Collect parity (functions/geo_agg.collect_points_wkt): per-group
    MULTIPOINT WKT assembled from pure column algebra — decimal-formatted
    coordinates in key order, one shuffle, no UDF — replayed by the
    oracle's ordered string_agg."""
    from xcube_geodb_spark.functions.geo_agg import collect_points_wkt

    pts = _points(spark, sf_dir).withColumn(
        "grp", (F.col("c_custkey") % 25).cast("long")
    )
    return collect_points_wkt(
        pts, ["grp"], "x", "y", order_col="c_custkey", precision=2
    )


GEO_ORACLES["geo_collect_points"] = f"""
    SELECT grp,
           'MULTIPOINT (' || string_agg(
               CAST(CAST(x AS DECIMAL(24,2)) AS VARCHAR) || ' ' ||
               CAST(CAST(y AS DECIMAL(24,2)) AS VARCHAR),
               ', ' ORDER BY c_custkey) || ')' AS wkt
    FROM (SELECT CAST(c_custkey % 25 AS BIGINT) AS grp, c_custkey, x, y
          FROM ({_PTS}))
    GROUP BY grp
"""


def _supplier_points(spark, sf_dir):
    """A second, independent point set (supplier-keyed, same closed-form
    coordinate hash) so spatial joins exercise two distinct inputs."""
    s = load(spark, sf_dir, "supplier")
    return (
        s.select(
            "s_suppkey",
            ((F.col("s_suppkey") * 7919 % 36000) / 100.0 - 180.0).alias("px"),
            ((F.col("s_suppkey") * 104729 % 18000) / 100.0 - 90.0).alias("py"),
        )
        .withColumn("geometry", _point_wkb("px", "py"))
        .withColumn("__xmin", F.col("px"))
        .withColumn("__ymin", F.col("py"))
        .withColumn("__xmax", F.col("px"))
        .withColumn("__ymax", F.col("py"))
    )


def geo_spatial_join_points(spark, sf_dir):
    """Grid-partitioned distributed spatial join (functions/spatial_join):
    customer squares x supplier points on st_intersects, auto-derived cell
    size. The oracle is pure interval arithmetic (point-in-axis-aligned
    square), so every candidate-generation + reference-point-dedup +
    exact-refinement stage is hash-checked end to end."""
    from xcube_geodb_spark.functions.spatial_join import spatial_join

    sq = _squares(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    pts = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    return spatial_join(sq, pts, "intersects").select("c_custkey", "s_suppkey")


def geo_spatial_join_dwithin(spark, sf_dir):
    """st_dwithin spatial join: customer points within 4.105 units of a
    supplier point (an explicit cell size forces multi-cell replication,
    proving the reference-point dedup emits each pair exactly once)."""
    from xcube_geodb_spark.functions.spatial_join import spatial_join

    cpts = _points(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    spts = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    return spatial_join(
        cpts, spts, "dwithin", distance=4.105, cell_size=3.0
    ).select("c_custkey", "s_suppkey")


def geo_spatial_join_within(spark, sf_dir):
    """Containment spatial join (r9): supplier points WITHIN customer
    squares through the PBSM grid plan with the predicate-tightened
    envelope condition (env(l) ⊆ env(r) candidates only) and the DE-9IM
    relate kernel refining survivors (vectorized clear-interior fast
    path for point-in-rectangle). PostGIS ST_Within semantics: a point
    ON the square boundary does not count — the oracle's strict interval
    arithmetic agrees exactly because both coordinate lattices are
    0.01-quantized, far above the kernel epsilon."""
    from xcube_geodb_spark.functions.spatial_join import spatial_join

    pts = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    sq = _squares(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    return spatial_join(pts, sq, "within").select("s_suppkey", "c_custkey")


def geo_linemerge_chain(spark, sf_dir):
    """ST_LineMerge end to end (r9): per customer, n = c%4+2 separate
    unit segments along x collect into a MULTILINESTRING whose pieces
    meet head-to-tail at degree-2 nodes; st_linemerge must sew them into
    ONE LineString with n+1 points and length n (closed forms the oracle
    computes directly). GEOS LineMerger parity: geometry/geom.line_merge."""
    from xcube_geodb_spark.functions.geo_agg import collect_geometries
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer")
    segs = (
        c.select(
            "c_custkey",
            (F.col("c_custkey") % 4 + 2).alias("n"),
            F.explode(
                F.sequence(F.lit(0), F.col("c_custkey") % 4 + 1)
            ).alias("i"),
        )
        .selectExpr(
            "c_custkey",
            "st_geomfromtext(concat('LINESTRING (', "
            "CAST(c_custkey % 97 + i AS STRING), ' 0, ', "
            "CAST(c_custkey % 97 + i + 1 AS STRING), ' 0)')) AS geometry",
        )
    )
    collected = collect_geometries(segs, ["c_custkey"])
    return collected.selectExpr(
        "c_custkey",
        "st_geometrytype(st_linemerge(geometry)) AS typ",
        "st_npoints(st_linemerge(geometry)) AS npts",
        "CAST(round(st_length(st_linemerge(geometry)), 6) AS DOUBLE) AS len",
    )


GEO_ORACLES["geo_linemerge_chain"] = """
    SELECT c_custkey, 'LINESTRING' AS typ,
           CAST(c_custkey % 4 + 3 AS INT) AS npts,
           CAST(c_custkey % 4 + 2 AS DOUBLE) AS len
    FROM customer
"""


def pg_polygonize(spark, sf_dir):
    """ST_Polygonize as a PG AGGREGATE through the dialect shim (r9):
    ``SELECT k, ST_Polygonize(geometry) ... GROUP BY k`` rewrites to
    collect + the face-tracing kernel (overlay.polygonize). Fixture: per
    customer, SEVEN fully-noded segments — a 2x2 square whose left/right
    edges are split at mid-height plus the midline — bound exactly TWO
    unit-height faces of total area 4 (the closed forms the oracle
    states directly)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer")
    segs = (
        c.select(
            "c_custkey",
            (F.col("c_custkey") % 89 * 3).cast("double").alias("x0"),
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .selectExpr(
            "c_custkey",
            """st_geomfromtext(CASE i
                WHEN 0 THEN concat('LINESTRING (', x0, ' 0, ', x0 + 2, ' 0)')
                WHEN 1 THEN concat('LINESTRING (', x0 + 2, ' 0, ', x0 + 2, ' 1)')
                WHEN 2 THEN concat('LINESTRING (', x0 + 2, ' 1, ', x0 + 2, ' 2)')
                WHEN 3 THEN concat('LINESTRING (', x0 + 2, ' 2, ', x0, ' 2)')
                WHEN 4 THEN concat('LINESTRING (', x0, ' 2, ', x0, ' 1)')
                WHEN 5 THEN concat('LINESTRING (', x0, ' 1, ', x0, ' 0)')
                ELSE concat('LINESTRING (', x0, ' 1, ', x0 + 2, ' 1)')
            END) AS geometry""",
        )
    )
    segs.createOrReplaceTempView("polyz")
    sql = build_pg_sql(
        "polyz",
        select=(
            "c_custkey, "
            "CAST(round(st_area(st_polygonize(geometry)), 6) AS DOUBLE) "
            "AS area, "
            "CAST(st_numgeometries(st_polygonize(geometry)) AS BIGINT) "
            "AS n_faces"
        ),
        group="c_custkey",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_polygonize"] = """
    SELECT c_custkey, CAST(4.0 AS DOUBLE) AS area,
           CAST(2 AS BIGINT) AS n_faces
    FROM customer
"""


def geo_node_polygonize(spark, sf_dir):
    """The linework pipeline end to end (r9): per customer a 2x2 square
    plus BOTH diagonals (crossing at the center, deliberately un-noded)
    collect into one MULTILINESTRING; ``st_node`` splits at the crossing
    (4 edges + 4 half-diagonals = 8 pieces, 16 points) and
    ``st_polygonize`` forms the four triangular faces of total area 4 —
    all closed forms the oracle states directly."""
    from xcube_geodb_spark.functions.geo_agg import collect_geometries
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer")
    segs = (
        c.select(
            "c_custkey",
            (F.col("c_custkey") % 83 * 3).cast("double").alias("x0"),
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("i"),
        )
        .selectExpr(
            "c_custkey",
            """st_geomfromtext(CASE i
                WHEN 0 THEN concat('LINESTRING (', x0, ' 0, ', x0 + 2, ' 0)')
                WHEN 1 THEN concat('LINESTRING (', x0 + 2, ' 0, ', x0 + 2, ' 2)')
                WHEN 2 THEN concat('LINESTRING (', x0 + 2, ' 2, ', x0, ' 2)')
                WHEN 3 THEN concat('LINESTRING (', x0, ' 2, ', x0, ' 0)')
                WHEN 4 THEN concat('LINESTRING (', x0, ' 0, ', x0 + 2, ' 2)')
                ELSE concat('LINESTRING (', x0, ' 2, ', x0 + 2, ' 0)')
            END) AS geometry""",
        )
    )
    collected = collect_geometries(segs, ["c_custkey"])
    return collected.selectExpr(
        "c_custkey",
        "CAST(st_numgeometries(st_node(geometry)) AS BIGINT) AS n_pieces",
        "CAST(st_npoints(st_node(geometry)) AS BIGINT) AS npts",
        "CAST(st_numgeometries(st_polygonize(st_node(geometry))) AS BIGINT)"
        " AS n_faces",
        "CAST(round(st_area(st_polygonize(st_node(geometry))), 6) "
        "AS DOUBLE) AS area",
    )


GEO_ORACLES["geo_node_polygonize"] = """
    SELECT c_custkey, CAST(8 AS BIGINT) AS n_pieces,
           CAST(16 AS BIGINT) AS npts,
           CAST(4 AS BIGINT) AS n_faces, CAST(4.0 AS DOUBLE) AS area
    FROM customer
"""


def geo_sql_relate(spark, sf_dir):
    """ST_Relate on the raw-SQL surface (r9): the full DE-9IM matrix
    (geometry/relate.relate_matrix) over five topology classes of square
    pairs — equal, corner-overlap, edge-touch, disjoint, strict
    containment — each with a KNOWN constant matrix, plus the
    ST_RelateMatch pattern leg ('T*F**FFF*' = OGC equals). PostGIS
    passthrough parity: geodb.sql:1147-1167 admits ST_Relate like any
    other PostGIS call."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )

    register_spatial_sql_functions(spark)
    sq = _squares(spark, sf_dir)
    cls = (F.col("c_custkey") % 5).cast("long")
    shift = (
        F.when(cls == 1, F.col("h"))
        .when(cls == 2, 2 * F.col("h"))
        .when(cls == 3, 3 * F.col("h"))
        .otherwise(F.lit(0.0))
    )
    part = (
        sq.withColumn("cls", cls)
        .withColumn("bx", F.col("x") + shift)
        # class 1 shifts BOTH axes: a pure x-shift of equal-height
        # squares shares collinear top/bottom boundary runs (BB=1);
        # the corner overlap is the canonical '212101212' case
        .withColumn(
            "by", F.col("y") + F.when(cls == 1, F.col("h")).otherwise(F.lit(0.0))
        )
        .withColumn(
            "bh",
            F.when(cls == 4, F.col("h") / 2).otherwise(F.col("h")),
        )
        .withColumn("bgeom", _square_wkb("bx", "by", "bh"))
    )
    return part.selectExpr(
        "c_custkey",
        "cls",
        "st_relate(geometry, bgeom) AS im",
        "st_relatematch(st_relate(geometry, bgeom), 'T*F**FFF*') AS is_equal",
    )


GEO_ORACLES["geo_sql_relate"] = """
    SELECT c_custkey, cls,
           CASE cls WHEN 0 THEN '2FFF1FFF2'
                    WHEN 1 THEN '212101212'
                    WHEN 2 THEN 'FF2F11212'
                    WHEN 3 THEN 'FF2FF1212'
                    ELSE '212FF1FF2' END AS im,
           cls = 0 AS is_equal
    FROM (SELECT c_custkey, c_custkey % 5 AS cls FROM customer)
"""


def geo_dbscan_points(spark, sf_dir):
    """Distributed DBSCAN (functions/spatial_join.spatial_dbscan) over the
    synthesized customer points, eps=3 / min_pts=3: neighbor pairs via the
    PBSM dwithin self-join, cores by neighborhood count, clusters by
    label-propagation connected components, deterministic border
    attachment. The oracle replays the whole thing relationally
    (brute-force pair distances + recursive-CTE components)."""
    from xcube_geodb_spark.functions.spatial_join import spatial_dbscan

    pts = _points(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    return spatial_dbscan(pts, eps=3.0, min_pts=3, id_col="c_custkey")


def geo_zonal_stats(spark, sf_dir):
    """Zonal statistics: the spatial join composed with aggregation —
    per customer square (zone), count and value-sum of the supplier
    points inside it. Proves the join's output feeds Catalyst's
    partial-aggregate machinery like any relational input."""
    from xcube_geodb_spark.functions.spatial_join import spatial_join

    sq = _squares(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    pts = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    j = spatial_join(sq, pts, "intersects")
    return j.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("s_suppkey").alias("sum_keys"),
    )


def geo_geohash_points(spark, sf_dir):
    """st_geohash parity (functions/tiles.geohash_column): base32 cell id
    per customer point at precision 7, plus the 3-char prefix (geohash
    prefixes nest, so prefix group-bys are the string-keyed analogue of
    the tile pyramid). The oracle replays the integer bit-interleave."""
    from xcube_geodb_spark.functions.tiles import with_geohash

    pts = _points(spark, sf_dir)
    out = with_geohash(pts, precision=7, lon_col="x", lat_col="y")
    return out.select(
        "c_custkey", "geohash", F.substring("geohash", 1, 3).alias("gh3")
    )


def _geohash_oracle_sql(precision: int) -> str:
    total = 5 * precision
    bits_lon = (total + 1) // 2
    bits_lat = total // 2
    terms = []
    for pos in range(total):
        if pos % 2 == 0:
            src, src_bits, idx = "ix", bits_lon, pos // 2
        else:
            src, src_bits, idx = "iy", bits_lat, pos // 2
        terms.append(
            f"((({src} >> {src_bits - 1 - idx}) & 1) << {total - 1 - pos})"
        )
    inter = " + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((inter >> {5 * (precision - 1 - g)}) & 31) + 1 AS INT), 1)"
        for g in range(precision)
    )
    return f"""
        SELECT c_custkey, ({chars}) AS geohash FROM (
            SELECT c_custkey, ({inter}) AS inter FROM (
                SELECT c_custkey,
                       least(CAST(floor((x + 180.0) / 360.0
                                 * {float(1 << bits_lon)}) AS BIGINT),
                             {(1 << bits_lon) - 1}) AS ix,
                       least(CAST(floor((y + 90.0) / 180.0
                                 * {float(1 << bits_lat)}) AS BIGINT),
                             {(1 << bits_lat) - 1}) AS iy
                FROM ({_PTS})
            )
        )
    """


def geo_tile_counts(spark, sf_dir):
    """Web-mercator tile aggregation (functions/tiles): features per z6
    tile, keys from pure JVM column math (no UDF), one map-side-combined
    hash aggregation. The oracle replays the mercator tile formula."""
    from xcube_geodb_spark.functions.tiles import tile_counts

    pts = _points(spark, sf_dir)
    out = tile_counts(pts, zoom=6, lon_col="x", lat_col="y")
    return out.select(
        F.col("tile_z").cast("long").alias("tile_z"),
        "tile_x",
        "tile_y",
        "n",
    )


def geo_tile_pyramid(spark, sf_dir):
    """Tile pyramid z6->z4: the base zoom scans the data once; coarser
    levels roll up the previous level by integer-halving the tile key
    (exact: tile scale factors are powers of two). The oracle computes
    each level directly from the raw points."""
    from xcube_geodb_spark.functions.tiles import tile_pyramid

    pts = _points(spark, sf_dir)
    out = tile_pyramid(pts, max_zoom=6, min_zoom=4, lon_col="x", lat_col="y")
    return out.select(
        F.col("tile_z").cast("long").alias("tile_z"),
        "tile_x",
        "tile_y",
        "n",
    )


def _tile_oracle_level(z: int) -> str:
    n = 1 << z
    return f"""
        SELECT CAST({z} AS BIGINT) AS tile_z,
               CAST(floor((x + 180.0) / 360.0 * {n}) AS BIGINT) AS tile_x,
               CAST(floor((1.0 - ln(tan(radians(y)) + 1.0 / cos(radians(y)))
                           / pi()) / 2.0 * {n}) AS BIGINT) AS tile_y,
               count(*) AS n
        FROM ({_PTS})
        WHERE y >= -85.05112878 AND y <= 85.05112878
        GROUP BY 1, 2, 3
    """


_SUPP_PTS = """
    SELECT s_suppkey,
           (s_suppkey * 7919 % 36000) / 100.0 - 180.0 AS px,
           (s_suppkey * 104729 % 18000) / 100.0 - 90.0 AS py
    FROM supplier
"""

def geo_knn_join(spark, sf_dir):
    """Distributed spatial k-NN join (functions/spatial_join): the 3
    nearest supplier points for every customer point via expanding-radius
    dwithin rounds — the PostGIS lateral ``ORDER BY geom <-> q LIMIT k``
    idiom. The oracle brute-forces the same closed-form distances with a
    window rank."""
    from xcube_geodb_spark.functions.spatial_join import spatial_knn_join

    cpts = _points(spark, sf_dir).select(
        "c_custkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    spts = _supplier_points(spark, sf_dir).select(
        "s_suppkey", "geometry", "__xmin", "__ymin", "__xmax", "__ymax"
    )
    out = spatial_knn_join(cpts, spts, k=3, left_id="c_custkey")
    return out.select(
        "c_custkey", "s_suppkey", F.round("dist", 6).alias("dist")
    )


GEO_ORACLES_JOINS = {
    "geo_knn_join": f"""
        SELECT c_custkey, s_suppkey, round(dist, 6) AS dist FROM (
            SELECT c.c_custkey, pt.s_suppkey,
                   sqrt((c.x - pt.px) * (c.x - pt.px)
                        + (c.y - pt.py) * (c.y - pt.py)) AS dist,
                   row_number() OVER (
                       PARTITION BY c.c_custkey
                       ORDER BY sqrt((c.x - pt.px) * (c.x - pt.px)
                                     + (c.y - pt.py) * (c.y - pt.py)) ASC,
                                pt.s_suppkey ASC
                   ) AS rn
            FROM ({_PTS}) c, ({_SUPP_PTS}) pt
        ) WHERE rn <= 3
    """,
    "geo_spatial_join_points": f"""
        SELECT c_custkey, s_suppkey
        FROM ({_SQS}) sq JOIN ({_SUPP_PTS}) pt
          ON pt.px >= sq.x - sq.h AND pt.px <= sq.x + sq.h
         AND pt.py >= sq.y - sq.h AND pt.py <= sq.y + sq.h
    """,
    "geo_spatial_join_dwithin": f"""
        SELECT c_custkey, s_suppkey
        FROM ({_PTS}) c JOIN ({_SUPP_PTS}) pt
          ON sqrt((c.x - pt.px) * (c.x - pt.px)
                  + (c.y - pt.py) * (c.y - pt.py)) <= 4.105
    """,
    "geo_spatial_join_within": f"""
        SELECT s_suppkey, c_custkey
        FROM ({_SUPP_PTS}) pt JOIN ({_SQS}) sq
          ON pt.px > sq.x - sq.h AND pt.px < sq.x + sq.h
         AND pt.py > sq.y - sq.h AND pt.py < sq.y + sq.h
    """,
    "geo_dbscan_points": f"""
        WITH RECURSIVE pts AS ({_PTS}),
        pairs AS (
            SELECT a.c_custkey AS ida, b.c_custkey AS idb
            FROM pts a JOIN pts b
              ON sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)) <= 3.0
        ),
        counts AS (SELECT ida, count(*) AS n FROM pairs GROUP BY 1),
        cores AS (SELECT ida AS id FROM counts WHERE n >= 3),
        core_edges AS (
            SELECT ida AS src, idb AS dst FROM pairs
            WHERE ida <> idb
              AND ida IN (SELECT id FROM cores)
              AND idb IN (SELECT id FROM cores)
        ),
        reach AS (
            SELECT src AS id, dst AS r FROM core_edges
            UNION
            SELECT rr.id, e.dst FROM reach rr
            JOIN core_edges e ON e.src = rr.r
        ),
        core_cluster AS (
            SELECT c.id,
                   least(c.id, coalesce(min(r.r), c.id)) AS cluster_id
            FROM cores c LEFT JOIN reach r ON r.id = c.id
            GROUP BY c.id
        ),
        border AS (
            SELECT p.ida AS id, min(cc.cluster_id) AS cluster_id
            FROM pairs p JOIN core_cluster cc ON cc.id = p.idb
            WHERE p.ida NOT IN (SELECT id FROM cores)
            GROUP BY 1
        )
        SELECT p.c_custkey,
               coalesce(cc.cluster_id, b.cluster_id) AS cluster_id,
               CASE WHEN cc.id IS NOT NULL THEN 'core'
                    WHEN b.id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role
        FROM pts p
        LEFT JOIN core_cluster cc ON cc.id = p.c_custkey
        LEFT JOIN border b ON b.id = p.c_custkey
    """,
    "geo_zonal_stats": f"""
        SELECT c_custkey, count(*) AS n_points,
               CAST(sum(s_suppkey) AS BIGINT) AS sum_keys
        FROM ({_SQS}) sq JOIN ({_SUPP_PTS}) pt
          ON pt.px >= sq.x - sq.h AND pt.px <= sq.x + sq.h
         AND pt.py >= sq.y - sq.h AND pt.py <= sq.y + sq.h
        GROUP BY c_custkey
    """,
}


@F.pandas_udf(T.BinaryType())
def _diamond_wkb(x: pd.Series, y: pd.Series, r: pd.Series) -> pd.Series:
    # batch-assembled 93-byte diamond-polygon WKB (vertices at +-r along
    # the axes from the center: a rotated square, NOT axis-aligned, so
    # st_intersection takes the general overlay kernel, never the clip
    # fast path)
    import numpy as np

    n = len(x)
    xv = x.to_numpy(dtype=np.float64)
    yv = y.to_numpy(dtype=np.float64)
    rv = r.to_numpy(dtype=np.float64)
    ring = np.empty((n, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = xv + rv, yv
    ring[:, 2], ring[:, 3] = xv, yv + rv
    ring[:, 4], ring[:, 5] = xv - rv, yv
    ring[:, 6], ring[:, 7] = xv, yv - rv
    ring[:, 8], ring[:, 9] = xv + rv, yv
    arr = np.empty((n, 93), dtype=np.uint8)
    arr[:, :13] = np.frombuffer(
        b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00", dtype=np.uint8
    )
    arr[:, 13:] = ring.view(np.uint8).reshape(n, 80)
    return pd.Series([arr[i].tobytes() for i in range(n)])


def geo_overlay_diamond(spark, sf_dir):
    """General polygon overlay (geometry/overlay.py) through the SQL
    surface: each square intersected/unioned/differenced with a CONCENTRIC
    DIAMOND of radius r = key %% 11 + 3 — a rotated operand, so none of
    these take the rectangular clip fast path. The concentric geometry
    gives the oracle a closed form: |sq ∩ dia| = 2r² when r<=h (diamond
    inside), 2r² - 4(r-h)² while r<=2h (four diamond tips clipped), else
    4h² (square inside diamond); union and difference follow by
    inclusion-exclusion. Integer h, r land exact-touch degeneracies
    (r=h: diamond vertices ON square edges; r=2h: diamond edges through
    square corners) on many keys — the kernel's snapped planar graph and
    the closed form must classify them identically. Key filter %% 13 keeps
    the row-at-a-time SQL path off the bench hot path (the engine's
    vectorized operators are the scale story; this is the passthrough
    compatibility surface, like PostGIS parity demands)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    sq = (
        _squares(spark, sf_dir)
        .filter(F.col("c_custkey") % 13 == 1)
        .withColumn("r", (F.col("c_custkey") % 11 + 3).cast("double"))
        .withColumn("diamond", _diamond_wkb("x", "y", "r"))
    )
    sq.createOrReplaceTempView("sq_overlay")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_area(st_intersection(geometry, diamond)), 6)
                   AS inter_area,
               round(st_area(st_union(geometry, diamond)), 6) AS union_area,
               round(coalesce(st_area(st_difference(geometry, diamond)), 0.0),
                     6) AS diff_area,
               round(coalesce(st_area(st_symdifference(geometry, diamond)),
                              0.0), 6) AS sym_area
        FROM sq_overlay
        """
    )


GEO_ORACLES["geo_overlay_diamond"] = f"""
    SELECT c_custkey,
           round(inter, 6) AS inter_area,
           round(4*h*h + 2*r*r - inter, 6) AS union_area,
           round(4*h*h - inter, 6) AS diff_area,
           round(4*h*h + 2*r*r - 2*inter, 6) AS sym_area
    FROM (
        SELECT c_custkey, h, r,
               CASE WHEN r <= h THEN 2*r*r
                    WHEN r <= 2*h THEN 2*r*r - 4*(r-h)*(r-h)
                    ELSE 4*h*h END AS inter
        FROM (SELECT *, CAST(c_custkey % 11 + 3 AS DOUBLE) AS r
              FROM ({_SQS}) WHERE c_custkey % 13 = 1)
    )
"""


def geo_dissolve_chain(spark, sf_dir):
    """Aggregate dissolve (``ST_Union(geometry)``, functions/geo_agg.
    dissolve): per group, a CHAIN of overlapping unit-half-width squares
    spaced 1.5 apart (consecutive overlap 0.5 x 2 = 1.0, no triple
    overlap), so the oracle's union area is the closed form 4n - (n-1).
    One shuffle on the group key; the per-group balanced overlay fold is
    the PostGIS-parity dissolve. Rank cap 8 bounds group size at every
    SF — the unbounded-group scale path is documented two-level
    pre-union in the function docstring."""
    from pyspark.sql import Window

    from xcube_geodb_spark.functions.geo_agg import dissolve
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy(F.col("c_custkey") % 50).orderBy("c_custkey")
    chain = (
        c.select("c_custkey", (F.col("c_custkey") % 50).alias("grp"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 8)
        .withColumn("cx", F.col("grp") * 1000.0 + F.col("rnk") * 1.5)
        .withColumn("cy", F.lit(0.0))
        .withColumn("h", F.lit(1.0))
        .withColumn("geometry", _square_wkb("cx", "cy", "h"))
    )
    out = dissolve(chain, ["grp"])
    return out.select(
        "grp",
        "n_members",
        F.round(F.expr("st_area(geometry)"), 6).alias("union_area"),
    )


def geo_dissolve_two_level(spark, sf_dir):
    """The UNBOUNDED-group dissolve valve (functions/geo_agg.dissolve
    two_level=True — the 100-TB path): groups take EVERY customer (no
    rank cap, so group size grows with SF), a first aggregation on
    (group, partition id) pre-unions each partition's members map-side,
    and only per-partition partials shuffle to the final group task.
    Same chain fixture as geo_dissolve_chain — consecutive squares
    overlap pairwise 1.0, so union area stays the closed form
    4n - (n-1) no matter how members split across partitions (union is
    associative; the parity pytest pins two_level == single-level)."""
    from pyspark.sql import Window

    from xcube_geodb_spark.functions.geo_agg import dissolve
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy(F.col("c_custkey") % 50).orderBy("c_custkey")
    chain = (
        c.select("c_custkey", (F.col("c_custkey") % 50).alias("grp"))
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("cx", F.col("grp") * 100000.0 + F.col("rnk") * 1.5)
        .withColumn("cy", F.lit(0.0))
        .withColumn("h", F.lit(1.0))
        .withColumn("geometry", _square_wkb("cx", "cy", "h"))
        .repartition(16)  # scatter each group across partitions
    )
    out = dissolve(chain, ["grp"], two_level=True)
    return out.select(
        "grp",
        "n_members",
        F.round(F.expr("st_area(geometry)"), 6).alias("union_area"),
    )


GEO_ORACLES["geo_dissolve_two_level"] = """
    SELECT grp, n AS n_members,
           round(4.0*n - (n-1), 6) AS union_area
    FROM (
        SELECT c_custkey % 50 AS grp, count(*) AS n
        FROM customer GROUP BY grp
    )
"""


GEO_ORACLES["geo_dissolve_chain"] = """
    SELECT grp, n AS n_members,
           round(4.0*n - (n-1), 6) AS union_area
    FROM (
        SELECT grp, count(*) AS n
        FROM (
            SELECT c_custkey % 50 AS grp,
                   row_number() OVER (PARTITION BY c_custkey % 50
                                      ORDER BY c_custkey) AS rnk
            FROM customer
        ) WHERE rnk <= 8
        GROUP BY grp
    )
"""


def geo_makevalid_bowtie(spark, sf_dir):
    """``ST_MakeValid`` (geometry/overlay.make_valid): per customer a
    BOWTIE ring — (x0 y0, x0+w y0+h, x0 y0+h, x0+w y0, x0 y0) — whose
    edges cross at the center, the canonical invalid polygon. The
    planar-subdivision repair yields two triangles (a MULTIPOLYGON) of
    total area w*h/2, the closed form the oracle replays. Integer
    coordinates keep the crossing point (w/2, h/2 offsets) and the area
    halves exact in floats."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("mv_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               CAST(st_isvalid(g) AS INT) AS was_valid,
               CAST(st_isvalid(st_makevalid(g)) AS INT) AS now_valid,
               st_geometrytype(st_makevalid(g)) AS gtype,
               round(st_area(st_makevalid(g)), 6) AS fixed_area
        FROM (
            SELECT c_custkey,
                   st_geomfromtext(concat(
                       'POLYGON((',
                       x0, ' ', y0, ',', x0 + w, ' ', y0 + h, ',',
                       x0, ' ', y0 + h, ',', x0 + w, ' ', y0, ',',
                       x0, ' ', y0, '))')) AS g
            FROM (
                SELECT c_custkey,
                       CAST(c_custkey % 100 AS INT) * 10 AS x0,
                       CAST(c_custkey % 83 AS INT) * 10 AS y0,
                       CAST(c_custkey % 5 + 2 AS INT) AS w,
                       CAST(c_custkey % 7 + 2 AS INT) AS h
                FROM mv_cust WHERE c_custkey % 13 = 2
            )
        )
        """
    )


GEO_ORACLES["geo_makevalid_bowtie"] = """
    SELECT c_custkey, 0 AS was_valid, 1 AS now_valid,
           'MULTIPOLYGON' AS gtype,
           round((c_custkey % 5 + 2) * (c_custkey % 7 + 2) / 2.0, 6)
               AS fixed_area
    FROM customer WHERE c_custkey % 13 = 2
"""


def geo_subdivide_cross(spark, sf_dir):
    """``ST_Subdivide`` (geometry/geom.subdivide): per customer a
    12-corner PLUS/CROSS polygon (arm half-length L = 2w, half-width w),
    13 ring points > max_vertices=8, so the recursive envelope-halving
    clip must split it — deterministically into 4 quarter-crosses (the
    first x-cut and then one y-cut per half), each within the vertex
    budget. Closed forms the oracle replays: piece count 4, total area
    8*L*w - 4*w^2 = 12*w^2 preserved exactly (integer coordinates,
    axis-parallel cuts). This is the 100-TB spatial-join prep: bounded
    per-piece vertex counts keep PBSM grid-cell work balanced."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("sd_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               count(*) AS n_pieces,
               round(sum(st_area(piece)), 6) AS total_area,
               CAST(max(st_npoints(piece)) <= 8 AS INT) AS within_budget
        FROM (
            SELECT c_custkey,
                   explode(st_subdivide(g, 8)) AS piece
            FROM (
                SELECT c_custkey,
                       st_geomfromtext(concat(
                           'POLYGON((',
                           cx - w, ' ', cy - l, ',', cx + w, ' ', cy - l,
                           ',', cx + w, ' ', cy - w, ',', cx + l, ' ',
                           cy - w, ',', cx + l, ' ', cy + w, ',', cx + w,
                           ' ', cy + w, ',', cx + w, ' ', cy + l, ',',
                           cx - w, ' ', cy + l, ',', cx - w, ' ', cy + w,
                           ',', cx - l, ' ', cy + w, ',', cx - l, ' ',
                           cy - w, ',', cx - w, ' ', cy - w, ',',
                           cx - w, ' ', cy - l, '))')) AS g
                FROM (
                    SELECT c_custkey,
                           CAST(c_custkey % 90 AS INT) * 20 AS cx,
                           CAST(c_custkey % 71 AS INT) * 20 AS cy,
                           CAST(c_custkey % 4 + 1 AS INT) AS w,
                           CAST((c_custkey % 4 + 1) * 2 AS INT) AS l
                    FROM sd_cust WHERE c_custkey % 17 = 3
                )
            )
        )
        GROUP BY c_custkey
        """
    )


GEO_ORACLES["geo_subdivide_cross"] = """
    SELECT c_custkey, CAST(4 AS BIGINT) AS n_pieces,
           round(12.0 * (c_custkey % 4 + 1) * (c_custkey % 4 + 1), 6)
               AS total_area,
           1 AS within_budget
    FROM customer WHERE c_custkey % 17 = 3
"""


def geo_pointonsurface_l(spark, sf_dir):
    """``ST_PointOnSurface`` (geometry/geom.point_on_surface, the
    JTS/GEOS widest-bisector-chord construction PostGIS uses): per
    customer an L-SHAPE whose centroid lies OUTSIDE the polygon — the
    case PointOnSurface exists for. For the L with corner (x0,y0), arm
    length 3s, thickness s, the safe bisector is y0 + 2s (midway between
    the inner-corner ordinate y0+s and the top y0+3s) and the only
    chord spans x0..x0+s, so the point is (x0 + s/2, y0 + 2s) — exact
    closed form on integer inputs (s/2 is a binary-exact half)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("pos_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               st_x(st_pointonsurface(g)) AS px,
               st_y(st_pointonsurface(g)) AS py,
               CAST(st_distance(st_pointonsurface(g), g) = 0.0 AS INT)
                   AS inside
        FROM (
            SELECT c_custkey,
                   st_geomfromtext(concat(
                       'POLYGON((',
                       x0, ' ', y0, ',', x0 + 3 * s, ' ', y0, ',',
                       x0 + 3 * s, ' ', y0 + s, ',', x0 + s, ' ',
                       y0 + s, ',', x0 + s, ' ', y0 + 3 * s, ',',
                       x0, ' ', y0 + 3 * s, ',', x0, ' ', y0, '))')) AS g
            FROM (
                SELECT c_custkey,
                       CAST(c_custkey % 97 AS INT) * 15 AS x0,
                       CAST(c_custkey % 89 AS INT) * 15 AS y0,
                       CAST(c_custkey % 4 + 1 AS INT) AS s
                FROM pos_cust WHERE c_custkey % 19 = 5
            )
        )
        """
    )


GEO_ORACLES["geo_pointonsurface_l"] = """
    SELECT c_custkey,
           (c_custkey % 97) * 15 + (c_custkey % 4 + 1) / 2.0 AS px,
           (c_custkey % 89) * 15 + (c_custkey % 4 + 1) * 2.0 AS py,
           1 AS inside
    FROM customer WHERE c_custkey % 19 = 5
"""


def geo_linear_ref(spark, sf_dir):
    """Linear referencing (geometry/geom.line_interpolate_point /
    line_locate_point / line_substring) + st_closestpoint/st_boundary:
    per customer an L-path LINESTRING (x0 y0, x0+8 y0, x0+8 y0+4) of
    total length 12 — every output below has an exact closed form the
    oracle replays (integer anchors; 0.5*12 and 2/12 are binary-exact
    or stable under round-6)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("lr_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               st_x(st_lineinterpolatepoint(g, 0.5)) AS mid_x,
               st_y(st_lineinterpolatepoint(g, 0.5)) AS mid_y,
               round(st_linelocatepoint(g,
                   st_makepoint(x0 + 2.0, y0 + 3.0)), 6) AS loc_frac,
               round(st_length(st_linesubstring(g, 0.25, 0.75)), 6)
                   AS sub_len,
               st_x(st_closestpoint(g, st_makepoint(x0 + 4.0, y0 + 3.0)))
                   AS cp_x,
               st_geometrytype(st_boundary(g)) AS btype
        FROM (
            SELECT c_custkey, x0, y0,
                   st_geomfromtext(concat(
                       'LINESTRING(', x0, ' ', y0, ',', x0 + 8, ' ', y0,
                       ',', x0 + 8, ' ', y0 + 4, ')')) AS g
            FROM (
                SELECT c_custkey,
                       CAST(c_custkey % 101 AS INT) * 12 AS x0,
                       CAST(c_custkey % 67 AS INT) * 12 AS y0
                FROM lr_cust WHERE c_custkey % 23 = 7
            )
        )
        """
    )


GEO_ORACLES["geo_linear_ref"] = """
    SELECT c_custkey,
           (c_custkey % 101) * 12 + 6.0 AS mid_x,
           (c_custkey % 67) * 12 + 0.0 AS mid_y,
           round(2.0 / 12.0, 6) AS loc_frac,
           6.0 AS sub_len,
           (c_custkey % 101) * 12 + 4.0 AS cp_x,
           'MULTIPOINT' AS btype
    FROM customer WHERE c_custkey % 23 = 7
"""


def geo_affine_rect(spark, sf_dir):
    """Affine transforms (st_translate/st_scale/st_rotate — PostGIS
    surface via geom.map_coordinates) + st_points: per customer an
    axis-aligned rectangle (half-width a, half-height b, integer
    center), every output a closed form — translation moves the
    centroid exactly, scaling multiplies the area by xs*ys, a 90-degree
    rotation about the center swaps the half extents (cos(pi/2) ~ 6e-17
    vanishes under round-6), and st_points keeps the ring closure
    duplicate (5 vertices)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("af_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_x(st_centroid(st_translate(g, 3.0, -2.0))), 6)
                   AS t_cx,
               round(st_area(st_scale(g, 2.0, 3.0)), 6) AS s_area,
               round(st_xmax(st_rotate(g, radians(90.0),
                                       CAST(cx AS DOUBLE),
                                       CAST(cy AS DOUBLE))), 6) AS r_xmax,
               st_npoints(st_points(g)) AS n_pts
        FROM (
            SELECT c_custkey, cx, cy,
                   st_geomfromtext(concat(
                       'POLYGON((', cx - a, ' ', cy - b, ',', cx + a, ' ',
                       cy - b, ',', cx + a, ' ', cy + b, ',', cx - a, ' ',
                       cy + b, ',', cx - a, ' ', cy - b, '))')) AS g
            FROM (
                SELECT c_custkey,
                       CAST(c_custkey % 93 AS INT) * 25 AS cx,
                       CAST(c_custkey % 79 AS INT) * 25 AS cy,
                       CAST(c_custkey % 4 + 1 AS INT) AS a,
                       CAST(c_custkey % 6 + 2 AS INT) AS b
                FROM af_cust WHERE c_custkey % 29 = 11
            )
        )
        """
    )


GEO_ORACLES["geo_affine_rect"] = """
    SELECT c_custkey,
           round((c_custkey % 93) * 25 + 3.0, 6) AS t_cx,
           round(4.0 * (c_custkey % 4 + 1) * (c_custkey % 6 + 2) * 6.0, 6)
               AS s_area,
           round((c_custkey % 93) * 25 + (c_custkey % 6 + 2) + 0.0, 6)
               AS r_xmax,
           5 AS n_pts
    FROM customer WHERE c_custkey % 29 = 11
"""


def geo_mec_envelope(spark, sf_dir):
    """Minimum enclosing circle + oriented envelope
    (geometry/geom.minimum_bounding_circle — deterministic Welzl;
    oriented_envelope — rotating calipers over the convex hull): for a
    rectangle the MEC radius is the half-diagonal sqrt(a^2+b^2) and the
    minimum-area rotated envelope of a ROTATED rectangle is the
    rectangle itself (area 4ab) — closed forms the oracle replays
    (sqrt is correctly rounded in both engines; rotation noise vanishes
    under round-6)."""
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("mec_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               round(st_minimumboundingradius(g), 6) AS mec_r,
               round(st_x(st_centroid(st_minimumboundingcircle(g))), 6)
                   AS mec_cx,
               round(st_area(st_orientedenvelope(
                   st_rotate(g, radians(30.0), CAST(cx AS DOUBLE),
                             CAST(cy AS DOUBLE)))), 6) AS oe_area
        FROM (
            SELECT c_custkey, cx, cy,
                   st_geomfromtext(concat(
                       'POLYGON((', cx - a, ' ', cy - b, ',', cx + a, ' ',
                       cy - b, ',', cx + a, ' ', cy + b, ',', cx - a, ' ',
                       cy + b, ',', cx - a, ' ', cy - b, '))')) AS g
            FROM (
                SELECT c_custkey,
                       CAST(c_custkey % 87 AS INT) * 30 AS cx,
                       CAST(c_custkey % 73 AS INT) * 30 AS cy,
                       CAST(c_custkey % 5 + 1 AS INT) AS a,
                       CAST(c_custkey % 7 + 2 AS INT) AS b
                FROM mec_cust WHERE c_custkey % 31 = 13
            )
        )
        """
    )


GEO_ORACLES["geo_mec_envelope"] = """
    SELECT c_custkey,
           round(sqrt(CAST((c_custkey % 5 + 1) * (c_custkey % 5 + 1)
                 + (c_custkey % 7 + 2) * (c_custkey % 7 + 2) AS DOUBLE)),
                 6) AS mec_r,
           round((c_custkey % 87) * 30 + 0.0, 6) AS mec_cx,
           round(4.0 * (c_custkey % 5 + 1) * (c_custkey % 7 + 2), 6)
               AS oe_area
    FROM customer WHERE c_custkey % 31 = 13
"""


def geo_sql_join_intersects(spark, sf_dir):
    """Spatial join in PURE raw SQL through the ``get_collection_pg``
    clause builder (operators/scan.build_pg_sql) using the GEOM–GEOM
    ``st_intersects(a.geometry, b.geometry)`` dispatch
    (geometry/relate.py): customer squares x supplier points. The join
    condition is the persisted-envelope prefilter (JVM-side range
    predicate — parquet-stat prunable, and the shape a 100-TB plan
    wants: the exact Python kernel only ever sees envelope survivors);
    the exact geometry–geometry refine sits in WHERE. Reference: the
    PostGIS passthrough admits exactly this statement
    (/root/reference/xcube_geodb/sql/geodb.sql:1147-1167). The scale
    path for massive joins remains functions/spatial_join (PBSM grid);
    this gate pins the raw-SQL surface's semantics against interval
    arithmetic."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("gg_squares")
    _supplier_points(spark, sf_dir).createOrReplaceTempView("gg_pts")
    sql = build_pg_sql(
        "gg_squares a JOIN gg_pts b"
        " ON a.__xmin <= b.__xmax AND a.__xmax >= b.__xmin"
        " AND a.__ymin <= b.__ymax AND a.__ymax >= b.__ymin",
        select="a.c_custkey AS c_custkey, b.s_suppkey AS s_suppkey",
        where="st_intersects(a.geometry, b.geometry)",
    )
    return spark.sql(sql)


def geo_sql_geom_modes(spark, sf_dir):
    """All eight binary predicates in their GEOM–GEOM form on the raw-SQL
    surface (geometry/relate.geom_predicate behind st_<mode>(wkb, wkb)):
    squares (or segments, for crosses) against a constant envelope built
    by ``st_makeenvelope`` — i.e. the PostGIS argument order
    ``ST_Within(geom, env)``, the mirror of the bbox-first gates. One
    tagged union keeps every mode's exact row membership in a single
    driver slot, same as geo_bbox_modes."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("gg_modes_sq")
    _segments(spark, sf_dir).createOrReplaceTempView("gg_modes_seg")

    def env(box):
        return (
            f"st_makeenvelope({box[0]}, {box[1]}, {box[2]}, {box[3]})"
        )

    arms = [
        ("within", "gg_modes_sq", env(BOX_SQUARES)),
        ("contains", "gg_modes_sq", env(BOX_WITHIN)),
        ("intersects", "gg_modes_sq", env(BOX_SQUARES)),
        ("disjoint", "gg_modes_sq", env(BOX_SQUARES)),
        ("touches", "gg_modes_sq", env(BOX_TOUCHES)),
        ("overlaps", "gg_modes_sq", env(BOX_SQUARES)),
        ("equals", "gg_modes_sq", env(BOX_EQUALS)),
        ("crosses", "gg_modes_seg", env(BOX_CROSSES)),
    ]
    out = None
    for mode, view, e in arms:
        sql = build_pg_sql(
            view,
            select=f"'{mode}' AS mode, c_custkey",
            where=f"st_{mode}(geometry, {e})",
        )
        part = spark.sql(sql)
        out = part if out is None else out.unionByName(part)
    return out


def pg_spatial_agg(spark, sf_dir):
    """PostGIS spatial AGGREGATES through the pg dialect shim
    (operators/scan._rewrite_spatial_aggs — reference passthrough admits
    ``SELECT k, ST_Union(geom) ... GROUP BY k`` at geodb.sql:1169):
    ``st_union(g)`` -> collect_list + the engine's dissolve fold,
    ``st_collect(g)`` -> collect_list + the ST_Collect promotion kernel,
    ``st_extent(g)`` -> four plain min/max aggregates (NO collect_list).
    Fixture: per customer a UNIT square [cell, cell+1] x [0, 1] with
    cell = custkey % 13, grouped by custkey % 25 — group members either
    coincide exactly or tile the x-axis, so the union area is EXACTLY
    the distinct-cell count, the extent is [min cell, max cell + 1] x
    [0, 1], and ST_Collect keeps duplicates (member count = rows)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 25).alias("grp"),
        (F.col("c_custkey") % 13).cast("double").alias("cell"),
    )
    c.select(
        "grp",
        _square_wkb(
            F.col("cell") + F.lit(0.5), F.lit(0.5), F.lit(0.5)
        ).alias("geometry"),
    ).createOrReplaceTempView("spagg")
    sql = build_pg_sql(
        "spagg",
        select=(
            "grp, round(st_area(st_union(geometry)), 6) AS union_area, "
            "st_extent(geometry) AS extent, "
            "CAST(st_numgeometries(st_collect(geometry)) AS BIGINT) "
            "AS n_coll, count(*) AS n_rows"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_spatial_agg"] = """
    SELECT grp,
           round(CAST(count(DISTINCT cell) AS DOUBLE), 6) AS union_area,
           concat('BOX(',
                  CAST(CAST(min(cell) AS DECIMAL(24,6)) AS VARCHAR), ' ',
                  '0.000000', ',',
                  CAST(CAST(max(cell) + 1 AS DECIMAL(24,6)) AS VARCHAR),
                  ' ', '1.000000', ')') AS extent,
           count(*) AS n_coll,
           count(*) AS n_rows
    FROM (SELECT c_custkey % 25 AS grp, c_custkey % 13 AS cell
          FROM customer)
    GROUP BY grp
"""


def pg_geography_distance(spark, sf_dir):
    """PG ``::geography`` casts through the raw-SQL shim (r9 verdict
    order 4; reference passthrough admits them, geodb.sql:1147-1167):
    ``ST_Distance(g::geography, 'POINT ...'::geography, false)`` routes
    to the st_distancesphere haversine kernel (use_spheroid=false —
    PostGIS' sphere form), and ``ST_DWithin(geography)`` compiles to a
    ``distance <= d`` predicate in meters. The oracle replays the
    haversine closed form on the mean-radius sphere (same association
    as the geo_distance_sphere gate, well inside the 1e-3 rounding
    margin). The spheroid default (no third argument -> Vincenty)
    has no closed SQL form; its routing is pinned by
    tests/test_client_e2e.py::test_geography_rewrites."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _points(spark, sf_dir).createOrReplaceTempView("pts_geog")
    sql = build_pg_sql(
        "pts_geog",
        select=(
            "c_custkey, "
            "round(st_distance(geometry::geography, "
            "'POINT (0 51.48)'::geography, false), 3) AS meters, "
            "st_dwithin(geometry::geography, "
            "'POINT (0 51.48)'::geography, 5000000, false) AS nearby"
        ),
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_geography_distance"] = f"""
    SELECT c_custkey,
           round(2.0 * 6371008.8 * asin(sqrt(least(
               pow(sin(radians(y - 51.48) / 2), 2)
               + cos(radians(51.48)) * cos(radians(y))
               * pow(sin(radians(x - 0.0) / 2), 2), 1.0))), 3) AS meters,
           (2.0 * 6371008.8 * asin(sqrt(least(
               pow(sin(radians(y - 51.48) / 2), 2)
               + cos(radians(51.48)) * cos(radians(y))
               * pow(sin(radians(x - 0.0) / 2), 2), 1.0))) <= 5000000)
               AS nearby
    FROM ({_PTS})
    ORDER BY c_custkey
"""


def pg_geography_length(spark, sf_dir):
    """``ST_Length(line::geography, false)`` through the shim (r10):
    routes to the st_lengthsphere kernel (per-segment haversine sum).
    Fixture: the horizontal customer segments (x-h, y) -> (x+h, y) —
    one segment each, so the length is a single same-latitude haversine
    the oracle replays with the kernel's exact float association
    (dlat = 0 makes the first haversine term exactly 0.0). The spheroid
    default routes to st_lengthspheroid (Vincenty — no closed SQL form;
    routing pinned in test_client_e2e.py)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _segments(spark, sf_dir).createOrReplaceTempView("seg_geog")
    sql = build_pg_sql(
        "seg_geog",
        select=(
            "c_custkey, "
            "round(st_length(geometry::geography, false), 3) AS len_m"
        ),
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_geography_length"] = f"""
    SELECT c_custkey,
           round(2.0 * 6371008.8 * asin(sqrt(least(
               cos(radians(y)) * cos(radians(y))
               * pow(sin(radians((x + h) - (x - h)) / 2), 2), 1.0))),
               3) AS len_m
    FROM ({_SQS})
    ORDER BY c_custkey
"""


def pg_bbox_overlap(spark, sf_dir):
    """PostGIS ``geom && geom`` (bounding boxes intersect — THE PostGIS
    index operator) through the raw-SQL shim (r10):
    ``operators/scan._rewrite_bbox_overlap`` compiles it to
    ``st_intersects(st_envelope(a), st_envelope(b))``. Fixture: customer
    squares vs a query polygon whose edges sit .005 off the coordinate
    grid, so any kernel epsilon in [1e-10, 1e-3] classifies identically;
    the oracle is pure interval arithmetic (a square IS its own
    envelope)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("sq_bbox_op")
    poly = (
        "POLYGON((-50.005 -30.005, 50.005 -30.005, 50.005 30.005, "
        "-50.005 30.005, -50.005 -30.005))"
    )
    sql = build_pg_sql(
        "sq_bbox_op",
        select="c_custkey",
        where=f"geometry && '{poly}'::geometry",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_bbox_overlap"] = f"""
    SELECT c_custkey FROM ({_SQS})
    WHERE x + h > -50.005 AND x - h < 50.005
      AND y + h > -30.005 AND y - h < 30.005
    ORDER BY c_custkey
"""


def pg_knn_operator(spark, sf_dir):
    """PostGIS KNN distance operators ``<->`` / ``<#>`` through the pg
    dialect shim (operators/scan._rewrite_knn_ops — the reference
    passthrough admits the operator form, geodb.sql:1147-1167): the 40
    customer squares nearest POINT(-20 30), the distance appearing both
    as the ORDER BY key and as projected columns. ``<#>`` (bounding-box
    distance) is pinned by the same closed form because an axis-aligned
    square IS its own envelope. ``ORDER BY geom <-> q LIMIT k`` compiles
    to TakeOrderedAndProject — a map-side top-k per partition plus a
    k-row merge, the scale analogue of PG's KNN index walk (no global
    sort at any SF). Oracle: point-to-box distance
    hypot(max(|px-x|-h, 0), max(|py-y|-h, 0))."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("knn_sq")
    sql = build_pg_sql(
        "knn_sq",
        select=(
            "c_custkey, "
            "round(geometry <-> st_geomfromtext('POINT (-20 30)'), 6) "
            "AS dist, "
            "round(geometry <#> st_geomfromtext('POINT (-20 30)'), 6) "
            "AS bdist"
        ),
        order="geometry <-> st_geomfromtext('POINT (-20 30)'), c_custkey",
        limit=40,
    )
    return spark.sql(sql)


GEO_ORACLES["pg_knn_operator"] = f"""
    SELECT c_custkey,
           round(sqrt(greatest(abs(-20 - x) - h, 0)
                      * greatest(abs(-20 - x) - h, 0)
                      + greatest(abs(30 - y) - h, 0)
                      * greatest(abs(30 - y) - h, 0)), 6) AS dist,
           round(sqrt(greatest(abs(-20 - x) - h, 0)
                      * greatest(abs(-20 - x) - h, 0)
                      + greatest(abs(30 - y) - h, 0)
                      * greatest(abs(30 - y) - h, 0)), 6) AS bdist
    FROM ({_SQS})
    ORDER BY dist, c_custkey
    LIMIT 40
"""


def pg_makeline_traj(spark, sf_dir):
    """PostGIS ``ST_MakeLine(geom ORDER BY k)`` — the everyday
    trajectory-building aggregate — through the pg dialect shim
    (operators/scan._rewrite_spatial_aggs -> geom.make_line): per group
    of 25 the customer points become one LineString ordered by custkey.
    The ordered collect is the same struct-sort as array_agg ORDER BY —
    one hash shuffle on the group key, map-side combining, no global
    sort. Oracle: vertex count = group size, start/end = the min/max
    custkey's closed-form coordinates, and the length replayed as a
    lag-window sum of consecutive point distances (round 4 absorbs the
    two engines' summation-association difference; see geo.py header
    for the coordinate grid)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _points(spark, sf_dir).select(
        (F.col("c_custkey") % 25).alias("grp"), "c_custkey", "geometry"
    ).createOrReplaceTempView("traj_pts")
    sql = build_pg_sql(
        "traj_pts",
        select=(
            "grp, "
            "st_npoints(st_makeline(geometry ORDER BY c_custkey)) "
            "AS n_pts, "
            "round(st_length(st_makeline(geometry ORDER BY c_custkey)), 4) "
            "AS traj_len, "
            "round(st_x(st_startpoint("
            "st_makeline(geometry ORDER BY c_custkey))), 2) AS x0, "
            "round(st_y(st_endpoint("
            "st_makeline(geometry ORDER BY c_custkey))), 2) AS y1"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_makeline_traj"] = f"""
    WITH pts AS (
        SELECT c_custkey % 25 AS grp, c_custkey, x, y FROM ({_PTS})
    ),
    seg AS (
        SELECT grp, c_custkey, x, y,
               x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy,
               row_number() OVER w AS rn,
               count(*) OVER (PARTITION BY grp) AS n
        FROM pts
        WINDOW w AS (PARTITION BY grp ORDER BY c_custkey)
    )
    SELECT grp,
           CAST(max(n) AS INT) AS n_pts,
           round(sum(sqrt(dx * dx + dy * dy)), 4) AS traj_len,
           round(max(CASE WHEN rn = 1 THEN x END), 2) AS x0,
           round(max(CASE WHEN rn = n THEN y END), 2) AS y1
    FROM seg
    GROUP BY grp
"""


def geo_split_blade(spark, sf_dir):
    """``ST_Split`` on the raw-SQL surface (overlay.split_geometry — the
    polygon-by-line arrangement path, reusing the noding + face tracer
    the overlay kernel trusts): every customer square is split by a
    vertical blade at x + h/2, built per-row with the scalar
    ``st_makeline(st_point, st_point)``. Closed form: two pieces, left
    one 1.5h x 2h = 3h^2, total 4h^2 (round 3 absorbs the noding
    lattice's 1e-9-scale snap); member order is the face tracer's
    leftmost-first sort, so st_geometryn(.., 1) IS the left piece."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("split_sq")
    sql = build_pg_sql(
        "split_sq",
        select=(
            "c_custkey, "
            "st_numgeometries(st_split(geometry, "
            "st_makeline(st_point(x + h / 2, y - h - 1), "
            "st_point(x + h / 2, y + h + 1)))) AS n_pieces, "
            "round(st_area(st_split(geometry, "
            "st_makeline(st_point(x + h / 2, y - h - 1), "
            "st_point(x + h / 2, y + h + 1)))), 3) AS total_area, "
            "round(st_area(st_geometryn(st_split(geometry, "
            "st_makeline(st_point(x + h / 2, y - h - 1), "
            "st_point(x + h / 2, y + h + 1))), 1)), 3) AS left_area"
        ),
        where="c_custkey % 10 = 3",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_split_blade"] = f"""
    SELECT c_custkey,
           2 AS n_pieces,
           round(4 * h * h, 3) AS total_area,
           round(3 * h * h, 3) AS left_area
    FROM ({_SQS})
    WHERE c_custkey % 10 = 3
    ORDER BY c_custkey
"""


def geo_delaunay_anchor(spark, sf_dir):
    """``ST_DelaunayTriangles`` on the raw-SQL surface
    (geometry/triangulate.delaunay_geometry — Bowyer-Watson over the
    collected group points): per group of 20 the customer points plus
    four FAR corner anchors (a rectangle strictly containing every
    synthesized coordinate) are collected and triangulated. The anchors
    make the hull exactly the 400 x 200 rectangle, so two Euler-formula
    closed forms pin the whole triangulation: triangle count
    2n - 2 - 4 (every data point interior, h = 4) and total area
    80000 (any valid triangulation tiles the hull — robust even to
    cocircular tie-breaks, which is what makes this oracle exact)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    pts = _points(spark, sf_dir).select(
        (F.col("c_custkey") % 20).alias("grp"), "c_custkey", "geometry"
    )
    anchors = (
        pts.select("grp")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(-200.0, -100.0), (200.0, -100.0),
                 (200.0, 100.0), (-200.0, 100.0)],
                "ax double, ay double",
            )
        )
        .select(
            "grp",
            F.lit(-1).cast("long").alias("c_custkey"),
            _point_wkb(F.col("ax"), F.col("ay")).alias("geometry"),
        )
    )
    pts.unionByName(anchors).createOrReplaceTempView("tri_pts")
    sql = build_pg_sql(
        "tri_pts",
        select=(
            "grp, "
            "st_numgeometries(st_delaunaytriangles(st_collect(geometry))) "
            "AS n_tris, "
            "round(st_area(st_delaunaytriangles(st_collect(geometry))), 3) "
            "AS hull_area"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_delaunay_anchor"] = f"""
    SELECT c_custkey % 20 AS grp,
           CAST(2 * (count(*) + 4) - 6 AS INT) AS n_tris,
           round(CAST(80000 AS DOUBLE), 3) AS hull_area
    FROM ({_PTS})
    GROUP BY grp
    ORDER BY grp
"""


def geo_voronoi_cells(spark, sf_dir):
    """``ST_VoronoiPolygons`` on the raw-SQL surface
    (geometry/triangulate.voronoi_polygons — per-site half-plane
    clipping of the input envelope): the same anchored per-group point
    sets as geo_delaunay_anchor. The four corner anchors make the
    envelope the exact 400 x 200 rectangle, and Voronoi cells TILE the
    clip frame by construction — so cell count = distinct sites and
    area sum = 80000 are exact closed forms, whatever the cell shapes."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    pts = _points(spark, sf_dir).select(
        (F.col("c_custkey") % 20).alias("grp"), "c_custkey", "geometry"
    )
    anchors = (
        pts.select("grp")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(-200.0, -100.0), (200.0, -100.0),
                 (200.0, 100.0), (-200.0, 100.0)],
                "ax double, ay double",
            )
        )
        .select(
            "grp",
            F.lit(-1).cast("long").alias("c_custkey"),
            _point_wkb(F.col("ax"), F.col("ay")).alias("geometry"),
        )
    )
    pts.unionByName(anchors).createOrReplaceTempView("vor_pts")
    sql = build_pg_sql(
        "vor_pts",
        select=(
            "grp, "
            "st_numgeometries(st_voronoipolygons(st_collect(geometry))) "
            "AS n_cells, "
            "round(st_area(st_voronoipolygons(st_collect(geometry))), 3) "
            "AS frame_area"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_voronoi_cells"] = f"""
    SELECT c_custkey % 20 AS grp,
           CAST(count(*) + 4 AS INT) AS n_cells,
           round(CAST(80000 AS DOUBLE), 3) AS frame_area
    FROM ({_PTS})
    GROUP BY grp
    ORDER BY grp
"""


def geo_scalar_kit(spark, sf_dir):
    """The SFS scalar kit on the raw-SQL surface (geom.is_simple /
    is_closed / is_ring, multi, collection_extract,
    remove_repeated_points, segmentize, hausdorff_distance, angle_3pt,
    scalar st_collect): every expression reduces to a constant or the
    4h^2 square-area closed form, so one row per sampled customer pins
    eleven functions at once (r9 session 2 adds the discrete Frechet
    distance — Eiter & Mannila 1994, the translate fixture's coupling
    is exactly sqrt(5) — and st_unaryunion, whose half-overlapping
    square pair dissolves to 6h^2). Hausdorff of a horizontal segment against
    its (1, 2)-translate is exactly sqrt(5) (the far endpoint), the
    segmentize count is 2h / (h/2) + 1 = 5, and the angle arm replays
    the PostGIS doc example ST_Angle(P(5 0), P(0 0), P(5 5)) = 45
    degrees shifted to the row's point."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("kit_sq")
    seg = "st_makeline(st_point(x - h, y), st_point(x + h, y))"
    sql = build_pg_sql(
        "kit_sq",
        select=(
            "c_custkey, "
            "st_isring(st_exteriorring(geometry)) AS ring_ok, "
            f"st_issimple({seg}) AS seg_simple, "
            f"st_isclosed({seg}) AS seg_closed, "
            f"round(st_hausdorffdistance({seg}, "
            f"st_translate({seg}, 1.0, 2.0)), 6) AS haus, "
            f"st_npoints(st_segmentize({seg}, h / 2.0)) AS n_seg, "
            "st_numgeometries(st_multi(geometry)) AS n_multi, "
            f"st_npoints(st_removerepeatedpoints(st_makeline("
            f"st_startpoint({seg}), st_startpoint({seg})), 0.0)) AS n_rr, "
            "round(degrees(st_angle(st_point(x + 5, y), st_point(x, y), "
            "st_point(x + 5, y + 5))), 6) AS angle_deg, "
            "round(st_area(st_collectionextract("
            "st_collect(st_point(x, y), geometry), 3)), 6) AS poly_area, "
            f"round(st_frechetdistance({seg}, "
            f"st_translate({seg}, 1.0, 2.0)), 6) AS frech, "
            "round(st_area(st_unaryunion(st_collect(geometry, "
            "st_translate(geometry, h, 0.0)))), 6) AS union_area"
        ),
        where="c_custkey % 10 = 7",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_scalar_kit"] = f"""
    SELECT c_custkey,
           TRUE AS ring_ok,
           TRUE AS seg_simple,
           FALSE AS seg_closed,
           round(sqrt(5), 6) AS haus,
           CAST(5 AS INT) AS n_seg,
           CAST(1 AS INT) AS n_multi,
           CAST(2 AS INT) AS n_rr,
           round(CAST(45 AS DOUBLE), 6) AS angle_deg,
           round(4 * h * h, 6) AS poly_area,
           round(sqrt(5), 6) AS frech,
           round(6 * h * h, 6) AS union_area
    FROM ({_SQS})
    WHERE c_custkey % 10 = 7
    ORDER BY c_custkey
"""


def geo_generate_snap(spark, sf_dir):
    """``ST_GeneratePoints`` + ``ST_Snap`` on the raw-SQL surface
    (geom.generate_points — seeded splitmix64 envelope rejection;
    geom.snap_geometry — the two GEOS snapping rules): per square,
    16 seeded points all land inside (pinned through the geom-geom
    st_within dispatch), and a (0.005, 0.005)-translated copy of the
    square snaps back onto the original exactly (vertex rule; the
    translation distance ~0.00707 sits inside the 0.02 tolerance), so
    st_equals + the 4h^2 area are closed forms."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("gen_sq")
    sql = build_pg_sql(
        "gen_sq",
        select=(
            "c_custkey, "
            "st_numgeometries(st_generatepoints(geometry, 16, c_custkey)) "
            "AS n_pts, "
            "st_within(st_generatepoints(geometry, 16, c_custkey), "
            "geometry) AS inside, "
            "st_equals(st_snap(st_translate(geometry, 0.005, 0.005), "
            "geometry, 0.02), geometry) AS snapped_back, "
            "round(st_area(st_snap(st_translate(geometry, 0.005, 0.005), "
            "geometry, 0.02)), 6) AS snap_area"
        ),
        where="c_custkey % 10 = 1",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_generate_snap"] = f"""
    SELECT c_custkey,
           CAST(16 AS INT) AS n_pts,
           TRUE AS inside,
           TRUE AS snapped_back,
           round(4 * h * h, 6) AS snap_area
    FROM ({_SQS})
    WHERE c_custkey % 10 = 1
    ORDER BY c_custkey
"""


def pg_cluster_within(spark, sf_dir):
    """PostGIS clustering aggregates ``ST_ClusterWithin(geom, d)`` /
    ``ST_ClusterIntersecting(geom)`` through the pg dialect shim
    (functions/geo_agg.cluster_within_members — single-linkage
    union-find with an envelope prefilter; the quadratic term pays only
    for envelope survivors, and like PG's own aggregate the group
    materializes on one task — pre-bucket upstream for unbounded
    groups). Fixture: per group (custkey % 4) the unit squares sit at
    x = 1.5 * (custkey % 6); CRT gives every group exactly the three
    cells {g, g+2, g+4} mod 6, spaced 2 apart edge-to-edge — so three
    clusters at d=1 (and for intersecting duplicates), ONE at d=2.5."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    c = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 4).alias("grp"),
        (1.5 * (F.col("c_custkey") % 6).cast("double")).alias("cx"),
    )
    c.select(
        "grp",
        _square_wkb(
            F.col("cx") + F.lit(0.5), F.lit(0.5), F.lit(0.5)
        ).alias("geometry"),
    ).createOrReplaceTempView("clw")
    sql = build_pg_sql(
        "clw",
        select=(
            "grp, "
            "size(st_clusterwithin(geometry, 1.0)) AS n_tight, "
            "size(st_clusterwithin(geometry, 2.5)) AS n_loose, "
            "size(st_clusterintersecting(geometry)) AS n_isect"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["pg_cluster_within"] = """
    SELECT c_custkey % 4 AS grp,
           CAST(3 AS INT) AS n_tight,
           CAST(1 AS INT) AS n_loose,
           CAST(3 AS INT) AS n_isect
    FROM customer
    GROUP BY grp
    ORDER BY grp
"""


def geo_concave_hull(spark, sf_dir):
    """``ST_ConcaveHull`` on the raw-SQL surface
    (geometry/triangulate.concave_hull — chi-shapes, Duckham et al.
    2008, carving the in-repo Delaunay): at param_pctconvex = 1 no edge
    carves and the chi-shape IS the convex hull, so the anchored
    fixture's hull area is exactly the 400 x 200 frame; a 0.2 carve can
    only remove area and never vertices (monotonicity), pinned as
    booleans."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    pts = _points(spark, sf_dir).select(
        (F.col("c_custkey") % 20).alias("grp"), "c_custkey", "geometry"
    )
    anchors = (
        pts.select("grp")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(-200.0, -100.0), (200.0, -100.0),
                 (200.0, 100.0), (-200.0, 100.0)],
                "ax double, ay double",
            )
        )
        .select(
            "grp",
            F.lit(-1).cast("long").alias("c_custkey"),
            _point_wkb(F.col("ax"), F.col("ay")).alias("geometry"),
        )
    )
    pts.unionByName(anchors).createOrReplaceTempView("chull_pts")
    sql = build_pg_sql(
        "chull_pts",
        select=(
            "grp, "
            "round(st_area(st_concavehull(st_collect(geometry), 1.0)), 3) "
            "AS hull_area, "
            "st_area(st_concavehull(st_collect(geometry), 0.2)) "
            "<= st_area(st_concavehull(st_collect(geometry), 1.0)) "
            "AS carve_monotone"
        ),
        group="grp",
        order="grp",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_concave_hull"] = f"""
    SELECT c_custkey % 20 AS grp,
           round(CAST(80000 AS DOUBLE), 3) AS hull_area,
           TRUE AS carve_monotone
    FROM ({_PTS})
    GROUP BY grp
    ORDER BY grp
"""


def geo_offset_curve(spark, sf_dir):
    """``ST_OffsetCurve`` on the raw-SQL surface (geom.offset_curve):
    per customer an L-shaped line (east 2h, north 2h) is offset one
    unit to each side. The LEFT offset is the inner side — both legs
    trim by exactly 1, length 4h - 2; the RIGHT offset adds a
    quarter-circle round join segmented at quad_segs = 8, whose chord
    polyline length is the exact closed form 16 sin(pi/32) (eight
    chords of pi/16 about a unit radius)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("off_sq")
    ell = (
        "st_makeline(st_makeline(st_point(x - h, y), st_point(x + h, y)), "
        "st_point(x + h, y + 2 * h))"
    )
    sql = build_pg_sql(
        "off_sq",
        select=(
            "c_custkey, "
            f"round(st_length(st_offsetcurve({ell}, 1.0)), 6) AS len_inner, "
            f"round(st_length(st_offsetcurve({ell}, -1.0)), 6) AS len_outer"
        ),
        where="c_custkey % 10 = 9",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_offset_curve"] = f"""
    SELECT c_custkey,
           round(4 * h - 2, 6) AS len_inner,
           round(4 * h + 16 * sin(pi() / 32), 6) AS len_outer
    FROM ({_SQS})
    WHERE c_custkey % 10 = 9
    ORDER BY c_custkey
"""


def geo_buffer_styles(spark, sf_dir):
    """The 3-argument ``ST_Buffer(g, d, 'style')`` through the pg shim
    (operators/scan._rewrite_buffer3 -> overlay.buffer_with_style): per
    customer a horizontal 2h segment is buffered one unit with every
    style. Closed forms: flat = 4h (a 2h x 2 rectangle), square =
    4h + 4, round = 4h + the inscribed-32-gon disc 16 sin(pi/16),
    single-sided = 2h each."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("bufsty_sq")
    seg = "st_makeline(st_point(x - h, y), st_point(x + h, y))"
    sql = build_pg_sql(
        "bufsty_sq",
        select=(
            "c_custkey, "
            f"round(st_area(st_buffer({seg}, 1.0, 'endcap=flat')), 6) "
            "AS a_flat, "
            f"round(st_area(st_buffer({seg}, 1.0, 'endcap=square')), 6) "
            "AS a_square, "
            f"round(st_area(st_buffer({seg}, 1.0, 'endcap=round')), 6) "
            "AS a_round, "
            f"round(st_area(st_buffer({seg}, 1.0, 'side=left')), 6) "
            "AS a_left, "
            f"round(st_area(st_buffer({seg}, 1.0, 'side=right')), 6) "
            "AS a_right"
        ),
        where="c_custkey % 10 = 5",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_buffer_styles"] = f"""
    SELECT c_custkey,
           round(4 * h, 6) AS a_flat,
           round(4 * h + 4, 6) AS a_square,
           round(4 * h + 16 * sin(pi() / 16), 6) AS a_round,
           round(2 * h, 6) AS a_left,
           round(2 * h, 6) AS a_right
    FROM ({_SQS})
    WHERE c_custkey % 10 = 5
    ORDER BY c_custkey
"""


def geo_grid_kit(spark, sf_dir):
    """Orientation forcing, bounding diagonal, minimum clearance, tile
    envelope and hexagon constructors on the raw-SQL surface (all
    geom.py/sqlfuncs r9 additions). Closed forms per square: forcing CW
    then testing CW/CCW pins the orientation pair (area invariant under
    ring reversal), the bounding diagonal is 2h*sqrt(2), GEOS minimum
    clearance of a square is its side 2h, the z=3 web-mercator tile is
    2*world/8 wide, and the flat-top hexagon of edge h has area
    1.5*sqrt(3)*h^2 wherever its cell lands."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("grid_sq")
    sql = build_pg_sql(
        "grid_sq",
        select=(
            "c_custkey, "
            "st_ispolygoncw(st_forcepolygoncw(geometry)) AS cw_ok, "
            "st_ispolygonccw(st_forcepolygoncw(geometry)) AS ccw_no, "
            "round(st_area(st_forcepolygoncw(geometry)), 6) AS cw_area, "
            "round(st_length(st_boundingdiagonal(geometry)), 6) "
            "AS diag_len, "
            "round(st_minimumclearance(geometry), 6) AS clearance, "
            "round(st_xmax(st_tileenvelope(3, c_custkey % 8, "
            "c_custkey % 8)) - st_xmin(st_tileenvelope(3, c_custkey % 8, "
            "c_custkey % 8)), 6) AS tile_w, "
            "round(st_area(st_hexagon(h, 1, 2)), 6) AS hex_area"
        ),
        where="c_custkey % 10 = 4",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_grid_kit"] = f"""
    SELECT c_custkey,
           TRUE AS cw_ok,
           FALSE AS ccw_no,
           round(4 * h * h, 6) AS cw_area,
           round(2 * h * sqrt(2), 6) AS diag_len,
           round(2 * h, 6) AS clearance,
           round(2 * 20037508.342789244 / 8, 6) AS tile_w,
           round(1.5 * sqrt(3) * h * h, 6) AS hex_area
    FROM ({_SQS})
    WHERE c_custkey % 10 = 4
    ORDER BY c_custkey
"""


def geo_smooth_kit(spark, sf_dir):
    """Smoothing / robustness kit on the raw-SQL surface: Chaikin
    corner cutting (one pass on a square leaves 3.5 h^2 — each corner
    cut removes an (h/2)-leg triangle), Visvalingam simplification
    (collinear ring midpoints carry zero effective area and drop,
    restoring the 5-point square ring), the Weiszfeld geometric median
    (the four DISTINCT corners' median IS the center by symmetry —
    st_points would double the ring-closure corner and bias it), ShiftLongitude
    (x < 0 -> x + 360 replayed in SQL arithmetic), and ReducePrecision
    on a finer grid than the 0.01-coordinate lattice (identity, area
    preserved — the validity-repair leg is pytest-covered)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("smooth_sq")
    mid_ring = (
        "st_makeline(st_makeline(st_makeline(st_makeline(st_makeline("
        "st_point(x - h, y - h), st_point(x, y - h)), "
        "st_point(x + h, y - h)), st_point(x + h, y + h)), "
        "st_point(x - h, y + h)), st_point(x - h, y - h))"
    )
    sql = build_pg_sql(
        "smooth_sq",
        select=(
            "c_custkey, "
            "round(st_area(st_chaikinsmoothing(geometry, 1)), 6) "
            "AS chaikin_area, "
            f"st_npoints(st_simplifyvw({mid_ring}, 0.0001)) AS vw_pts, "
            "round(st_x(st_geometricmedian(st_collect("
            "st_collect(st_point(x - h, y - h), st_point(x + h, y - h)), "
            "st_collect(st_point(x + h, y + h), st_point(x - h, y + h))"
            "))), 6) AS med_x, "
            "round(st_x(st_startpoint(st_shiftlongitude("
            "st_makeline(st_point(x, y), st_point(x, y + 1))))), 6) "
            "AS shifted_x, "
            "round(st_area(st_reduceprecision(geometry, 0.001)), 6) "
            "AS rp_area"
        ),
        where="c_custkey % 10 = 6",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_smooth_kit"] = f"""
    SELECT c_custkey,
           round(3.5 * h * h, 6) AS chaikin_area,
           CAST(5 AS INT) AS vw_pts,
           round(x, 6) AS med_x,
           round(CASE WHEN x < 0 THEN x + 360 ELSE x END, 6) AS shifted_x,
           round(4 * h * h, 6) AS rp_area
    FROM ({_SQS})
    WHERE c_custkey % 10 = 6
    ORDER BY c_custkey
"""


def geo_triangulate_poly(spark, sf_dir):
    """``ST_TriangulatePolygon`` on the raw-SQL surface
    (geometry/triangulate.triangulate_polygon — ear clipping over the
    hole-bridged ring, Meister/Eberly): the plain square tiles into
    exactly n - 2 = 2 triangles of total area 4h^2, and the
    donut built per row with st_difference gains a bridge, tiling into
    n + 2*holes - 2 = 8 triangles of total area 4h^2 - 1 — both counts
    and both area sums are exact Euler closed forms."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("tri_sq")
    donut = (
        "st_difference(geometry, st_makeenvelope("
        "x - 0.5, y - 0.5, x + 0.5, y + 0.5))"
    )
    sql = build_pg_sql(
        "tri_sq",
        select=(
            "c_custkey, "
            "st_numgeometries(st_triangulatepolygon(geometry)) AS n_plain, "
            "round(st_area(st_triangulatepolygon(geometry)), 6) "
            "AS area_plain, "
            f"st_numgeometries(st_triangulatepolygon({donut})) AS n_donut, "
            f"round(st_area(st_triangulatepolygon({donut})), 6) "
            "AS area_donut"
        ),
        where="c_custkey % 10 = 2",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_triangulate_poly"] = f"""
    SELECT c_custkey,
           CAST(2 AS INT) AS n_plain,
           round(4 * h * h, 6) AS area_plain,
           CAST(8 AS INT) AS n_donut,
           round(4 * h * h - 1, 6) AS area_donut
    FROM ({_SQS})
    WHERE c_custkey % 10 = 2
    ORDER BY c_custkey
"""


def geo_inscribed_circles(spark, sf_dir):
    """``ST_MaximumInscribedCircle`` / ``ST_LargestEmptyCircle`` on the
    raw-SQL surface (geometry/triangulate — GEOS' successive quadtree
    refinement, deterministic tolerance envelope-diagonal/1e6): the
    square's inscribed circle is its center with radius h exactly, and
    the LEC among the four corner points (obstacles) inside their own
    envelope is the center with radius h*sqrt(2) — both far inside the
    round-3 margin of the refinement bound."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("mic_sq")
    corners = (
        "st_collect(st_collect(st_point(x - h, y - h), "
        "st_point(x + h, y - h)), st_collect(st_point(x + h, y + h), "
        "st_point(x - h, y + h)))"
    )
    sql = build_pg_sql(
        "mic_sq",
        select=(
            "c_custkey, "
            "round(st_x(st_maximuminscribedcircle(geometry)), 3) AS mic_x, "
            "round(st_y(st_maximuminscribedcircle(geometry)), 3) AS mic_y, "
            "round(st_maximuminscribedradius(geometry), 3) AS mic_r, "
            f"round(st_x(st_largestemptycircle({corners})), 3) AS lec_x, "
            f"round(st_largestemptyradius({corners}), 3) AS lec_r"
        ),
        where="c_custkey % 10 = 8",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_inscribed_circles"] = f"""
    SELECT c_custkey,
           round(x, 3) AS mic_x,
           round(y, 3) AS mic_y,
           round(CAST(h AS DOUBLE), 3) AS mic_r,
           round(x, 3) AS lec_x,
           round(h * sqrt(2), 3) AS lec_r
    FROM ({_SQS})
    WHERE c_custkey % 10 = 8
    ORDER BY c_custkey
"""


def geo_line_tools(spark, sf_dir):
    """The line-tool tail on the raw-SQL surface: ST_LineExtend
    (forward 2 + backward 1 adds exactly 3 to the 2h segment),
    ST_DumpRings (the st_difference donut has shell + one hole),
    ST_OrderingEquals (a line equals itself, not its reverse), and
    ST_SharedPaths (a co-directional blade over [x, x+h] shares
    exactly h of linework — the collection's first member is the
    same-direction MultiLineString)."""
    from xcube_geodb_spark.geometry.sqlfuncs import (
        register_spatial_sql_functions,
    )
    from xcube_geodb_spark.operators.scan import build_pg_sql

    register_spatial_sql_functions(spark)
    _squares(spark, sf_dir).createOrReplaceTempView("lt_sq")
    seg = "st_makeline(st_point(x - h, y), st_point(x + h, y))"
    blade = "st_makeline(st_point(x, y), st_point(x + h + 1, y))"
    donut = (
        "st_difference(geometry, st_makeenvelope("
        "x - 0.5, y - 0.5, x + 0.5, y + 0.5))"
    )
    sql = build_pg_sql(
        "lt_sq",
        select=(
            "c_custkey, "
            f"round(st_length(st_lineextend({seg}, 2.0, 1.0)), 6) "
            "AS ext_len, "
            f"size(st_dumprings({donut})) AS n_rings, "
            f"st_orderingequals({seg}, {seg}) AS oeq, "
            f"st_orderingequals({seg}, st_reverse({seg})) AS oeq_rev, "
            f"round(st_length(st_geometryn(st_sharedpaths({seg}, "
            f"{blade}), 1)), 6) AS shared_len"
        ),
        where="c_custkey % 10 = 0 AND c_custkey > 0",
        order="c_custkey",
    )
    return spark.sql(sql)


GEO_ORACLES["geo_line_tools"] = f"""
    SELECT c_custkey,
           round(2 * h + 3, 6) AS ext_len,
           CAST(2 AS INT) AS n_rings,
           TRUE AS oeq,
           FALSE AS oeq_rev,
           round(CAST(h AS DOUBLE), 6) AS shared_len
    FROM ({_SQS})
    WHERE c_custkey % 10 = 0 AND c_custkey > 0
    ORDER BY c_custkey
"""


GEO_ORACLES["geo_sql_join_intersects"] = GEO_ORACLES_JOINS[
    "geo_spatial_join_points"
]

# geom–geom arms mirror the bbox-first oracles: ST_<mode>(geom, env) is
# ST_<mirror-mode>(env, geom), so the interval-arithmetic forms carry over
# with sq_in_box/box_in_sq swapped where the mode is asymmetric
GEO_ORACLES["geo_sql_geom_modes"] = "\nUNION ALL\n".join(
    f"SELECT '{mode}' AS mode, c_custkey FROM ({frag})"
    for mode, frag in [
        ("within", _sq_oracle(BOX_SQUARES, "sq_in_box")),
        ("contains", _sq_oracle(BOX_WITHIN, "box_in_sq")),
        ("intersects", _sq_oracle(BOX_SQUARES, _INTERSECTS)),
        ("disjoint", _sq_oracle(BOX_SQUARES, f"NOT ({_INTERSECTS})")),
        (
            "touches",
            _sq_oracle(BOX_TOUCHES, f"({_INTERSECTS}) AND NOT ({_II})"),
        ),
        (
            "overlaps",
            _sq_oracle(
                BOX_SQUARES, f"({_II}) AND NOT sq_in_box AND NOT box_in_sq"
            ),
        ),
        (
            "equals",
            _sq_oracle(
                BOX_EQUALS,
                f"abs(x - h - ({BOX_EQUALS[0]})) < {EPS} AND "
                f"abs(y - h - ({BOX_EQUALS[1]})) < {EPS} AND "
                f"abs(x + h - ({BOX_EQUALS[2]})) < {EPS} AND "
                f"abs(y + h - ({BOX_EQUALS[3]})) < {EPS}",
            ),
        ),
        (
            "crosses",
            f"""
            SELECT c_custkey FROM ({_SQS})
            WHERE y > {BOX_CROSSES[1]} AND y < {BOX_CROSSES[3]}
              AND x + h > {BOX_CROSSES[0]} AND x - h < {BOX_CROSSES[2]}
              AND NOT (x - h >= {BOX_CROSSES[0]}
                       AND x + h <= {BOX_CROSSES[2]})
            """,
        ),
    ]
)


GEO_QUERIES = {
    "geo_sql_join_intersects": geo_sql_join_intersects,
    "geo_sql_geom_modes": geo_sql_geom_modes,
    "pg_spatial_agg": pg_spatial_agg,
    "pg_geography_distance": pg_geography_distance,
    "pg_geography_length": pg_geography_length,
    "pg_bbox_overlap": pg_bbox_overlap,
    "pg_knn_operator": pg_knn_operator,
    "pg_makeline_traj": pg_makeline_traj,
    "geo_split_blade": geo_split_blade,
    "geo_delaunay_anchor": geo_delaunay_anchor,
    "geo_voronoi_cells": geo_voronoi_cells,
    "geo_scalar_kit": geo_scalar_kit,
    "geo_generate_snap": geo_generate_snap,
    "pg_cluster_within": pg_cluster_within,
    "geo_concave_hull": geo_concave_hull,
    "geo_offset_curve": geo_offset_curve,
    "geo_buffer_styles": geo_buffer_styles,
    "geo_grid_kit": geo_grid_kit,
    "geo_smooth_kit": geo_smooth_kit,
    "geo_triangulate_poly": geo_triangulate_poly,
    "geo_inscribed_circles": geo_inscribed_circles,
    "geo_line_tools": geo_line_tools,
    "geo_buffer_squares": geo_buffer_squares,
    "geo_erode_squares": geo_erode_squares,
    "geo_measures_squares": geo_measures_squares,
    "geo_bbox_modes": geo_bbox_modes,
    "geo_distance_knn": geo_distance_knn,
    "geo_distance_sphere": geo_distance_sphere,
    "geo_collect_points": geo_collect_points,
    "geo_clip_squares": geo_clip_squares,
    "geo_prepared_chain": geo_prepared_chain,
    "geo_knn_warehouse": geo_knn_warehouse,
    "geo_transform_points": geo_transform_points,
    "geo_bbox_contains_points": geo_bbox_contains_points,
    "geo_bbox_crs_transform": geo_bbox_crs_transform,
    "geo_bbox_disjoint_points": geo_bbox_disjoint_points,
    "geo_bbox_intersects_squares": geo_bbox_intersects_squares,
    "geo_bbox_within_squares": geo_bbox_within_squares,
    "geo_bbox_touches_squares": geo_bbox_touches_squares,
    "geo_bbox_overlaps_squares": geo_bbox_overlaps_squares,
    "geo_bbox_equals_squares": geo_bbox_equals_squares,
    "geo_bbox_crosses_segments": geo_bbox_crosses_segments,
    "geo_count_by_bbox": geo_count_by_bbox,
    "geo_extent_squares": geo_extent_squares,
    "geo_geometry_types": geo_geometry_types,
    "geo_overlay_diamond": geo_overlay_diamond,
    "geo_dissolve_chain": geo_dissolve_chain,
    "geo_dissolve_two_level": geo_dissolve_two_level,
    "geo_makevalid_bowtie": geo_makevalid_bowtie,
    "geo_linear_ref": geo_linear_ref,
    "geo_affine_rect": geo_affine_rect,
    "geo_mec_envelope": geo_mec_envelope,
    "geo_subdivide_cross": geo_subdivide_cross,
    "geo_pointonsurface_l": geo_pointonsurface_l,
    "geo_spatial_join_points": geo_spatial_join_points,
    "geo_spatial_join_dwithin": geo_spatial_join_dwithin,
    "geo_spatial_join_within": geo_spatial_join_within,
    "geo_sql_relate": geo_sql_relate,
    "geo_linemerge_chain": geo_linemerge_chain,
    "pg_polygonize": pg_polygonize,
    "geo_node_polygonize": geo_node_polygonize,
    "geo_dbscan_points": geo_dbscan_points,
    "geo_knn_join": geo_knn_join,
    "geo_zonal_stats": geo_zonal_stats,
    "geo_geohash_points": geo_geohash_points,
    "geo_tile_counts": geo_tile_counts,
    "geo_tile_pyramid": geo_tile_pyramid,
}

GEO_ORACLES.update(GEO_ORACLES_JOINS)
GEO_ORACLES["geo_geohash_points"] = f"""
    SELECT c_custkey, geohash, substr(geohash, 1, 3) AS gh3
    FROM ({_geohash_oracle_sql(7)})
"""
GEO_ORACLES["geo_tile_counts"] = _tile_oracle_level(6)
GEO_ORACLES["geo_tile_pyramid"] = "\nUNION ALL\n".join(
    _tile_oracle_level(z) for z in (6, 5, 4)
)
