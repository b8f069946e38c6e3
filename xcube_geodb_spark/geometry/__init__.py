"""Pure-Python/numpy geometry kernel.

The reference delegates all geometry work to PostGIS
(``xcube_geodb/sql/geodb.sql:1204-1247`` builds ``ST_*`` predicate SQL).
Spark has no native geometry type and this environment has no shapely, so
this subpackage implements the minimal kernel the reference's surface
needs, evaluated inside Arrow-vectorized pandas UDFs:

- WKB / EWKB(hex) / WKT / GeoJSON parse + serialize  (:mod:`.geom`)
- envelopes (persisted at ingest for parquet min/max pruning)
- the 8 bbox-vs-geometry predicates of ``geodb_get_by_bbox``
  (:mod:`.predicates`)
- ``GeometryType()`` parity (:func:`.geom.geometry_type_wkb`)
- minimal CRS transforms (:mod:`.crs`)
"""

from xcube_geodb_spark.geometry.geom import (
    Geometry,
    parse_wkb,
    parse_wkb_hex,
    parse_wkt,
    from_geojson,
    to_wkb,
    to_wkb_hex,
    to_wkt,
    to_geojson,
    envelope,
    geometry_type_wkb,
)
from xcube_geodb_spark.geometry.predicates import (
    COMPARISON_MODES,
    bbox_predicate,
)

__all__ = [
    "Geometry",
    "parse_wkb",
    "parse_wkb_hex",
    "parse_wkt",
    "from_geojson",
    "to_wkb",
    "to_wkb_hex",
    "to_wkt",
    "to_geojson",
    "envelope",
    "geometry_type_wkb",
    "COMPARISON_MODES",
    "bbox_predicate",
]
