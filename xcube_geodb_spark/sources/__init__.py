"""Sources/sinks: ingest paths into warehouse collections.

The reference's ingest surface is "a user-built GeoDataFrame" (e.g. from a
Shapefile, README.md:13-14) POSTed as GeoJSON. Spark-native equivalents:

- :func:`.readers.read_geojson` — GeoJSON FeatureCollection -> DataFrame
  with WKB geometry (distributed parse via Spark's json reader + kernel UDF)
- :func:`.readers.read_csv_wkt` — CSV with a WKT geometry column
- :func:`.readers.with_geometry_from_wkt` / ``from_wkb_hex`` — column
  converters for any existing DataFrame
- :func:`.writers.write_geojson_seq` / :func:`.writers.write_csv_wkt` —
  distributed, re-ingestable exports (the reference leaves export to
  single-node geopandas)
"""

from xcube_geodb_spark.sources.readers import (
    read_csv_wkt,
    read_geojson,
    with_geometry_from_wkt,
    with_geometry_from_wkb_hex,
)
from xcube_geodb_spark.sources.writers import (
    geojson_feature_column,
    write_csv_wkt,
    write_geojson_seq,
)

__all__ = [
    "read_geojson",
    "read_csv_wkt",
    "with_geometry_from_wkt",
    "with_geometry_from_wkb_hex",
    "write_geojson_seq",
    "write_csv_wkt",
    "geojson_feature_column",
]
