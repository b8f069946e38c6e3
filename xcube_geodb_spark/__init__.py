"""xcube_geodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of xcube-dev/xcube-geodb.

The reference (https://github.com/xcube-dev/xcube-geodb) is a 3-tier
geospatial feature database: Python client -> PostgREST -> PostgreSQL/PostGIS.
This package re-expresses its data model + operator semantics on Apache Spark:

- collections   -> versioned Parquet tables + JSON metadata sidecar
                   (:mod:`xcube_geodb_spark.catalog`)
- PostgREST     -> a filter-grammar parser producing pyspark Column trees
  filter grammar   (:mod:`xcube_geodb_spark.filters`)
- PostGIS       -> a pure-Python WKB/WKT geometry kernel evaluated in
                   Arrow-vectorized pandas UDFs
                   (:mod:`xcube_geodb_spark.geometry`)
- SQL passthru  -> Spark SQL (Catalyst is the planner/optimizer the
                   reference delegated to Postgres)

Scale notes: every operator is expressed on the DataFrame API so Catalyst
performs pushdown/pruning; spatial scans pre-filter on persisted envelope
columns (parquet min/max pruned) before the exact geometry predicate runs.
"""

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.session import get_spark


def __getattr__(name):  # lazy: avoid importing pyspark-heavy modules eagerly
    if name == "GeoDBCatalog":
        from xcube_geodb_spark.catalog import GeoDBCatalog

        return GeoDBCatalog
    if name == "GeoDBSparkClient":
        from xcube_geodb_spark.client import GeoDBSparkClient

        return GeoDBSparkClient
    raise AttributeError(name)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "GeoDBCatalog",
    "GeoDBSparkClient",
    "GeoDBError",
    "__version__",
]
