"""Distributed export writers — the inverse of :mod:`.readers`.

The reference returns GeoDataFrames and leaves file export to geopandas
(single-node ``gdf.to_file``); an engine that produced the result on a
cluster should export from the cluster. Two formats, both chosen for being
splittable line-per-record (a 100 TB export parallelizes exactly like any
other write, and the files re-ingest through the engine's own readers):

- **newline-delimited GeoJSON** (GeoJSONSeq / geojsonl — one Feature per
  line, the streaming-friendly profile of RFC 7946)
- **CSV with a WKT geometry column** (Spark's native csv writer after a
  vectorized WKB->WKT projection)

Geometry conversion is Arrow-vectorized over the same kernel codecs the
readers use; property serialization stays JVM-side (``to_json``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_geodb_spark.geometry.geom import parse_wkb, to_geojson, to_wkt

__all__ = ["write_geojson_seq", "write_csv_wkt", "geojson_feature_column"]


@F.pandas_udf(T.StringType())
def _wkb_to_wkt(s: pd.Series) -> pd.Series:
    return s.map(lambda b: to_wkt(parse_wkb(bytes(b))) if b is not None else None)


@F.pandas_udf(T.StringType())
def _wkb_to_geojson_geom(s: pd.Series) -> pd.Series:
    import json

    return s.map(
        lambda b: json.dumps(to_geojson(parse_wkb(bytes(b))))
        if b is not None
        else None
    )


def geojson_feature_column(
    df: DataFrame, geometry_col: str = "geometry"
) -> F.Column:
    """One RFC 7946 Feature per row as a string column: geometry via the
    vectorized kernel codec, properties via JVM-side ``to_json`` over the
    remaining columns."""
    props = [c for c in df.columns if c != geometry_col]
    return F.concat(
        F.lit('{"type": "Feature", "geometry": '),
        F.coalesce(_wkb_to_geojson_geom(F.col(geometry_col)), F.lit("null")),
        F.lit(', "properties": '),
        # keep null properties in the Feature (to_json drops null struct
        # fields by default, which breaks export/re-ingest fidelity)
        F.to_json(
            F.struct(*[F.col(c) for c in props]),
            {"ignoreNullFields": "false"},
        ),
        F.lit("}"),
    )


def write_geojson_seq(
    df: DataFrame, path: str, geometry_col: str = "geometry", **options
) -> None:
    """Newline-delimited GeoJSON export (one Feature per line, splittable;
    re-ingestable via ``readers.read_geojson``)."""
    out = df.select(
        geojson_feature_column(df, geometry_col).alias("value")
    )
    out.write.mode(options.pop("mode", "overwrite")).text(path)


def write_csv_wkt(
    df: DataFrame, path: str, geometry_col: str = "geometry", **options
) -> None:
    """CSV export with geometry as WKT (re-ingestable via
    ``readers.read_csv_wkt``). Spark's native csv writer handles quoting,
    headers, and partitioned output."""
    cols = [
        _wkb_to_wkt(F.col(c)).alias(c) if c == geometry_col else F.col(c)
        for c in df.columns
    ]
    mode = options.pop("mode", "overwrite")
    df.select(*cols).write.mode(mode).options(
        header=options.pop("header", True), **options
    ).csv(path)
