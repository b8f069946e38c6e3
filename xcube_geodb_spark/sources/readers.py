"""Distributed ingest readers producing WKB geometry columns.

All geometry conversion runs in Arrow-vectorized pandas UDFs over the
kernel codecs — the file parse itself is Spark's native (distributed,
pushdown-capable) json/csv reader.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_geodb_spark.geometry.geom import (
    from_geojson,
    parse_wkb_hex,
    parse_wkt,
    to_wkb,
)


@F.pandas_udf(T.BinaryType())
def _wkt_to_wkb(s: pd.Series) -> pd.Series:
    return s.map(lambda v: to_wkb(parse_wkt(v)) if v is not None else None)


@F.pandas_udf(T.BinaryType())
def _wkb_hex_to_wkb(s: pd.Series) -> pd.Series:
    return s.map(lambda v: to_wkb(parse_wkb_hex(v)) if v is not None else None)


def _fix_coords(c):
    # Spark's json schema inference can't unify Point/Polygon coordinate
    # nesting and falls back to strings at some depth — re-parse recursively
    if isinstance(c, str):
        return _fix_coords(json.loads(c))
    if isinstance(c, list):
        return [_fix_coords(e) for e in c]
    return c


def _parse_geojson_obj(v: str):
    obj = json.loads(v)
    if "coordinates" in obj:
        obj["coordinates"] = _fix_coords(obj["coordinates"])
    return obj


@F.pandas_udf(T.BinaryType())
def _geojson_str_to_wkb(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: to_wkb(from_geojson(_parse_geojson_obj(v))) if v is not None else None
    )


def with_geometry_from_wkt(
    df: DataFrame, wkt_col: str, geometry_col: str = "geometry"
) -> DataFrame:
    return df.withColumn(geometry_col, _wkt_to_wkb(F.col(wkt_col)))


def with_geometry_from_wkb_hex(
    df: DataFrame, hex_col: str, geometry_col: str = "geometry"
) -> DataFrame:
    return df.withColumn(geometry_col, _wkb_hex_to_wkb(F.col(hex_col)))


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    wkt_col: str = "geometry",
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV with a WKT geometry column -> DataFrame with WKB geometry."""
    df = spark.read.options(header=header, inferSchema=True, **options).csv(path)
    return df.withColumn(wkt_col, _wkt_to_wkb(F.col(wkt_col)))


def read_geojson(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """GeoJSON FeatureCollection file(s) -> one row per feature: property
    columns + WKB ``geometry``.

    The file is read with Spark's json source (splittable across files;
    one large FeatureCollection parses on a single task — prefer
    newline-delimited features or many files at scale)."""
    raw = spark.read.option("multiLine", multiline).json(path)
    if "features" in raw.columns:
        feats = raw.select(F.explode("features").alias("f"))
    else:  # newline-delimited single features
        feats = spark.read.json(path).select(F.struct("*").alias("f"))
    cols = [F.col("f.properties.*")] if "properties" in feats.select("f.*").columns else []
    out = feats.select(
        *cols, F.to_json(F.col("f.geometry")).alias("__geojson")
    )
    return out.withColumn("geometry", _geojson_str_to_wkb(F.col("__geojson"))).drop(
        "__geojson"
    )
