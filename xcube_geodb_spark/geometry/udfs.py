"""Arrow-vectorized pandas UDFs wrapping the geometry kernel.

These are the only places the engine leaves the JVM on the data path, and
each is batch-vectorized (Arrow transfer, numpy inner loops). Scans avoid
calling them entirely when the envelope pre-filter is decisive
(operators/spatial.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_geodb_spark.geometry.geom import (
    envelope,
    geometry_type_wkb,
    parse_wkb,
)
from xcube_geodb_spark.geometry.predicates import Box, bbox_predicate

_ENVELOPE_TYPE = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


@F.pandas_udf(T.StringType())
def geom_type_udf(wkb: pd.Series) -> pd.Series:
    """PostGIS ``GeometryType(geometry)`` — header-only WKB read."""
    return wkb.map(lambda b: geometry_type_wkb(b) if b is not None else None)


@F.pandas_udf(_ENVELOPE_TYPE)
def envelope_udf(wkb: pd.Series) -> pd.DataFrame:
    rows = []
    for b in wkb:
        if b is None:
            rows.append((None, None, None, None))
        else:
            rows.append(envelope(parse_wkb(b)))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


def with_envelope_columns(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Persisted at ingest: __xmin/__ymin/__xmax/__ymax envelope columns
    drive parquet min/max file pruning for every spatial scan."""
    env = envelope_udf(F.col(geometry_col)).alias("__env")
    df = df.withColumn("__env", env)
    return (
        df.withColumn("__xmin", F.col("__env.xmin"))
        .withColumn("__ymin", F.col("__env.ymin"))
        .withColumn("__xmax", F.col("__env.xmax"))
        .withColumn("__ymax", F.col("__env.ymax"))
        .drop("__env")
    )


def bbox_predicate_column(mode: str, box: Box, geometry_col: str = "geometry") -> Column:
    """Exact ``ST_<mode>(bbox, geom)`` as a vectorized pandas-UDF Column."""
    bx = tuple(float(v) for v in box)

    @F.pandas_udf(T.BooleanType())
    def _pred(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: bbox_predicate(mode, parse_wkb(b), bx) if b is not None else False
        )

    return _pred(F.col(geometry_col))


def envelope_prefilter(mode: str, box: Box) -> Column | None:
    """Cheap JVM-side pre-filter on the persisted envelope columns — pushed
    into the parquet scan. Returns a *necessary* condition for the exact
    predicate (None when the mode admits no envelope shortcut, i.e.
    ``disjoint``)."""
    xmin, ymin, xmax, ymax = (float(v) for v in box)
    # margin keeps the pre-filter strictly looser than the exact kernel
    # predicate (which tolerates ~1e-9 relative) — it must stay a NECESSARY
    # condition, never reject a row the kernel would accept
    m = 1e-6 * max(abs(xmin), abs(ymin), abs(xmax), abs(ymax), 1.0)
    env_intersects = (
        (F.col("__xmin") <= xmax + m)
        & (F.col("__xmax") >= xmin - m)
        & (F.col("__ymin") <= ymax + m)
        & (F.col("__ymax") >= ymin - m)
    )
    if mode in ("intersects", "touches", "overlaps", "crosses"):
        return env_intersects
    if mode in ("contains", "equals"):
        # geom ⊆ box ⇒ envelope ⊆ box
        return (
            (F.col("__xmin") >= xmin - m)
            & (F.col("__xmax") <= xmax + m)
            & (F.col("__ymin") >= ymin - m)
            & (F.col("__ymax") <= ymax + m)
        )
    if mode == "within":
        # box ⊆ geom ⇒ geom envelope ⊇ box
        return (
            (F.col("__xmin") <= xmin + m)
            & (F.col("__xmax") >= xmax - m)
            & (F.col("__ymin") <= ymin + m)
            & (F.col("__ymax") >= ymax - m)
        )
    return None  # disjoint: complement — no cheap necessary condition
