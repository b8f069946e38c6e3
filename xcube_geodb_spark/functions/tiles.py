"""Web-mercator tile indexing and pyramid aggregation.

The reference's PostGIS surface reaches tiling through arbitrary SQL
(``geodb_get_pg`` passthrough, /root/reference/xcube_geodb/sql/geodb.sql:
1123-1177) and its GeoServer publishing exists to serve exactly such
tiles; this engine makes the tile index a first-class distributed
operator, because at 100 TB "how many features per tile, per zoom" is the
canonical map-reduce over a feature table.

Plan shape, deliberately:

- **Tile keys are pure JVM column math** (radians/tan/cos/ln/floor — all
  whole-stage-codegen built-ins). No UDF, no Python, no shuffle to
  assign keys.
- **One hash aggregation per base zoom** — map-side partial counts mean
  the single shuffle carries one row per (tile, partition), not per
  feature.
- **Pyramid levels never rescan the data**: zoom z-1 is a rollup of zoom
  z by integer-halving the tile key (``tx div 2``), so each level's
  shuffle is geometrically smaller than the last — the classic tile
  pyramid build.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: largest latitude representable in the square web-mercator tile grid
MAX_MERCATOR_LAT = 85.05112878


def _tile_cols(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    n = float(1 << zoom)
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    lat_r = F.radians(lat)
    merc = (
        F.lit(1.0)
        - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(math.pi)
    ) / F.lit(2.0)
    ty = F.floor(merc * F.lit(n))
    # features exactly on the antimeridian / pole edge belong to the last
    # tile, not a nonexistent one
    tx = F.least(tx, F.lit((1 << zoom) - 1))
    ty = F.least(F.greatest(ty, F.lit(0)), F.lit((1 << zoom) - 1))
    return tx, ty


def with_tile(
    df: DataFrame,
    zoom: int,
    lon_col: str | None = None,
    lat_col: str | None = None,
) -> DataFrame:
    """Adds ``tile_z``/``tile_x``/``tile_y`` for each feature.

    Coordinates come from ``lon_col``/``lat_col`` when given, else from
    the persisted envelope midpoint (``__xmin..__ymax`` — every warehouse
    collection carries these). Rows outside the mercator latitude domain
    (|lat| > 85.05112878, where the projection diverges) are dropped, as
    tile servers conventionally do.
    """
    if not 0 <= zoom <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {zoom}")
    if lon_col is not None and lat_col is not None:
        lon, lat = F.col(lon_col), F.col(lat_col)
    elif all(c in df.columns for c in ("__xmin", "__ymin", "__xmax", "__ymax")):
        lon = (F.col("__xmin") + F.col("__xmax")) / F.lit(2.0)
        lat = (F.col("__ymin") + F.col("__ymax")) / F.lit(2.0)
    else:
        raise ValueError(
            "with_tile needs lon_col/lat_col or persisted envelope columns"
        )
    df = df.filter(
        (lat >= F.lit(-MAX_MERCATOR_LAT)) & (lat <= F.lit(MAX_MERCATOR_LAT))
    )
    tx, ty = _tile_cols(lon, lat, zoom)
    return (
        df.withColumn("tile_z", F.lit(zoom))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
    )


def tile_counts(
    df: DataFrame,
    zoom: int,
    lon_col: str | None = None,
    lat_col: str | None = None,
) -> DataFrame:
    """Feature count per tile at one zoom: (tile_z, tile_x, tile_y, n)."""
    return (
        with_tile(df, zoom, lon_col, lat_col)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tile_pyramid(
    df: DataFrame,
    max_zoom: int,
    min_zoom: int = 0,
    lon_col: str | None = None,
    lat_col: str | None = None,
) -> DataFrame:
    """Counts for every zoom in [min_zoom, max_zoom] in one frame.

    The data is scanned and shuffled once, at ``max_zoom``; each coarser
    level aggregates the previous level's (already tiny) tile table by
    halving the tile key — ``floor(tx / 2)`` is exactly the parent tile in
    the quadtree. At scale this is the difference between one 100 TB
    shuffle and ``levels`` of them.
    """
    if min_zoom > max_zoom:
        raise ValueError(f"min_zoom {min_zoom} > max_zoom {max_zoom}")
    base = tile_counts(df, max_zoom, lon_col, lat_col)
    levels = [base]
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        prev = levels[-1]
        levels.append(
            prev.groupBy(
                F.lit(z).alias("tile_z"),
                F.expr("tile_x div 2").alias("tile_x"),
                F.expr("tile_y div 2").alias("tile_y"),
            ).agg(F.sum("n").alias("n"))
        )
    return reduce(DataFrame.unionByName, levels)


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_column(lon: Column, lat: Column, precision: int = 9) -> Column:
    """``ST_GeoHash`` parity as PURE JVM column math (no UDF): the
    classic bit-interleaved base32 cell id, here computed by scaling
    lon/lat to integer cells (one ``floor`` each, like the tile index),
    then unrolling the bit interleave + base32 lookup into a codegen'd
    expression tree. Geohash prefixes nest, so ``substr(gh, 1, p)``
    group-bys give the same coarsen-by-prefix rollups the tile pyramid
    does — but as strings, interoperable with every geohash consumer.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    total = 5 * precision
    bits_lon = (total + 1) // 2
    bits_lat = total // 2
    ix = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << bits_lon))),
        F.lit((1 << bits_lon) - 1),
    ).cast("long")
    iy = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << bits_lat))),
        F.lit((1 << bits_lat) - 1),
    ).cast("long")
    # interleave from the MSB: even positions (0,2,..) take lon bits
    inter = F.lit(0).cast("long")
    for pos in range(total):
        if pos % 2 == 0:
            src, src_bits, idx = ix, bits_lon, pos // 2
        else:
            src, src_bits, idx = iy, bits_lat, pos // 2
        bit = F.shiftright(src, src_bits - 1 - idx).bitwiseAND(F.lit(1))
        inter = inter + F.shiftleft(bit, total - 1 - pos)
    chars = F.array(*[F.lit(c) for c in _GEOHASH32])
    out = [
        F.element_at(
            chars,
            (
                F.shiftright(inter, 5 * (precision - 1 - g)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for g in range(precision)
    ]
    return F.concat(*out)


def with_geohash(
    df: DataFrame,
    precision: int = 9,
    lon_col: str | None = None,
    lat_col: str | None = None,
    out_col: str = "geohash",
) -> DataFrame:
    """Adds a geohash cell id per feature (envelope midpoint when no
    explicit lon/lat columns are given, like :func:`with_tile`)."""
    if lon_col is not None and lat_col is not None:
        lon, lat = F.col(lon_col), F.col(lat_col)
    elif all(c in df.columns for c in ("__xmin", "__ymin", "__xmax", "__ymax")):
        lon = (F.col("__xmin") + F.col("__xmax")) / F.lit(2.0)
        lat = (F.col("__ymin") + F.col("__ymax")) / F.lit(2.0)
    else:
        raise ValueError(
            "with_geohash needs lon_col/lat_col or persisted envelope columns"
        )
    return df.withColumn(out_col, geohash_column(lon, lat, precision))
