"""Spatial file-layout planning.

Parquet prunes files/row-groups by column min/max statistics; random row
order makes every file's envelope span the world and nothing prunes. The
fix is to cluster rows by a space-filling curve before writing so nearby
geometries share files — then a bbox query's envelope pre-filter skips most
of the data at the scan level. This is the Spark equivalent of the
reference's GIST index (``xcube_geodb/sql/geodb.sql:1456-1471``); see
SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(
    x: Column,
    y: Column,
    bounds: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    bits: int = 16,
) -> Column:
    """Interleaved-bit Z-order key from (x, y), pure JVM expressions.

    Quantizes each coordinate to ``bits`` levels inside ``bounds`` and
    interleaves them with shift/or — no UDF, fully codegen'd, usable in
    ``repartitionByRange``/``sortWithinPartitions``."""
    xmin, ymin, xmax, ymax = bounds
    qx = F.least(
        F.lit((1 << bits) - 1),
        F.greatest(
            F.lit(0),
            ((x - xmin) / (xmax - xmin) * (1 << bits)).cast("long"),
        ),
    )
    qy = F.least(
        F.lit((1 << bits) - 1),
        F.greatest(
            F.lit(0),
            ((y - ymin) / (ymax - ymin) * (1 << bits)).cast("long"),
        ),
    )
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        key = (
            F.shiftleft(key, 2)
            .bitwiseOR(F.shiftright(qx, b).bitwiseAND(F.lit(1)) * 2)
            .bitwiseOR(F.shiftright(qy, b).bitwiseAND(F.lit(1)))
        )
    return key
