"""Dense sequential id assignment (SERIAL parity) without a global shuffle.

The reference's ``id SERIAL PRIMARY KEY`` (``xcube_geodb/sql/geodb.sql:310``)
hands out a dense sequence. ``monotonically_increasing_id`` is sparse, and a
global ``row_number()`` window collapses to one partition. Instead: count
rows per partition (tiny job), compute cumulative offsets on the driver,
then add ``offset + local row_number`` via a per-partition window — no
cross-partition shuffle of the data itself, so the approach holds at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame, start: int = 1, id_col: str = "id"
) -> DataFrame:
    df = df.withColumn("__pid", F.spark_partition_id())
    counts = df.groupBy("__pid").count().collect()
    offsets = []
    acc = int(start)
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["count"]
    if not offsets:
        return df.drop("__pid").withColumn(id_col, F.lit(None).cast("long"))
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    out = (
        df.join(F.broadcast(off_df), "__pid")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"))
        .drop("__pid", "__offset")
    )
    return out
