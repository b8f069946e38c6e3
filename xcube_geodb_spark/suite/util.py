"""Shared helpers for the driver-contract suite."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        from pyspark.sql import functions as F

        # some fixture generations store ts as TIMESTAMP(NANOS), which
        # Spark's vectorized reader only loads via nanosAsLong; newer
        # fixtures store timestamp[us].  Convert only when ts actually
        # loaded as a long, otherwise use the column as-is.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables or TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
