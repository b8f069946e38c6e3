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
        # the events parquet uses TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and convert to microseconds
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables or TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
