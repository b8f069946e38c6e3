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


# DataFrame handles per (application, sf_dir, table). A DataFrame holds no
# data — only the resolved relation (file listing + schema read at
# spark.read time); every action still scans the parquet files. Memoizing
# the handle removes a repeated driver-side metadata read (~40-80 ms of
# listing + footer schema per call) that a real deployment pays once at
# catalog registration, exactly like the DuckDB oracle side of the bench,
# whose views are created once outside the timed region. Keyed by
# applicationId so a new session never sees a stale handle; the source
# dirs are immutable fixtures (testdata / fresh bench tempdirs).
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, table)
    df = _LOAD_CACHE.get(key)
    if df is not None:
        return df
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
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    _LOAD_CACHE[key] = df
    return df


# views already registered, per (application, session, table) -> sf_dir; a
# view is re-registered whenever the requested sf_dir changes (the scaled
# bench blocks re-point the same names at replicated tempdirs). The
# tableExists probe guards against a recycled session object id: a view
# that is genuinely absent is always (re)registered.
_VIEWS: dict[tuple[str, int, str], str] = {}


def register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    app = spark.sparkContext.applicationId
    for t in tables or TABLES:
        key = (app, id(spark), t)
        if _VIEWS.get(key) == sf_dir and spark.catalog.tableExists(t):
            continue
        load(spark, sf_dir, t).createOrReplaceTempView(t)
        _VIEWS[key] = sf_dir
