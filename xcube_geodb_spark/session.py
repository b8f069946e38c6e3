"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every default here is chosen so the
same plans survive a multi-executor cluster: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for the pandas-UDF geometry
kernel, and shuffle partitions sized to the local core count rather than
the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xcube_geodb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # make this package importable in Python workers regardless of the
    # driver's cwd (UDFs are pickled by reference to this module)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # scan-split size: Spark's 128m default gives a ~100 MB parquet
        # table ONE input split, so a 32-core local run executes the
        # whole scan on one task (measured: a 200k x 64 embedding scan
        # at 12x the cost of the same scan split 7 ways). 16m keeps
        # every core busy on the GB-scale local datasets; on a real
        # cluster raise it back via the env (AQE coalesces post-shuffle
        # either way, so over-splitting only costs scheduling).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
