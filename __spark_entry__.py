"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 (plus
the LLM-pipeline extensions); each callable takes (spark, sf_dir).
``oracle_sql()`` — matching DuckDB SQL per query (column names aligned).

Implementation lives in :mod:`xcube_geodb_spark.suite`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xcube_geodb_spark.suite import ORACLES, QUERIES  # noqa: E402


def _ensure_worker_path() -> None:
    """Python workers must be able to import xcube_geodb_spark (UDFs pickle
    by reference)."""
    root = os.path.dirname(os.path.abspath(__file__))
    existing = os.environ.get("PYTHONPATH", "")
    if root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{root}{os.pathsep}{existing}" if existing else root
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary through the engine's raw-SQL
    path on /root/testdata/sf0.001."""
    _ensure_worker_path()
    from xcube_geodb_spark.suite.core import pg_groupby_q1

    return pg_groupby_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_worker_path()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
