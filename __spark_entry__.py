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


_SHIPPED: set[int] = set()


def _ensure_worker_path(spark: SparkSession | None = None) -> None:
    """Python workers must be able to import xcube_geodb_spark (UDFs pickle
    by reference). Two mechanisms:

    - PYTHONPATH env (effective only if set before the JVM launches);
    - ``addPyFile`` of a package zip (works on an already-running session —
      the driver may create its SparkSession before importing this module).
    """
    root = os.path.dirname(os.path.abspath(__file__))
    existing = os.environ.get("PYTHONPATH", "")
    if root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{root}{os.pathsep}{existing}" if existing else root
        )
    if spark is not None and id(spark) not in _SHIPPED:
        _SHIPPED.add(id(spark))
        import shutil
        import tempfile

        zip_base = os.path.join(
            tempfile.gettempdir(), "xcube_geodb_spark_pkg"
        )
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=root, base_dir="xcube_geodb_spark"
        )
        try:
            spark.sparkContext.addPyFile(zip_path)
        except Exception:
            pass  # e.g. duplicate registration across sessions — harmless


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary through the engine's raw-SQL
    path on /root/testdata/sf0.001."""
    _ensure_worker_path(spark)
    from xcube_geodb_spark.suite.core import pg_groupby_q1

    return pg_groupby_q1(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_worker_path(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_worker_path()
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
