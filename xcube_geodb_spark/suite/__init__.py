"""The driver-contract query suite: every operator from SURVEY.md §2 (plus
the LLM-pipeline extensions) as (Spark callable, DuckDB oracle SQL) pairs.

Each entry in :data:`QUERIES` is ``name -> fn(spark, sf_dir) -> DataFrame``;
:data:`ORACLES` holds the matching ANSI-SQL string DuckDB runs over the same
parquet tables (views pre-registered by the driver). Column names/aliases
match exactly; float aggregates are rounded identically on both sides.
"""

from xcube_geodb_spark.suite.core import CORE_QUERIES, CORE_ORACLES
from xcube_geodb_spark.suite.geo import GEO_QUERIES, GEO_ORACLES
from xcube_geodb_spark.suite.llm import LLM_QUERIES, LLM_ORACLES
from xcube_geodb_spark.suite.dml import DML_QUERIES, DML_ORACLES

QUERIES = {**CORE_QUERIES, **GEO_QUERIES, **LLM_QUERIES, **DML_QUERIES}
ORACLES = {**CORE_ORACLES, **GEO_ORACLES, **LLM_ORACLES, **DML_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
