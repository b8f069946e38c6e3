"""Plan inspection helpers: make 'is this the plan we want?' testable."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True when a predicate on ``column`` reached the parquet scan."""
    for m in _PUSHED.finditer(executed_plan(df)):
        if column in m.group(1):
            return True
    return False


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    return executed_plan(df).count("WholeStageCodegen")
