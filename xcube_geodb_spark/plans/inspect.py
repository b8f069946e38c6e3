"""Plan inspection helpers: make 'is this the plan we want?' testable."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# the plan printer truncates long scans, so PushedFilters may be cut off;
# DataFilters on a FileScan line are the same predicates pre-translation
_PUSHED = re.compile(r"(?:PushedFilters|DataFilters): \[([^\]\n]*)")


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
    """Distinct whole-stage-codegen regions ('*(N)' prefixes in the string
    plan; the long form 'WholeStageCodegen' appears only in formatted mode)."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids) or plan.count("WholeStageCodegen")
