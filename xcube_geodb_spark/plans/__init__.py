"""Physical-plan utilities: layout planning + plan inspection.

- :mod:`.layout`  — Z-order key expression for spatial file clustering
- :mod:`.inspect` — helpers asserting that a plan has the shape we want
  (pushed filters, broadcast joins, codegen) — used by tests and tuning
"""

from xcube_geodb_spark.plans.layout import zorder_key
from xcube_geodb_spark.plans.inspect import (
    executed_plan,
    has_pushed_filter,
    broadcast_join_count,
)

__all__ = [
    "zorder_key",
    "executed_plan",
    "has_pushed_filter",
    "broadcast_join_count",
]
