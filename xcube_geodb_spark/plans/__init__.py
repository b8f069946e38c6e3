"""Physical-plan utilities: layout planning, plan inspection, skew tools.

- :mod:`.layout`  — Z-order key expression for spatial file clustering
- :mod:`.inspect` — helpers asserting that a plan has the shape we want
  (pushed filters, broadcast joins, codegen) — used by tests and tuning
- :mod:`.skew`    — salted join / two-stage aggregation for hot keys AQE
  can't split
"""

from xcube_geodb_spark.plans.layout import zorder_key
from xcube_geodb_spark.plans.inspect import (
    executed_plan,
    has_pushed_filter,
    broadcast_join_count,
)
from xcube_geodb_spark.plans.skew import salted_agg, salted_join

__all__ = [
    "zorder_key",
    "executed_plan",
    "has_pushed_filter",
    "broadcast_join_count",
    "salted_agg",
    "salted_join",
]
