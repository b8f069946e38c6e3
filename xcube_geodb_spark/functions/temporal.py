"""Temporal join operators Spark lacks natively: as-of join, range join.

**As-of join** (for each left row, the latest right row at-or-before its
timestamp) is implemented as a UNION + single window pass, not a range
join: both sides are tagged, unioned, hash-partitioned by key and sorted by
(time, side), and ``last(value, ignorenulls)`` carries the most recent
right-side values forward onto left rows. One shuffle on the key, no
broadcast of either side, no O(n*m) interval explosion — the standard
scalable formulation (the same shape Flink/kdb use for as-of semantics).

DuckDB's native ``ASOF JOIN`` serves as the oracle in the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` (or < when ``strict``) within the
    same ``on`` key. Left rows with no match get NULLs (left-join
    semantics)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    out_cols = [f"{c}{suffix}" for c in value_cols]

    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if not strict else 0)
    )
    for c in out_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0 if not strict else 1).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    # inclusive: right sorts before left at equal time (right row visible);
    # strict: left sorts before right (same-time right rows invisible)
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in out_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    is_left = F.col("__side") == (1 if not strict else 0)
    return carried.filter(is_left).drop("__t", "__side")


def range_join_events(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Interval containment join (left.ts in [right.start, right.end]) keyed
    by ``on``: an equi-join on the key plus a post-filter, so Catalyst plans
    a hash join rather than a cartesian range explosion. For keys with very
    long interval lists, bucketize time as an additional equi-key."""
    cond = [left[k] == right[k] for k in on] + [
        left[left_ts] >= right[right_start],
        left[left_ts] <= right[right_end],
    ]
    c = cond[0]
    for x in cond[1:]:
        c = c & x
    return left.join(right, c, "inner")
