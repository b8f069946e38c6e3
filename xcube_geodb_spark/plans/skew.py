"""Skew mitigation: salted joins and two-stage (salted) aggregation.

Spark's AQE skew-join (enabled by the engine's session defaults,
``session.py``) splits oversized *shuffle partitions* at runtime, but it
only fires for sort-merge joins and only per-partition — a single hot KEY
(one nation holding 40% of a 100 TB fact table, one null-ish default id)
still lands every matching row in one task when AQE can't split further,
and aggregation skew isn't covered at all. These helpers implement the
classic salting constructions; both are *result-invariant* rewrites of the
plain operator, which the driver gate proves by hashing a salted query
against an unsalted SQL oracle.

When to reach for them (docstring-as-runbook, in the spirit of
SURVEY.md §4):

- ``salted_join``: fact⋈dim where the dim is too big to broadcast and a few
  fact keys dominate. Replicates only the (small) right side ``salts``×.
- ``salted_agg``: holistic aggregates (``collect_list``, exact distinct
  counts) over skewed keys, where Spark's map-side partial aggregation
  can't shrink the hot group. Algebraic aggs (sum/count/min/max/avg) do
  NOT need this — partial aggregation already bounds them; use it when the
  per-group state itself is the problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_agg"]

_SALT = "__salt"


def _salt_of(df: DataFrame, salts: int) -> Column:
    """Deterministic per-row salt: a hash over all columns spreads a hot
    key's rows across ``salts`` buckets without RNG (replayable runs,
    stable tests). Rows identical in every column share a salt — harmless,
    since duplicates can't be spread by any row-local scheme."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    The left (big, skewed) side gets a per-row salt; the right side is
    exploded ``salts``× so every (key, salt) combination exists; the join
    keys become ``on + [__salt]``, splitting each hot key's rows across
    ``salts`` independent shuffle partitions. Output equals
    ``left.join(right, on, how)`` with columns in the same order.

    Cost model: right side is read once and replicated ``salts``× through
    the shuffle — choose ``salts`` ≈ (hot-key rows / target partition
    rows), not larger. Supports inner and left joins (the semantics where
    per-left-row multiplicity is preserved by construction).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l_salted = left.withColumn(_SALT, _salt_of(left, salts))
    r_replicated = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return l_salted.join(r_replicated, on + [_SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation: stage 1 aggregates on ``keys + salt`` (hot
    groups split ``salts`` ways, each partial small), stage 2 merges the
    partials on ``keys`` alone — the second shuffle moves only
    ``salts × |groups|`` rows, never the raw data.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the partial
    columns (refer to them by their aliases). Example — exact distincts
    under skew::

        salted_agg(
            events, ["user_id"],
            partial_aggs=[F.collect_set("page").alias("pages")],
            final_aggs=[
                F.size(F.array_distinct(F.flatten(F.collect_list("pages"))))
                 .alias("distinct_pages")
            ],
        )
    """
    staged = (
        df.withColumn(_SALT, _salt_of(df, salts))
        .groupBy(*keys, _SALT)
        .agg(*partial_aggs)
    )
    return staged.groupBy(*keys).agg(*final_aggs)
