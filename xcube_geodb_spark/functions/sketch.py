"""Deterministic frequency / distinct sketches for 100 TB profiling.

Spark's own approximate aggregates (HLL++ ``approx_count_distinct``,
``approx_percentile``) are engine-internal: no other system reproduces
their estimates, so they cannot be oracle-verified and their merge state
cannot leave Spark. The sketches here use the repo's md5-as-uniform
convention instead — fully deterministic, engine-replayable (the driver
gates hash-match DuckDB replaying the identical construction), and
mergeable by plain SQL ``GROUP BY``:

- **count-min** (Cormode & Muthukrishnan 2005): d x w counter matrix;
  item -> one counter per row via independent md5 slices; estimate =
  min over rows (always an over-count; error <= 2N/w with prob 1-2^-d).
  Building is explode(d) + one hash aggregate whose OUTPUT is d*w rows
  regardless of corpus size — the partial aggregation absorbs the corpus.
- **KMV / bottom-k** (Bar-Yossef et al. 2002) distinct estimate:
  (k-1) / max(k smallest normalized hashes). One min-k aggregation per
  group; state is k doubles per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "count_min_build",
    "count_min_lookup",
    "kmv_distinct",
]

# each sketch row r hashes with a distinct seed; 8 hex chars of md5 give a
# 32-bit uniform int exactly like sampling.hash_bucket
_HASH_BITS = 0xFFFFFFFF


def _bucket(item: Column, row: int, width: int) -> Column:
    h = F.md5(F.concat(F.lit(f"cm{row}:"), item.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def count_min_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` with exactly one (row,
    bucket) hit per item occurrence per sketch row. Output cardinality is
    at most ``depth * width`` no matter how large the input — the hash
    aggregate's map-side partials do the compression, so the only shuffle
    moves pre-reduced counters."""
    item = F.col(item_col)
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"), _bucket(item, r, width).alias("bucket")
            )
            for r in range(depth)
        ])
    )
    return (
        df.select(rows.alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_lookup(
    sketch: DataFrame, probes: DataFrame, item_col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Estimate the frequency of every probe item: join each probe's d
    (row, bucket) coordinates against the sketch (broadcast — the sketch
    is <= d*w rows by construction) and take the min counter. Absent
    (row, bucket) cells count 0, so items never seen estimate 0.
    Returns probes + ``est`` (long, upper bound on the true count)."""
    item = F.col(item_col)
    coords = probes.select(
        item.alias("__item"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(item, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb"),
    ).select("__item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = coords.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "__item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return (
        joined.groupBy("__item")
        .agg(F.min("cnt").alias("est"))
        .withColumnRenamed("__item", item_col)
    )


def kmv_distinct(
    df: DataFrame, item_col: str, group_cols: list[str] | None = None,
    k: int = 256, n_shards: int = 64,
) -> DataFrame:
    """Bottom-k (KMV) distinct-count estimate per group: hash every item
    to a uniform [0, 1) double (md5 32-bit slice / 2^32), keep the k
    smallest distinct hashes per group, estimate ``(k-1) /
    kth_smallest``. Exact when the group holds fewer than k distinct
    items (falls back to the distinct-hash count).

    Scalably min-k: a single set-aggregate per group would hold every
    distinct hash in one task, so the bottom-k runs in two phases — each
    of ``n_shards`` hash-shards of a group keeps its own k smallest
    (identical items land in the same shard, preserving distinctness),
    then the shard lists merge: the k smallest of a union are always
    among each shard's k smallest. Final-phase input is at most
    ``n_shards * k`` doubles per group. The result is shard-count
    independent, which is what lets a plain SQL oracle replay it.
    Returns group cols + ``est_distinct`` (double)."""
    item = F.col(item_col)
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv:"), item.cast("string"))), 1, 8),
            16, 10,
        ).cast("double")
        / F.lit(float(_HASH_BITS + 1))
    )
    groups = [F.col(c) for c in (group_cols or [])]
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmvs:"), item.cast("string"))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(n_shards),
    )
    phase1 = (
        df.select(*groups, shard.alias("__shard"), h.alias("__h"))
        .groupBy(*(groups + [F.col("__shard")]))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__ks"))
    )
    agg = phase1.groupBy(*groups).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__ks"))), 1, k
        ).alias("__ks")
    )
    n_seen = F.size(F.col("__ks"))
    kth = F.element_at(F.col("__ks"), k)
    est = F.when(n_seen < k, n_seen.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )
    return agg.select(*groups, F.round(est, 6).alias("est_distinct"))
