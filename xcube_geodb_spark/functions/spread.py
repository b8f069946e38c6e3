"""Scale-adaptive fan-out for CPU-heavy work fused onto small scans.

Parquet scan parallelism is bounded by row-group granularity, not split
count: a split only processes the row groups whose start offset falls in
its byte range, so a small input (one file, one row group — DuckDB and
many writers emit 122 880-row groups) executes the WHOLE fused
projection chain on one core no matter how
``spark.sql.files.openCostInBytes`` / ``maxPartitionBytes`` are tuned.
For operators that spend hundreds of CPU ops per input byte (shingle
construction + per-shingle md5, the text-profile regex battery, Arrow
geometry/vector kernels) that serializes the entire operator.

:func:`spread_small` inserts an explicit round-robin repartition ONLY
when Catalyst's size estimate proves the input small (default 256 MB,
``SPARK_GRAFT_SPREAD_SMALL_BYTES``): by construction the shuffle then
moves at most that many bytes — cheap — while the compute above it fans
out over every core. A large input never takes the branch: its scan
already parallelizes over row groups/files, and shuffling the payload
would be exactly the anti-pattern the optimization guide warns about.
The explicit partition count (2x ``defaultParallelism``) is pinned so
AQE's advisory-size coalescing cannot fold the small shuffle back into
one partition; the row-to-partition assignment stays deterministic
under retries via Spark's sort-before-repartition default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_DEFAULT_THRESHOLD = 256 * 1024 * 1024


def spread_small(
    df: DataFrame,
    threshold: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Round-robin repartition ``df`` iff its optimizer-estimated size is
    provably small; returns ``df`` unchanged otherwise (including on any
    estimation failure — the safe default is the plan Spark chose)."""
    try:
        if df.isStreaming:
            return df
        size = int(
            str(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
    except Exception:
        return df
    if threshold is None:
        threshold = int(
            os.environ.get(
                "SPARK_GRAFT_SPREAD_SMALL_BYTES", _DEFAULT_THRESHOLD
            )
        )
    if size <= 0 or size > threshold:
        return df
    if partitions is None:
        try:
            partitions = 2 * df.sparkSession.sparkContext.defaultParallelism
        except Exception:
            return df
    return df.repartition(int(partitions))
