"""Parquet-footer statistics — the engine's "estimated" fast paths.

The reference answers estimated counts from ``pg_class.reltuples``
(``xcube_geodb/sql/geodb.sql:1276-1303``) and estimated extents from
``ST_EstimatedExtent`` (``geodb.sql:443-458``) — O(1) reads of planner
statistics. Parquet footers give us the same thing *exactly* and without
launching a Spark job: row counts and per-column min/max live in the file
metadata. Documented deviation: our "estimates" are exact (SURVEY.md §7),
so they never return the pre-ANALYZE −1/NULL sentinels.
"""

from __future__ import annotations

import pyarrow.parquet as pq


def footer_row_count(paths: list[str]) -> int:
    """Exact row count from parquet footers only."""
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def footer_min_max(paths: list[str], columns: list[str]) -> dict[str, tuple]:
    """Per-column (min, max) aggregated over all files' row-group stats.
    Returns only columns whose every row group carries stats."""
    agg: dict[str, list] = {c: [None, None] for c in columns}
    ok: dict[str, bool] = {c: True for c in columns}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in columns:
            if c not in idx:
                ok[c] = False
                continue
            ci = idx[c]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok[c] = False
                    break
                lo, hi = st.min, st.max
                if agg[c][0] is None or lo < agg[c][0]:
                    agg[c][0] = lo
                if agg[c][1] is None or hi > agg[c][1]:
                    agg[c][1] = hi
    return {c: tuple(agg[c]) for c in columns if ok[c] and agg[c][0] is not None}
