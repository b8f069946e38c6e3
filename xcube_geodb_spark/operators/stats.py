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


def file_column_stats(path: str, max_str: int = 64) -> dict[str, list]:
    """JSON-safe per-column [min, max] for ONE file, for embedding into the
    collection manifest at commit time (Delta-style data skipping: pruning
    then reads the manifest instead of N footers per query).

    Only columns whose every row group carries stats and whose values are
    JSON-representable (int/float/bool/short str) are recorded; anything
    else is simply absent, which pruning treats as "maybe matches". The
    reserved ``::rows`` key (not a valid column name) carries the file's
    row count, so exact counts read the manifest with zero file IO."""
    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {"::rows": [md.num_rows, md.num_rows]}
    for i in range(md.num_columns):
        name = md.schema.column(i).name
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            a, b = st.min, st.max
            if not isinstance(a, (int, float, str)) or isinstance(a, bool):
                ok = False
                break
            if isinstance(a, str) and (len(a) > max_str or len(str(b)) > max_str):
                ok = False
                break
            if lo is None or a < lo:
                lo = a
            if hi is None or b > hi:
                hi = b
        if ok and lo is not None:
            out[name] = [lo, hi]
    return out


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
