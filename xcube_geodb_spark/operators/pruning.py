"""File-level pruning for DML: decide from parquet footer statistics which
manifest files can possibly contain rows matching a PostgREST filter.

At 100 TB this is the difference between rewriting one file and rewriting
the table: ``delete_from_collection(query='raba_id=eq.7000')`` must touch
only the files whose ``raba_id`` min/max interval admits 7000 (files are
Z-order/btree clustered at write, so intervals are tight).

The analysis is deliberately conservative: it extracts only *top-level
conjunctive* constraints of the form ``col op literal`` (eq/gt/gte/lt/lte/
in) from the raw query string; anything it cannot understand (or-groups,
like, negation, is) contributes no constraint, meaning "maybe matches".
A file is skipped ONLY when some understood constraint provably excludes
its entire [min, max] range — never the other way around.
"""

from __future__ import annotations

import math

from xcube_geodb_spark.filters import _parse_literal, _split_csv, _split_pairs

_RESERVED = {"select", "order", "limit", "offset", "and", "or", "not.and", "not.or"}

_INTERVAL_OPS = {"eq", "gt", "gte", "ge", "lt", "lte", "le", "in"}


def conjunctive_constraints(query: str | None) -> list[tuple[str, str, object]]:
    """[(column, op, literal)] for top-level ANDed simple comparisons."""
    if not query:
        return []
    out = []
    for key, value in _split_pairs(query):
        if key.lower() in _RESERVED:
            continue
        bits = value.split(".")
        if bits[0].lower() == "not":
            continue  # negations: no safe interval constraint
        op = bits[0].lower()
        if op not in _INTERVAL_OPS:
            continue
        raw = ".".join(bits[1:])
        if op == "in":
            raw = raw.strip()
            if raw.startswith("(") and raw.endswith(")"):
                out.append(
                    (key, "in", [_parse_literal(v) for v in _split_csv(raw[1:-1])])
                )
            continue
        out.append((key, op, _parse_literal(raw)))
    return out


def _excludes(op: str, lit, lo, hi) -> bool:
    """True when `col op lit` can match NO value in [lo, hi]."""
    try:
        if op == "eq":
            return lit < lo or lit > hi
        if op in ("gt",):
            return hi <= lit
        if op in ("gte", "ge"):
            return hi < lit
        if op in ("lt",):
            return lo >= lit
        if op in ("lte", "le"):
            return lo > lit
        if op == "in":
            return all(v < lo or v > hi for v in lit)
    except TypeError:
        return False  # incomparable types: keep the file
    return False


def file_may_match(
    stats: dict[str, tuple], constraints: list[tuple[str, str, object]]
) -> bool:
    """Footer min/max stats (+ optional ``::bloom:<col>`` filters) vs the
    constraint set; missing stats => maybe."""
    from xcube_geodb_spark.operators.stats import bloom_may_contain

    for col, op, lit in constraints:
        bloom = stats.get(f"::bloom:{col}")
        if bloom is not None:
            if op == "eq" and not bloom_may_contain(bloom, lit):
                return False
            if op == "in" and all(
                not bloom_may_contain(bloom, v) for v in lit
            ):
                return False
        if col not in stats:
            continue
        lo, hi = stats[col]
        if lo is None or hi is None:
            continue
        if isinstance(lo, float) and (math.isnan(lo) or math.isnan(hi)):
            continue
        if _excludes(op, lit, lo, hi):
            return False
    return True


def split_files_by_constraints(
    paths: dict[str, str],
    columns: list[str],
    constraints,
    stats_map: dict[str, dict] | None = None,
) -> tuple[list[str], list[str]]:
    """Partition manifest files into (maybe_touched, untouched).

    ``paths`` maps manifest-relative name -> absolute path. ``stats_map``
    is the manifest's commit-time ``file_stats`` (rel -> {col: [min,
    max]}); files present there prune without any footer IO — at 100 TB
    the manifest read replaces N per-query footer reads. Files absent
    (pre-stats commits) fall back to reading their footer."""
    from xcube_geodb_spark.operators.stats import footer_min_max

    if not constraints:
        return list(paths), []
    touched, untouched = [], []
    for rel, absolute in paths.items():
        if stats_map is not None and rel in stats_map:
            stats = {}
            for c, v in stats_map[rel].items():
                if c in columns:
                    stats[c] = tuple(v)
                elif c.startswith("::bloom:") and c[len("::bloom:"):] in columns:
                    stats[c] = v  # base64 string, not a (min, max) pair
        else:
            stats = footer_min_max([absolute], columns)
        if file_may_match(stats, constraints):
            touched.append(rel)
        else:
            untouched.append(rel)
    return touched, untouched
