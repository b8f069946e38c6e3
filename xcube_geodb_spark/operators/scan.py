"""Scan operators: PostgREST-grammar path + raw-SQL passthrough.

Reference lifecycles: SURVEY.md §3.1 (``get_collection``) and §3.2
(``get_collection_pg`` — clause-ordered SQL built server-side at
``xcube_geodb/sql/geodb.sql:1147-1167``). Here Spark SQL *is* the dialect
engine; Catalyst replaces the Postgres planner.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_geodb_spark.catalog import GeoDBCatalog
from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.filters import apply_postgrest_query


def get_collection(
    catalog: GeoDBCatalog,
    collection: str,
    query: str | None = None,
    database: str = "public",
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """Filtered scan via the PostgREST grammar (``geodb.py:1830-1885``).

    Selective scans skip manifest files whose footer min/max provably
    exclude the query's conjunctive constraints (same analysis DML uses
    for rewrites): a point lookup like ``id=eq.N`` on a clustered
    collection plans a one-file scan instead of the table — the engine's
    stand-in for the reference's PK btree (geodb.sql:310)."""
    from xcube_geodb_spark.catalog import SYSTEM_COLUMNS
    from xcube_geodb_spark.operators.pruning import (
        bloom_columns_needed,
        conjunctive_constraints,
        fts_term_groups,
        split_files_by_constraints,
    )

    constraints = conjunctive_constraints(query)
    m = catalog.meta(collection, database)
    fts_groups = fts_term_groups(query, _fts_indexes(m))
    if (constraints or fts_groups) and m.files:
        cols = sorted({c for c, _, _ in constraints})
        touched, _ = split_files_by_constraints(
            catalog.manifest_paths(collection, database, meta=m),
            cols,
            constraints,
            meta=m,
            need_untouched=False,
            fts_groups=fts_groups,
            blooms_map=(
                m.file_blooms()
                if bloom_columns_needed(
                    constraints, fts_groups, _bloom_indexed(m)
                )
                else None
            ),
        )
        df = catalog.load_files(collection, database, touched, meta=m)
        df = df.drop(*[c for c in df.columns if c in SYSTEM_COLUMNS])
    else:
        df = catalog.load_df(collection, database)
    return apply_postgrest_query(df, query, limit=limit, offset=offset)


def _fts_indexes(m) -> dict[str, str]:
    """column -> dictionary for the collection's fts token-bloom indexes."""
    return {
        i["property"]: i.get("dictionary", "english")
        for i in m.d.get("indexes", [])
        if i.get("type") == "fts"
    }


def _bloom_indexed(m) -> set[str]:
    return {
        i["property"]
        for i in m.d.get("indexes", [])
        if i.get("type") == "bloom"
    }


def explain_scan(
    catalog: GeoDBCatalog,
    collection: str,
    query: str | None = None,
    database: str = "public",
) -> dict:
    """Pruning introspection for a grammar scan — which manifest files the
    planned read would touch and why (the engine's answer to EXPLAIN's
    PushedFilters line, at file granularity). Metadata-only: no Spark job,
    no footer IO when manifest stats cover the files."""
    from xcube_geodb_spark.operators.pruning import (
        bloom_columns_needed,
        conjunctive_constraints,
        fts_term_groups,
        split_files_by_constraints,
        summary_excludes,
    )

    m = catalog.meta(collection, database)
    constraints = conjunctive_constraints(query)
    fts_groups = fts_term_groups(query, _fts_indexes(m))
    stats_map = m.file_stats()
    if (constraints or fts_groups) and m.files:
        touched, skipped = split_files_by_constraints(
            catalog.manifest_paths(collection, database, meta=m),
            sorted({c for c, _, _ in constraints}),
            constraints,
            stats_map=stats_map,
            fts_groups=fts_groups,
            blooms_map=(
                m.file_blooms()
                if bloom_columns_needed(
                    constraints, fts_groups, _bloom_indexed(m)
                )
                else None
            ),
        )
    else:
        touched, skipped = list(m.files), []
    bloom_cols = sorted(
        {
            i["property"]
            for i in m.d.get("indexes", [])
            if i.get("type") in ("bloom", "fts")
        }
        | {
            k[len("::bloom:"):]
            for st in stats_map.values()
            for k in st
            if k.startswith("::bloom:")
        }
    )
    return {
        "collection": f"{database}_{collection}",
        "version": m.version,
        "constraints": [
            {"column": c, "op": op, "literal": lit} for c, op, lit in constraints
        ],
        "fts_constraints": [
            {"column": c, "required_term_groups": g} for c, g in fts_groups
        ],
        "files_total": len(m.files),
        "files_scanned": len(touched),
        "files_skipped": len(skipped),
        "manifest_stats": all(f in stats_map for f in m.files),
        "bloom_columns": bloom_cols,
        # stats-tree view: how many shard hulls a probing scan would skip
        # WITHOUT loading (get_collection's fast path; this introspection
        # itself loads everything to report per-file detail)
        "stats_tree": {
            "complete": m.stats_complete,
            "shards_total": len(m.stats_shards()),
            "shards_skipped": (
                sum(
                    1
                    for _n, summary in m.stats_shards()
                    if summary is not None
                    and constraints
                    and summary_excludes(summary, constraints)
                )
                if m.stats_complete
                else 0
            ),
        },
    }


def head_collection(
    catalog: GeoDBCatalog,
    collection: str,
    num_lines: int = 10,
    database: str = "public",
) -> DataFrame:
    """First N rows (``geodb.py:1803-1828``); ordered by id for determinism.

    Manifest id stats bound the scan: walk files by ascending id-min until
    the accumulated row count covers N — every id in those files is <= the
    max of their id-maxes (call it B), so at least N ids are <= B and no
    file whose id-min exceeds B can contribute to the head. At 100 TB a
    head-10 reads one file, not the table."""
    from xcube_geodb_spark.catalog import SYSTEM_COLUMNS

    m = catalog.meta(collection, database)
    fstats = m.file_stats()
    n = int(num_lines)
    if m.files and all(
        f in fstats and "id" in fstats[f] and "::rows" in fstats[f]
        for f in m.files
    ):
        by_lo = sorted(m.files, key=lambda f: fstats[f]["id"][0])
        total = 0
        bound = None
        for f in by_lo:
            total += fstats[f]["::rows"][0]
            bound = max(bound or fstats[f]["id"][1], fstats[f]["id"][1])
            if total >= n:
                break
        candidates = [f for f in m.files if fstats[f]["id"][0] <= bound]
        df = catalog.load_files(collection, database, candidates, meta=m)
        df = df.drop(*[c for c in df.columns if c in SYSTEM_COLUMNS])
        return df.orderBy("id").limit(n)
    return catalog.load_df(collection, database).orderBy("id").limit(n)


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


# view-name -> DataFrame handle last registered by get_collection_pg on a
# session; holding the handle (not just its id) keeps identity comparisons
# safe against id reuse after gc
_VIEW_MEMO: dict[tuple, object] = {}


def _view_name(database: str, collection: str) -> str:
    name = f"{database}_{collection}"
    if not _IDENT.match(name):
        raise GeoDBError(f"Invalid collection name: {name!r}")
    return name


# PG type names Spark's parser doesn't know, for the ::cast shim
_PG_CAST_TYPES = {
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "float4": "float",
    "float8": "double",
    "text": "string",
    "varchar": "string",
    "bytea": "binary",
    "bool": "boolean",
    "numeric": "double",
    # json/jsonb properties are stored as json TEXT (TESTDATA events
    # payload, catalog json columns); the PG cast is representation-only
    "json": "string",
    "jsonb": "string",
}

_PARAM_TYPE_RE = re.compile(
    r"([A-Za-z_]\w*)\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\)"
)


def _pg_cast_expr(expr: str, t: str) -> str:
    """One non-geometry PG ``::type`` cast -> Spark, shared by the
    segment / literal / parenthesized cast paths. Parameterized types
    (r11) carry PG's exact semantics: ``numeric(p,s)`` -> DECIMAL(p,s);
    ``varchar(n)`` TRUNCATES to n chars (Spark's VARCHAR(n) cast keeps
    the full string — a silent deviation otherwise); ``char(n)``
    truncates and blank-pads like bpchar; ``timestamp(p)`` ROUNDS the
    micros to p fractional digits like PG (r12 — a bare TIMESTAMP cast
    silently kept sub-second parts; half-up at the cut, PG's rounding
    for both signs). Multi-word PG spellings (``double precision``,
    ``character varying[(n)]``, ``timestamp [(p)] with[out] time
    zone``) canonicalize onto the same branches (r12 — they used to
    half-match, leaving a dangling word that SELECT position read as a
    silent column alias). Unknown parameterized types refuse loudly."""
    t = t.strip()
    low = re.sub(r"\s+", " ", t.lower())
    if " " in low:
        if low == "double precision":
            return f"CAST({expr} AS DOUBLE)"
        m2 = re.fullmatch(r"character varying(?:\s*\(\s*(\d+)\s*\))?", low)
        if m2:
            return _pg_cast_expr(
                expr, f"varchar({m2.group(1)})" if m2.group(1) else "varchar"
            )
        m3 = re.fullmatch(
            r"timestamp(?:\s*\(\s*(\d+)\s*\))? with(?:out)? time zone", low
        )
        if m3:
            return _pg_cast_expr(
                expr,
                f"timestamp({m3.group(1)})" if m3.group(1) else "timestamp",
            )
        raise GeoDBError(
            f"Unsupported cast ::{t} (bit strings and TIME-of-day are "
            "outside the pg dialect shim)"
        )
    m = _PARAM_TYPE_RE.fullmatch(t)
    if m:
        name = m.group(1).lower()
        p, s = m.group(2), m.group(3)
        if name in ("numeric", "decimal"):
            return f"CAST({expr} AS DECIMAL({p}, {s or 0}))"
        if name == "varchar" and s is None:
            return f"substring(CAST({expr} AS STRING), 1, {p})"
        if name in ("char", "bpchar", "character") and s is None:
            return (
                f"rpad(substring(CAST({expr} AS STRING), 1, {p}), "
                f"{p}, ' ')"
            )
        if name in ("timestamp", "timestamptz") and s is None:
            prec = int(p)
            if prec >= 6:
                return f"CAST({expr} AS TIMESTAMP)"  # micros either way
            return (
                f"timestamp_micros(CAST(round(unix_micros("
                f"CAST({expr} AS TIMESTAMP)), {prec - 6}) AS BIGINT))"
            )
        raise GeoDBError(
            f"Unsupported parameterized cast ::{t} (supported: "
            "numeric/decimal(p[,s]), varchar(n), char(n), timestamp(p))"
        )
    return f"CAST({expr} AS {_PG_CAST_TYPES.get(t.lower(), t)})"


# multi-word PG type spellings first (longest match), then the one-word
# (optionally parameterized) form — ::double precision must not half-match
# as CAST(x AS double) with a dangling "precision" token (a SILENT alias
# in SELECT position)
_TYPE_TOKEN = (
    r"(?:(?i:double\s+precision"
    r"|character\s+varying(?:\s*\(\s*\d+\s*\))?"
    r"|bit\s+varying(?:\s*\(\s*\d+\s*\))?"
    r"|timestamp(?:\s*\(\s*\d+\s*\))?\s+with(?:out)?\s+time\s+zone"
    r"|time(?:\s*\(\s*\d+\s*\))?\s+with(?:out)?\s+time\s+zone)"
    r"|[A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)
_CAST_RE = re.compile(
    r"""((?:[A-Za-z_][A-Za-z0-9_.]*\s*\([^()]*\))   # f(args)
        |[A-Za-z_][A-Za-z0-9_.]*                    # identifier
        |'[^']*'                                    # string literal
        |\d+(?:\.\d+)?)                             # number
        \s*::\s*(""" + _TYPE_TOKEN + r")",
    re.VERBOSE,
)
def _similar_to_regex(pat: str) -> str:
    """PG ``SIMILAR TO`` pattern -> anchored POSIX regex: ``%`` -> ``.*``,
    ``_`` -> ``.``; SIMILAR TO's regex metacharacters (| * + ? ( ) { }
    and bracket expressions) pass through; characters that are regex
    metacharacters but NOT SIMILAR TO metacharacters (. ^ $ \\) are
    escaped — PG treats a period as a literal period."""
    out = []
    i, n = 0, len(pat)
    in_brackets = False
    while i < n:
        ch = pat[i]
        if in_brackets:
            out.append(ch)
            if ch == "]":
                in_brackets = False
        elif ch == "[":
            in_brackets = True
            out.append(ch)
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in ".^$\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return "^(?:" + "".join(out) + ")$"


def _rewrite_array_literals(parts: list[str]) -> None:
    """``ARRAY[...]`` -> ``array(...)`` in-place over quote-split
    segments (even indexes = code): the opener and its matching ``]``
    may sit in different code segments when the elements are string
    literals, so bracket depth carries across segments. Subscript
    brackets outside an ARRAY literal are untouched."""
    stack: list[str] = []  # 'A' = ARRAY bracket, 'P' = plain subscript
    opener = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)
    for i in range(0, len(parts), 2):
        seg = parts[i]
        out = []
        pos = 0
        while pos < len(seg):
            if not stack:
                m = opener.search(seg, pos)
                if not m:
                    out.append(seg[pos:])
                    break
                out.append(seg[pos: m.start()])
                out.append("array(")
                stack.append("A")
                pos = m.end()
                continue
            m = opener.match(seg, pos)
            if m:  # nested ARRAY[ inside an open literal
                out.append("array(")
                stack.append("A")
                pos = m.end()
                continue
            ch = seg[pos]
            if ch == "[":
                stack.append("P")
                out.append(ch)
            elif ch == "]":
                out.append(")" if stack.pop() == "A" else "]")
            else:
                out.append(ch)
            pos += 1
        parts[i] = "".join(out)


def _operand_before(s: str) -> tuple[str, int] | None:
    """The operand ending at the END of code string ``s``: an identifier
    chain or a balanced ``(...)`` call (function call / array(...));
    returns (operand, start_index)."""
    t = s.rstrip()
    if not t:
        return None
    if t.endswith(")"):
        depth = 0
        for j in range(len(t) - 1, -1, -1):
            if t[j] == ")":
                depth += 1
            elif t[j] == "(":
                depth -= 1
                if depth == 0:
                    # include a preceding function name (whitespace
                    # between name and paren is legal SQL) — but never a
                    # keyword, which precedes a plain parenthesized
                    # expression rather than naming a call
                    m = re.search(r"([A-Za-z0-9_.\"]+)\s*$", t[:j])
                    start = j
                    if m and m.group(1).upper() not in _SQL_KEYWORDS:
                        start = m.start(1)
                    return t[start:], start
        return None
    m = re.search(r"[A-Za-z0-9_.\"]+$", t)
    if m:
        return t[m.start():], m.start()
    return None


_SQL_KEYWORDS = frozenset(
    "AND OR NOT WHERE ON WHEN THEN ELSE END IN SELECT FROM HAVING LIKE "
    "ILIKE BETWEEN DISTINCT ALL ANY SOME EXISTS CASE AS JOIN BY OVER "
    "USING VALUES RETURNING".split()
)

def _guard_keyword_operand(op: str, lhs: str) -> None:
    """Refuse loudly when an operand-pair rewrite extracted a bare SQL
    keyword as the left operand (e.g. ``CASE ... END @> x`` — the
    operand scanner stops at ``END``); a rewrite would emit broken SQL
    with no hint at the cause (r10 ADVICE)."""
    if lhs.upper() in _SQL_KEYWORDS:
        raise GeoDBError(
            f"Unsupported left operand for {op}: the operand scanner "
            f"stopped at the keyword {lhs!r}. Parenthesize the operand "
            f"(e.g. (CASE ... END) {op} ...)."
        )


# FROM-clause keywords that must not be mistaken for a table alias
# (kept separate: LEFT/RIGHT are also scalar function names, so they
# cannot join _SQL_KEYWORDS, which guards operand-call detection)
_FROM_KEYWORDS = _SQL_KEYWORDS | frozenset(
    "LEFT RIGHT FULL INNER OUTER CROSS NATURAL LATERAL "
    "TABLESAMPLE".split()
)


def _operand_after(s: str) -> tuple[str, int] | None:
    """The operand starting at the BEGINNING of code string ``s``
    (mirror of :func:`_operand_before`); returns (operand, end_index)."""
    t = s.lstrip()
    off = len(s) - len(t)
    m = re.match(r"[A-Za-z0-9_.\"]+", t)
    if not m:
        return None
    end = m.end()
    if end < len(t) and t[end] == "(":
        depth = 0
        for j in range(end, len(t)):
            if t[j] == "(":
                depth += 1
            elif t[j] == ")":
                depth -= 1
                if depth == 0:
                    return t[: j + 1], off + j + 1
        return None
    return t[:end], off + end


def _close_paren(code: str, open_idx: int) -> int | None:
    """Index of the ``)`` matching the ``(`` at ``open_idx`` (balanced
    scan), or None when unbalanced — callers leave unbalanced input for
    Spark's parser to reject with its own message."""
    depth = 0
    for j in range(open_idx, len(code)):
        if code[j] == "(":
            depth += 1
        elif code[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return None



def _rewrite_containment(seg: str) -> str:
    """``a @> b`` / ``a <@ b`` (array containment, set semantics) ->
    ``size(array_except(needle, hay)) = 0`` within ONE code segment
    (operands with string-literal elements are handled by running this
    AFTER the ARRAY rewrite on the joined code — see caller)."""
    while True:
        m = re.search(r"(@>|<@)", seg)
        if not m:
            return seg
        left = _operand_before(seg[: m.start()])
        right = _operand_after(seg[m.end():])
        if left is None or right is None:
            return seg  # not an operand shape we rewrite; leave as-is
        lhs, lstart = left
        rhs, rend_rel = right
        # the true PG operand extends further left through a binary
        # operator (e.g. ``x || y @> z`` is ``(x || y) @> z``); a partial
        # rewrite would be silently wrong SQL — refuse instead
        prefix = seg[:lstart].rstrip()
        if prefix and prefix[-1] in "|&+-*/%^":
            raise GeoDBError(
                "Unsupported operand shape for @>/<@: the left operand is "
                f"a compound expression ({prefix[-2:].strip()}{lhs} ...). "
                "Parenthesize the operand or rewrite with array_except()."
            )
        suffix = seg[m.end() + rend_rel:].lstrip()
        if suffix and suffix[0] in "|&+-*/%^":
            raise GeoDBError(
                "Unsupported operand shape for @>/<@: the right operand "
                f"is a compound expression ({rhs} {suffix[:2].strip()} "
                "...). Parenthesize the operand or rewrite with "
                "array_except()."
            )
        _guard_keyword_operand(m.group(1), lhs)
        hay, needle = (lhs, rhs) if m.group(1) == "@>" else (rhs, lhs)
        repl = f"size(array_except({needle}, {hay})) = 0"
        seg = seg[:lstart] + repl + seg[m.end() + rend_rel:]


_KNN_OP_RE = re.compile(r"<->|<#>")


def _rewrite_knn_ops(seg: str) -> str:
    """PostGIS KNN distance operators on literal-protected code:
    ``a <-> b`` -> ``st_distance(a, b)`` (exact 2D distance, the
    PostGIS 9.5+ geometry semantics) and ``a <#> b`` ->
    ``st_distance(st_envelope(a), st_envelope(b))`` (bounding-box
    distance). In PG these drive an index-assisted ``ORDER BY ...
    LIMIT k`` walk; here the rewrite yields a plain distance expression
    and Spark's LIMIT path compiles to TakeOrderedAndProject — a
    map-side top-k per partition plus a k-row merge, the scale analogue
    of the KNN index scan (no global sort at any SF). Compound operands
    (``a || b <-> c``) refuse loudly rather than rewrite to silently
    wrong SQL, mirroring the @>/<@ guard above.
    Reference: the passthrough admits the operator form
    (/root/reference/xcube_geodb/sql/geodb.sql:1147-1167)."""
    while True:
        m = _KNN_OP_RE.search(seg)
        if not m:
            return seg
        op = m.group(0)
        left = _operand_before(seg[: m.start()])
        right = _operand_after(seg[m.end():])
        if left is None or right is None:
            raise GeoDBError(
                f"Unsupported operand shape for {op}: operands must be "
                "geometry columns, function calls, or geometry literals."
            )
        lhs, lstart = left
        rhs, rend_rel = right
        _guard_keyword_operand(op, lhs)
        prefix = seg[:lstart].rstrip()
        if prefix and prefix[-1] in "|&+-*/%^":
            raise GeoDBError(
                f"Unsupported operand shape for {op}: the left operand "
                f"is a compound expression (... {prefix[-1]} {lhs}). "
                "Parenthesize the operand."
            )
        suffix = seg[m.end() + rend_rel:].lstrip()
        if suffix and suffix[0] in "|&+-*/%^":
            raise GeoDBError(
                f"Unsupported operand shape for {op}: the right operand "
                f"is a compound expression ({rhs} {suffix[0]} ...). "
                "Parenthesize the operand."
            )
        if op == "<->":
            repl = f"st_distance({lhs}, {rhs})"
        else:
            repl = (
                f"st_distance(st_envelope({lhs}), st_envelope({rhs}))"
            )
        seg = seg[:lstart] + repl + seg[m.end() + rend_rel:]


# PG json operators. `<->`/`<#>` (KNN) are excluded by the lookbehind;
# Spark lambda arrows (`x -> expr`) survive because the rewrite only
# fires when the RIGHT operand is a string literal or an integer AND the
# left operand is not a lambda parameter of a higher-order function
# (_is_lambda_param — r10 ADVICE: `transform(xs, x -> 'y')` has a
# literal body but is not a PG json form).
_JSON_ARROW_RE = re.compile(r"(?<!<)(?:->>|->|#>>|#>)")
_LIT_PLACEHOLDER_RE = re.compile(r"__GEODB_LIT_(\d+)__")

# Spark's higher-order functions whose lambda arguments carry `->`
_HOF_NAMES = frozenset(
    "transform filter exists forall aggregate reduce zip_with map_filter "
    "map_zip_with transform_keys transform_values array_sort".split()
)
_LAMBDA_PARAMS_RE = re.compile(
    r"\(\s*[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*\s*\)"
)


def _is_lambda_param(code: str, lstart: int, lhs: str) -> bool:
    """True when the operand ``lhs`` starting at ``lstart`` is a
    plausible Spark lambda parameter: a bare identifier (or ``(x, i)``
    parameter tuple) that begins a direct argument — i.e. immediately
    follows ``(`` or ``,`` — of a call to a known higher-order function.
    Guards the json-arrow rewrite against literal-bodied lambdas like
    ``transform(xs, x -> 'y')``; ``f(j ->> 'k')`` still rewrites because
    ``f`` is not a HOF."""
    if not (
        re.fullmatch(r"[A-Za-z_]\w*", lhs)
        or _LAMBDA_PARAMS_RE.fullmatch(lhs)
    ):
        return False
    prefix = code[:lstart].rstrip()
    if not prefix or prefix[-1] not in "(,":
        return False
    depth = 0
    for j in range(len(prefix) - 1, -1, -1):
        ch = prefix[j]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                m = re.search(r"([A-Za-z_]\w*)\s*$", prefix[:j])
                return bool(m) and m.group(1).lower() in _HOF_NAMES
            depth -= 1
    return False


def _json_path_seg(key: str) -> str:
    """One object-key segment of a JSONPath: dotted for identifier-shaped
    keys, bracket-quoted otherwise (both get_json_object and variant_get
    accept ``$['k']``)."""
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        return "." + key
    if "'" in key or "]" in key:
        raise GeoDBError(
            f"json key {key!r}: keys containing quotes or ']' are outside "
            "the pg dialect shim (SURVEY.md §7)"
        )
    return f"['{key}']"


def _rewrite_json_arrows(code: str, lits: list[str]) -> str:
    """PG json operators on literal-protected code (reference's own SQL
    uses them — /root/reference/xcube_geodb/sql/geodb.sql:114-116, :1901 —
    and its passthrough admits them, geodb.sql:1147-1167):

    - ``j ->> 'k'`` / ``j ->> n`` (text) — chains compile to ONE
      ``get_json_object(j, '$.path')`` (JVM-side Jackson walk, no UDF)
    - ``j -> 'k'`` / ``j -> n`` terminal (json) ->
      ``to_json(variant_get(try_parse_json(j), '$.path'))`` — string
      values keep their quotes exactly like PG's json-returning form.
      DOCUMENTED DEVIATION: variant re-serializes objects with SORTED
      keys and compact spacing (PG/DuckDB return the original text);
      malformed json yields NULL instead of an error (try_parse_json)
    - ``j #> '{a,b,1}'`` / ``#>>`` — the text-array path form; integer
      elements compile to array indexes (PG disambiguates by the actual
      value at runtime; an integer OBJECT KEY needs the quoted
      ``-> '1'`` spelling)

    Chained arrows (``j->'a'->>'b'``, integer indexes anywhere) fold into
    a single path, so intermediate `->`s never materialize. The arrows
    bind tighter than every other binary operator, exactly like PG, so
    rewriting just the adjacent operands preserves precedence. New path
    literals append to ``lits`` and emit placeholders, keeping later
    protected-code scanners literal-free."""
    pos = 0
    while True:
        m = _JSON_ARROW_RE.search(code, pos)
        if not m:
            return code
        left = _operand_before(code[: m.start()])
        if left is None:
            pos = m.end()
            continue
        lhs, lstart = left
        if m.group(0) == "->" and _is_lambda_param(code, lstart, lhs):
            # a Spark lambda whose body happens to be a literal
            # (`transform(xs, x -> 'y')`) — not a PG json form; only the
            # `->` spelling can be a lambda arrow
            pos = m.end()
            continue
        if lhs.upper() in _SQL_KEYWORDS:
            # e.g. `CASE ... END ->> 'k'`: the operand scanner stops at
            # the keyword; a rewrite would emit broken SQL (r10 ADVICE)
            raise GeoDBError(
                f"Unsupported left operand for {m.group(0)}: the operand "
                f"scanner stopped at the keyword {lhs!r}. Parenthesize "
                "the operand (e.g. (CASE ... END) ->> 'k')."
            )
        path, last_text = "$", False
        op = m.group(0)
        j = m.end()
        rhs_end = None
        first = True
        while True:
            right = _operand_after(code[j:])
            if right is None or (
                first
                and _LIT_PLACEHOLDER_RE.fullmatch(right[0]) is None
                and not re.fullmatch(r"\d+", right[0])
            ):
                if first:
                    # not a PG json form (e.g. a Spark lambda `x -> e`):
                    # leave it for Spark's parser untouched
                    pos = m.end()
                    break
                raise GeoDBError(
                    f"Unsupported right operand for {op}: a string "
                    "literal or a non-negative integer is required "
                    "(parenthesize computed operands outside the arrow)"
                )
            first = False
            rhs, rend_rel = right
            rhs_end = j + rend_rel
            lm = _LIT_PLACEHOLDER_RE.fullmatch(rhs)
            if lm is not None:
                val = lits[int(lm.group(1))][1:-1].replace("''", "'")
                if op in ("#>", "#>>"):
                    inner = val.strip()
                    if not (inner.startswith("{") and inner.endswith("}")):
                        raise GeoDBError(
                            f"{op} path must be a text-array literal "
                            "like '{a,b,1}'"
                        )
                    for elem in inner[1:-1].split(","):
                        elem = elem.strip().strip('"')
                        if not elem:
                            continue  # '{}' path: the value itself
                        if re.fullmatch(r"\d+", elem):
                            path += f"[{elem}]"
                        elif re.fullmatch(r"-\d+", elem):
                            raise GeoDBError(
                                f"{op}: negative array indexes are "
                                "outside the pg dialect shim"
                            )
                        else:
                            path += _json_path_seg(elem)
                else:
                    path += _json_path_seg(val)
            elif re.fullmatch(r"\d+", rhs):
                if op in ("#>", "#>>"):
                    raise GeoDBError(
                        f"{op} requires a text-array literal path "
                        "('{a,b}'), not an integer"
                    )
                path += f"[{rhs}]"
            else:
                raise GeoDBError(
                    f"Unsupported right operand for {op}: {rhs!r} (a "
                    "string literal or a non-negative integer is "
                    "required)"
                )
            last_text = op.endswith(">>")
            rest = code[rhs_end:]
            ws = len(rest) - len(rest.lstrip())
            m2 = _JSON_ARROW_RE.match(code, rhs_end + ws)
            if m2 is None:
                break
            op = m2.group(0)
            j = m2.end()
        if first:
            continue  # skipped: not a PG json form
        lits.append("'" + path.replace("'", "''") + "'")
        ph = f"__GEODB_LIT_{len(lits) - 1}__"
        if last_text:
            repl = f"get_json_object({lhs}, {ph})"
        else:
            repl = f"to_json(variant_get(try_parse_json({lhs}), {ph}))"
        code = code[:lstart] + repl + code[rhs_end:]
        pos = lstart + len(repl)


_PAREN_CAST_RE = re.compile(r"\)\s*::\s*(" + _TYPE_TOKEN + r")")


def _rewrite_paren_casts(code: str) -> str:
    """``(expr)::type`` / ``f(g(x))::type`` on literal-protected code —
    the cast shapes the segment-level ``_CAST_RE`` can't reach (its
    operand grammar is regex-bound to paren-free call args). Runs AFTER
    the json-arrow rewrite so ``(payload->>'k')::int``, the everyday PG
    idiom for typed json extraction, resolves to
    ``CAST((get_json_object(...)) AS INT)``."""
    pos = 0
    while True:
        m = _PAREN_CAST_RE.search(code, pos)
        if not m:
            return code
        depth = 0
        for j in range(m.start(), -1, -1):
            if code[j] == ")":
                depth += 1
            elif code[j] == "(":
                depth -= 1
                if depth == 0:
                    break
        else:
            return code  # unbalanced: leave for Spark's parser
        nm = re.search(r"([A-Za-z0-9_.\"]+)\s*$", code[:j])
        start = j
        if nm and nm.group(1).upper() not in _SQL_KEYWORDS:
            start = nm.start(1)
        expr = code[start: m.start() + 1]
        t = m.group(1).lower()
        if t == "geometry":
            repl = f"st_geomfromtext({expr})"
        elif t == "geography":
            repl = f"{_GEOG_MARK}({expr})"
        else:
            repl = _pg_cast_expr(expr, m.group(1))
        code = code[:start] + repl + code[m.end():]
        pos = start  # chained casts: ((x)::a)::b resolves inner-out


_GEOG_MARK = "__geodb_geography__"
_GEOG_FN_RE = re.compile(
    r"\b(st_distance|st_dwithin|st_length|st_perimeter|st_area)\s*\(",
    re.IGNORECASE,
)


def _rewrite_geography(code: str) -> str:
    """PG ``::geography`` forms on literal-protected code: the cast shim
    wraps geography-cast operands in a ``__geodb_geography__(...)``
    marker; this pass routes marked ``ST_Distance`` / ``ST_DWithin``
    calls onto the geodesic kernels (geometry/geom.py):

    - ``ST_Distance(a::geography, b::geography)`` ->
      ``st_distancespheroid(a, b)`` (PostGIS' use_spheroid=true default,
      WGS84 Vincenty); a literal ``false``/``true`` third argument picks
      ``st_distancesphere`` (haversine) / spheroid explicitly
    - ``ST_DWithin(a::geography, b::geography, d [, use_spheroid])`` ->
      ``(st_distance<kind>(a, b) <= d)`` — meters, like PostGIS
    - ``ST_Length`` / ``ST_Perimeter`` / ``ST_Area`` on geography ->
      the ``st_length/perimeter/area`` ``sphere``/``spheroid`` kernels
      (per-segment geodesics; spherical-excess / authalic area) —
      meters / m^2, same use_spheroid defaulting

    Any marker surviving outside those calls refuses loudly: silently
    stripping it would return degrees where PG returns meters.
    Reference: the passthrough admits geography casts
    (/root/reference/xcube_geodb/sql/geodb.sql:1147-1167)."""
    pos = 0
    while _GEOG_MARK in code:
        m = _GEOG_FN_RE.search(code, pos)
        if not m:
            raise GeoDBError(
                "::geography is supported inside ST_Distance / ST_DWithin "
                "/ ST_Length / ST_Perimeter / ST_Area only (geodesic "
                "meters); for other functions cast back or use the "
                "st_*sphere/spheroid forms directly"
            )
        j = _close_paren(code, m.end() - 1)
        if j is None:
            raise GeoDBError(f"{m.group(1)}: unbalanced parentheses")
        args_s = code[m.end(): j]
        if _GEOG_MARK not in args_s:
            pos = j + 1
            continue
        args, depth2, start = [], 0, 0
        for ci, ch in enumerate(args_s):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                args.append(args_s[start:ci].strip())
                start = ci + 1
        args.append(args_s[start:].strip())
        stripped = []
        for a in args:
            if a.startswith(_GEOG_MARK + "("):
                a = a[len(_GEOG_MARK):]
            if _GEOG_MARK in a:
                # a marker nested inside ANOTHER call (e.g.
                # st_buffer(g::geography, 1)) would silently lose its
                # meters semantics if stripped — refuse instead
                raise GeoDBError(
                    "::geography must cast a direct argument of "
                    "ST_Distance/ST_DWithin, not an expression nested "
                    "inside another function call"
                )
            stripped.append(a)
        args = stripped
        fname = m.group(1).lower()

        def _kernel(flag: str | None) -> str:
            if flag is None or flag.lower() == "true":
                return "st_distancespheroid"
            if flag.lower() == "false":
                return "st_distancesphere"
            raise GeoDBError(
                f"{fname}: use_spheroid must be a literal true/false "
                f"(got {flag!r})"
            )

        if fname == "st_distance":
            if len(args) not in (2, 3):
                raise GeoDBError(
                    "ST_Distance(geography): 2 or 3 arguments expected"
                )
            k = _kernel(args[2] if len(args) == 3 else None)
            repl = f"{k}({args[0]}, {args[1]})"
        elif fname == "st_dwithin":
            if len(args) not in (3, 4):
                raise GeoDBError(
                    "ST_DWithin(geography): 3 or 4 arguments expected"
                )
            k = _kernel(args[3] if len(args) == 4 else None)
            repl = f"({k}({args[0]}, {args[1]}) <= {args[2]})"
        else:
            # ST_Length / ST_Perimeter / ST_Area on geography: the
            # per-segment geodesic / geodesic-area kernels, meters(^2)
            if len(args) not in (1, 2):
                raise GeoDBError(
                    f"{fname}(geography): 1 or 2 arguments expected"
                )
            k = _kernel(args[1] if len(args) == 2 else None)
            suffix_k = "spheroid" if k.endswith("spheroid") else "sphere"
            repl = f"{fname}{suffix_k}({args[0]})"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start()
    return code


_POWER_OP_RE = re.compile(r"(?<![\^|&<>=!+*/%~#-])\^(?![\^=])")


def _rewrite_power(seg: str) -> str:
    """PG's exponentiation operator ``a ^ b`` on literal-protected code
    -> ``power(a, b)`` — in Spark ``^`` is bitwise XOR, so the
    passthrough would return garbage SILENTLY (2 ^ 3 = 1, not 8). PG's
    ``^`` binds tighter than every BINARY arithmetic operator and
    left-associates, so rewriting just the adjacent operands preserves
    precedence (``a ^ b ^ c`` = ``power(power(a, b), c)``) — EXCEPT
    unary minus, which binds tighter still: ``-2 ^ 2`` is
    ``power(-2, 2)`` = 4 in PG (r11 ADVICE; DuckDB agrees), so a minus
    in unary position folds into the BASE. A unary-minus exponent is
    folded in. Bitwise XOR is outside the pg dialect (PG spells it
    ``#``)."""
    pos = 0
    while True:
        m = _POWER_OP_RE.search(seg, pos)
        if not m:
            return seg
        left = _operand_before(seg[: m.start()])
        after = seg[m.end():]
        neg = ""
        stripped = after.lstrip()
        off = len(after) - len(stripped)
        if stripped.startswith("-"):
            neg = "-"
            off += 1
            stripped = stripped[1:]
        right = _operand_after(stripped)
        if right is None and stripped.startswith("("):
            j = _close_paren(stripped, 0)
            if j is not None:
                right = (stripped[: j + 1], j + 1)
        if left is None or right is None:
            raise GeoDBError(
                "Unsupported operand shape for ^ (PG exponentiation): "
                "operands must be columns, numbers, function calls, or "
                "parenthesized expressions."
            )
        lhs, lstart = left
        _guard_keyword_operand("^", lhs)
        # PG's unary minus binds tighter than ^: when the '-' before the
        # base sits in unary position (segment start / '(' / ',' / an
        # operator / a keyword), it belongs to the base
        before = seg[:lstart].rstrip()
        if before.endswith("-") and not before.endswith(("--", "#-")):
            b2 = before[:-1].rstrip()
            if (
                not b2
                or b2[-1] in "(,+-*/%<>=^|"
                or re.search(r"[A-Za-z_]\w*$", b2)
                and re.search(r"[A-Za-z_]\w*$", b2).group(0).upper()
                in _SQL_KEYWORDS
            ):
                lstart = len(before) - 1
                lhs = seg[lstart: m.start()].strip()
        rhs, rend_rel = right
        repl = f"power({lhs}, {neg}{rhs})"
        seg = seg[:lstart] + repl + seg[m.end() + off + rend_rel:]
        pos = lstart  # left-associative chains fold onto the result


_OVERLAPS_RE = re.compile(r"\)\s*OVERLAPS\s*\(", re.IGNORECASE)


def _rewrite_overlaps(code: str) -> str:
    """SQL-standard ``(s1, e1) OVERLAPS (s2, e2)`` (the PG temporal
    idiom; Spark's parser rejects it) on literal-protected code -> a
    CASE translation of PG's own algorithm (timestamp_overlaps):
    normalize each pair (swap reversed endpoints; a NULL start adopts
    the non-NULL end and keeps the other side UNKNOWN), then

        starts equal          -> TRUE (NULL if either end is NULL)
        later start < other's end -> TRUE
        otherwise             -> FALSE, degrading to NULL wherever the
                                 deciding endpoint is NULL

    — reversed endpoints swap like PG, shared start points (including
    two equal instants) overlap, an instant at another interval's END
    does not, and NULL endpoints propagate three-valuedly (r11 verdict
    What's-wrong 4: the old least/greatest normalization collapsed a
    NULL endpoint to an instant, so ``NOT (... OVERLAPS ...)`` with a
    NULL endpoint returned TRUE where PG yields NULL and drops the
    row)."""
    pos = 0
    while True:
        m = _OVERLAPS_RE.search(code, pos)
        if not m:
            return code
        # left pair: scan back to the matching open paren
        depth = 0
        for i in range(m.start(), -1, -1):
            if code[i] == ")":
                depth += 1
            elif code[i] == "(":
                depth -= 1
                if depth == 0:
                    break
        else:
            return code  # unbalanced: leave for Spark's parser
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code
        lpair = _split_top_commas_lit(code[i + 1: m.start()])
        rpair = _split_top_commas_lit(code[m.end(): j])
        if len(lpair) != 2 or len(rpair) != 2:
            raise GeoDBError(
                "OVERLAPS: both operands must be (start, end) pairs"
            )
        s1, e1 = (x.strip() for x in lpair)
        s2, e2 = (x.strip() for x in rpair)

        def _norm(s: str, e: str) -> tuple[str, str]:
            # normalized (start, end): swap reversed endpoints; a NULL
            # start adopts the non-NULL end (PG: the pair degenerates to
            # one known point with an UNKNOWN other side)
            ns = (
                f"(CASE WHEN ({s}) IS NULL THEN ({e}) "
                f"WHEN ({e}) IS NOT NULL AND ({s}) > ({e}) THEN ({e}) "
                f"ELSE ({s}) END)"
            )
            ne = (
                f"(CASE WHEN ({s}) IS NULL THEN NULL "
                f"WHEN ({s}) > ({e}) THEN ({s}) ELSE ({e}) END)"
            )
            return ns, ne

        ns1, ne1 = _norm(s1, e1)
        ns2, ne2 = _norm(s2, e2)
        repl = (
            f"(CASE WHEN {ns1} IS NULL OR {ns2} IS NULL THEN NULL "
            f"WHEN {ns1} > {ns2} THEN "
            f"(CASE WHEN {ne2} IS NULL THEN NULL "
            f"WHEN {ns1} < {ne2} THEN TRUE "
            f"WHEN {ne1} IS NULL THEN NULL ELSE FALSE END) "
            f"WHEN {ns1} < {ns2} THEN "
            f"(CASE WHEN {ne1} IS NULL THEN NULL "
            f"WHEN {ns2} < {ne1} THEN TRUE "
            f"WHEN {ne2} IS NULL THEN NULL ELSE FALSE END) "
            f"ELSE (CASE WHEN {ne1} IS NULL OR {ne2} IS NULL THEN NULL "
            f"ELSE TRUE END) END)"
        )
        code = code[:i] + repl + code[j + 1:]
        pos = i + len(repl)


_ANY_ALL_RE = re.compile(
    r"(<=|>=|<>|!=|=|<|>|(?:NOT\s+)?I?LIKE)\s*(ANY|ALL)\s*\(",
    re.IGNORECASE,
)


def _rewrite_any_all(code: str) -> str:
    """PG's quantified comparisons over ARRAYS on literal-protected
    code: ``v op ANY(arr)`` -> ``exists(arr, e -> v op e)`` and
    ``v op ALL(arr)`` -> ``forall(arr, e -> v op e)``, where ``op`` is
    a comparison or ``[NOT] [I]LIKE`` (the multi-pattern idiom
    ``name LIKE ANY(ARRAY['a%', 'b%'])``) — Spark's
    higher-order predicates carry PG's three-valued NULL semantics
    (``1 = ANY(ARRAY[2, NULL])`` is NULL in both). Subquery operands
    (``= ANY(SELECT ...)``) pass through to Spark's parser (spell them
    ``IN (SELECT ...)``); the bare aggregate ``any(flag)`` never
    matches — the rewrite requires a preceding comparison operator."""
    pos = 0
    while True:
        m = _ANY_ALL_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        arg = code[m.end(): j].strip()
        if re.match(r"SELECT\b", arg, re.IGNORECASE):
            pos = j + 1
            continue
        left = _operand_before(code[: m.start()])
        if left is None:
            raise GeoDBError(
                f"{m.group(2).upper()}(...): the compared operand must "
                "be a column, function call, or parenthesized expression"
            )
        lhs, lstart = left
        _guard_keyword_operand(m.group(2).upper(), lhs)
        # a '-' before the operand in unary position belongs to the
        # operand ('-3 = ANY(..)' compares -3, not a stranded negation
        # of the emitted exists() — same fold as the ^ rewrite)
        before = code[:lstart].rstrip()
        if before.endswith("-") and not before.endswith(("--", "#-")):
            b2 = before[:-1].rstrip()
            if (
                not b2
                or b2[-1] in "(,+-*/%<>=^|"
                or re.search(r"[A-Za-z_]\w*$", b2)
                and re.search(r"[A-Za-z_]\w*$", b2).group(0).upper()
                in _SQL_KEYWORDS
            ):
                lstart = len(before) - 1
                lhs = code[lstart: m.start()].strip()
        fn = "exists" if m.group(2).upper() == "ANY" else "forall"
        op = m.group(1)
        repl = f"{fn}({arg}, __geodb_e -> {lhs} {op} __geodb_e)"
        code = code[:lstart] + repl + code[j + 1:]
        pos = lstart + len(repl)


_BBOX_OP_RE = re.compile(r"&&")


def _rewrite_bbox_overlap(seg: str) -> str:
    """PostGIS ``a && b`` (bounding boxes intersect — THE index operator
    every PostGIS WHERE clause uses; reference passthrough admits it,
    geodb.sql:1147-1167) on literal-protected code ->
    ``st_intersects(st_envelope(a), st_envelope(b))``, the exact
    envelope-overlap semantics. The engine's planner additionally
    rewrites envelope predicates against PERSISTED envelope columns at
    the collection-scan layer (operators/spatial.py), so this textual
    form is the general-expression fallback. PG's ARRAY ``&&``
    (overlap) is outside the shim: geometry semantics win in a geo
    engine, and an array operand fails loudly at analysis (st_envelope
    rejects arrays) — use ``arrays_overlap(a, b)`` directly.
    Compound operands refuse like the other operator rewrites."""
    while True:
        m = _BBOX_OP_RE.search(seg)
        if not m:
            return seg
        left = _operand_before(seg[: m.start()])
        right = _operand_after(seg[m.end():])
        if left is None or right is None:
            raise GeoDBError(
                "Unsupported operand shape for &&: operands must be "
                "geometry columns, function calls, or geometry literals."
            )
        lhs, lstart = left
        rhs, rend_rel = right
        _guard_keyword_operand("&&", lhs)
        prefix = seg[:lstart].rstrip()
        if prefix and prefix[-1] in "|&+-*/%^":
            raise GeoDBError(
                "Unsupported operand shape for &&: the left operand is "
                f"a compound expression (... {prefix[-1]} {lhs}). "
                "Parenthesize the operand."
            )
        suffix = seg[m.end() + rend_rel:].lstrip()
        if suffix and suffix[0] in "|&+-*/%^":
            raise GeoDBError(
                "Unsupported operand shape for &&: the right operand is "
                f"a compound expression ({rhs} {suffix[0]} ...). "
                "Parenthesize the operand."
            )
        repl = f"st_intersects(st_envelope({lhs}), st_envelope({rhs}))"
        seg = seg[:lstart] + repl + seg[m.end() + rend_rel:]


_JSONB_EXISTS_RE = re.compile(r"\?[|&]?")
_JSONB_ALIAS_RE = re.compile(
    r"\bjsonb_(array_length|object_keys)\b", re.IGNORECASE
)
# pure name aliases: PG spellings of functions Spark ships under
# slightly different names (same argument order and semantics)
_NAME_ALIAS_RE = re.compile(r"\bstarts_with\s*\(", re.IGNORECASE)


def _rewrite_jsonb_exists(seg: str) -> str:
    """PG jsonb key-existence operators on literal-protected code:

    - ``j ? 'k'``  -> ``array_contains(json_object_keys(j), 'k')``
    - ``j ?| array('a','b')`` -> ``arrays_overlap(json_object_keys(j),
      ...)``
    - ``j ?& array('a','b')`` -> ``size(array_except(...,
      json_object_keys(j))) = 0``

    json_object_keys returns NULL for non-objects, so the predicates are
    NULL there (DOCUMENTED DEVIATION: PG's ``?`` on a jsonb ARRAY tests
    string-element membership; use array_contains on the parsed array
    for that). ``ARRAY[...]`` right operands were already rewritten to
    ``array(...)`` by the time this runs."""
    while True:
        m = _JSONB_EXISTS_RE.search(seg)
        if not m:
            return seg
        op = m.group(0)
        left = _operand_before(seg[: m.start()])
        right = _operand_after(seg[m.end():])
        if left is None or right is None:
            raise GeoDBError(
                f"Unsupported operand shape for {op}: operands must be "
                "a json column/expression and a string literal or "
                "ARRAY[...] of keys."
            )
        lhs, lstart = left
        rhs, rend_rel = right
        _guard_keyword_operand(op, lhs)
        keys = f"json_object_keys({lhs})"
        if op == "?":
            repl = f"array_contains({keys}, {rhs})"
        elif op == "?|":
            repl = f"arrays_overlap({keys}, {rhs})"
        else:
            repl = f"size(array_except({rhs}, {keys})) = 0"
        seg = seg[:lstart] + repl + seg[m.end() + rend_rel:]


_TSMATCH_OP_RE = re.compile(r"(?<!@)@@(?!@)")


def _rewrite_tsmatch(seg: str) -> str:
    """PG's text-search match operator ``vec @@ query`` on
    literal-protected code -> ``ts_match_all(vec, query)`` — the
    dialect's function spelling of the operator (functions/textsql.py;
    plainto_tsquery ANDs its words, exactly ts_match_all). Compound
    operands refuse like the other operator rewrites."""
    while True:
        m = _TSMATCH_OP_RE.search(seg)
        if not m:
            return seg
        left = _operand_before(seg[: m.start()])
        right = _operand_after(seg[m.end():])
        if left is None or right is None:
            raise GeoDBError(
                "Unsupported operand shape for @@: operands must be "
                "to_tsvector()/plainto_tsquery() calls or columns."
            )
        lhs, lstart = left
        rhs, rend_rel = right
        _guard_keyword_operand("@@", lhs)
        repl = f"ts_match_all({lhs}, {rhs})"
        seg = seg[:lstart] + repl + seg[m.end() + rend_rel:]


_TO_CHAR_RE = re.compile(r"\bto_char\s*\(", re.IGNORECASE)
_STR_TO_ARR_RE = re.compile(r"\bstring_to_array\s*\(", re.IGNORECASE)
_ARRAY_FN_RE = re.compile(
    r"\b(array_length|array_upper|array_cat|array_to_string"
    r"|array_position|array_prepend|array_replace|strpos"
    r"|log|ltrim|rtrim|to_hex|regexp_match|format"
    r"|jsonb?_typeof|initcap)\s*\(",
    re.IGNORECASE,
)


def _count_capture_groups(pat: str) -> int:
    """Capturing groups in a POSIX/Java regex literal: unescaped ``(``
    outside bracket expressions, excluding ``(?...`` extension groups
    (PG's ARE has no named captures, so every ``(?`` is non-capturing
    here)."""
    n, i, in_br = 0, 0, False
    while i < len(pat):
        ch = pat[i]
        if ch == "\\":
            i += 2
            continue
        if in_br:
            if ch == "]":
                in_br = False
        elif ch == "[":
            in_br = True
        elif ch == "(" and pat[i + 1: i + 2] != "?":
            n += 1
        i += 1
    return n


def _rewrite_array_funcs(code: str, lits: list[str]) -> str:
    """PG array/string/numeric scalars Spark spells differently:

    - ``array_length(a, 1)`` / ``array_upper(a, 1)`` ->
      ``nullif(size(a), 0)`` — PG returns NULL (not 0) for an empty
      array; only dimension 1 is supported (Spark arrays are 1-D),
      other dimensions refuse
    - ``array_cat(a, b)`` -> ``concat(a, b)``
    - ``strpos(s, sub)`` -> ``locate(sub, s)`` (1-based, 0 = not found
      in both)
    - ``log(x)`` -> ``log10(x)`` (r12 probe: PG's single-arg log is
      BASE 10, Spark's is the natural log — silent wrong value);
      two-arg ``log(b, x)`` agrees and passes through
    - 2-arg ``ltrim``/``rtrim(s, chars)`` -> ``trim(LEADING/TRAILING
      chars FROM s)`` (r12 probe: Spark's 2-arg spelling reverses the
      arguments — trimStr first — so the passthrough silently trims
      the wrong operand); 1-arg forms pass through; ``btrim`` already
      agrees
    - ``to_hex(n)`` -> ``lower(hex(n))`` (PG lowercases). DOCUMENTED
      DEVIATION: negative values render 64-bit two's-complement (PG's
      int4 overload gives 8 hex digits)
    - ``regexp_match(s, pat[, flags])`` (literal pattern) -> NULL-when-
      no-match array of capture-group extracts (whole match when the
      pattern has no groups), 'i' flag folds as (?i). DOCUMENTED
      DEVIATION: a non-participating group yields NULL via
      nullif(.., ''), so a group that MATCHES the empty string is also
      NULL where PG keeps ''
    """
    pos = 0
    while True:
        m = _ARRAY_FN_RE.search(code, pos)
        if not m:
            return code
        fname = m.group(1).lower()
        skip = 0  # emitted prefix that would re-match the name regex
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args_s = code[m.end(): j]
        args, depth2, start = [], 0, 0
        for ci, ch in enumerate(args_s):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                args.append(args_s[start:ci].strip())
                start = ci + 1
        args.append(args_s[start:].strip())
        if fname in ("array_length", "array_upper"):
            if len(args) != 2 or args[1] != "1":
                raise GeoDBError(
                    f"{fname}(arr, dim): only dimension 1 is supported "
                    "(Spark arrays are one-dimensional)"
                )
            repl = f"nullif(size({args[0]}), 0)"
        elif fname == "array_cat":
            if len(args) != 2:
                raise GeoDBError("array_cat(a, b): 2 arguments expected")
            repl = f"concat({args[0]}, {args[1]})"
        elif fname == "array_to_string":
            # Spark's array_join shares PG's arg order AND its 2-arg
            # skip-NULL / 3-arg replace-NULL semantics
            if len(args) not in (2, 3):
                raise GeoDBError(
                    "array_to_string(arr, sep[, null_string]): "
                    "2 or 3 arguments"
                )
            repl = f"array_join({args_s})"
        elif fname == "array_position":
            # r12 probe: PG returns NULL when the element is absent;
            # Spark returns 0
            if len(args) != 2:
                raise GeoDBError(
                    "array_position(arr, elem): 2 arguments expected "
                    "(the 3-argument start-offset form is unsupported)"
                )
            repl = f"nullif(array_position({args_s}), 0)"
            skip = len("nullif(array_position(")
        elif fname == "array_prepend":
            # r12 probe: PG is (elem, arr), Spark is (arr, elem)
            if len(args) != 2:
                raise GeoDBError(
                    "array_prepend(elem, arr): 2 arguments expected"
                )
            repl = f"array_prepend({args[1]}, {args[0]})"
            skip = len("array_prepend(")
        elif fname == "array_replace":
            # Spark has no builtin; PG replaces every occurrence,
            # NULL-safely -> null-safe-equality transform
            if len(args) != 3:
                raise GeoDBError(
                    "array_replace(arr, from, to): 3 arguments expected"
                )
            repl = (
                f"transform({args[0]}, x_ -> CASE WHEN x_ <=> "
                f"({args[1]}) THEN ({args[2]}) ELSE x_ END)"
            )
        elif fname == "log":
            if len(args) == 1:
                repl = f"log10({args[0]})"
            else:
                pos = m.end()  # log(b, x): Spark agrees, passthrough
                continue
        elif fname in ("ltrim", "rtrim"):
            if len(args) == 1:
                pos = m.end()
                continue
            if len(args) != 2:
                raise GeoDBError(f"{fname}(s[, chars]): 1 or 2 arguments")
            side = "LEADING" if fname == "ltrim" else "TRAILING"
            repl = f"trim({side} {args[1]} FROM {args[0]})"
        elif fname == "to_hex":
            if len(args) != 1:
                raise GeoDBError("to_hex(n): 1 argument expected")
            repl = f"lower(hex({args[0]}))"
        elif fname == "regexp_match":
            if len(args) not in (2, 3):
                raise GeoDBError(
                    "regexp_match(s, pattern[, flags]): 2 or 3 arguments"
                )
            pm = re.fullmatch(r"__GEODB_LIT_(\d+)__", args[1])
            if pm is None:
                raise GeoDBError(
                    "regexp_match: the pattern must be a string literal"
                )
            pidx = int(pm.group(1))
            if len(args) == 3:
                fm = re.fullmatch(r"__GEODB_LIT_(\d+)__", args[2])
                fv = (
                    lits[int(fm.group(1))][1:-1].replace("''", "'")
                    if fm else None
                )
                if fv != "i":
                    raise GeoDBError(
                        "regexp_match: only the 'i' flag is supported "
                        "('g' means regexp_matches in PG)"
                    )
                lits[pidx] = "'(?i)" + lits[pidx][1:]
            ptext = lits[pidx][1:-1].replace("''", "'")
            ng = _count_capture_groups(ptext)
            sp, pat = f"({args[0]})", args[1]
            if ng == 0:
                arr = f"array(regexp_extract({sp}, {pat}, 0))"
            else:
                arr = "array(" + ", ".join(
                    f"nullif(regexp_extract({sp}, {pat}, {g}), '')"
                    for g in range(1, ng + 1)
                ) + ")"
            repl = f"CASE WHEN {sp} RLIKE {pat} THEN {arr} END"
        elif fname == "format":
            # PG format(): %s with NULL -> '' and %% only (the %I/%L
            # quoting helpers build SQL, not data). Spark has no format
            # and Java's format_string renders NULL as 'null'
            tm = re.fullmatch(r"__GEODB_LIT_(\d+)__", args[0])
            if tm is None:
                raise GeoDBError(
                    "format: the template must be a string literal"
                )
            t = lits[int(tm.group(1))][1:-1].replace("''", "'")
            vals = [a.strip() for a in args[1:]]
            pieces: list[str] = []
            buf2: list[str] = []
            i2 = argi = 0

            def _flush() -> None:
                if buf2:
                    lits.append(
                        "'" + "".join(buf2).replace("'", "''") + "'"
                    )
                    pieces.append(f"__GEODB_LIT_{len(lits) - 1}__")
                    buf2.clear()

            while i2 < len(t):
                ch = t[i2]
                if ch != "%":
                    buf2.append(ch)
                    i2 += 1
                    continue
                nxt = t[i2 + 1: i2 + 2]
                if nxt == "%":
                    buf2.append("%")
                    i2 += 2
                    continue
                pm2 = re.match(r"(\d+)\$s", t[i2 + 1:])
                if pm2:
                    k2 = int(pm2.group(1)) - 1
                    i2 += 1 + pm2.end()
                elif nxt == "s":
                    k2 = argi
                    argi += 1
                    i2 += 2
                else:
                    raise GeoDBError(
                        f"format: unsupported specifier %{nxt or ''} "
                        "(supported: %s, %n$s, %% — the %I/%L quoting "
                        "helpers build SQL text, outside the dialect)"
                    )
                if not 0 <= k2 < len(vals):
                    raise GeoDBError(
                        "format: too few arguments for the template"
                    )
                _flush()
                pieces.append(
                    f"coalesce(CAST(({vals[k2]}) AS STRING), '')"
                )
            _flush()
            repl = (
                "concat(" + ", ".join(pieces) + ")" if len(pieces) > 1
                else (pieces[0] if pieces else "''")
            )
        elif fname == "initcap":
            # r12 probe: PG capitalizes after ANY non-alphanumeric
            # ('hello-world' -> 'Hello-World'); Spark's builtin splits
            # on whitespace only -> 'Hello-world'. Zero-width split on
            # the ASCII word boundary, capitalize each piece.
            # DOCUMENTED DEVIATION: the boundary class is ASCII — a
            # multibyte letter acts as a separator where a UTF-8 PG
            # locale keeps it inside the word
            if len(args) != 1:
                raise GeoDBError("initcap(s): 1 argument expected")
            repl = (
                f"array_join(transform(split({args[0]}, "
                "'(?<=[^a-zA-Z0-9])'), w_ -> concat(upper(left(w_, 1)), "
                "lower(substring(w_, 2)))), '')"
            )
        elif fname in ("json_typeof", "jsonb_typeof"):
            # PG type tag from the json TEXT's first significant char
            # (the engine's json values are text; malformed input that
            # PG would reject reads as 'number' — same malformed-json
            # boundary as the jsonb kernels)
            if len(args) != 1:
                raise GeoDBError(f"{fname}(json): 1 argument expected")
            a0 = f"({args[0]})"
            repl = (
                f"CASE substr(ltrim(CAST({a0} AS STRING)), 1, 1) "
                "WHEN '{' THEN 'object' WHEN '[' THEN 'array' "
                "WHEN '\"' THEN 'string' WHEN 't' THEN 'boolean' "
                "WHEN 'f' THEN 'boolean' WHEN 'n' THEN 'null' "
                f"ELSE CASE WHEN {a0} IS NULL THEN NULL "
                "ELSE 'number' END END"
            )
        else:  # strpos
            if len(args) != 2:
                raise GeoDBError("strpos(s, sub): 2 arguments expected")
            repl = f"locate({args[1]}, {args[0]})"
        code = code[: m.start()] + repl + code[j + 1:]
        # rescan from the replacement for nested calls in the args
        # (array_cat(array_cat(..))), skipping any emitted name that
        # would itself re-match (nullif(array_position(...), 0))
        pos = m.start() + skip


_EXTRACT_EPOCH_RE = re.compile(
    r"\bextract\s*\(\s*epoch\s+from\b", re.IGNORECASE
)
# dow/isodow numbering differs SILENTLY between PG and Spark: PG dow is
# 0-6 with Sunday=0, Spark's DOW/DAYOFWEEK is 1-7 with Sunday=1 (and
# Spark has no isodow at all) — the passthrough would be off by one
_EXTRACT_DOW_RE = re.compile(
    r"\bextract\s*\(\s*(dow|isodow|isoyear|century|decade|millennium"
    r"|milliseconds|microseconds)\s+from\b",
    re.IGNORECASE,
)
_JSON_BUILD_RE = re.compile(
    r"\b(?:json_build_object|jsonb_build_object)\s*\(", re.IGNORECASE
)
_JSON_ELEMS_RE = re.compile(
    r"\b(?:jsonb?_array_elements_text)\s*\(", re.IGNORECASE
)
_DATE_BIN_RE = re.compile(r"\bdate_bin\s*\(", re.IGNORECASE)
_INTERVAL_SECONDS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _rewrite_date_bin(code: str, lits: list[str]) -> str:
    """PG 14 ``date_bin(stride, source, origin)`` — the timeseries
    bucketing idiom — on literal-protected code. Stride must be a
    fixed-length ``INTERVAL`` literal (micros..weeks; months/years have
    variable length and refuse like PG) and origin a ``TIMESTAMP``
    literal; the rewrite is closed-form epoch arithmetic that stays in
    whole-stage codegen:

        timestamp_seconds(floor((epoch(src) - O) / S) * S + O)

    with O/S folded to double literals at rewrite time. Bins extend
    toward -infinity for sources before the origin, exactly PG (and
    DuckDB's time_bucket, the oracle's spelling)."""
    pos = 0
    while True:
        m = _DATE_BIN_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args_s = code[m.end(): j]
        args, depth2, start = [], 0, 0
        for ci, ch in enumerate(args_s):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                args.append(args_s[start:ci].strip())
                start = ci + 1
        args.append(args_s[start:].strip())
        if len(args) != 3:
            raise GeoDBError(
                "date_bin(stride, source, origin): 3 arguments expected"
            )
        sm = re.fullmatch(
            r"INTERVAL\s+(__GEODB_LIT_(\d+)__)", args[0], re.IGNORECASE
        )
        if sm is None:
            raise GeoDBError(
                "date_bin: stride must be an INTERVAL '<n> <unit>' "
                "literal"
            )
        sval = lits[int(sm.group(2))][1:-1].strip()
        im = re.fullmatch(
            r"(\d+(?:\.\d+)?)\s*"
            r"(microsecond|millisecond|second|minute|hour|day|week)s?",
            sval, re.IGNORECASE,
        )
        if im is None:
            raise GeoDBError(
                f"date_bin: unsupported stride {sval!r} (fixed-length "
                "units only — months/years vary in length, exactly PG's "
                "restriction)"
            )
        stride_s = float(im.group(1)) * _INTERVAL_SECONDS[im.group(2).lower()]
        if stride_s <= 0:
            raise GeoDBError("date_bin: stride must be positive")
        om = re.fullmatch(
            r"TIMESTAMP\s+(__GEODB_LIT_(\d+)__)", args[2], re.IGNORECASE
        )
        if om is None:
            raise GeoDBError(
                "date_bin: origin must be a TIMESTAMP '...' literal"
            )
        oval = lits[int(om.group(2))][1:-1].strip()
        from datetime import datetime, timezone

        try:
            odt = datetime.fromisoformat(oval)
        except ValueError as exc:
            raise GeoDBError(f"date_bin: bad origin {oval!r}") from exc
        origin_s = odt.replace(tzinfo=timezone.utc).timestamp()
        src = args[1]
        repl = (
            f"timestamp_seconds(floor((CAST(CAST({src} AS TIMESTAMP) "
            f"AS DOUBLE) - {origin_s!r}) / {stride_s!r}) * {stride_s!r} "
            f"+ {origin_s!r})"
        )
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _rewrite_json_array_elements(code: str, lits: list[str]) -> str:
    """PG ``json_array_elements_text(j)`` / ``jsonb_array_elements_text``
    in SELECT position -> ``explode(from_json(j, 'array<string>'))`` —
    one row per array element as text; scalar elements unquote and
    object/array elements stringify to their json text, both exactly
    PG's _text semantics (Spark's array<string> coercion). Same
    one-generator-per-select restriction as ``unnest``. The json-TYPED
    ``json_array_elements`` stays outside the shim — extract with
    ``-> n`` chains or a typed from_json directly."""
    pos = 0
    while True:
        m = _JSON_ELEMS_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        lits.append("'array<string>'")
        ph = f"__GEODB_LIT_{len(lits) - 1}__"
        repl = f"explode(from_json({code[m.end(): j]}, {ph}))"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _strip_outer_parens(expr: str) -> str:
    """Remove balanced all-enclosing parens: '((a - b))' -> 'a - b'."""
    expr = expr.strip()
    while expr.startswith("(") and expr.endswith(")"):
        depth = 0
        for k, ch in enumerate(expr):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and k != len(expr) - 1:
                    return expr  # first paren closes early: not enclosing
        expr = expr[1:-1].strip()
    return expr


def _top_level_binary_minuses(expr: str) -> list[int]:
    """Positions of binary ``-`` at paren depth 0 (unary minuses and the
    ``->``/``->>``/``#-`` operator spellings excluded)."""
    out, depth = [], 0
    for k, ch in enumerate(expr):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "-" and depth == 0 and k > 0:
            if k + 1 < len(expr) and expr[k + 1] in ">-":
                continue  # -> / ->> json arrows, -- comment
            if expr[k - 1] in "#<>!=+-*/%^|":
                continue  # #- operator / compound-operator tail
            prev = expr[:k].rstrip()
            if not prev or prev[-1] in "(,+*/%<>=^|":
                continue  # unary position
            out.append(k)
    return out


def _rewrite_extract_epoch(code: str) -> str:
    """PG ``extract(epoch from x)`` ->
    ``CAST(CAST((x) AS TIMESTAMP) AS DOUBLE)`` — Spark's EXTRACT has no
    epoch field, but its timestamp->double cast IS epoch seconds with
    fractional microseconds, exactly PG's semantics (the inner cast
    lifts TIMESTAMP_NTZ parquet columns, interpreted in the session's
    pinned UTC — the same naive-is-UTC rule PG and DuckDB apply).
    Other extract fields pass through (Spark runs them natively).

    The canonical PG duration idiom ``extract(epoch from t2 - t1)``
    yields an INTERVAL operand, which no timestamp cast can lift
    (r11 verdict What's-wrong 3): when the operand is provably a single
    difference ``a - b`` (and the rhs is not an INTERVAL literal or bare
    number, where ``-`` returns a timestamp/date again), emit the
    epoch-seconds difference ``epoch(a) - epoch(b)`` instead. Operands
    with several top-level minuses (interval arithmetic chains) refuse
    loudly naming the supported shapes."""
    pos = 0
    while True:
        m = _EXTRACT_EPOCH_RE.search(code, pos)
        if not m:
            return code
        depth = 1  # extract's own open paren is inside the match
        for j in range(m.end(), len(code)):
            if code[j] == "(":
                depth += 1
            elif code[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        else:
            return code  # unbalanced: leave for Spark's parser
        repl = _epoch_of_operand(code[m.end(): j])
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _epoch_of_operand(raw: str) -> str:
    """Epoch-seconds form of an extract/date_part operand, handling the
    provable-difference INTERVAL idiom (see _rewrite_extract_epoch)."""
    expr = _strip_outer_parens(raw)
    minuses = _top_level_binary_minuses(expr)
    if len(minuses) > 1:
        raise GeoDBError(
            "extract(epoch from ...): supported operand shapes are a "
            "timestamp/date expression or a single difference t2 - t1 "
            "— parenthesize or pre-compute interval arithmetic chains"
        )
    if len(minuses) == 1:
        lhs = expr[: minuses[0]].strip()
        rhs = expr[minuses[0] + 1:].strip()
        if _leading_keyword(lhs) == "INTERVAL":
            raise GeoDBError(
                "extract(epoch from ...): INTERVAL-valued operands are "
                "supported only as a single difference t2 - t1 of "
                "timestamp/date expressions"
            )
        ts_minus_scalar = (
            _leading_keyword(rhs) == "INTERVAL"  # ts - INTERVAL -> ts
            or re.fullmatch(r"[0-9.]+", rhs)  # date - n -> date
        )
        if not ts_minus_scalar:
            return f"({_epoch_expr(lhs)} - {_epoch_expr(rhs)})"
    return f"CAST(CAST(({expr}) AS TIMESTAMP) AS DOUBLE)"


def _leading_keyword(expr: str) -> str:
    """The first identifier-shaped token of ``expr``, uppercased ('' if
    the expression starts with something else)."""
    m = re.match(r"\s*([A-Za-z_]\w*)", expr)
    return m.group(1).upper() if m else ""


_TO_JSONB_RE = re.compile(r"\b(?:to_jsonb|row_to_json)\s*\(", re.IGNORECASE)
_DATE_PART_EPOCH_RE = re.compile(
    r"\bdate_part\s*\(\s*(__GEODB_LIT_(\d+)__)\s*,", re.IGNORECASE
)
_AT_TZ_RE = re.compile(
    r"\s+AT\s+TIME\s+ZONE\s+(__GEODB_LIT_(\d+)__)", re.IGNORECASE
)
_AT_TZ_ANY_RE = re.compile(r"\bAT\s+TIME\s+ZONE\b", re.IGNORECASE)


def _epoch_expr(expr: str) -> str:
    """The engine's epoch-seconds form (see _rewrite_extract_epoch)."""
    return f"CAST(CAST(({expr}) AS TIMESTAMP) AS DOUBLE)"


def _rewrite_to_jsonb(code: str) -> str:
    """PG ``to_jsonb(t)`` / ``row_to_json(t)`` over a ROW (table/alias)
    reference — the reference packages rows this way
    (/root/reference/xcube_geodb/sql/geodb.sql:1804-1830) ->
    ``to_json(struct(t.*))``. Only the bare-identifier (row) form
    rewrites; a scalar argument refuses loudly (Spark's to_json takes
    containers only — use CAST or json_build_object for scalars)."""
    pos = 0
    while True:
        m = _TO_JSONB_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        arg = code[m.end(): j].strip()
        if _LIT_PLACEHOLDER_RE.fullmatch(arg) or not re.fullmatch(
            r"[A-Za-z_]\w*", arg
        ):
            raise GeoDBError(
                "to_jsonb/row_to_json: only a row reference (bare table "
                "or alias identifier) is supported — for scalars use "
                "CAST(x AS string) or json_build_object('k', x)"
            )
        repl = f"to_json(struct({arg}.*))"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _dow_expr(field: str, expr: str) -> str:
    """PG numbering for the extract fields Spark lacks or numbers
    differently: ``dow`` = 0-6 with Sunday=0 (Spark's dayofweek is
    Sunday=1); ``isodow`` = 1-7 with Monday=1 (Spark's weekday is
    Monday=0); ``isoyear`` -> Spark's YEAROFWEEK; ``century``/
    ``decade``/``millennium`` -> the PG year buckets (CE dates — the
    engine's date domain starts at 0001-01-01)."""
    if field == "dow":
        return f"(dayofweek({expr}) - 1)"
    if field == "isodow":
        return f"(weekday({expr}) + 1)"
    if field == "isoyear":
        return f"extract(YEAROFWEEK FROM {expr})"
    if field == "century":
        return f"((year({expr}) + 99) DIV 100)"
    if field == "decade":
        return f"(year({expr}) DIV 10)"
    if field == "milliseconds":
        # PG: the seconds field INCLUDING fraction, in milliseconds
        return f"(extract(SECOND FROM {expr}) * 1000)"
    if field == "microseconds":
        return (
            f"CAST(extract(SECOND FROM {expr}) * 1000000 AS BIGINT)"
        )
    return f"((year({expr}) + 999) DIV 1000)"  # millennium


def _rewrite_date_part_epoch(code: str, lits: list[str]) -> str:
    """PG ``date_part('epoch'|'dow'|'isodow', x)`` — the function
    spellings of the extract fields Spark lacks or numbers differently
    (r10 verdict order 4; r11 dow/isodow: PG's dow is Sunday=0 where
    Spark's DOW extract is Sunday=1 — a SILENT off-by-one through the
    passthrough). Other fields pass through (Spark runs date_part
    natively)."""
    pos = 0
    while True:
        m = _DATE_PART_EPOCH_RE.search(code, pos)
        if not m:
            return code
        field = lits[int(m.group(2))][1:-1].strip().lower()
        if field not in (
            "epoch", "dow", "isodow", "isoyear", "century", "decade",
            "millennium", "milliseconds", "microseconds",
        ):
            pos = m.end()
            continue
        open_idx = code.index("(", m.start())
        j = _close_paren(code, open_idx)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        expr = code[m.end(): j].strip()
        if field == "epoch":
            repl = _epoch_of_operand(expr)
        else:
            repl = _dow_expr(field, expr)
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _rewrite_extract_dow(code: str) -> str:
    """PG ``extract(dow|isodow from x)`` -> the PG-numbered weekday
    expressions (see _dow_expr) — Spark's own ``extract(DOW ...)``
    returns Sunday=1 where PG returns Sunday=0, and isodow does not
    exist in Spark; both would otherwise ship wrong-by-one silently."""
    pos = 0
    while True:
        m = _EXTRACT_DOW_RE.search(code, pos)
        if not m:
            return code
        depth = 1  # extract's open paren is inside the match
        for j in range(m.end(), len(code)):
            if code[j] == "(":
                depth += 1
            elif code[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        else:
            return code  # unbalanced: leave for Spark's parser
        expr = code[m.end(): j].strip()
        repl = _dow_expr(m.group(1).lower(), expr)
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _rewrite_at_time_zone(code: str, lits: list[str]) -> str:
    """PG ``expr AT TIME ZONE 'zone'`` (literal zones only) on
    literal-protected code. The engine's timestamps are NAIVE (parquet
    TIMESTAMP in the session's pinned UTC), so the PG semantics are:

    - first application — interpret the naive timestamp as ``zone``
      wall time, yielding the UTC instant: ``to_utc_timestamp(expr,
      zone)``
    - applied to a previous AT TIME ZONE result (a timestamptz in PG) —
      convert the instant to ``zone``-local naive time:
      ``from_utc_timestamp(expr, zone)``

    which makes the chained ``ts AT TIME ZONE 'a' AT TIME ZONE 'b'``
    wall-time translation exact. A non-literal zone expression refuses
    loudly (the zone drives the rewrite choice at compile time)."""
    pos = 0
    while True:
        m = _AT_TZ_RE.search(code, pos)
        if not m:
            break
        left = _operand_before(code[: m.start() + 1])
        if left is None:
            raise GeoDBError(
                "AT TIME ZONE: the timestamp operand must be a column, "
                "function call, or parenthesized expression"
            )
        lhs, lstart = left
        if lhs.upper() in _SQL_KEYWORDS:
            raise GeoDBError(
                "AT TIME ZONE: parenthesize the timestamp operand"
            )
        # the "previous AT TIME ZONE result" test must see through
        # balanced parens: "(ts AT TIME ZONE 'a') AT TIME ZONE 'b'" has
        # lhs "(to_utc_timestamp(ts, 'a'))" (r11 ADVICE — the bare prefix
        # check re-interpreted instead of converting, shifting timestamps)
        fn = (
            "from_utc_timestamp"
            if re.match(
                r"to_utc_timestamp\s*\(",
                _strip_outer_parens(lhs),
                re.IGNORECASE,
            )
            else "to_utc_timestamp"
        )
        repl = f"{fn}({lhs}, {m.group(1)})"
        code = code[:lstart] + repl + code[m.end():]
        pos = lstart  # chained zones re-scan from the rewritten operand
    if _AT_TZ_ANY_RE.search(code):
        raise GeoDBError(
            "AT TIME ZONE: the zone must be a string literal "
            "('UTC', 'Europe/Berlin', ...)"
        )
    return code


def _rewrite_json_build(code: str) -> str:
    """PG ``json_build_object(k1, v1, ...)`` / ``jsonb_build_object`` ->
    ``to_json(named_struct(k1, v1, ...))`` — keys must be string
    literals (named_struct's foldable-key requirement; PG's
    expression-key form fails loudly at analysis). Key order is
    preserved like PG's json_build_object; spacing is compact (the
    jsonb form; documented deviation from json_build_object's ', ')."""
    pos = 0
    while True:
        m = _JSON_BUILD_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        repl = f"to_json(named_struct({code[m.end(): j]}))"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)

# PG to_char template patterns -> Spark date_format (SimpleDateFormat).
# NAME tokens carry a case class: PG renders 'MON' -> 'JAN', 'Mon' ->
# 'Jan', 'mon' -> 'jan' while SimpleDateFormat always emits title case —
# _to_char_format reports the template's uniform case so the caller can
# wrap the whole date_format in upper()/lower() (safe: every other
# emitted character is a digit or punctuation separator).
_TO_CHAR_TOKENS = [
    ("YYYY", "yyyy"), ("YYY", "yyy"), ("YY", "yy"),
    ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"),
    ("MI", "mm"), ("SS", "ss"), ("MS", "SSS"),
    ("MM", "MM"), ("DDD", "DDD"), ("DD", "dd"),
    ("TZ", "zz"), ("Q", "Q"), ("WW", "ww"), ("J", None), ("IYYY", None),
    # PG's digit tokens are case-insensitive ('yyyy-mm-dd' is everyday
    # PG); name tokens stay case-SENSITIVE (casing drives rendering)
    ("yyyy", "yyyy"), ("yyy", "yyy"), ("yy", "yy"),
    ("hh24", "HH"), ("hh12", "hh"), ("hh", "hh"),
    ("mi", "mm"), ("ss", "ss"), ("ms", "SSS"),
    ("mm", "MM"), ("ddd", "DDD"), ("dd", "dd"),
    ("tz", "zz"), ("q", "Q"), ("ww", "ww"),
]
_TO_CHAR_NAME_TOKENS = {
    "MONTH": ("MMMM", "upper"), "Month": ("MMMM", "title"),
    "month": ("MMMM", "lower"),
    "MON": ("MMM", "upper"), "Mon": ("MMM", "title"),
    "mon": ("MMM", "lower"),
    "DAY": ("EEEE", "upper"), "Day": ("EEEE", "title"),
    "day": ("EEEE", "lower"),
    "DY": ("EEE", "upper"), "Dy": ("EEE", "title"), "dy": ("EEE", "lower"),
    "AM": ("a", "upper"), "PM": ("a", "upper"),
    "am": ("a", "lower"), "pm": ("a", "lower"),
}


def _to_char_format(fmt: str) -> tuple[str, str | None]:
    """PG to_char template -> (SimpleDateFormat, case_wrap) with
    longest-token-first matching; non-alphanumeric separators pass
    through; unknown alpha tokens refuse loudly rather than silently
    emit wrong text. ``case_wrap`` is ``'upper'``/``'lower'`` when the
    template's NAME tokens (MON/Day/am...) are uniformly that case —
    PG's exact rendering, applied by the caller over the whole result —
    or None for title-cased / name-free / mixed-case templates
    (DOCUMENTED DEVIATION: a mixed-case template like 'MON dy' keeps
    SimpleDateFormat's title case)."""
    out, i = [], 0
    cases: set[str] = set()
    toks = sorted(
        [(pg, sp, None) for pg, sp in _TO_CHAR_TOKENS]
        + [
            (pg, sp, case)
            for pg, (sp, case) in _TO_CHAR_NAME_TOKENS.items()
        ],
        key=lambda t: -len(t[0]),
    )
    while i < len(fmt):
        ch = fmt[i]
        if not ch.isalpha():
            if ch == "'":
                out.append("''")  # SimpleDateFormat literal-quote escape
            elif ch.isdigit():
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            i += 1
            continue
        for pg, sp, case in toks:
            if fmt.startswith(pg, i):
                if sp is None:
                    raise GeoDBError(
                        f"to_char: template token {pg!r} is outside the "
                        "pg dialect shim (SURVEY.md §7)"
                    )
                out.append(sp)
                if case is not None:
                    cases.add(case)
                i += len(pg)
                break
        else:
            raise GeoDBError(
                f"to_char: unrecognized template at {fmt[i:]!r} "
                "(supported: YYYY/MM/DD/HH24/HH12/MI/SS/MS/MON/DY/Day/"
                "AM/PM and punctuation separators)"
            )
    wrap = cases.pop() if len(cases) == 1 else None
    return "".join(out), None if wrap == "title" else wrap


def _to_char_numeric(expr: str, fmt: str) -> str:
    """PG numeric ``to_char`` templates (r10 verdict order 6) — the
    money/fixed-point subset: optional ``FM``, digit positions ``9``
    (blank-padded) / ``0`` (zero-padded), group/decimal marks ``,``/
    ``.`` (``G``/``D`` synonyms). Compiles to format_string /
    format_number; without FM the result right-justifies to the
    template width + 1 sign column, exactly PG. ``FM`` with all-``9``
    decimals strips trailing zeros like PG (DOCUMENTED DEVIATION: a
    whole number renders without PG's dangling point — '1' not '1.').
    Exotic tokens (S, RN, EEEE, PR, mixed 0/9 decimals, 0-padding
    combined with grouping) refuse loudly. DOCUMENTED DEVIATIONS:
    half-up rounding at the last digit (Java format; PG rounds half
    away from zero — identical for positives), and overflow renders
    the full number instead of PG's '#' fill."""
    f = fmt
    fm = False
    if f[:2].upper() == "FM":
        fm, f = True, f[2:]
    f = (
        f.replace("D", ".").replace("d", ".")
        .replace("G", ",").replace("g", ",")
    )
    if not re.fullmatch(r"[09,]+(?:\.[09]+)?", f):
        raise GeoDBError(
            f"to_char: unsupported numeric template {fmt!r} (supported: "
            "FM, 9, 0, ',' and '.' / G and D)"
        )
    int_part, dot, dec_part = f.partition(".")
    d = len(dec_part)
    if dec_part and "0" in dec_part and "9" in dec_part:
        raise GeoDBError(
            "to_char: mixed 0/9 decimal positions are outside the pg "
            "dialect shim (use all 0s to keep or all 9s to strip "
            "trailing zeros)"
        )
    int0 = int_part.count("0")
    has_comma = "," in int_part
    if has_comma and int0:
        raise GeoDBError(
            "to_char: zero-padding combined with grouping separators is "
            "outside the pg dialect shim"
        )
    x = f"CAST({expr} AS DOUBLE)"
    if has_comma:
        body = f"format_number({x}, {d})"
    elif int0:
        w = int0 + (d + 1 if dot else 0)
        # Java's %0 pad width counts the sign column, PG's digit template
        # does not: to_char(-5, '00') is '-05', not ' -5'.  Zero-pad the
        # magnitude and re-attach the sign (PG keeps the input's sign even
        # when the value rounds to zero: to_char(-0.4, 'FM00') -> '-00').
        mag = f"format_string('%0{w}.{d}f', abs({x}))"
        body = f"concat(CASE WHEN {x} < 0 THEN '-' ELSE '' END, {mag})"
    else:
        body = f"format_string('%.{d}f', {x})"
    if fm:
        if dec_part and set(dec_part) == {"9"}:
            # FM + 9-decimals: strip trailing zeros and a bare point
            body = f"regexp_replace({body}, '[.]?0+$', '')"
    else:
        body = f"lpad({body}, {len(f) + 1}, ' ')"
    # format_string renders a NULL argument as the text 'null'; PG's
    # to_char(NULL, ...) is NULL
    return f"CASE WHEN {x} IS NULL THEN NULL ELSE {body} END"


_TRUNC_RE = re.compile(r"\btrunc\s*\(", re.IGNORECASE)
_ENCODE_RE = re.compile(r"\b(encode|decode)\s*\(", re.IGNORECASE)


def _rewrite_numeric_trunc(code: str, lits: list[str]) -> str:
    """PG's NUMERIC ``trunc(x[, n])`` (truncate toward zero) on
    literal-protected code — Spark's ``trunc`` is the (date, fmt) form
    and rejects both numeric arities loudly. The 1-argument form and
    the integer-literal-scale form rewrite to toward-zero arithmetic::

        trunc(x)    -> CAST(CAST(x AS BIGINT) AS DOUBLE)
        trunc(x, n) -> CAST(CAST(x * 10^n AS BIGINT) AS DOUBLE) / 10^n

    (negative scales truncate left of the point like PG). Spark's own
    date form — a string-literal second argument — passes through."""
    pos = 0
    while True:
        m = _TRUNC_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = _split_top_commas_lit(code[m.end(): j])
        if len(args) == 2 and _LIT_PLACEHOLDER_RE.fullmatch(args[1].strip()):
            pos = j + 1  # Spark's trunc(date, 'fmt'): native
            continue
        x = args[0].strip()
        if len(args) == 1:
            repl = f"CAST(CAST(({x}) AS BIGINT) AS DOUBLE)"
        elif len(args) == 2 and re.fullmatch(r"-?\d+", args[1].strip()):
            # toward-zero at scale n via DECIMAL floor/ceil (a float
            # multiply would truncate 1.13*100 = 112.999... one ulp low)
            n = int(args[1].strip())
            dec = f"CAST(({x}) AS DECIMAL(38, 15))"
            repl = (
                f"CAST((CASE WHEN ({x}) >= 0 THEN floor({dec}, {n}) "
                f"ELSE ceil({dec}, {n}) END) AS DOUBLE)"
            )
        else:
            raise GeoDBError(
                "trunc: numeric trunc takes (x) or (x, integer-literal "
                "scale); the date form is trunc(date, 'fmt')"
            )
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _rewrite_encode_decode(code: str, lits: list[str]) -> str:
    """PG ``encode(bytea, 'hex')`` / ``decode(text, 'hex')`` on
    literal-protected code -> ``lower(hex(x))`` / ``unhex(x)`` (PG
    renders hex lowercase). Other formats (base64/escape) pass through
    to Spark's loud charset error — PG's base64 wraps lines at 76
    chars, which no one-liner reproduces."""
    pos = 0
    while True:
        m = _ENCODE_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = _split_top_commas_lit(code[m.end(): j])
        fmt = None
        if len(args) == 2:
            fm = _LIT_PLACEHOLDER_RE.fullmatch(args[1].strip())
            if fm is not None:
                fmt = lits[int(fm.group(1))][1:-1].strip().lower()
        if fmt != "hex":
            pos = j + 1
            continue
        x = args[0].strip()
        if m.group(1).lower() == "encode":
            repl = f"lower(hex({x}))"
        else:
            repl = f"unhex({x})"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


_TO_NUMBER_RE = re.compile(r"\bto_number\s*\(", re.IGNORECASE)


def _rewrite_to_number(code: str, lits: list[str]) -> str:
    """PG ``to_number(s, template)`` — the parse direction of the
    numeric to_char subset (r12): validate the template against the
    same digit/grouping grammar, then strip grouping/currency noise and
    cast (PG's lenient parse of the supported templates). Returns
    DOUBLE, the engine's ::numeric convention. Unsupported templates
    refuse with the same message class as to_char."""
    pos = 0
    while True:
        m = _TO_NUMBER_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = _split_top_commas_lit(code[m.end(): j])
        if len(args) != 2:
            raise GeoDBError("to_number(text, 'template'): 2 arguments")
        fm = _LIT_PLACEHOLDER_RE.fullmatch(args[1].strip())
        if fm is None:
            raise GeoDBError(
                "to_number: the template must be a string literal"
            )
        fmt = lits[int(fm.group(1))][1:-1].replace("''", "'")
        f = fmt[2:] if fmt[:2].upper() == "FM" else fmt
        f = (
            f.replace("D", ".").replace("d", ".")
            .replace("G", ",").replace("g", ",")
        )
        if not re.fullmatch(r"[09,]+(?:\.[09]+)?", f):
            raise GeoDBError(
                f"to_number: unsupported numeric template {fmt!r} "
                "(supported: FM, 9, 0, ',' and '.' / G and D)"
            )
        s = args[0].strip()
        # the strip-pattern goes through the literal pool: its '^'
        # would otherwise be seen by the later ^ -> power rewrite.
        # PG-convention single backslash — the output pass doubles it
        lits.append("'[^0-9.+\\-]'")
        pat = f"__GEODB_LIT_{len(lits) - 1}__"
        repl = (
            f"CAST(regexp_replace(CAST({s} AS STRING), "
            f"{pat}, '') AS DOUBLE)"
        )
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


_BETWEEN_SYM_RE = re.compile(
    r"\b(NOT\s+)?BETWEEN\s+SYMMETRIC\b", re.IGNORECASE
)


def _rewrite_between_symmetric(code: str) -> str:
    """PG ``x [NOT] BETWEEN SYMMETRIC a AND b`` (bounds in either
    order; Spark's parser rejects the keyword) ->
    ``x [NOT] BETWEEN least(a, b) AND greatest(a, b)`` (r12). The lower
    bound is everything up to AND (any expression); the UPPER bound
    must be a simple operand — a trailing operator after it refuses
    loudly (silently splitting 'b + 1' would move '+ 1' outside the
    BETWEEN)."""
    pos = 0
    while True:
        m = _BETWEEN_SYM_RE.search(code, pos)
        if not m:
            return code
        after = code[m.end():]
        # the bounds separator is the first AND at paren depth 0 — a
        # parenthesized lower bound may contain its own AND
        am, depth2 = None, 0
        for am2 in re.finditer(r"\(|\)|\bAND\b", after, re.IGNORECASE):
            tok = am2.group(0)
            if tok == "(":
                depth2 += 1
            elif tok == ")":
                depth2 -= 1
            elif depth2 == 0:
                am = am2
                break
        lo = after[: am.start()].strip() if am else None
        if am:
            right = _operand_after(after[am.end():])
            if right is None:
                t = after[am.end():].lstrip()
                off = len(after) - am.end() - len(t)
                if t.startswith("("):
                    j2 = _close_paren(t, 0)
                    if j2 is not None:
                        right = (t[: j2 + 1], off + j2 + 1)
        if not am or not lo or right is None:
            raise GeoDBError(
                "BETWEEN SYMMETRIC: bounds must be simple operands "
                "(column / literal / function call) — parenthesize "
                "larger expressions"
            )
        hi = right[0]
        rest = after[am.end() + right[1]:].lstrip()
        if (rest and rest[0] in "+-*/%^") or rest[:2] == "||":
            raise GeoDBError(
                "BETWEEN SYMMETRIC: the upper bound must be a simple "
                "operand — parenthesize larger expressions"
            )
        neg = m.group(1) or ""
        repl = (
            f"{neg}BETWEEN least({lo}, {hi}) AND greatest({lo}, {hi})"
        )
        end = m.end() + am.end() + right[1]
        code = code[: m.start()] + repl + code[end:]
        pos = m.start() + len(repl)


_TO_TS_RE = re.compile(r"\bto_(timestamp|date)\s*\(", re.IGNORECASE)
# parse-direction can't reconstruct an instant from zone-name / quarter /
# week-of-year fields
_UNPARSEABLE_SDF = ("zz", "Q", "ww")


def _rewrite_to_ts_date(code: str, lits: list[str]) -> str:
    """PG-template ``to_timestamp(s, 'YYYY-MM-DD')`` / ``to_date(s,
    'DD Mon YYYY')`` -> the same function with the template translated
    through the shared to_char token table (the reference builds
    timestamps from text this way, geodb.sql:2010-2013). Untranslated,
    Spark's DateTimeFormatter dies with DATETIME_PATTERN_RECOGNITION:
    Java's 'YYYY' is week-based-year and 'DD' is day-of-year. Spark
    parses month/day names and meridiem case-insensitively, matching PG.
    Single-argument ``to_timestamp(x)`` is PG's epoch-seconds
    constructor -> ``timestamp_seconds`` (a string literal there refuses
    — PG has no template-free text form; use ``::timestamp``);
    single-argument ``to_date`` passes through (Spark's ISO parse).
    Templates with fields that don't round-trip through parsing
    (TZ/Q/WW) refuse loudly."""
    pos = 0
    while True:
        m = _TO_TS_RE.search(code, pos)
        if not m:
            return code
        fn = "to_" + m.group(1).lower()
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = _split_top_commas_lit(code[m.end(): j])
        if len(args) == 1:
            if fn == "to_date":
                pos = j + 1  # Spark's ISO to_date(s) == PG s::date
                continue
            x = args[0].strip()
            if _LIT_PLACEHOLDER_RE.fullmatch(x):
                raise GeoDBError(
                    "to_timestamp(text) without a template is not PG — "
                    "use to_timestamp(text, 'template') or ::timestamp "
                    "(PG's 1-argument form takes epoch seconds)"
                )
            repl = f"timestamp_seconds(CAST({x} AS DOUBLE))"
        elif len(args) == 2:
            fm = _LIT_PLACEHOLDER_RE.fullmatch(args[1].strip())
            if fm is None:
                raise GeoDBError(
                    f"{fn}: the template must be a string literal"
                )
            fmt = lits[int(fm.group(1))][1:-1].replace("''", "'")
            sdf, _wrap = _to_char_format(fmt)
            bad = [t for t in _UNPARSEABLE_SDF if t in sdf]
            if bad:
                raise GeoDBError(
                    f"{fn}: template {fmt!r} contains fields that cannot "
                    "be parsed back into an instant (TZ/Q/WW)"
                )
            lits.append("'" + sdf.replace("'", "''") + "'")
            repl = (
                f"{fn}({args[0].strip()}, __GEODB_LIT_{len(lits) - 1}__)"
            )
        else:
            raise GeoDBError(f"{fn}: 1 or 2 arguments")
        code = code[: m.start()] + repl + code[j + 1:]
        # advance just past 'to_xxx(' so a NESTED to_timestamp/to_date in
        # the arguments still rewrites, while the already-translated outer
        # call (template now a placeholder) is not re-translated (the token
        # map is not idempotent: HH24 -> HH -> hh)
        pos = m.start() + len(fn) + 1


_DATE_MINUS_RE = re.compile(r"(?<![-<>#!~&|^+*/%=:])-(?![>\-=])")
_CAST_DATE_RE = re.compile(
    r"CAST\s*\(.*\bAS\s+DATE\s*\)\s*", re.IGNORECASE | re.DOTALL
)
_DATE_CALLS = frozenset(("to_date", "make_date", "last_day"))


def _date_operand_before(protected: str, end: int) -> tuple[str, int] | None:
    """(operand, start) when the operand ending at ``protected[:end]``
    is PROVABLY date-typed: CAST(... AS DATE), a DATE '...' literal, a
    date-returning call, or current_date — else None."""
    left = _operand_before(protected[:end])
    if left is None:
        return None
    lhs, lstart = left
    if _is_date_shape(lhs):
        return lhs, lstart
    if _LIT_PLACEHOLDER_RE.fullmatch(lhs):
        m = re.search(r"\bDATE\s*$", protected[:lstart], re.IGNORECASE)
        if m:
            return protected[m.start(): end].rstrip(), m.start()
    return None


def _date_operand_after(protected: str, start: int) -> tuple[str, int] | None:
    """Mirror of :func:`_date_operand_before`; returns (operand,
    end_index into ``protected``)."""
    right = _operand_after(protected[start:])
    if right is None:
        return None
    rhs, rend = right
    if _is_date_shape(rhs):
        return rhs, start + rend
    if rhs.upper() == "DATE":
        m = re.match(r"\s*(__GEODB_LIT_\d+__)", protected[start + rend:])
        if m:
            end = start + rend + m.end()
            return protected[start:end].strip(), end
    return None


def _is_date_shape(operand: str) -> bool:
    if _CAST_DATE_RE.fullmatch(operand):
        return True
    if operand.upper() == "CURRENT_DATE":
        return True
    name = operand.split("(", 1)[0].strip().lower()
    return "(" in operand and name in _DATE_CALLS


_CONCAT_RE = re.compile(r"\bconcat\s*\(", re.IGNORECASE)


def _rewrite_concat_nulls(protected: str) -> str:
    """PG ``concat(...)`` IGNORES NULL arguments (``concat('a', NULL)``
    is ``'a'``) while Spark's concat NULL-propagates — a silent
    wrong-answer through the passthrough (r12 probe). ``concat_ws('',
    ...)`` has PG's skip-NULLs semantics and the same text coercion, so
    the spelling rewrites wholesale. Runs FIRST in the misc chain, so
    later passes that EMIT concat (the numeric to_char sign splice,
    already NULL-guarded) are untouched. DOCUMENTED BOUNDARY
    (COVERAGE.md): Spark-style binary/array concat through the pg path
    becomes text like in PG."""
    return _CONCAT_RE.sub("concat_ws('', ", protected)


_SLASH_RE = re.compile(r"(?<![/*])/(?![/*=])")
_CAST_INT_RE = re.compile(
    r"CAST\s*\(.*\bAS\s+(?:TINYINT|SMALLINT|INT|INTEGER|BIGINT)\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def _is_int_shape(operand: str) -> bool:
    operand = operand.strip()
    if operand.startswith("-"):
        operand = operand[1:].lstrip()
    return bool(
        re.fullmatch(r"\d+", operand) or _CAST_INT_RE.fullmatch(operand)
    )


def _rewrite_int_div(protected: str) -> str:
    """PG ``int / int`` is INTEGER division truncating toward zero
    (``7 / 2`` = 3, ``-7 / 2`` = -3) while Spark's ``/`` always returns
    a double — a silent everyday divergence (r12 probe). When BOTH
    operands are PROVABLY integer (integer literals or
    ``::int2/4/8``-family casts, optionally negated), rewrite to
    Spark's ``DIV`` (same toward-zero truncation). DOCUMENTED BOUNDARY
    (COVERAGE.md): bare-column operands pass through (type not provable
    from text) and return Spark's double — cast the RESULT ``::int``
    (toward-zero, PG-equal) or an operand to opt in."""
    pos = 0
    while True:
        m = _SLASH_RE.search(protected, pos)
        if m is None:
            return protected
        left = _operand_before(protected[: m.start()])
        if left is None or not _is_int_shape(left[0]):
            pos = m.end()
            continue
        after = protected[m.end():]
        stripped = after.lstrip()
        off = len(after) - len(stripped)
        neg = ""
        if stripped.startswith("-"):
            neg = "-"
            stripped = stripped[1:].lstrip()
            off = len(after) - len(stripped)
        right = _operand_after(stripped)
        if right is None or not _is_int_shape(neg + right[0]):
            pos = m.end()
            continue
        # left operand may itself carry a unary minus in unary position
        lhs, lstart = left
        before = protected[:lstart].rstrip()
        if before.endswith("-") and not before.endswith(("--", "#-")):
            b2 = before[:-1].rstrip()
            if not b2 or b2[-1] in "(,+-*/%<>=^|":
                lstart = len(before) - 1
                lhs = protected[lstart: m.start()].strip()
                before = b2
        # same-precedence LEFT context: in 'x * 7 / 2' the division's
        # left input is the whole product (unknown type), not the
        # adjacent literal — skip unless the chain is itself an integer
        # division ('8 / 3 / 2' -> '8 DIV 3 / 2', whose left input is
        # provably integral)
        if before.endswith(("*", "%", "/")):
            pos = m.end()
            continue
        repl = f"{lhs} DIV {neg}{right[0]}"
        protected = (
            protected[:lstart] + repl + protected[m.end() + off + right[1]:]
        )
        pos = lstart + len(repl)


_LBRACKET_RE = re.compile(r"\[")


def _close_bracket(code: str, open_idx: int) -> int | None:
    depth = 0
    for j in range(open_idx, len(code)):
        if code[j] == "[":
            depth += 1
        elif code[j] == "]":
            depth -= 1
            if depth == 0:
                return j
    return None


def _rewrite_array_subscript(protected: str) -> str:
    """PG array subscripts are 1-BASED and out-of-range reads (incl.
    index 0 and negatives) return NULL; Spark's ``arr[i]`` is 0-based —
    a silent off-by-one for every PG user (r12 probe). Rewrites:

        arr[i]    -> try_element_at(arr, i)        (1-based, NULL o.o.r.)
                     with a CASE guard for non-literal / non-positive i
                     (try_element_at ERRORS on 0 and counts NEGATIVES
                     from the end — both un-PG)
        arr[s:e]  -> slice(arr, max(s,1), ...)     (PG clamps bounds)

    ``ARRAY[...]`` literals were already rewritten to array(...) before
    this pass; a string-literal index (jsonb/map subscript) passes
    through untouched."""
    pos = 0
    while True:
        m = _LBRACKET_RE.search(protected, pos)
        if m is None:
            return protected
        left = _operand_before(protected[: m.start()])
        if left is None or left[0].upper() in _SQL_KEYWORDS or (
            left[0].upper() == "ARRAY"
        ):
            pos = m.end()
            continue
        j = _close_bracket(protected, m.start())
        if j is None:
            return protected  # unbalanced: leave for Spark's parser
        lhs, lstart = left
        inner = protected[m.start() + 1: j].strip()
        if not inner or _LIT_PLACEHOLDER_RE.fullmatch(inner):
            pos = j + 1  # empty or jsonb/map-style string subscript
            continue
        # top-level slice colon?
        depth = 0
        colon = None
        for k, ch in enumerate(inner):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == ":" and depth == 0:
                colon = k
                break
        if colon is not None:
            s = inner[:colon].strip()
            e = inner[colon + 1:].strip()
            if not s or not e:
                raise GeoDBError(
                    "array slice: both bounds are required — arr[s:e]"
                )
            repl = (
                f"slice({lhs}, greatest(({s}), 1), "
                f"greatest(({e}) - greatest(({s}), 1) + 1, 0))"
            )
        elif re.fullmatch(r"[1-9]\d*", inner):
            repl = f"try_element_at({lhs}, {inner})"
        else:
            repl = (
                f"(CASE WHEN ({inner}) < 1 THEN NULL "
                f"ELSE try_element_at({lhs}, {inner}) END)"
            )
        protected = protected[:lstart] + repl + protected[j + 1:]
        pos = lstart + len(repl)


_LEFT_RIGHT_RE = re.compile(r"\b(left|right)\s*\(", re.IGNORECASE)
_SUBSTR_RE = re.compile(r"\b(?:substring|substr)\s*\(", re.IGNORECASE)


def _regex_group_count(pat: str) -> int:
    """Number of CAPTURING groups in a regex literal (unescaped ``(``
    not followed by ``?``)."""
    n, i = 0, 0
    while i < len(pat):
        ch = pat[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "(" and not pat.startswith("(?", i):
            n += 1
        i += 1
    return n


def _rewrite_str_edges(protected: str, lits: list[str]) -> str:
    """PG string-window semantics the passthrough gets wrong (r12
    probe), for PROVABLE (literal) arguments:

    - ``left(s, -n)`` = all but the LAST n chars (Spark returns '')
      -> ``substring(s, 1, greatest(length(s) - n, 0))``
    - ``right(s, -n)`` = all but the FIRST n chars -> ``substring(s,
      n + 1)``
    - ``substring(s, start<=0 [, len])`` counts a virtual position:
      the window [start, start+len-1] intersected with [1..] (Spark
      treats 0/negative starts as 1) -> shifted 1-based window
    - ``substring(s FROM 'pattern')`` with a NON-NUMERIC literal is
      PG's POSIX-regex extraction (first match; group 1 when the
      pattern captures; NULL when it doesn't match) -> RLIKE-guarded
      ``regexp_extract`` — untranslated, Spark casts the pattern to INT
      and dies blaming a cast the user never wrote

    Column-valued counts stay a documented passthrough boundary."""
    pos = 0
    while True:
        m = _SUBSTR_RE.search(protected, pos)
        if m is None:
            break
        j = _close_paren(protected, m.end() - 1)
        if j is None:
            return protected
        inner = protected[m.end(): j]
        fm = re.fullmatch(
            r"(.+?)\s+FROM\s+(__GEODB_LIT_(\d+)__)\s*",
            inner,
            re.IGNORECASE | re.DOTALL,
        )
        if fm is None:
            # the comma spelling of the same PG form:
            # substring(s, 'pattern') with a non-numeric literal
            cargs = _split_top_commas_lit(inner)
            cm = (
                re.fullmatch(
                    r"__GEODB_LIT_(\d+)__", cargs[1].strip()
                )
                if len(cargs) == 2 else None
            )
            if cm is None:
                pos = m.end()
                continue
            s_expr, pat_ph = cargs[0].strip(), cargs[1].strip()
            lit = lits[int(cm.group(1))][1:-1].replace("''", "'")
        else:
            s_expr, pat_ph = fm.group(1).strip(), fm.group(2)
            lit = lits[int(fm.group(3))][1:-1].replace("''", "'")
        if re.fullmatch(r"-?\d+", lit.strip()):
            pos = m.end()  # positional FROM '2' / (s, '2') — Spark-native
            continue
        s = s_expr
        idx = 1 if _regex_group_count(lit) >= 1 else 0
        repl = (
            f"CASE WHEN {s} RLIKE {pat_ph} "
            f"THEN regexp_extract({s}, {pat_ph}, {idx}) END"
        )
        protected = protected[: m.start()] + repl + protected[j + 1:]
        pos = m.start() + len(repl)
    pos = 0
    pos = 0
    while True:
        m = _LEFT_RIGHT_RE.search(protected, pos)
        if m is None:
            break
        j = _close_paren(protected, m.end() - 1)
        if j is None:
            return protected
        args = _split_top_commas_lit(protected[m.end(): j])
        nm = m.group(1).lower()
        if len(args) == 2 and re.fullmatch(r"-\s*\d+", args[1].strip()):
            s = args[0].strip()
            n = args[1].strip().lstrip("-").strip()
            if nm == "left":
                repl = f"substring({s}, 1, greatest(length({s}) - {n}, 0))"
            else:
                repl = f"substring({s}, {n} + 1)"
            protected = protected[: m.start()] + repl + protected[j + 1:]
            pos = m.start() + len(repl)
        else:
            pos = m.end()
    pos = 0
    while True:
        m = _SUBSTR_RE.search(protected, pos)
        if m is None:
            return protected
        j = _close_paren(protected, m.end() - 1)
        if j is None:
            return protected
        args = _split_top_commas_lit(protected[m.end(): j])
        start = args[1].strip() if len(args) >= 2 else ""
        sm = re.fullmatch(r"(-\s*\d+|0)", start)
        if sm is None or len(args) not in (2, 3):
            pos = m.end()
            continue
        s = args[0].strip()
        start_val = int(start.replace(" ", ""))
        if len(args) == 2:
            repl = f"substring({s}, 1)"
        else:
            ln = args[2].strip()
            if re.fullmatch(r"\d+", ln):
                new_len = max(start_val + int(ln) - 1, 0)
                repl = f"substring({s}, 1, {new_len})"
            else:
                repl = (
                    f"substring({s}, 1, "
                    f"greatest({start_val} + ({ln}) - 1, 0))"
                )
        protected = protected[: m.start()] + repl + protected[j + 1:]
        pos = m.start() + len(repl)


_NULLS_PLACED_RE = re.compile(r"\bNULLS\s+(FIRST|LAST)\s*$", re.IGNORECASE)
_DESC_RE = re.compile(r"\bDESC\s*$", re.IGNORECASE)
_OVER_RE = re.compile(r"\bOVER\s*\(", re.IGNORECASE)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_FRAME_KW_RE = re.compile(r"\b(ROWS|RANGE|GROUPS)\b", re.IGNORECASE)


def _split_top_commas(code: str) -> list[str]:
    out, depth, start = [], 0, 0
    for k, ch in enumerate(code):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(code[start:k])
            start = k + 1
    out.append(code[start:])
    return out


def _pg_order_nulls(order: str | None) -> str | None:
    """PG's default NULL placement is the OPPOSITE of Spark's: PG sorts
    NULLs LAST ascending and FIRST descending, Spark FIRST/LAST (r12
    probe — silent row-order and paging flips on nullable sort keys).
    Append the explicit placement to every sort item that doesn't name
    one."""
    if not order:
        return order
    items = []
    for item in _split_top_commas(order):
        body = item.rstrip()
        pad = item[len(body):]
        if not body.strip() or _NULLS_PLACED_RE.search(body):
            items.append(item)
        elif _DESC_RE.search(body):
            items.append(f"{body} NULLS FIRST{pad}")
        else:
            items.append(f"{body} NULLS LAST{pad}")
    return ",".join(items)


def _rewrite_window_order_nulls(protected: str) -> str:
    """Apply :func:`_pg_order_nulls` to every ``ORDER BY`` inside an
    ``OVER (...)`` window specification (the statement-level ORDER BY is
    handled by build_pg_sql). Runs LAST in the rewrite chain, after the
    aggregate rewrites consumed their own WITHIN-GROUP order clauses."""
    pos = 0
    while True:
        m = _OVER_RE.search(protected, pos)
        if m is None:
            return protected
        j = _close_paren(protected, m.end() - 1)
        if j is None:
            return protected
        spec = protected[m.end(): j]
        om = _ORDER_BY_RE.search(spec)
        if om is None:
            pos = j + 1
            continue
        # the order list ends at the frame clause, if any
        fm = _FRAME_KW_RE.search(spec, om.end())
        end = fm.start() if fm else len(spec)
        order = _pg_order_nulls(spec[om.end(): end])
        spec = spec[: om.end()] + f" {order.strip()} " + spec[end:]
        repl = f"OVER ({spec.strip()})"
        protected = protected[: m.start()] + repl + protected[j + 1:]
        pos = m.start() + len(repl)


_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)
_CAST_DOUBLE_RE = re.compile(
    r"CAST\s*\(.*\bAS\s+(?:DOUBLE|FLOAT)\s*\)", re.IGNORECASE | re.DOTALL
)


def _rewrite_round_double(protected: str) -> str:
    """PG ``round(float8)`` ties round HALF-TO-EVEN (C rint) while
    Spark's round is HALF_UP — ``round(2.5::float8)`` is 2 in PG, 3 in
    Spark (r11 verdict What's-missing 4). When the single operand is
    PROVABLY double-typed (a ``::float8``/``::double precision`` cast,
    i.e. CAST-to-DOUBLE/FLOAT after the cast rewrite), emit Spark's
    ``rint`` — identical off ties, half-to-even on them. The 2-argument
    form and unprovable operands pass through: PG's 2-arg round exists
    only for NUMERIC, where half-away-from-zero matches Spark's HALF_UP
    on both signs (documented boundary in COVERAGE.md)."""
    pos = 0
    while True:
        m = _ROUND_RE.search(protected, pos)
        if m is None:
            return protected
        j = _close_paren(protected, m.end() - 1)
        if j is None:
            return protected  # unbalanced: leave for Spark's parser
        args = _split_top_commas_lit(protected[m.end(): j])
        arg = args[0].strip() if args else ""
        # see through unary minus and balanced parens: -2.5::float8 is
        # -(CAST(2.5 AS DOUBLE)) and still provably double
        core = arg
        while True:
            stripped = _strip_outer_parens(core)
            if stripped.startswith("-"):
                core = stripped[1:].lstrip()
            elif stripped != core:
                core = stripped
            else:
                break
        if len(args) == 1 and _CAST_DOUBLE_RE.fullmatch(core):
            repl = f"rint({arg})"
            protected = protected[: m.start()] + repl + protected[j + 1:]
            pos = m.start() + len(repl)
        else:
            pos = m.end()


def _rewrite_date_minus(protected: str) -> str:
    """PG ``date - date`` returns INTEGER days; Spark's ``-`` on dates
    returns an INTERVAL — a silent schema/type deviation in SELECT
    position (r11 verdict What's-missing 3). When BOTH operands of a
    binary ``-`` are provably date-typed (``::date``/CAST-to-DATE,
    ``DATE '...'`` literals, to_date/make_date/last_day calls,
    current_date), rewrite to ``datediff(a, b)`` = PG's a - b in days.
    Bare-column operands stay a documented passthrough boundary (their
    type is not provable from the text). Runs on the literal-protected
    stream AFTER ::casts and the epoch rewrites."""
    pos = 0
    while True:
        m = _DATE_MINUS_RE.search(protected, pos)
        if m is None:
            return protected
        left = _date_operand_before(protected, m.start())
        if left is None:
            pos = m.end()
            continue
        right = _date_operand_after(protected, m.end())
        if right is None:
            pos = m.end()
            continue
        lhs, lstart = left
        rhs, rend = right
        repl = f"datediff({lhs}, {rhs})"
        protected = protected[:lstart] + repl + protected[rend:]
        pos = lstart + len(repl)


def _rewrite_misc_pg_funcs(code: str, lits: list[str]) -> str:
    """Literal-protected rewrites for common PG scalar spellings:

    - ``to_char(expr, 'YYYY-MM-DD...')`` -> ``date_format(expr, ...)``
      with the template translated token-by-token (unknown tokens
      refuse). Numeric-formatting to_char (e.g. '999D99') is outside
      the shim.
    - ``string_to_array(s, 'sep')`` -> ``split(s, <regex-escaped sep>)``
      — PG splits on the LITERAL delimiter while Spark's split takes a
      Java regex, so the separator literal is escaped; the 3-argument
      null-string form refuses.
    """
    pos = 0
    while True:
        m = _TO_CHAR_RE.search(code, pos)
        if not m:
            break
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        depth2, comma_at = 0, None
        for ci, ch in enumerate(args):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                comma_at = ci
                break
        if comma_at is None:
            raise GeoDBError("to_char(expr, 'template'): 2 arguments")
        expr = args[:comma_at].strip()
        fmt_ph = args[comma_at + 1:].strip()
        fm = _LIT_PLACEHOLDER_RE.fullmatch(fmt_ph)
        if fm is None:
            raise GeoDBError(
                "to_char: the template must be a string literal"
            )
        fmt = lits[int(fm.group(1))][1:-1].replace("''", "'")
        if re.search(r"[09]", fmt):
            # digit positions never appear in datetime templates: this
            # is PG's NUMERIC to_char (money/fixed-point formatting)
            repl = _to_char_numeric(expr, fmt)
        else:
            # FM prefix: fill-mode — strips the blank padding PG gives
            # full Day/Month names (a no-op for every other date token)
            fm_flag = fmt[:2].upper() == "FM"
            dfmt = fmt[2:] if fm_flag else fmt
            nt = _TO_CHAR_NAME_TOKENS.get(dfmt)
            if nt is not None and dfmt.upper() in ("DAY", "MONTH"):
                # standalone full-name template: PG blank-pads to 9
                # columns ('Monday   ') unless FM. Mixed templates
                # containing Day/Month keep the unpadded rendering
                # (DOCUMENTED DEVIATION, COVERAGE.md)
                sp, case = nt
                lits.append(f"'{sp}'")
                repl = f"date_format({expr}, __GEODB_LIT_{len(lits) - 1}__)"
                if case in ("upper", "lower"):
                    repl = f"{case}({repl})"
                if not fm_flag:
                    repl = f"rpad({repl}, 9, ' ')"
            else:
                sdf, wrap = _to_char_format(dfmt)
                lits.append("'" + sdf.replace("'", "''") + "'")
                repl = f"date_format({expr}, __GEODB_LIT_{len(lits) - 1}__)"
                if wrap is not None:
                    # PG's name-token casing ('MON' -> 'JAN'): safe to
                    # wrap the whole result — all other output is
                    # digits/punct
                    repl = f"{wrap}({repl})"
        code = code[: m.start()] + repl + code[j + 1:]
        # rescan from the match start: a nested to_char inside the
        # rewritten arguments (render-parse round-trips) must rewrite too;
        # terminates because every pass removes one to_char occurrence
        pos = m.start()
    pos = 0
    while True:
        m = _STR_TO_ARR_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        splits, depth2 = [], 0
        for ci, ch in enumerate(args):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                splits.append(ci)
        if len(splits) != 1:
            raise GeoDBError(
                "string_to_array(s, 'sep'): exactly 2 arguments (the "
                "3-argument null-string form is outside the shim)"
            )
        src = args[: splits[0]].strip()
        sep_ph = args[splits[0] + 1:].strip()
        sm = _LIT_PLACEHOLDER_RE.fullmatch(sep_ph)
        if sm is None:
            raise GeoDBError(
                "string_to_array: the separator must be a string literal"
            )
        sep = lits[int(sm.group(1))][1:-1].replace("''", "'")
        lits.append("'" + re.escape(sep).replace("'", "''") + "'")
        repl = f"split({src}, __GEODB_LIT_{len(lits) - 1}__)"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


_AGG_ORDER_RE = re.compile(
    r"\b(string_agg|array_agg|json_agg|jsonb_agg)\s*\(", re.IGNORECASE
)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def _split_order_keys(
    order: str,
) -> tuple[list[tuple[str, bool, bool]], bool]:
    """Top-level comma split of an aggregate-internal ORDER BY list ->
    ([(bare key, ascending, nulls_first)], any_explicit_nulls).  An
    unspecified null placement resolves to PG's default (ASC -> NULLS
    LAST, DESC -> NULLS FIRST)."""
    keys, depth, start = [], 0, 0
    for i, ch in enumerate(order):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            keys.append(order[start:i])
            start = i + 1
    keys.append(order[start:])
    out, any_explicit = [], False
    for k in keys:
        k = k.strip()
        nf = None
        m = re.search(r"\bNULLS\s+(FIRST|LAST)\s*$", k, re.IGNORECASE)
        if m:
            nf = m.group(1).upper() == "FIRST"
            any_explicit = True
            k = k[: m.start()].rstrip()
        m = re.search(r"\s+(ASC|DESC)\s*$", k, re.IGNORECASE)
        asc = True
        if m:
            asc = m.group(1).upper() == "ASC"
            k = k[: m.start()].rstrip()
        if nf is None:
            nf = not asc  # PG default: ASC -> NULLS LAST, DESC -> FIRST
        out.append((k, asc, nf))
    return out, any_explicit


def _agg_filter_clause(code: str, j: int) -> tuple[str | None, int]:
    """Parse an optional ``FILTER (WHERE cond)`` immediately after the
    aggregate's close paren at index ``j`` -> (cond, end_index_of_filter)
    or (None, j). The rewritten aggregates fold the condition into the
    collect itself (CASE WHEN cond THEN struct END — collect_list drops
    the NULLs, exactly FILTER semantics), since Spark's FILTER clause
    cannot attach to the transform(...) expression the rewrite emits."""
    fm = re.compile(r"\s*FILTER\s*\(\s*WHERE\b", re.IGNORECASE).match(
        code, j + 1
    )
    if fm is None:
        return None, j
    depth = 1  # the FILTER clause's own open paren is inside the match
    for k in range(fm.end(), len(code)):
        if code[k] == "(":
            depth += 1
        elif code[k] == ")":
            depth -= 1
            if depth == 0:
                return code[fm.end(): k].strip(), k
    return None, j  # unbalanced: leave for Spark's parser


def _ordered_collect_expr(
    keys: list[tuple[str, bool, bool]], any_explicit: bool, head: str,
    distinct: bool = False, filter_cond: str | None = None,
) -> str:
    """The ordered-collect core shared by ``array_agg(x ORDER BY ...)``
    and ``st_collect(g ORDER BY ...)``: a map-side-combining
    ``collect_list`` of (keys..., value) structs, sorted per group.

    Uniform-direction key lists without an explicit NULLS placement keep
    the r8 ``sort_array`` fast path (whole-stage-codegen struct compare;
    DOCUMENTED DEVIATION: a NULL key sorts with Spark's struct rule —
    nulls first under ASC — not PG's default).  Mixed ASC/DESC or
    explicit NULLS FIRST/LAST builds an ``array_sort`` comparator lambda
    with exact PG placement per key.  Ties resolve by the value (PG
    leaves them unspecified); the struct wrapper keeps NULL values,
    matching PG array_agg."""
    fields = ", ".join(
        f"({k}) AS __o{i}" for i, (k, _, _) in enumerate(keys)
    ) + f", ({head}) AS __v"
    row = f"struct({fields})"
    if filter_cond is not None:
        row = f"CASE WHEN ({filter_cond}) THEN {row} END"
    collect = f"collect_list({row})"
    if distinct:
        # legal only when the key IS the value (caller enforces), so
        # struct rows of duplicates are identical and dedup is exact
        collect = f"array_distinct({collect})"
    uniform = len({asc for _, asc, _ in keys}) == 1
    if uniform and not any_explicit:
        tail = "" if keys[0][1] else ", false"
        return f"sort_array({collect}{tail})"
    terms = []
    for i, (_, asc, nf) in enumerate(keys):
        lt, gt = ("-1", "1") if asc else ("1", "-1")
        nl, nr = ("-1", "1") if nf else ("1", "-1")
        terms.append(
            f"CASE WHEN l.__o{i} IS NULL AND r.__o{i} IS NULL THEN 0 "
            f"WHEN l.__o{i} IS NULL THEN {nl} "
            f"WHEN r.__o{i} IS NULL THEN {nr} "
            f"WHEN l.__o{i} < r.__o{i} THEN {lt} "
            f"WHEN l.__o{i} > r.__o{i} THEN {gt} ELSE 0 END"
        )
    terms.append(
        "CASE WHEN l.__v IS NULL AND r.__v IS NULL THEN 0 "
        "WHEN l.__v IS NULL THEN -1 WHEN r.__v IS NULL THEN 1 "
        "WHEN l.__v < r.__v THEN -1 WHEN l.__v > r.__v THEN 1 ELSE 0 END"
    )
    cmp = terms[-1]
    for t in reversed(terms[:-1]):
        cmp = f"(CASE WHEN ({t}) != 0 THEN ({t}) ELSE {cmp} END)"
    return f"array_sort({collect}, (l, r) -> {cmp})"


def _rewrite_agg_orderby(code: str) -> str:
    """PG's aggregate-internal ``ORDER BY`` on literal-protected code:

    - ``string_agg(x, sep ORDER BY k...)`` ->
      ``string_agg(x, sep) WITHIN GROUP (ORDER BY k...)`` (Spark 4 runs
      string_agg + WITHIN GROUP natively; only PG's in-args spelling
      needs moving)
    - ``array_agg(x ORDER BY k...)`` ->
      ``transform(sort_array(collect_list(struct(k AS __o0, ..., x AS
      __v))[, false]), s -> s.__v)`` — one map-side-combining aggregate,
      per-group sort by the keys (ties resolved by the value, which PG
      leaves unspecified).  Unlike bare collect_list, the struct wrapper
      keeps NULL values, matching PG array_agg.
    - ``json_agg(x [ORDER BY k...])`` / ``jsonb_agg`` -> the array_agg
      machinery wrapped in ``to_json(...)`` — PG renders the group as a
      json array; NULL members render as json nulls (the struct wrapper
      keeps them).  DOCUMENTED DEVIATION: compact separators (PG
      json_agg pretty-prints with ', '; jsonb_agg is compact like
      Spark/DuckDB)."""
    pos = 0
    while True:
        m = _AGG_ORDER_RE.search(code, pos)
        if not m:
            return code
        fname = m.group(1).lower()
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        ob = None
        for om in _ORDER_BY_RE.finditer(args):
            if args[: om.start()].count("(") == args[: om.start()].count(")"):
                ob = om
                break
        if ob is None:
            if fname in ("json_agg", "jsonb_agg"):
                # PG: arbitrary order without ORDER BY — same caveat
                cond, j = _agg_filter_clause(code, j)
                row = f"struct(({args.strip()}) AS __v)"
                if cond is not None:
                    row = f"CASE WHEN ({cond}) THEN {row} END"
                repl = (
                    f"to_json(transform(collect_list({row}), s -> s.__v))"
                )
                code = code[: m.start()] + repl + code[j + 1:]
                pos = m.start() + len(repl)
                continue
            pos = m.end()
            continue
        head = args[: ob.start()].rstrip()
        order = args[ob.end():].strip()
        if fname == "string_agg":
            # Spark 4's native ListAgg (string_agg WITHIN GROUP) crashes
            # Catalyst's RewriteDistinctAggregates whenever it shares a
            # projection with ANY distinct aggregate (ClassCastException
            # AttributeReference vs SortOrder in withNewChildrenInternal
            # — differential-fuzz find, r12): route BOTH forms through
            # the ordered-collect core instead. array_join skips NULL
            # elements exactly like PG string_agg skips NULL values.
            distinct = bool(re.match(r"DISTINCT\b", head, re.IGNORECASE))
            body = head[len("DISTINCT"):] if distinct else head
            parts2 = _split_top_commas_lit(body)
            if len(parts2) != 2:
                raise GeoDBError(
                    "string_agg(x, sep ORDER BY ...): 2 arguments "
                    "expected"
                )
            inner, sep = parts2[0].strip(), parts2[1].strip()
            keys, any_explicit = _split_order_keys(order)
            if distinct:
                norm = lambda s2: re.sub(r"\s+", "", s2).lower()  # noqa: E731
                if len(keys) != 1 or norm(keys[0][0]) != norm(inner):
                    raise GeoDBError(
                        "string_agg(DISTINCT x ORDER BY ...): the ORDER "
                        "BY expression must be x itself (PG requires "
                        "ORDER BY expressions to appear in the argument "
                        "list)"
                    )
            cond, j = _agg_filter_clause(code, j)
            repl = (
                f"array_join(transform("
                f"{_ordered_collect_expr(keys, any_explicit, inner, distinct, cond)}"
                f", s -> s.__v), {sep})"
            )
        else:
            distinct = False
            if re.match(r"DISTINCT\b", head, re.IGNORECASE):
                # PG only admits DISTINCT + ORDER BY when every ORDER BY
                # expression appears in the argument list — with one
                # argument that means ORDER BY the value itself
                inner = head[len("DISTINCT"):].strip()
                keys, any_explicit = _split_order_keys(order)
                norm = lambda s: re.sub(r"\s+", "", s).lower()  # noqa: E731
                if len(keys) != 1 or norm(keys[0][0]) != norm(inner):
                    raise GeoDBError(
                        "array_agg(DISTINCT x ORDER BY ...): the ORDER BY "
                        "expression must be x itself (PG requires ORDER "
                        "BY expressions to appear in the argument list)"
                    )
                head, distinct = inner, True
            else:
                keys, any_explicit = _split_order_keys(order)
            cond, j = _agg_filter_clause(code, j)
            repl = (
                f"transform("
                f"{_ordered_collect_expr(keys, any_explicit, head, distinct, cond)}"
                f", s -> s.__v)"
            )
            if fname in ("json_agg", "jsonb_agg"):
                repl = f"to_json({repl})"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


_SPATIAL_AGG_RE = re.compile(
    r"\b(st_union|st_collect|st_extent|st_polygonize|st_makeline"
    r"|st_clusterwithin|st_clusterintersecting)\s*\(",
    re.IGNORECASE,
)


def _rewrite_spatial_aggs(code: str) -> str:
    """PostGIS spatial AGGREGATES on literal-protected code (reference
    passthrough admits them in SELECT — geodb.sql:1169):

    - ``st_extent(g)`` -> the box2d text built from four plain min/max
      aggregates over the Arrow-batched envelope accessors — NO
      collect_list, so the rewrite is a pure map-side-combining
      aggregation (the 100-TB shape)
    - ``st_union(g)`` -> ``st_union_agg(collect_list(g))`` (the engine's
      dissolve fold — geometry/overlay.union_all)
    - ``st_collect(g)`` -> ``st_collect_agg(collect_list(g))``; an
      aggregate-internal ``ORDER BY`` is honored via the same
      struct-sort as array_agg
    - ``st_makeline(g [ORDER BY k])`` -> ``st_makeline_agg(...)`` (the
      trajectory-building aggregate; coordinates concatenate in the
      ORDER BY order — without one the order is whatever the executors
      deliver, exactly PG's unordered-aggregate caveat)

    Two-argument ``st_union(a, b)`` / ``st_collect(a, b)`` are the scalar
    forms and pass through untouched. Like PostGIS' ST_Union aggregate, a
    collect_list group materializes on one task — cap group sizes
    upstream for unbounded groups (functions/geo_agg.dissolve has the
    two_level valve on the Python API)."""
    pos = 0
    while True:
        m = _SPATIAL_AGG_RE.search(code, pos)
        if not m:
            return code
        fname = m.group(1).lower()
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        # top-level comma -> the scalar two-argument overlay form
        # (EXCEPT st_clusterwithin, whose 2-arg form IS the aggregate)
        depth2, comma_at = 0, None
        for ci, ch in enumerate(args):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                comma_at = ci
                break
        if fname in ("st_clusterwithin", "st_clusterintersecting"):
            if fname == "st_clusterwithin":
                if comma_at is None:
                    raise GeoDBError(
                        "st_clusterwithin(geom, distance): two arguments "
                        "required"
                    )
                gexpr = args[:comma_at].strip()
                dexpr = args[comma_at + 1:].strip()
            else:
                if comma_at is not None:
                    raise GeoDBError(
                        "st_clusterintersecting(geom): one argument only"
                    )
                gexpr, dexpr = args.strip(), "0.0"
            repl = (
                f"st_clusterwithin_agg(collect_list({gexpr}), {dexpr})"
            )
            code = code[: m.start()] + repl + code[j + 1:]
            pos = m.start() + len(repl)
            continue
        if comma_at is not None:
            pos = m.end()
            continue
        ob = None
        for om in _ORDER_BY_RE.finditer(args):
            if args[: om.start()].count("(") == args[: om.start()].count(")"):
                ob = om
                break
        head = args if ob is None else args[: ob.start()].rstrip()
        head = head.strip()
        if fname == "st_extent":
            if ob is not None:
                raise GeoDBError(
                    "st_extent(... ORDER BY ...) is meaningless; drop the "
                    "ORDER BY"
                )
            def _b(fn, agg):
                return (
                    f"CAST(CAST({agg}({fn}({head})) AS DECIMAL(24,6)) "
                    f"AS STRING)"
                )
            repl = (
                f"concat('BOX(', {_b('st_xmin', 'min')}, ' ', "
                f"{_b('st_ymin', 'min')}, ',', {_b('st_xmax', 'max')}, "
                f"' ', {_b('st_ymax', 'max')}, ')')"
            )
        elif ob is not None:
            if fname in ("st_union", "st_polygonize"):
                raise GeoDBError(
                    f"{fname}(... ORDER BY ...): the aggregate is "
                    "order-independent; drop the ORDER BY"
                )
            keys, any_explicit = _split_order_keys(args[ob.end():].strip())
            agg_fn = (
                "st_makeline_agg" if fname == "st_makeline"
                else "st_collect_agg"
            )
            repl = (
                f"{agg_fn}(transform("
                f"{_ordered_collect_expr(keys, any_explicit, head)}"
                f", s -> s.__v))"
            )
        elif fname == "st_polygonize":
            # the PG aggregate: collect the linework, polygonize once
            repl = f"st_polygonize(st_collect_agg(collect_list({head})))"
        else:
            repl = f"{fname}_agg(collect_list({head}))"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


_RELATE3_RE = re.compile(r"\bst_relate\s*\(", re.IGNORECASE)


_UNNEST_RE = re.compile(r"\bunnest\s*\(", re.IGNORECASE)
_REGEXP4_RE = re.compile(r"\bregexp_replace\s*\(", re.IGNORECASE)


def _pg_regexp_rep_pieces(rep: str) -> list[tuple[str, object]]:
    """Parse a PG regexp_replace replacement string into pieces:
    ``('lit', text)`` runs and ``('group', n)`` backrefs (``\\1``-``\\9``;
    ``\\&`` = whole match = group 0). ``\\\\`` is a literal backslash; a
    backslash before any other character keeps that character (PG raises
    there — lenient boundary)."""
    pieces: list[tuple[str, object]] = []
    buf: list[str] = []
    i = 0
    while i < len(rep):
        ch = rep[i]
        if ch == "\\" and i + 1 < len(rep):
            nxt = rep[i + 1]
            if nxt.isdigit() or nxt == "&":
                if buf:
                    pieces.append(("lit", "".join(buf)))
                    buf = []
                pieces.append(("group", 0 if nxt == "&" else int(nxt)))
            else:
                buf.append("\\" if nxt == "\\" else nxt)
            i += 2
            continue
        buf.append(ch)
        i += 1
    if buf:
        pieces.append(("lit", "".join(buf)))
    return pieces


def _rewrite_regexp_replace(code: str, lits: list[str]) -> str:
    """PG ``regexp_replace(src, pat, rep[, flags])`` on literal-protected
    code — two silent divergence classes (r12 probes, DuckDB-confirmed):

    - without the ``'g'`` flag PG replaces only the FIRST match where
      Spark's 3-arg form replaces ALL (``regexp_replace('aaa','a','b')``:
      PG ``'baa'``, Spark ``'bbb'``) -> emit a first-match splice on
      ``regexp_instr`` position + ``regexp_extract(.., 0)`` length, with
      PG backrefs in a literal replacement becoming per-group
      ``regexp_extract`` pieces
    - with ``'g'`` Spark IS global, but PG spells backrefs ``\\1`` /
      ``\\&`` where Java's replaceAll wants ``$1`` / ``$0`` (and gives
      ``$`` and lone ``\\`` meanings PG text doesn't have) -> translate
      literal replacements to the Java spelling

    ``'i'`` folds in as a ``(?i)`` pattern prefix (in-place for literal
    patterns, a concat for expressions); other flags refuse loudly.
    Expression (non-literal) replacements keep their text verbatim:
    backslash/dollar bytes in DATA then follow Java on the global path —
    documented boundary (COVERAGE.md). Must run BEFORE the misc passes
    whose emitted regexp_replace calls are Spark-global by design
    (to_number's strip, to_char's zero-trim).

    Rightmost match first, so nested user calls rewrite inner-before-
    outer (the splice duplicates ``src`` — an unrewritten inner call
    would otherwise be copied verbatim and silently run global);
    finished calls leave under a sentinel name restored at the end."""
    while True:
        m = None
        for m2 in _REGEXP4_RE.finditer(code):
            m = m2
        if m is None:
            return code.replace("__GEODB_RERE__(", "regexp_replace(")
        j = _close_paren(code, m.end() - 1)
        if j is None:
            # unbalanced: leave for Spark's parser
            return code.replace("__GEODB_RERE__(", "regexp_replace(")
        args = code[m.end(): j]
        splits, depth2 = [], 0
        for k, ch in enumerate(args):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                splits.append(k)
        if len(splits) not in (2, 3):
            # wrong arity — park it under the sentinel; Spark's analyzer
            # reports the bad call loudly
            code = (
                code[: m.start()] + "__GEODB_RERE__(" + code[m.end():]
            )
            continue
        bounds = [-1] + splits + [len(args)]
        parts = [
            args[bounds[k] + 1: bounds[k + 1]].strip()
            for k in range(len(bounds) - 1)
        ]
        src_a, pat, rep = parts[0], parts[1], parts[2]
        fval = ""
        if len(parts) == 4:
            fm = re.fullmatch(r"__GEODB_LIT_(\d+)__", parts[3])
            if fm is None:
                raise GeoDBError(
                    "regexp_replace: the flags argument must be a string "
                    "literal ('g', 'i' or 'gi')"
                )
            fval = lits[int(fm.group(1))][1:-1].replace("''", "'")
            if not set(fval) <= {"g", "i"}:
                raise GeoDBError(
                    f"regexp_replace: unsupported flags {fval!r} "
                    "(g/i only)"
                )
        if "i" in fval:
            pm = re.fullmatch(r"__GEODB_LIT_(\d+)__", pat)
            if pm is not None:
                k2 = int(pm.group(1))
                lits[k2] = "'(?i)" + lits[k2][1:]
            else:
                pat = f"concat('(?i)', {pat})"
        rm = re.fullmatch(r"__GEODB_LIT_(\d+)__", rep)
        if "g" in fval:
            if rm is not None:
                ridx = int(rm.group(1))
                rtext = lits[ridx][1:-1].replace("''", "'")
                java = "".join(
                    f"${p[1]}" if p[0] == "group"
                    else str(p[1]).replace("\\", "\\\\").replace("$", "\\$")
                    for p in _pg_regexp_rep_pieces(rtext)
                )
                lits[ridx] = "'" + java.replace("'", "''") + "'"
            repl = f"__GEODB_RERE__({src_a}, {pat}, {rep})"
        else:
            srcp = f"({src_a})"
            if rm is not None:
                rpieces = []
                for kind, v in _pg_regexp_rep_pieces(
                    lits[int(rm.group(1))][1:-1].replace("''", "'")
                ):
                    if kind == "group":
                        rpieces.append(
                            f"regexp_extract({srcp}, {pat}, {v})"
                        )
                    else:
                        lits.append("'" + str(v).replace("'", "''") + "'")
                        rpieces.append(f"__GEODB_LIT_{len(lits) - 1}__")
                rep_sql = (
                    rpieces[0] if len(rpieces) == 1
                    else "concat(" + ", ".join(rpieces) + ")"
                ) if rpieces else "''"
            else:
                rep_sql = rep
            at = f"regexp_instr({srcp}, {pat})"
            repl = (
                f"CASE WHEN {at} > 0 THEN concat("
                f"substr({srcp}, 1, {at} - 1), {rep_sql}, "
                f"substr({srcp}, {at} + "
                f"length(regexp_extract({srcp}, {pat}, 0)))) "
                f"WHEN {at} = 0 THEN {srcp} END"
            )
        code = code[: m.start()] + repl + code[j + 1:]


_BUFFER3_RE = re.compile(r"\bst_buffer\s*\(", re.IGNORECASE)


def _rewrite_buffer3(code: str) -> str:
    """PostGIS' 3-argument ``ST_Buffer(g, d, 'style')`` on
    literal-protected code -> ``st_buffer_style(g, d, style)`` (one
    registered arity per name; the 2-argument form passes through)."""
    pos = 0
    while True:
        m = _BUFFER3_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        depth2, n_commas = 0, 0
        for ch in args:
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                n_commas += 1
        if n_commas != 2:
            pos = j + 1
            continue
        repl = f"st_buffer_style({args})"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


def _rewrite_relate3(code: str) -> str:
    """PostGIS' boolean 3-argument ``ST_Relate(a, b, pattern)`` on
    literal-protected code -> ``st_relatematch(st_relate(a, b), pattern)``
    (Spark registers one return type per function name, so the text and
    boolean forms are the separate functions PostGIS also provides; the
    2-argument matrix form passes through untouched)."""
    pos = 0
    while True:
        m = _RELATE3_RE.search(code, pos)
        if not m:
            return code
        j = _close_paren(code, m.end() - 1)
        if j is None:
            return code  # unbalanced: leave for Spark's parser
        args = code[m.end(): j]
        splits = []
        depth2 = 0
        for k, ch in enumerate(args):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                splits.append(k)
        if len(splits) != 2:
            pos = j + 1
            continue
        a = args[: splits[0]].strip()
        b = args[splits[0] + 1: splits[1]].strip()
        pat = args[splits[1] + 1:].strip()
        repl = f"st_relatematch(st_relate({a}, {b}), {pat})"
        code = code[: m.start()] + repl + code[j + 1:]
        pos = m.start() + len(repl)


# json-producing function names whose result feeding `||` means the PG
# operator is the jsonb merge, not string concat
_JSON_PRODUCERS = frozenset(
    "json_build_object jsonb_build_object to_json to_jsonb row_to_json "
    "json_agg jsonb_agg jsonb_merge jsonb_set jsonb_delete "
    "jsonb_delete_path json_object".split()
)


def _guard_jsonb_concat(clause: str) -> None:
    """Refuse ``jsonb || jsonb`` loudly (r10 verdict What's-wrong #1):
    Spark's ``||`` is STRING concatenation, so a json-typed operand
    would silently produce ``{"a":1}{"b":2}`` where PG merges to
    ``{"a": 1, "b": 2}``. Every other jsonb operator either rewrites
    correctly or fails at analysis; this is the one spelling that would
    silently deviate — same refuse-loudly policy as the geography
    marker. An operand counts as json-typed when it is a ``::json(b)``
    cast, a json-producing function call (json_build_object/ to_jsonb/
    json_agg/...), or a json-TYPED arrow terminal (``->`` / ``#>``;
    the text forms ``->>`` / ``#>>`` are legal string concat). The fix
    is the registered ``jsonb_merge(a, b)`` function
    (functions/jsonsql.py), which carries PG's exact ``||`` semantics."""
    parts = re.split(r"('(?:[^']|'')*')", clause)
    protected = "".join(
        p if i % 2 == 0 else f"__GEODB_LIT_{i // 2}__"
        for i, p in enumerate(parts)
    )

    def _refuse() -> None:
        raise GeoDBError(
            "jsonb || jsonb is outside the pg dialect shim: Spark's || "
            "is string concatenation and would silently concatenate the "
            "json texts where PG merges objects / concatenates arrays. "
            "Use jsonb_merge(a, b) (registered SQL function, exact PG "
            "|| semantics) instead."
        )

    pos = 0
    while True:
        m = re.compile(r"(?<!\|)\|\|(?!\|)").search(protected, pos)
        if m is None:
            return
        left = _operand_before(protected[: m.start()])
        if left is not None:
            lhs, lstart = left
            before = protected[:lstart].rstrip()
            if before.endswith("::") and lhs.lower() in ("json", "jsonb"):
                _refuse()
            arrow_json = (
                before.endswith("->") and not before.endswith("->>")
            ) or (before.endswith("#>") and not before.endswith("#>>"))
            if arrow_json and before.endswith("->"):
                # not a json arrow when it is a Spark lambda's arrow
                # (`transform(xs, x -> y || 'z')` is string concat)
                lam = _operand_before(before[:-2])
                if lam is not None and _is_lambda_param(
                    before[:-2], lam[1], lam[0]
                ):
                    arrow_json = False
            if arrow_json:
                _refuse()
            name = lhs.split("(", 1)[0].strip().lower()
            if "(" in lhs and name in _JSON_PRODUCERS:
                _refuse()
        right = _operand_after(protected[m.end():])
        if right is not None:
            rhs, rend = right
            after = protected[m.end() + rend:].lstrip()
            if re.match(r"::\s*jsonb?\b", after, re.IGNORECASE):
                _refuse()
            if (after.startswith("->") and not after.startswith("->>")) or (
                after.startswith("#>") and not after.startswith("#>>")
            ):
                # `x || j -> 'k'`: the arrow binds tighter, so the right
                # operand is json-typed
                _refuse()
            name = rhs.split("(", 1)[0].strip().lower()
            if "(" in rhs and name in _JSON_PRODUCERS:
                _refuse()
        else:
            # parenthesized right operand: `a || (b)::jsonb`
            tail = protected[m.end():].lstrip()
            if tail.startswith("("):
                j = _close_paren(tail, 0)
                if j is not None and re.match(
                    r"\s*::\s*jsonb?\b", tail[j + 1:], re.IGNORECASE
                ):
                    _refuse()
        pos = m.end()


_HASH_MINUS_RE = re.compile(r"#-(?![>-])")
_MINUS_RHS_RE = re.compile(
    r"(?<![-<>#!~&|^+*/%=])-\s*(__GEODB_LIT_(\d+)__|\d+(?![.\d]))"
)


def _json_typed_lhs(
    protected: str, end: int
) -> tuple[str, int] | None:
    """The operand ending at ``protected[:end]`` when it is PROVABLY
    json-typed — a ``::json(b)`` cast (returned WITH the cast text) or a
    json-producing call — else None. Shared by the jsonb ``-`` rewrite;
    the ``||`` guard uses the same rules inline."""
    left = _operand_before(protected[:end])
    if left is None:
        return None
    lhs, lstart = left
    before = protected[:lstart].rstrip()
    if before.endswith("::") and lhs.lower() in ("json", "jsonb"):
        inner = _operand_before(before[: len(before) - 2])
        if inner is None:
            return None
        _ilhs, istart = inner
        return protected[istart:end].rstrip(), istart
    name = lhs.split("(", 1)[0].strip().lower()
    if "(" in lhs and name in _JSON_PRODUCERS:
        return lhs, lstart
    return None


def _rewrite_jsonb_mutation_ops(clause: str) -> str:
    """PG's jsonb delete operators on the RAW clause (r11 — closing the
    jsonb mutation surface, r10 What's-missing #2):

    - ``j #- '{a,b}'`` -> ``jsonb_delete_path(j, '{a,b}')`` — the
      spelling is unambiguous, always rewrites
    - ``j - 'key'`` / ``j - n`` -> ``jsonb_delete(j, key)`` ONLY when
      the left operand is PROVABLY json-typed (a ``::json(b)`` cast or
      a json-producing call) — ``-`` is also arithmetic, and Spark
      would COERCE ``x - '3'`` numerically. A NON-numeric string
      literal subtracted from an unprovable operand refuses loudly
      (Spark would silently coerce both sides to double and return
      NULL); numeric-looking literals and bare integers stay
      arithmetic.

    ``jsonb_set(...)`` needs no rewrite — it is a registered function
    (functions/jsonsql.py) reachable through the passthrough."""
    if "#-" not in clause and "-" not in clause:
        return clause
    parts = re.split(r"('(?:[^']|'')*')", clause)
    lits = parts[1::2]
    protected = "".join(
        p if i % 2 == 0 else f"__GEODB_LIT_{i // 2}__"
        for i, p in enumerate(parts)
    )
    changed = False
    pos = 0
    while True:
        m = _HASH_MINUS_RE.search(protected, pos)
        if m is None:
            break
        left = _operand_before(protected[: m.start()])
        right = _operand_after(protected[m.end():])
        if left is None or right is None:
            raise GeoDBError(
                "#-: operands must be a json expression and a text-array "
                "path literal like '{a,b}'"
            )
        lhs, lstart = left
        _guard_keyword_operand("#-", lhs)
        rhs, rend = right
        repl = f"jsonb_delete_path({lhs}, {rhs})"
        protected = protected[:lstart] + repl + protected[m.end() + rend:]
        pos = lstart + len(repl)
        changed = True
    pos = 0
    while True:
        m = _MINUS_RHS_RE.search(protected, pos)
        if m is None:
            break
        jt = _json_typed_lhs(protected, m.start())
        if jt is not None:
            lhs, lstart = jt
            rhs = m.group(1)
            repl = f"jsonb_delete({lhs}, {rhs})"
            protected = protected[:lstart] + repl + protected[m.end():]
            pos = lstart + len(repl)
            changed = True
            continue
        lm = _LIT_PLACEHOLDER_RE.fullmatch(m.group(1))
        if lm is not None:
            val = lits[int(lm.group(1))][1:-1].replace("''", "'")
            if not re.fullmatch(r"\s*-?\d+(\.\d+)?\s*", val):
                raise GeoDBError(
                    f"Ambiguous '- {lits[int(lm.group(1))]}': subtracting "
                    "a non-numeric string literal is either PG's jsonb "
                    "delete or date/interval arithmetic, and Spark would "
                    "silently coerce both sides to numbers and return "
                    "NULL. Cast the operand: (x)::jsonb - 'k' for jsonb "
                    "delete, or x - '...'::date / INTERVAL '...' for "
                    "temporal arithmetic."
                )
        pos = m.end()
    if not changed:
        return clause
    return re.sub(
        r"__GEODB_LIT_(\d+)__",
        lambda mm: lits[int(mm.group(1))],
        protected,
    )


def _pg_clause_to_spark(clause: str | None) -> str | None:
    """Textual shim for the PG-isms Spark SQL's parser rejects, applied
    outside string literals only:

    - ``expr::type`` -> ``CAST(expr AS type)`` (identifier / literal /
      single function call operands; PG-only type names mapped)
    - ``col ~ 'pat'`` / ``~*`` / ``!~`` / ``!~*`` -> ``RLIKE`` with a
      ``(?i)`` prefix for the case-insensitive forms (pattern must be a
      quoted literal)
    - ``ARRAY[...]`` -> ``array(...)`` (nested arrays, string elements)
    - ``a @> b`` / ``a <@ b`` -> ``size(array_except(needle, hay)) = 0``
      (PG array containment, SET semantics: duplicates in the needle do
      not require duplicates in the hay — identical to PG)
    - ``expr [NOT] SIMILAR TO 'pat'`` -> anchored ``RLIKE`` with the
      SIMILAR TO pattern translated (% -> .*, _ -> .; period is literal)
    - ``a <-> b`` / ``a <#> b`` (PostGIS KNN distance operators) ->
      ``st_distance(a, b)`` / envelope distance; with ``LIMIT k`` Spark
      compiles the ORDER BY form to TakeOrderedAndProject (top-k)

    Spark-native PG-isms (``ILIKE``, ``||``, ``IS DISTINCT FROM``) pass
    through untouched, and string-literal CONTENTS are never rewritten.
    A documented textual shim, not a SQL transpiler — SURVEY.md §7 records
    the dialect boundary."""
    if not clause:
        return clause
    clause = _rewrite_jsonb_mutation_ops(clause)
    if "||" in clause:
        _guard_jsonb_concat(clause)

    def _cast(m: re.Match) -> str:
        t = m.group(2).lower()
        if t == "geometry":
            # '...'::geometry — the everyday PG WKT-literal cast; Spark
            # has no geometry type, the registered parser is the cast
            return f"st_geomfromtext({m.group(1)})"
        if t == "geography":
            # computation marker, consumed by _rewrite_geography (routes
            # ST_Distance/ST_DWithin onto the geodesic kernels)
            return f"{_GEOG_MARK}({m.group(1)})"
        return _pg_cast_expr(m.group(1), m.group(2))

    # Work on quote-split segments throughout: even indexes are code, odd
    # indexes are complete string literals ('' is the quote escape). Both
    # rewrites below touch ONLY code segments, so literal contents can
    # never be corrupted — a literal that happens to contain "x ~ 'y'" or
    # "a::b" passes through byte-identical.
    parts = re.split(r"('(?:[^']|'')*')", clause)
    for i in range(0, len(parts), 2):
        seg = parts[i]
        prev = None
        while prev != seg:  # chained casts resolve left-to-right
            prev = seg
            seg = _CAST_RE.sub(_cast, seg)
        # PG unnest(arr) in select position IS Spark explode(arr)
        seg = _UNNEST_RE.sub("explode(", seg)
        parts[i] = seg
    _rewrite_array_literals(parts)
    # cross-segment forms, resolved on the segment LIST so only real
    # literals (odd indexes) participate:
    # - '<literal>'::type  — cast whose operand is the preceding literal
    # - lhs ~ '<literal>'  — regex op whose pattern is the following literal
    # - lhs [NOT] SIMILAR TO '<literal>' — translated anchored RLIKE
    for i in range(1, len(parts), 2):
        after = parts[i + 1] if i + 1 < len(parts) else ""
        m = re.match(
            r"\s*::\s*(" + _TYPE_TOKEN + r")(.*)", after, re.DOTALL
        )
        if m:
            t = m.group(1).lower()
            if t == "geometry":
                parts[i] = f"st_geomfromtext({parts[i]})"
            elif t == "geography":
                parts[i] = f"{_GEOG_MARK}(st_geomfromtext({parts[i]}))"
            else:
                parts[i] = _pg_cast_expr(parts[i], m.group(1))
            parts[i + 1] = m.group(2)
        before = parts[i - 1]
        m = re.search(
            r"(?<![A-Za-z0-9_])(NOT\s+)?SIMILAR\s+TO\s*$",
            before, re.IGNORECASE,
        )
        if m and parts[i].startswith("'"):
            # swap the operator in place — the lhs expression (however
            # compound) stays untouched, and RLIKE / NOT RLIKE bind
            # looser than || and arithmetic in Spark exactly like
            # SIMILAR TO does in PG, so precedence is preserved without
            # parsing the lhs. The pattern is unescaped before regex
            # translation and re-escaped on emit so embedded quotes
            # survive byte-exact.
            rx = _similar_to_regex(parts[i][1:-1].replace("''", "'"))
            op = "NOT RLIKE" if m.group(1) else "RLIKE"
            parts[i - 1] = before[: m.start()] + op + " "
            parts[i] = "'" + rx.replace("'", "''") + "'"
            continue
        # PG's LIKE-operator spellings MUST match before the regex ops
        # (`~~` would otherwise half-match `~` and emit broken SQL):
        # ~~ = LIKE, ~~* = ILIKE, !~~ = NOT LIKE, !~~* = NOT ILIKE —
        # Spark runs LIKE/ILIKE natively, the pattern stays byte-exact
        m = re.search(r"(!?~~\*?)\s*$", before)
        if m and parts[i].startswith("'"):
            op = m.group(1)
            spark_op = "ILIKE" if op.endswith("*") else "LIKE"
            if op.startswith("!"):
                spark_op = "NOT " + spark_op
            parts[i - 1] = before[: m.start()] + spark_op + " "
            continue
        m = re.search(r"(\S+)\s*(!~\*|!~|~\*|~)\s*$", before)
        if m and re.fullmatch(r"[!~*]+", m.group(1)):
            m = None  # '!~*' alone: operator chars, not an lhs
        m2 = (
            None if m else
            re.fullmatch(r"\s*(!~\*|!~|~\*|~)\s*", before)
        )
        if m and not parts[i].startswith("CAST("):
            lhs, op = m.groups()
            pat = parts[i][1:-1]
            if "*" in op:
                pat = f"(?i){pat}"
            neg = "NOT " if op.startswith("!") else ""
            parts[i - 1] = before[: m.start()]
            parts[i] = f"{neg}{lhs} RLIKE '{pat}'"
        elif (
            m2 is not None and i >= 2
            and parts[i - 2].startswith("'")
            and not parts[i].startswith("CAST(")
        ):
            # literal lhs: '<s>' ~ '<pat>' — the lhs is the PREVIOUS
            # literal part (an identifier-shaped lhs never reaches here)
            op = m2.group(1)
            pat = parts[i][1:-1]
            if "*" in op:
                pat = f"(?i){pat}"
            neg = "NOT " if op.startswith("!") else ""
            parts[i] = f"{neg}{parts[i - 2]} RLIKE '{pat}'"
            parts[i - 2] = ""
            parts[i - 1] = " "
    out = "".join(parts)
    need_cont = "@>" in out or "<@" in out
    need_agg = bool(_AGG_ORDER_RE.search(out))
    need_spagg = bool(_SPATIAL_AGG_RE.search(out))
    need_rel3 = bool(_RELATE3_RE.search(out))
    need_knn = bool(_KNN_OP_RE.search(out))
    need_buf3 = bool(_BUFFER3_RE.search(out))
    need_rx4 = bool(_REGEXP4_RE.search(out))
    need_json = bool(_JSON_ARROW_RE.search(out))
    need_pcast = bool(_PAREN_CAST_RE.search(out))
    # case-insensitive: PG type names are case-insensitive, so
    # (x)::GEOGRAPHY must arm the marker-consuming pass too (r10 ADVICE:
    # a case-sensitive check leaked the internal marker into final SQL)
    need_geog = _GEOG_MARK in out or (
        need_pcast and "geography" in out.lower()
    )
    need_bbox = "&&" in out
    need_ts = bool(_TSMATCH_OP_RE.search(out))
    need_jexists = "?" in out
    need_anyall = bool(
        re.search(r"\b(?:ANY|ALL)\s*\(", out, re.IGNORECASE)
    )
    need_overlaps = bool(_OVERLAPS_RE.search(out))
    need_power = "^" in out
    if _JSONB_ALIAS_RE.search(out) or _NAME_ALIAS_RE.search(out):
        # pure name aliases: PG's jsonb_* spellings of functions Spark
        # ships under json_* (same semantics, json-text input), and
        # starts_with -> startswith (same args/semantics)
        parts = re.split(r"('(?:[^']|'')*')", out)
        for i in range(0, len(parts), 2):
            parts[i] = _JSONB_ALIAS_RE.sub(
                lambda mm: "json_" + mm.group(1).lower(), parts[i]
            )
            parts[i] = _NAME_ALIAS_RE.sub("startswith(", parts[i])
        out = "".join(parts)
    need_misc = bool(
        _TO_CHAR_RE.search(out) or _STR_TO_ARR_RE.search(out)
        or _EXTRACT_EPOCH_RE.search(out) or _JSON_BUILD_RE.search(out)
        or _ARRAY_FN_RE.search(out) or _JSON_ELEMS_RE.search(out)
        or _DATE_BIN_RE.search(out) or _TO_JSONB_RE.search(out)
        or _AT_TZ_ANY_RE.search(out) or _EXTRACT_DOW_RE.search(out)
        or _TRUNC_RE.search(out) or _ENCODE_RE.search(out)
        or _TO_TS_RE.search(out) or _TO_NUMBER_RE.search(out)
        or _BETWEEN_SYM_RE.search(out)
        or re.search(r"\bdate_part\s*\(", out, re.IGNORECASE)
    )
    need_dminus = bool(
        "-" in out and re.search(r"(?i)\bdate\b|\bcurrent_date\b|"
                                 r"\b(?:to_date|make_date|last_day)\s*\(", out)
    )
    # round(provably-double) needs a cast in sight to ever apply
    need_round = bool(
        _ROUND_RE.search(out)
        and re.search(r"(?i)::|\bAS\s+(?:DOUBLE|FLOAT)\b", out)
    )
    need_concat = bool(_CONCAT_RE.search(out))
    need_subscript = "[" in out
    need_intdiv = bool(_SLASH_RE.search(out))
    need_stredges = bool(
        _LEFT_RIGHT_RE.search(out) or _SUBSTR_RE.search(out)
    )
    need_wnulls = bool(_OVER_RE.search(out) and _ORDER_BY_RE.search(out))
    if (need_cont or need_agg or need_spagg or need_rel3 or need_knn
            or need_buf3 or need_rx4 or need_json or need_geog
            or need_pcast or need_bbox or need_misc or need_ts
            or need_jexists or need_anyall or need_overlaps
            or need_power or need_dminus or need_round or need_concat
            or need_subscript or need_intdiv or need_stredges
            or need_wnulls):
        # these operands/arg-lists may span literal segments: protect
        # literals behind identifier-shaped placeholders, rewrite on the
        # joined code, then restore — literal contents stay byte-identical
        parts = re.split(r"('(?:[^']|'')*')", out)
        lits = parts[1::2]
        protected = "".join(
            p if i % 2 == 0 else f"__GEODB_LIT_{i // 2}__"
            for i, p in enumerate(parts)
        )
        if need_concat:
            # FIRST: later passes EMIT concat (to_char's sign splice)
            # that must stay Spark-native
            protected = _rewrite_concat_nulls(protected)
        if need_subscript and "[" in protected:
            # user brackets only — no later pass emits '['
            protected = _rewrite_array_subscript(protected)
        if need_rx4:
            # EARLY: user regexp_replace gets PG first-match/backref
            # semantics; the misc passes below EMIT Spark-global calls
            # (to_number's strip, to_char's zero-trim) that must stay
            protected = _rewrite_regexp_replace(protected, lits)
        if need_knn:
            protected = _rewrite_knn_ops(protected)
        if need_json:
            # after KNN (consumes <->/<#>), before containment/aggs so
            # their operand scanners see the rewritten function calls and
            # no rewrite-generated lambda arrows exist yet
            protected = _rewrite_json_arrows(protected, lits)
        if need_pcast:
            protected = _rewrite_paren_casts(protected)
        if need_geog:
            protected = _rewrite_geography(protected)
        if need_misc:
            protected = _rewrite_misc_pg_funcs(protected, lits)
            protected = _rewrite_to_ts_date(protected, lits)
            if _TO_NUMBER_RE.search(protected):
                protected = _rewrite_to_number(protected, lits)
            if _BETWEEN_SYM_RE.search(protected):
                protected = _rewrite_between_symmetric(protected)
            protected = _rewrite_at_time_zone(protected, lits)
            protected = _rewrite_extract_epoch(protected)
            protected = _rewrite_extract_dow(protected)
            protected = _rewrite_date_part_epoch(protected, lits)
            protected = _rewrite_to_jsonb(protected)
            protected = _rewrite_numeric_trunc(protected, lits)
            protected = _rewrite_encode_decode(protected, lits)
            protected = _rewrite_json_build(protected)
            protected = _rewrite_array_funcs(protected, lits)
            # elements_text BEFORE the jsonb_* alias pass cannot apply
            # here (aliases run pre-protection); the name regex matches
            # both json_ and jsonb_ spellings directly
            protected = _rewrite_json_array_elements(protected, lits)
            protected = _rewrite_date_bin(protected, lits)
        if need_dminus:
            # after ::casts (so x::date reads CAST(x AS DATE)) and after
            # the epoch rewrites (whose own difference rule runs first)
            protected = _rewrite_date_minus(protected)
        if need_round and _ROUND_RE.search(protected):
            protected = _rewrite_round_double(protected)
        if need_intdiv and "/" in protected:
            # after ::casts (int-family casts prove operand types); the
            # emitted divisions of earlier passes have non-provable
            # operands and pass through
            protected = _rewrite_int_div(protected)
        if need_stredges:
            protected = _rewrite_str_edges(protected, lits)
        if need_bbox:
            # after containment would also work (&& and @> never nest),
            # but BEFORE it keeps the operand scanners simple; && must
            # run before nothing else emits '&&'
            protected = _rewrite_bbox_overlap(protected)
        if need_ts:
            protected = _rewrite_tsmatch(protected)
        if need_jexists and _JSONB_EXISTS_RE.search(protected):
            protected = _rewrite_jsonb_exists(protected)
        if need_overlaps:
            protected = _rewrite_overlaps(protected)
        if need_power and _POWER_OP_RE.search(protected):
            protected = _rewrite_power(protected)
        if need_anyall:
            protected = _rewrite_any_all(protected)
        if need_cont:
            protected = _rewrite_containment(protected)
        if need_agg:
            protected = _rewrite_agg_orderby(protected)
        if need_spagg:
            protected = _rewrite_spatial_aggs(protected)
        if need_rel3:
            protected = _rewrite_relate3(protected)
        if need_buf3:
            protected = _rewrite_buffer3(protected)
        if need_wnulls and _OVER_RE.search(protected):
            # LAST: the aggregate rewrites above consumed their own
            # WITHIN-GROUP order clauses; whatever ORDER BY remains sits
            # in a window spec and takes PG's NULL placement
            protected = _rewrite_window_order_nulls(protected)
        out = re.sub(
            r"__GEODB_LIT_(\d+)__",
            lambda mm: lits[int(mm.group(1))],
            protected,
        )
    return _pg_literal_backslashes(out)


def _pg_literal_backslashes(sql: str) -> str:
    """Spark's SQL parser treats backslash as an escape inside string
    literals; PG (standard_conforming_strings, the modern default) does
    not — so ``name ~ '\\d+'`` through a verbatim passthrough silently
    matches letter-d runs, and every ``re.escape``'d separator the shim
    emits loses its escapes (r12 probe). Double every backslash inside
    every literal of the FINAL shim output, exactly once, so the value
    Spark parses equals the PG-convention text between the quotes. All
    shim-emitted literals are therefore stored in PG convention (the
    character sequence they mean at runtime), never pre-escaped for
    Spark."""
    if "\\" not in sql:
        return sql
    parts = re.split(r"('(?:[^']|'')*')", sql)
    for i in range(1, len(parts), 2):
        parts[i] = parts[i].replace("\\", "\\\\")
    return "".join(parts)


def _close_paren_lit(code: str, open_idx: int) -> int | None:
    """Like :func:`_close_paren` but quote-aware: parens inside string
    literals ('' is the quote escape — toggles twice, net no-op) don't
    count. For raw FROM-clause text, which is not literal-protected."""
    depth, in_lit = 0, False
    for j in range(open_idx, len(code)):
        ch = code[j]
        if ch == "'":
            in_lit = not in_lit
        elif not in_lit:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return j
    return None


def _split_top_commas_lit(s: str) -> list[str]:
    """Split on commas at paren depth 0 outside string literals — the
    FROM-item / argument splitter for raw (not literal-protected) SQL."""
    items, depth, in_lit, start = [], 0, False, 0
    for i, ch in enumerate(s):
        if ch == "'":
            in_lit = not in_lit
        elif not in_lit:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                items.append(s[start:i])
                start = i + 1
    items.append(s[start:])
    return items


_GEN_SERIES_RE = re.compile(r"\bgenerate_series\s*\(", re.IGNORECASE)


def _rewrite_generate_series(table: str) -> str:
    """PG's ``FROM generate_series(a, b[, step]) [AS] t(i)`` (the
    series/gapfill idiom; DuckDB and PG share it) -> a Spark lateral
    subquery ``(SELECT explode(sequence(a, b[, step])) AS i) t``.
    Spark's ``sequence`` is inclusive on both ends exactly like PG's
    generate_series, for ints and timestamps alike. The args run
    through the clause shim so ``::`` casts inside them translate. The
    unaliased form gets PG's default column name ``generate_series``.
    SELECT-position set-returning calls stay outside the dialect shim
    (SURVEY.md §7) — only the FROM position rewrites."""
    m = _GEN_SERIES_RE.search(table)
    if not m:
        return table
    depth, j, in_lit = 0, m.end() - 1, False
    while j < len(table):
        ch = table[j]
        if ch == "'":
            in_lit = not in_lit  # '' escape toggles twice: net no-op
        elif not in_lit:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        j += 1
    else:
        return table  # unbalanced: leave for Spark's parser
    args = _pg_clause_to_spark(table[m.end(): j])
    rest = table[j + 1:]
    am = re.match(
        r"\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*"
        r"(?:\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\))?",
        rest,
        re.IGNORECASE,
    )
    alias, col, consumed = None, None, 0
    if am and am.group(1).upper() not in _FROM_KEYWORDS:
        alias, col, consumed = am.group(1), am.group(2), am.end()
    col = col or "generate_series"
    sub = f"(SELECT explode(sequence({args})) AS {col})"
    if alias:
        sub += f" {alias}"
    out = table[: m.start()] + sub + rest[consumed:]
    return _rewrite_generate_series(out)  # several series in one FROM


# FROM-position set-returning functions (r10 verdict order 1): the
# reference's own PL/pgSQL iterates FROM json_each_text(...)
# (geodb.sql:224), FROM json_each(...) (:342-345), FROM
# json_array_elements(...) (:246, :364) and FROM unnest(...) (:1797),
# and the passthrough admits them (geodb.sql:1147-1167).
_FROM_SRF_RE = re.compile(
    r"\b(unnest|jsonb?_each_text|jsonb?_each"
    r"|jsonb?_array_elements_text|jsonb?_array_elements"
    r"|jsonb?_object_keys|regexp_split_to_table|string_to_table)\s*\(",
    re.IGNORECASE,
)
_WITH_ORD_RE = re.compile(r"^\s*WITH\s+ORDINALITY\b", re.IGNORECASE)
_CROSS_JOIN_TAIL_RE = re.compile(
    r"\bCROSS\s+JOIN(?:\s+LATERAL)?\s*$", re.IGNORECASE
)
_SRF_ALIAS_RE = re.compile(
    r"^\s*(?:AS\s+)?([A-Za-z_]\w*)\s*"
    r"(?:\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\))?",
    re.IGNORECASE,
)


def _srf_generator(
    fname: str, args: str, with_ord: bool
) -> tuple[str, list[str]]:
    """(generator expression, PG default column names) for one
    FROM-position set-returning function. ``args`` already ran through
    the clause shim. Value semantics:

    - ``unnest(a)`` -> ``explode(a)``; ``WITH ORDINALITY`` -> an
      ``inline(transform(...))`` carrying a 1-based BIGINT ordinal
      (PG's ordinality column, LAST like PG); multi-array
      ``unnest(a, b)`` -> ``inline(arrays_zip(a, b))`` — arrays_zip
      null-pads to the longest array exactly like PG's row form
    - ``json_each_text(j)`` -> explode of ``from_json(j,
      'map<string,string>')`` — scalar values unquote, nested values
      stringify to json text, PG's _text semantics (DOCUMENTED
      DEVIATION: object values re-serialize compactly)
    - ``json_each(j)`` -> same map with values kept json-TYPED as text
      via ``transform_values(..., to_json(variant))`` — string values
      keep their quotes exactly like PG's json-returning form
    - ``json_array_elements[_text](j)`` -> explode of
      ``from_json(j, 'array<variant|string>')`` with the same
      json/text value split
    """
    if fname == "unnest":
        arglist = _split_top_commas_lit(args)
        if len(arglist) > 1:
            if with_ord:
                raise GeoDBError(
                    "unnest(a, b, ...) WITH ORDINALITY is outside the pg "
                    "dialect shim (use a single array)"
                )
            return f"inline(arrays_zip({args}))", ["unnest"] * len(arglist)
        if with_ord:
            return (
                f"inline(transform({args}, (__geodb_v, __geodb_i) -> "
                f"struct(__geodb_v, CAST(__geodb_i + 1 AS BIGINT))))",
                ["unnest", "ordinality"],
            )
        return f"explode({args})", ["unnest"]
    if with_ord:
        raise GeoDBError(
            f"{fname} WITH ORDINALITY is outside the pg dialect shim"
        )
    if fname == "json_each_text":
        return (
            f"explode(from_json({args}, 'map<string,string>'))",
            ["key", "value"],
        )
    if fname == "json_each":
        return (
            f"explode(transform_values("
            f"from_json({args}, 'map<string,variant>'), "
            f"(__geodb_k, __geodb_v) -> to_json(__geodb_v)))",
            ["key", "value"],
        )
    if fname == "json_array_elements_text":
        return f"explode(from_json({args}, 'array<string>'))", ["value"]
    if fname == "json_object_keys":
        # Spark's json_object_keys returns the key array directly
        return f"explode(json_object_keys({args}))", ["json_object_keys"]
    if fname == "regexp_split_to_table":
        # POSIX vs Java regex: the everyday subset is identical; exotic
        # PG-only atoms fail loudly at analysis
        return f"explode(split({args}))", ["regexp_split_to_table"]
    if fname == "string_to_table":
        arglist = _split_top_commas_lit(args)
        if len(arglist) != 2:
            raise GeoDBError(
                "string_to_table(s, 'sep'): exactly 2 arguments (the "
                "3-argument null-string form is outside the shim)"
            )
        # PG splits on the LITERAL separator; split() takes a regex, so
        # a literal separator is regex-escaped (the string_to_array
        # donor); expression separators refuse
        sm = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", arglist[1])
        if sm is None:
            raise GeoDBError(
                "string_to_table: the separator must be a string literal"
            )
        sep = sm.group(1).replace("''", "'")
        esc = re.escape(sep).replace("'", "''")
        return (
            f"explode(split({arglist[0]}, '{esc}'))",
            ["string_to_table"],
        )
    # json_array_elements
    return (
        f"explode(transform(from_json({args}, 'array<variant>'), "
        f"__geodb_v -> to_json(__geodb_v)))",
        ["value"],
    )


def _rewrite_from_srfs(table: str) -> str:
    """PG FROM-position set-returning functions -> Spark ``LATERAL VIEW``
    / lateral subquery forms (the reference's own SQL uses every one —
    geodb.sql:224, :342-345, :246, :364, :1797):

    - ``FROM tbl, unnest(tbl.arr) [AS] t(x)`` (PG's implicit-LATERAL
      comma form, optional explicit ``LATERAL``) ->
      ``FROM tbl LATERAL VIEW explode(tbl.arr) t AS x``
    - ``FROM tbl CROSS JOIN [LATERAL] srf(...) t(...)`` — same rewrite
    - ``FROM srf(literal_args) [AS] t(cols)`` standalone -> a lateral
      subquery ``(SELECT explode(...) AS cols) t`` (the
      generate_series donor shape)

    Spark's grammar hangs LATERAL VIEWs off the END of the FROM clause,
    so SRF items are lifted out of the comma list and appended in their
    original order — generators may reference any preceding relation or
    earlier SRF alias, exactly PG's left-to-right lateral scoping. A
    relation listed AFTER an SRF that the SRF does not reference is
    legal in both (comma join is commutative); PG queries where a LATER
    relation references the SRF's alias are rare and fail loudly at
    analysis. Default aliases/columns follow PG: the function name
    aliases the table; ``unnest``'s scalar column takes a bare ``AS t``
    alias as its COLUMN name (PG's scalar-function rule), json_each*
    yields (key, value), elements yields value. Multi-array unnest
    requires explicit column aliases. SELECT-position SRFs stay with
    the clause shim (``unnest`` -> explode there)."""
    if not _FROM_SRF_RE.search(table):
        return table
    items = _split_top_commas_lit(table)
    plain: list[str] = []
    laterals: list[str] = []
    standalone_subquery: str | None = None
    for item in items:
        pos = 0
        consumed_any = False
        while True:
            m = _FROM_SRF_RE.search(item, pos)
            if m is None:
                break
            # only top-level calls rewrite; nested (subquery/arg) ones
            # belong to their own scope
            head = item[: m.start()]
            if head.count("(") - head.count(")") != 0:
                pos = m.end()
                continue
            prefix = head.strip()
            is_lead = prefix == "" or re.fullmatch(
                r"LATERAL", prefix, re.IGNORECASE
            )
            cj = _CROSS_JOIN_TAIL_RE.search(prefix) if not is_lead else None
            if not is_lead and cj is None:
                # not a FROM item head (e.g. a scalar call inside an ON
                # condition): leave for Spark's parser
                pos = m.end()
                continue
            j = _close_paren_lit(item, m.end() - 1)
            if j is None:
                raise GeoDBError(f"{m.group(1)}: unbalanced parentheses")
            fname = m.group(1).lower().replace("jsonb_", "json_")
            args = _pg_clause_to_spark(item[m.end(): j].strip())
            rest = item[j + 1:]
            with_ord = False
            om = _WITH_ORD_RE.match(rest)
            if om:
                with_ord = True
                rest = rest[om.end():]
            gen, def_cols = _srf_generator(fname, args, with_ord)
            am = _SRF_ALIAS_RE.match(rest)
            alias, cols = fname, def_cols
            if am and am.group(1).upper() not in _FROM_KEYWORDS:
                alias = am.group(1)
                if am.group(2):
                    cols = [c.strip() for c in am.group(2).split(",")]
                    if len(cols) != len(def_cols):
                        raise GeoDBError(
                            f"{fname}: {len(def_cols)} output column(s) "
                            f"expected, alias lists {len(cols)}"
                        )
                elif len(def_cols) == 1:
                    # PG scalar-function rule: a bare alias names the
                    # COLUMN for base-type-returning SRFs (unnest,
                    # json_array_elements*, json_object_keys, the split
                    # tables); composite-returning json_each keeps its
                    # (key, value) names
                    cols = [alias]
                rest = rest[am.end():]
            if len(set(c.lower() for c in cols)) != len(cols):
                raise GeoDBError(
                    f"{fname}: output columns must be uniquely named — "
                    "alias them explicitly, e.g. AS t(a, b)"
                )
            laterals.append(f"LATERAL VIEW {gen} {alias} AS {', '.join(cols)}")
            if is_lead and standalone_subquery is None and not plain:
                # might end up standalone; remember how to render it
                if len(cols) == 1:
                    sel = f"{gen} AS {cols[0]}"
                else:
                    sel = f"{gen} AS ({', '.join(cols)})"
                standalone_subquery = f"(SELECT {sel}) {alias}"
            # drop the SRF text from the item, keep surrounding joins
            keep_head = prefix[: cj.start()] if cj else ""
            item = keep_head + rest
            pos = 0
            consumed_any = True
        item = item.strip()
        if item:
            plain.append(item)
        elif not consumed_any:
            raise GeoDBError("empty FROM item")
    if not plain:
        # no base relation: the first SRF becomes a lateral subquery
        # (literal-args form), the rest stay LATERAL VIEWs on it
        if standalone_subquery is None:
            raise GeoDBError(
                "FROM-position set-returning function without a base "
                "relation must come first in the FROM list"
            )
        plain = [standalone_subquery]
        laterals = laterals[1:]
    out = ", ".join(plain)
    if laterals:
        out += " " + " ".join(laterals)
    return out


_DISTINCT_ON_RE = re.compile(r"\s*DISTINCT\s+ON\s*\(", re.IGNORECASE)


def _split_distinct_on(select: str) -> tuple[str, str] | None:
    """``DISTINCT ON (k1, k2) rest`` -> ``("k1, k2", "rest")`` with
    balanced-paren scanning (keys may contain function calls); None when
    the select list is not a DISTINCT ON form."""
    m = _DISTINCT_ON_RE.match(select)
    if not m:
        return None
    depth, i = 0, m.end() - 1
    for i in range(m.end() - 1, len(select)):
        if select[i] == "(":
            depth += 1
        elif select[i] == ")":
            depth -= 1
            if depth == 0:
                return select[m.end(): i].strip(), select[i + 1:].strip()
    raise GeoDBError("Unbalanced parentheses in DISTINCT ON (...)")


def build_pg_sql(
    table: str,
    select: str = "*",
    where: str | None = None,
    group: str | None = None,
    order: str | None = None,
    limit: int | None = None,
    offset: int | None = None,
    columns: list[str] | None = None,
) -> str:
    """Clause-ordered SELECT built exactly like ``geodb_get_pg``
    (``geodb.sql:1147-1167``): SELECT -> WHERE -> GROUP -> ORDER -> LIMIT ->
    OFFSET, with OFFSET emitted only when LIMIT is set.

    ``DISTINCT ON (keys) rest`` (the most common PG idiom Spark's parser
    rejects — reference passthrough geodb.sql:1147-1167) rewrites to the
    standard row_number window: first row per key group under the ORDER BY
    (PG semantics: WHERE before DISTINCT ON; no ORDER BY -> arbitrary
    group representative, here pinned to ORDER BY keys). The window
    partitions on the keys, so Spark executes one hash shuffle on them —
    no global sort, scale-equivalent to PG's sort-unique. ``columns`` (the
    collection's column list, supplied by :func:`get_collection_pg`) is
    required only for the ``DISTINCT ON (...) *`` spelling, to project the
    helper row-number column back out."""
    table = _rewrite_from_srfs(_rewrite_generate_series(table))
    select = _pg_clause_to_spark(select)
    where = _pg_clause_to_spark(where)
    group = _pg_clause_to_spark(group)
    # PG's default NULL placement (LAST asc / FIRST desc) is the
    # opposite of Spark's — make it explicit on every sort item
    order = _pg_order_nulls(_pg_clause_to_spark(order))
    don = _split_distinct_on(select)
    if don is not None:
        keys, rest = don
        rest = rest or "*"
        if group:
            raise GeoDBError(
                "DISTINCT ON combined with GROUP BY is outside the pg "
                "dialect shim (SURVEY.md §7)"
            )
        if rest.strip() == "*":
            if not columns:
                raise GeoDBError(
                    "DISTINCT ON (...) * needs the collection column list "
                    "(get_collection_pg supplies it; pass columns=... here)"
                )
            rest = ", ".join(columns)
        inner = f"SELECT *, row_number() OVER (PARTITION BY {keys} " \
                f"ORDER BY {order or _pg_order_nulls(keys)}) " \
                f"AS __geodb_rn FROM {table}"
        if where:
            inner += f" WHERE {where}"
        sql = f"SELECT {rest} FROM ({inner}) WHERE __geodb_rn = 1"
        if order:
            sql += f" ORDER BY {order}"
        if limit is not None:
            sql += f" LIMIT {int(limit)}"
            if offset:
                sql += f" OFFSET {int(offset)}"
        return sql
    sql = f"SELECT {select} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    if group:
        sql += f" GROUP BY {group}"
    if order:
        sql += f" ORDER BY {order}"
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
        if offset:
            sql += f" OFFSET {int(offset)}"
    return sql


def get_collection_pg(
    catalog: GeoDBCatalog,
    collection: str,
    select: str = "*",
    where: str | None = None,
    group: str | None = None,
    order: str | None = None,
    limit: int | None = None,
    offset: int | None = None,
    database: str = "public",
    raise_empty: bool = False,
) -> DataFrame:
    """Raw-SQL scan (``geodb_get_pg``). Spark SQL parses/optimizes the
    statement (dialect deviation from Postgres documented in SURVEY.md §7);
    PostGIS-style ``st_*`` functions and the PG text-search family
    (``to_tsvector``/``plainto_tsquery``/``ts_match_all`` — the dialect's
    spelling of ``@@``) are available in all clauses."""
    from xcube_geodb_spark.functions.jsonsql import register_json_sql_functions
    from xcube_geodb_spark.functions.textsql import register_text_sql_functions
    from xcube_geodb_spark.geometry.sqlfuncs import register_spatial_sql_functions

    register_spatial_sql_functions(catalog.spark)
    register_text_sql_functions(catalog.spark)
    register_json_sql_functions(catalog.spark)
    df = catalog.load_df(collection, database)
    view = _view_name(database, collection)
    # re-registering the same handle is a pure py4j round trip; load_df
    # memoizes handles per manifest version, so identity implies the view
    # is already bound to this exact snapshot. A caller who drops the
    # view out-of-band (spark.catalog.dropTempView) is healed by the
    # tableExists check; REBINDING the same name directly via
    # createOrReplaceTempView (instead of run_sql, which keeps the memo
    # truthful) is out of contract — these __geodb_* names belong to the
    # engine.
    memo_key = (id(catalog.spark), view)
    if _VIEW_MEMO.get(memo_key) is not df or not catalog.spark.catalog.tableExists(
        view
    ):
        df.createOrReplaceTempView(view)
        _VIEW_MEMO[memo_key] = df
    out = catalog.spark.sql(
        build_pg_sql(
            view, select, where, group, order, limit, offset,
            columns=list(df.columns),
        )
    )
    if raise_empty and out.isEmpty():
        # parity with geodb.sql:1171-1175 ("Empty result")
        raise GeoDBError("Empty result")
    return out


def run_sql(catalog: GeoDBCatalog, sql: str, views: dict[str, DataFrame]) -> DataFrame:
    """Engine superset: arbitrary Spark SQL over registered collections."""
    for name, df in views.items():
        df.createOrReplaceTempView(name)
        # a caller may rebind a name get_collection_pg also uses; keep the
        # skip-if-identical memo truthful about what the view holds now
        _VIEW_MEMO[(id(catalog.spark), name)] = df
    return catalog.spark.sql(sql)


def count_collection(
    catalog: GeoDBCatalog,
    collection: str,
    database: str = "public",
    exact: bool = True,
) -> int:
    """Row count (``geodb_count_collection`` geodb.sql:1259-1273 /
    ``geodb_estimate_collection_count`` :1276-1303). Both paths read parquet
    footers — exact and O(files), no Spark job (SURVEY.md §4)."""
    from xcube_geodb_spark.operators.stats import footer_row_count
    import os

    m = catalog.meta(collection, database)
    fstats = m.file_stats()
    if all(f in fstats and "::rows" in fstats[f] for f in m.files):
        # commit-time row counts in the manifest: zero-IO exact count
        return sum(fstats[f]["::rows"][0] for f in m.files)
    paths = [
        os.path.join(catalog.warehouse, database, collection, f) for f in m.files
    ]
    return footer_row_count(paths)
