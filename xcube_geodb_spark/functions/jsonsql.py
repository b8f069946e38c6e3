"""json/jsonb functions registered into Spark SQL for the raw-SQL path.

SURVEY.md §4: the reference's ``get_collection_pg`` admits any Postgres
built-in inside raw clauses (geodb.sql:1147-1167), including the jsonb
operator surface. Spark's ``||`` is STRING concatenation, so the PG
``jsonb || jsonb`` merge/concatenate operator cannot pass through — the
dialect shim refuses it loudly (operators/scan._guard_jsonb_concat) and
points here: ``jsonb_merge(a, b)`` is the registered function spelling
with PG's exact ``||`` semantics.

Like the text-search surface (functions/textsql.py), the function is an
Arrow-batched ``pandas_udf`` wrapping a scalar kernel — Arrow column
transfer, never per-value pickling.

Registered names:

- ``jsonb_set(target, path, new_value[, create_missing])`` — PG's
  path-replace on json text; the shim pads the 3-argument spelling.
  Missing INTERMEDIATE path steps return the target unchanged and
  create_missing adds leaves / clamps array appends, exactly PG.
- ``jsonb_delete(j, key_or_index)`` — the PG ``-`` operator (the shim
  rewrites provably-json ``-`` spellings here): object - key,
  array - position (negative from the end), array - string element.
- ``jsonb_delete_path(j, '{a,b,1}')`` — the PG ``#-`` operator.
- ``jsonb_merge(a, b)`` — PG ``jsonb || jsonb``: object || object is a
  SHALLOW merge with the right operand winning on key collisions (and
  null-valued keys KEPT, unlike RFC-7386 merge-patch); any other
  combination concatenates as arrays with non-array operands wrapped
  as single elements (``'[1]' || '2'`` -> ``[1, 2]``,
  ``'{"a":1}' || '[2]'`` -> ``[{"a": 1}, 2]``) — exactly PG. Output
  renders in PG's jsonb text form: object keys sorted by (length,
  byte order) at every level, ``", "`` / ``": "`` separators.
  DOCUMENTED DEVIATION: malformed json input yields NULL instead of an
  error (the engine's try-parse convention, same as the ``->`` shim).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def pg_jsonb_dumps(v) -> str:
    """Serialize a parsed json value exactly as PG renders jsonb text:
    object keys sorted by (byte length, byte order) at every nesting
    level — PG's jsonb storage order — with ``", "``/``": "``
    separators; arrays keep element order."""
    if isinstance(v, dict):
        items = sorted(
            v.items(),
            key=lambda kv: (len(kv[0].encode()), kv[0].encode()),
        )
        return (
            "{"
            + ", ".join(
                json.dumps(k, ensure_ascii=False) + ": " + pg_jsonb_dumps(x)
                for k, x in items
            )
            + "}"
        )
    if isinstance(v, list):
        return "[" + ", ".join(pg_jsonb_dumps(x) for x in v) + "]"
    return json.dumps(v, ensure_ascii=False)


def jsonb_merge_py(a: str | None, b: str | None) -> str | None:
    """Scalar kernel: PG ``jsonb || jsonb`` on json text (semantics in
    the module docstring)."""
    if a is None or b is None:
        return None
    try:
        va, vb = json.loads(a), json.loads(b)
    except (ValueError, TypeError):
        return None
    if isinstance(va, dict) and isinstance(vb, dict):
        return pg_jsonb_dumps({**va, **vb})
    la = va if isinstance(va, list) else [va]
    lb = vb if isinstance(vb, list) else [vb]
    return pg_jsonb_dumps(la + lb)


def _parse_path(path) -> list | None:
    """A PG text-array path literal (``'{a,b,1}'``) or an already-split
    list -> list of steps (ints for array positions)."""
    if path is None:
        return None
    if isinstance(path, str):
        p = path.strip()
        if not (p.startswith("{") and p.endswith("}")):
            return None
        steps = [s.strip().strip('"') for s in p[1:-1].split(",")]
        if steps == [""]:
            return []
    else:
        steps = [str(s) for s in path]
    out = []
    for s in steps:
        if re.fullmatch(r"-?\d+", s):
            out.append(int(s))
        else:
            out.append(s)
    return out


def _walk_parent(root, steps):
    """Follow all but the last path step; None when any intermediate is
    missing or mistyped (PG jsonb_set / #- return the target unchanged
    then)."""
    node = root
    for s in steps[:-1]:
        if isinstance(node, dict) and isinstance(s, str) and s in node:
            node = node[s]
        elif isinstance(node, list) and isinstance(s, int):
            i = s if s >= 0 else len(node) + s
            if 0 <= i < len(node):
                node = node[i]
            else:
                return None
        else:
            return None
    return node


def jsonb_set_py(
    target: str | None, path, new_value: str | None,
    create_missing: bool = True,
) -> str | None:
    """PG ``jsonb_set(target, path, new_value[, create_missing])`` on
    json text: replaces the value at ``path`` (a PG ``'{a,b,1}'``
    text-array literal), creating the leaf only when ``create_missing``
    and the parent exists — a missing INTERMEDIATE step returns the
    target unchanged, exactly PG. Array positions are integers,
    negative counts from the end; appends clamp like PG."""
    if target is None or path is None or new_value is None:
        return None
    steps = _parse_path(path)
    if steps is None:
        return None
    try:
        root = json.loads(target)
        val = json.loads(new_value)
    except (ValueError, TypeError):
        return None
    if not steps:
        return pg_jsonb_dumps(root)
    parent = _walk_parent(root, steps)
    last = steps[-1]
    if isinstance(parent, dict) and isinstance(last, str):
        if last in parent or create_missing:
            parent[last] = val
    elif isinstance(parent, list) and isinstance(last, int):
        i = last if last >= 0 else len(parent) + last
        if 0 <= i < len(parent):
            parent[i] = val
        elif create_missing:
            # PG clamps out-of-range positions to the matching end
            if i < 0:
                parent.insert(0, val)
            else:
                parent.append(val)
    return pg_jsonb_dumps(root)


def jsonb_delete_py(j: str | None, key) -> str | None:
    """PG ``jsonb - key``: object - text removes the key; array - int
    removes the (possibly negative) position; array - text removes
    string elements equal to it. Scalar targets yield NULL (PG errors;
    the engine's try-parse convention)."""
    if j is None or key is None:
        return None
    try:
        v = json.loads(j)
    except (ValueError, TypeError):
        return None
    if isinstance(v, dict):
        v.pop(str(key), None)
        return pg_jsonb_dumps(v)
    if isinstance(v, list):
        if isinstance(key, int) or (
            isinstance(key, str) and re.fullmatch(r"-?\d+", key)
        ):
            i = int(key)
            i = i if i >= 0 else len(v) + i
            if 0 <= i < len(v):
                del v[i]
        else:
            v = [x for x in v if x != key]
        return pg_jsonb_dumps(v)
    return None


def jsonb_delete_path_py(j: str | None, path) -> str | None:
    """PG ``jsonb #- '{a,b,1}'``: delete the leaf the path designates;
    a missing path returns the target unchanged, exactly PG."""
    if j is None or path is None:
        return None
    steps = _parse_path(path)
    if steps is None:
        return None
    try:
        root = json.loads(j)
    except (ValueError, TypeError):
        return None
    if not steps:
        return pg_jsonb_dumps(root)
    parent = _walk_parent(root, steps)
    last = steps[-1]
    if isinstance(parent, dict) and isinstance(last, str):
        parent.pop(last, None)
    elif isinstance(parent, list) and isinstance(last, int):
        i = last if last >= 0 else len(parent) + last
        if 0 <= i < len(parent):
            del parent[i]
    return pg_jsonb_dumps(root)


import weakref

# id(session) -> weakref to the session (see textsql._REGISTERED: a bare
# id set goes stale under id reuse after a session is garbage-collected)
_REGISTERED: "weakref.WeakValueDictionary[int, SparkSession]" = (
    weakref.WeakValueDictionary()
)


def register_json_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration into the session's SQL dialect
    (Arrow-batched via geometry.sqlfuncs._vec — see that module's note
    on why the scalar kernels stay the single source of truth). Memoized
    per session: each ``spark.udf.register`` is a py4j round trip, and
    the scan path calls this on every query."""
    from xcube_geodb_spark.geometry.sqlfuncs import _vec

    key = id(spark)
    if _REGISTERED.get(key) is spark:
        return
    _REGISTERED[key] = spark

    spark.udf.register("jsonb_merge", _vec(jsonb_merge_py, T.StringType()))
    spark.udf.register("jsonb_set", _vec(jsonb_set_py, T.StringType()))
    spark.udf.register("jsonb_delete", _vec(jsonb_delete_py, T.StringType()))
    spark.udf.register(
        "jsonb_delete_path", _vec(jsonb_delete_path_py, T.StringType())
    )
