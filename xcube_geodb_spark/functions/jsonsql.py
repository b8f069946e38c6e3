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


def register_json_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration into the session's SQL dialect
    (Arrow-batched via geometry.sqlfuncs._vec — see that module's note
    on why the scalar kernels stay the single source of truth)."""
    from xcube_geodb_spark.geometry.sqlfuncs import _vec

    spark.udf.register("jsonb_merge", _vec(jsonb_merge_py, T.StringType()))
