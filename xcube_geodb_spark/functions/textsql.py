"""Text-search functions registered into Spark SQL for the raw-SQL path.

SURVEY.md §4: the reference's ``get_collection_pg`` admits any Postgres
built-in inside raw ``select``/``where`` strings — including the text
search family (``to_tsvector``, ``plainto_tsquery``, ``@@``). Spark SQL
has no ``@@`` operator, so matching is exposed as boolean functions
(``ts_match_all`` / ``ts_match_any``), the same dialect deviation as the
``::``/``~`` shims documented in SURVEY.md §7.

Like the spatial surface (geometry/sqlfuncs.py), these are row-at-a-time
UDFs: a compatibility surface for ad-hoc SQL, not the hot path. The
engine's fts filters and the fts token-bloom index use the pure Column
tree in functions/porter.py instead.

Registered names:

- ``geodb_stem(word)`` — Porter stem of one lower-case token
- ``to_tsvector(config, text)`` — sorted distinct lexemes of ``text``
  (config ``english`` stems, ``simple`` doesn't), as ``array<string>``
- ``plainto_tsquery(config, query)`` — the query's lexemes in order
- ``ts_match_all(vec, query_lexemes)`` — every lexeme present (PG
  ``vec @@ plainto_tsquery(...)`` semantics: plainto ANDs its words)
- ``ts_match_any(vec, query_lexemes)`` — at least one lexeme present
- ``ts_headline(config, text, query_lexemes)`` — a highlighted fragment:
  words whose lexeme matches the query wrap in ``<b>...</b>``, cropped
  to a window around the first match (simplified PG defaults: ~35 words,
  StartSel/StopSel fixed; cover-density ranking of fragments is not
  implemented — documented deviation)
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.functions.porter import porter_py

_CONFIGS = ("english", "en", "simple")


def _lexemes(config: str, text: str | None) -> list[str] | None:
    if text is None:
        return None
    cfg = (config or "english").lower()
    if cfg not in _CONFIGS:
        raise GeoDBError(
            f"Unknown text search configuration {config!r} "
            "(available: english, simple)"
        )
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if cfg in ("english", "en"):
        from xcube_geodb_spark.functions.stopwords import ENGLISH_STOPWORDS

        # PG's english config elides stopwords in BOTH to_tsvector and
        # plainto_tsquery before stemming
        toks = [
            porter_py(t) for t in toks if t not in ENGLISH_STOPWORDS
        ]
    return toks


_HEAD_MAX_WORDS = 35
_HEAD_LEAD_WORDS = 7


def _headline(config: str, text: str | None, query: list[str] | None):
    if text is None or query is None:
        return None
    qset = set(query)
    words = text.split()
    cfg = (config or "english").lower()
    marked = []
    first = None
    for i, w in enumerate(words):
        lex = _lexemes(cfg, w)
        hit = bool(lex) and any(t in qset for t in lex)
        if hit and first is None:
            first = i
        marked.append(f"<b>{w}</b>" if hit else w)
    start = max(0, (first or 0) - _HEAD_LEAD_WORDS)
    frag = marked[start : start + _HEAD_MAX_WORDS]
    head = "... " if start > 0 else ""
    tail = " ..." if start + _HEAD_MAX_WORDS < len(marked) else ""
    return head + " ".join(frag) + tail


def register_text_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration into the session's SQL dialect."""
    arr = T.ArrayType(T.StringType())

    spark.udf.register(
        "geodb_stem", lambda w: porter_py(w) if w is not None else None,
        T.StringType(),
    )
    spark.udf.register(
        "to_tsvector",
        lambda cfg, text: (
            sorted(set(_lexemes(cfg, text))) if text is not None else None
        ),
        arr,
    )
    spark.udf.register("plainto_tsquery", _lexemes, arr)
    spark.udf.register(
        "ts_match_all",
        lambda vec, q: (
            None
            if vec is None or q is None
            else all(t in set(vec) for t in q)
        ),
        T.BooleanType(),
    )
    spark.udf.register("ts_headline", _headline, T.StringType())
    spark.udf.register(
        "ts_match_any",
        lambda vec, q: (
            None
            if vec is None or q is None
            else any(t in set(vec) for t in q)
        ),
        T.BooleanType(),
    )
