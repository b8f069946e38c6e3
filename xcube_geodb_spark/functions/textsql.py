"""Text-search functions registered into Spark SQL for the raw-SQL path.

SURVEY.md §4: the reference's ``get_collection_pg`` admits any Postgres
built-in inside raw ``select``/``where`` strings — including the text
search family (``to_tsvector``, ``plainto_tsquery``, ``@@``). Spark SQL
has no ``@@`` operator, so matching is exposed as boolean functions
(``ts_match_all`` / ``ts_match_any``), the same dialect deviation as the
``::``/``~`` shims documented in SURVEY.md §7.

Like the spatial surface (geometry/sqlfuncs.py), every function is
registered as an Arrow-batched ``pandas_udf`` wrapping the scalar
kernels — Arrow column transfer, never per-value pickling. (The engine's
fts filters and the fts token-bloom index use the pure Column tree in
functions/porter.py and never touch this surface at all.)

Registered names:

- ``geodb_stem(word)`` — Porter stem of one lower-case token
- ``to_tsvector(config, text)`` — sorted distinct lexemes of ``text``
  (config ``english`` stems, ``simple`` doesn't), as ``array<string>``
- ``plainto_tsquery(config, query)`` — the query's lexemes in order
- ``ts_match_all(vec, query_lexemes)`` — every lexeme present (PG
  ``vec @@ plainto_tsquery(...)`` semantics: plainto ANDs its words)
- ``ts_match_any(vec, query_lexemes)`` — at least one lexeme present
- ``ts_rank(config, text, query_lexemes [, normalization])`` — PG
  word-frequency rank: n/(n+1) per matched distinct term (uniform
  weights; normalization bits 1 and 2 supported)
- ``ts_rank_cd(config, text, query_lexemes [, normalization])`` — cover
  density: 1/width per minimal window containing all query terms
- ``ts_headline(config, text, query_lexemes)`` — a highlighted fragment:
  words whose lexeme matches the query wrap in ``<b>...</b>``; the
  window centers on the BEST COVER (the tightest span containing every
  query term present — PG's cover-density fragment choice, ties to the
  earliest cover), falling back to the first match when no full cover
  exists (simplified PG defaults: ~35 words, StartSel/StopSel fixed)
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
    """Highlighted fragment with PG-style COVER selection: the window
    centers on the best cover — the tightest word span containing every
    distinct query term that appears in the document (ts_headline's
    cover-density fragment choice; ties -> earliest). Documents where no
    full cover exists fall back to the first matching word; no match at
    all returns the leading words unmarked."""
    if text is None or query is None:
        return None
    qset = set(query)
    words = text.split()
    cfg = (config or "english").lower()
    marked = []
    hit_terms: list[set | None] = []
    for w in words:
        lex = _lexemes(cfg, w)
        terms = {t for t in lex if t in qset} if lex else set()
        hit_terms.append(terms or None)
        marked.append(f"<b>{w}</b>" if terms else w)
    present = set().union(*(t for t in hit_terms if t)) if any(
        hit_terms
    ) else set()
    anchor, anchor_end = None, None
    if present:
        # tightest cover of ALL present terms: same two-pointer sweep as
        # ts_rank_cd, tracking the minimal width
        last: dict[str, int] = {}
        best = None  # (width, start, end)
        for i, terms in enumerate(hit_terms):
            if not terms:
                continue
            for t in terms:
                last[t] = i
            if len(last) == len(present):
                left = min(last.values())
                cand = (i - left + 1, left, i)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            anchor, anchor_end = best[1], best[2]
        else:
            anchor = next(i for i, t in enumerate(hit_terms) if t)
            anchor_end = anchor
    if anchor is None:
        anchor, anchor_end = 0, 0
    # window: lead-in before the cover, cropped to the word budget
    start = max(0, anchor - _HEAD_LEAD_WORDS)
    if anchor_end - start + 1 > _HEAD_MAX_WORDS:
        start = anchor  # cover wider than the budget: start at its head
    frag = marked[start : start + _HEAD_MAX_WORDS]
    head = "... " if start > 0 else ""
    tail = " ..." if start + _HEAD_MAX_WORDS < len(marked) else ""
    return head + " ".join(frag) + tail


# positional lexeme stream (duplicates kept, elision applied) — what
# ts_rank/ts_rank_cd need; _lexemes already preserves duplicates (the
# distinct-set happens in to_tsvector's registration)
_lexeme_stream = _lexemes


def _ts_rank(config: str, text: str | None, query: list | None,
             normalization: int = 0) -> float | None:
    """PG ``ts_rank`` core: each matched query term contributes
    ``n/(n+1)`` where n is its occurrence count (tsrank.c's
    word-frequency weight with uniform D-weights — position/weight-label
    structure is not modeled; documented deviation). Normalization bits
    supported: 1 (divide by 1+log(length)), 2 (divide by length)."""
    import math

    if text is None or query is None:
        return None
    stream = _lexeme_stream(config, text)
    counts: dict[str, int] = {}
    for t in stream:
        counts[t] = counts.get(t, 0) + 1
    rank = 0.0
    for q in dict.fromkeys(query):  # distinct, order-preserving
        n = counts.get(q, 0)
        if n:
            rank += n / (n + 1.0)
    norm = int(normalization or 0)
    if norm & 1:
        rank /= 1.0 + math.log(max(len(stream), 1))
    if norm & 2:
        rank /= max(len(stream), 1)
    return round(rank, 9)


def _ts_rank_cd(config: str, text: str | None, query: list | None,
                normalization: int = 0) -> float | None:
    """PG ``ts_rank_cd`` (cover density, Clarke et al.): every MINIMAL
    window of the lexeme stream containing ALL query terms contributes
    ``1/width``; the standard two-pointer sweep enumerates the minimal
    covers. Weight labels are not modeled (uniform weights — PG default
    D=0.1 scaling omitted so ranks are pure cover density; documented
    deviation). Normalization bits 1 and 2 as in :func:`_ts_rank`."""
    import math

    if text is None or query is None:
        return None
    stream = _lexeme_stream(config, text)
    need = set(query)
    if not need or not need <= set(stream):
        rank = 0.0
    else:
        # minimal covers: for each right endpoint completing a cover,
        # shrink the left edge maximally
        last: dict[str, int] = {}
        rank = 0.0
        for i, t in enumerate(stream):
            if t not in need:
                continue
            last[t] = i
            if len(last) == len(need):
                left = min(last.values())
                width = i - left + 1
                rank += 1.0 / width
                # only the TIGHTEST cover per right-completion counts:
                # drop the term at the left edge so the next completion
                # finds a fresh minimal window
                for k, v in list(last.items()):
                    if v == left:
                        del last[k]
    norm = int(normalization or 0)
    if norm & 1:
        rank /= 1.0 + math.log(max(len(stream), 1))
    if norm & 2:
        rank /= max(len(stream), 1)
    return round(rank, 9)


import weakref

# id(session) -> weakref to the session it was registered on. A bare id
# set would go stale when a session is garbage-collected and CPython
# reuses its id for a NEW session — registration would be silently
# skipped there. The weak value dies with the session, and the identity
# check rejects an id-reuse hit on a different live object.
_REGISTERED: "weakref.WeakValueDictionary[int, SparkSession]" = (
    weakref.WeakValueDictionary()
)


def register_text_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration into the session's SQL dialect (each name
    Arrow-batched via geometry.sqlfuncs._vec — see that module's note on
    why the scalar kernels stay the single source of truth). Memoized per
    session: each ``spark.udf.register`` is a py4j round trip, and the
    scan path calls this on every query."""
    from xcube_geodb_spark.geometry.sqlfuncs import _vec

    key = id(spark)
    if _REGISTERED.get(key) is spark:
        return
    _REGISTERED[key] = spark

    arr = T.ArrayType(T.StringType())

    def _register(name, fn, ret):
        spark.udf.register(name, _vec(fn, ret))

    _register(
        "geodb_stem", lambda w: porter_py(w) if w is not None else None,
        T.StringType(),
    )
    _register(
        "to_tsvector",
        lambda cfg, text: (
            sorted(set(_lexemes(cfg, text))) if text is not None else None
        ),
        arr,
    )
    _register("plainto_tsquery", _lexemes, arr)
    _register(
        "ts_match_all",
        lambda vec, q: (
            None
            if vec is None or q is None
            else all(t in set(vec) for t in q)
        ),
        T.BooleanType(),
    )
    _register("ts_headline", _headline, T.StringType())
    _register("ts_rank", _ts_rank, T.DoubleType())
    _register("ts_rank_cd", _ts_rank_cd, T.DoubleType())
    _register(
        "ts_match_any",
        lambda vec, q: (
            None
            if vec is None or q is None
            else any(t in set(vec) for t in q)
        ),
        T.BooleanType(),
    )
