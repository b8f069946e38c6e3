"""English stopword elision for the ``fts(english)`` dictionary.

PG's ``english`` text-search configuration drops stopwords from both the
tsvector and the tsquery before stemming (the Snowball project's public
English stopword list, which PostgreSQL ships verbatim as
``english.stop``). The engine applies the same list on both sides:

- document tokens: filtered out before Porter stemming (filters._fts,
  operators/stats english blooms, retrieval's stemmed postings);
- query terms: a term that IS a stopword is dropped from its group; a
  group left empty disappears; a query left with no groups matches
  nothing (PG: the empty tsquery matches no document).

Apostrophe forms of the Snowball list (``i'm``, ``don't`` ...) are
omitted: the engine's tokenizer splits on ``[^a-z0-9]+`` so those
surface forms can never appear as tokens (documented deviation;
fragments like ``don``/``t`` are NOT treated as stopwords).

Phrase semantics (PG parity since r7): elided stopwords leave
POSITIONAL GAPS exactly as ``phraseto_tsquery`` produces them —
``'the cat in the hat'`` becomes ``cat <3> hat``, and ANY token
(stopword or not) may occupy the gap positions. The scan path matches
the gap pattern as a regex over the original token stream
(filters._fts ``phfts`` branch); the index path stores original-stream
positions and intersects offset-shifted postings
(retrieval.positional_index / phrase_docs_from_index).
"""

from __future__ import annotations

# Snowball English stopword list (public; snowballstem.org english/stop.txt,
# = PostgreSQL's english.stop), apostrophe forms omitted (see module doc)
ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    """
    i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are
    was were be been being have has had having do does did doing would
    should could ought cannot a an the and but if or because as until while
    of at by for with about against between into through during before
    after above below to from up down in out on off over under again
    further then once here there when where why how all any both each few
    more most other some such no nor not only own same so than too very
    """.split()
)

# deterministic order for generated SQL / Column literals
ENGLISH_STOPWORDS_SORTED: tuple[str, ...] = tuple(sorted(ENGLISH_STOPWORDS))


def is_stopword(word: str) -> bool:
    return word in ENGLISH_STOPWORDS


def stopword_sql_list() -> str:
    """DuckDB list literal of the stopword set, for oracle twins:
    ``['a', 'about', ...]``."""
    return "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS_SORTED) + "]"


def stopword_filter_sql(toks_expr: str) -> str:
    """DuckDB snippet filtering a token-list expression to non-stopwords
    — the twin of the Column-side ``F.filter(toks, ~isin(stopwords))``."""
    return (
        f"list_filter({toks_expr}, t -> NOT list_contains("
        f"{stopword_sql_list()}, t))"
    )
