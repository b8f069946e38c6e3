"""BM25 full-text retrieval over a document table.

The reference's full-text surface is the PostgREST ``fts`` filter family
(boolean token match, ``xcube_geodb/sql/geodb.sql`` raw-SQL passthrough
admits ``to_tsquery``); ranking a corpus against a query is the natural
next step for a training-data pipeline (e.g. mining documents relevant to
a benchmark prompt).  This module implements Okapi BM25 as pure Column
algebra, designed to stay cheap at 100 TB:

- Query terms are a handful of literals, so per-document term frequencies
  are ``size(filter(tokens, t == term))`` **columns** — no corpus explode,
  no (doc, term) shuffle, the whole score is one codegen'd projection.
- The only full passes are two tiny aggregations (corpus size + average
  document length, per-term document frequencies), each reducing to a
  single driver row of scalars, the same pattern the IVF centroid seed
  uses.
- Top-k is ``orderBy(score).limit(k)`` → TakeOrderedAndProject (per
  partition heaps, no global sort).

Scoring is arranged so a SQL oracle replays it bit-for-bit: integer
inputs (tf, dl, N, df), one fixed association for every float expression,
and a final ``round(score, 6)``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.text import tokens

__all__ = ["term_frequency", "bm25_score", "bm25_topk"]


def term_frequency(toks: Column, term: str) -> Column:
    """Occurrences of ``term`` in the token array — a codegen'd
    higher-order-function filter, no explode."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def _corpus_stats(docs: DataFrame, toks: Column, terms: list[str]):
    """One aggregation pass: corpus size, total token count, and the
    document frequency of every query term.  Returns plain Python ints —
    a single driver row, independent of corpus size."""
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size(toks)).alias("__dl"),
    ]
    for i, term in enumerate(terms):
        aggs.append(
            F.sum((term_frequency(toks, term) > 0).cast("long")).alias(f"__df{i}")
        )
    row = docs.agg(*aggs).collect()[0]
    return int(row["__n"]), int(row["__dl"]), [int(row[f"__df{i}"]) for i in range(len(terms))]


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Adds a ``bm25`` column scoring every document against ``terms``.

    idf uses the standard non-negative variant
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``; term scores are summed in
    query order (fixed float association so any engine replays the sum),
    then rounded to 6 decimals.
    """
    if not terms:
        raise ValueError("bm25_score needs at least one query term")
    toks = tokens(F.col(text_col))
    n_docs, total_dl, dfs = _corpus_stats(docs, toks, terms)
    avgdl = total_dl / n_docs if n_docs else 1.0

    dl = F.size(toks).cast("double")
    score = None
    for term, dfv in zip(terms, dfs):
        idf = math.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        tf = term_frequency(toks, term).cast("double")
        part = F.lit(idf) * (
            tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl)))
        )
        score = part if score is None else score + part
    return docs.withColumn("bm25", F.round(score, 6))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 — deterministic (ties broken by id), and
    physically a TakeOrderedAndProject: every partition keeps a local
    k-heap, the driver merges k-sized lists, nothing global is sorted."""
    scored = bm25_score(docs, terms, text_col=text_col, k1=k1, b=b)
    return (
        scored.select(id_col, "bm25")
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
