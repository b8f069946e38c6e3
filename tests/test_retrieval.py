"""BM25 retrieval: parity with a straight Python reimplementation, rank
sanity, and the physical plan contract (no UDF, top-k never global-sorts).

Reference surface: the reference exposes boolean full-text match via the
PostgREST ``fts`` family and arbitrary ``to_tsquery`` through the raw-SQL
passthrough (xcube_geodb/sql/geodb.sql); ranked retrieval is the engine's
training-pipeline superset.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.retrieval import bm25_score, bm25_topk

DOCS = [
    (1, "spark shuffle join spark spark"),
    (2, "hash table scan merge"),
    (3, "window sort window"),
    (4, "spark hash window merge spark"),
    (5, "unrelated words only here"),
    (6, ""),
]


def _py_bm25(terms, k1=1.2, b=0.75):
    corpus = {i: t.lower().split() if t else [""] for i, t in DOCS}
    # functions/text.normalized maps "" to [""] via split; mirror that
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    out = {}
    for i, toks in corpus.items():
        dl = len(toks)
        s = 0.0
        for t in terms:
            df = sum(1 for v in corpus.values() if t in v)
            tf = toks.count(t)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl)))
        out[i] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestBm25:
    def test_matches_python_reference(self, docs):
        terms = ["spark", "hash", "window"]
        got = {
            r["doc_id"]: r["bm25"]
            for r in bm25_score(docs, terms).select("doc_id", "bm25").collect()
        }
        want = _py_bm25(terms)
        for i in want:
            assert got[i] == pytest.approx(want[i], abs=2e-6), i

    def test_rank_sanity(self, docs):
        # doc 4 contains all three query terms; doc 5/6 contain none
        rows = bm25_topk(docs, ["spark", "hash", "window"], k=6).collect()
        assert rows[0]["doc_id"] == 4
        assert {r["doc_id"] for r in rows[-2:]} == {5, 6}
        assert all(r["bm25"] == 0.0 for r in rows[-2:])

    def test_topk_deterministic_ties(self, docs):
        a = [r["doc_id"] for r in bm25_topk(docs, ["spark"], k=6).collect()]
        b = [r["doc_id"] for r in bm25_topk(docs, ["spark"], k=6).collect()]
        assert a == b

    def test_requires_terms(self, docs):
        with pytest.raises(ValueError):
            bm25_score(docs, [])

    def test_plan_no_udf_and_heap_topk(self, docs):
        plan = bm25_topk(docs, ["spark", "hash"], k=3)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort
