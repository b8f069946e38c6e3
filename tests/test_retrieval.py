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


class TestBm25Join:
    QUERIES = [(1, "spark hash"), (2, "window"), (3, "zzz qqq")]

    def _run(self, spark, k=3):
        from xcube_geodb_spark.functions.retrieval import bm25_join

        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame(self.QUERIES, ["query_id", "query_text"])
        return bm25_join(docs, q, k=k)

    def test_matches_single_query_scores(self, spark):
        # per-(query, doc) scores equal the single-query scorer for every
        # doc that matches at least one term
        rows = self._run(spark, k=10).collect()
        got = {(r["query_id"], r["doc_id"]): r["bm25"] for r in rows}
        for qid, qtext in self.QUERIES:
            want = _py_bm25(qtext.split())
            matching = {
                i for i, t in DOCS
                if any(term in (t.split() if t else [""])
                       for term in qtext.split())
            }
            for i in matching:
                assert got[(qid, i)] == pytest.approx(want[i], abs=2e-6)
            # non-matching docs must not appear at all
            for i, _ in DOCS:
                if i not in matching:
                    assert (qid, i) not in got

    def test_k_bounds_each_query(self, spark):
        rows = self._run(spark, k=1).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        assert all(len(v) == 1 for v in per_q.values() if v)

    def test_no_match_query_returns_nothing(self, spark):
        rows = self._run(spark, k=10).collect()
        assert not [r for r in rows if r["query_id"] == 3]

    def test_plan_broadcasts_query_terms(self, spark):
        plan = self._run(spark)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # nothing corpus-sized joins by shuffle


class TestInvertedIndex:
    """At-rest inverted index: postings rows, bit-identical scores, and
    token-range file pruning on the warehouse layout."""

    TERMS = ["spark", "hash", "window", "merge"]

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return (
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("doc_id", "text")
        )

    def test_index_path_matches_direct_scan(self, docs):
        from xcube_geodb_spark.functions.retrieval import (
            bm25_topk,
            bm25_topk_from_index,
            corpus_totals,
            inverted_index,
        )

        direct = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, self.TERMS, k=20).collect()
        ]
        n, dl = corpus_totals(docs)
        via = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk_from_index(
                inverted_index(docs), n, dl, self.TERMS, k=20
            ).collect()
        ]
        assert direct == via and len(direct) == 20

    def test_missing_term_idf_matches_direct(self, docs):
        from xcube_geodb_spark.functions.retrieval import (
            bm25_topk,
            bm25_topk_from_index,
            corpus_totals,
            inverted_index,
        )

        terms = ["spark", "zzzabsent"]
        direct = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, terms, k=10).collect()
        ]
        n, dl = corpus_totals(docs)
        via = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk_from_index(
                inverted_index(docs), n, dl, terms, k=10
            ).collect()
        ]
        assert direct == via

    def test_warehouse_layout_prunes_token_files(self, docs, spark, tmp_path):
        from xcube_geodb_spark.catalog import GeoDBCatalog
        from xcube_geodb_spark.functions.retrieval import (
            bm25_collection_topk,
            bm25_topk,
            build_bm25_collection,
        )
        from xcube_geodb_spark.operators.scan import explain_scan

        cat = GeoDBCatalog(spark, str(tmp_path / "wh"), user="t")
        cat.create_database("t")
        # multi-file token-clustered layout straight from the build
        build_bm25_collection(
            cat, "postings", docs, database="t", max_file_rows=500
        )
        m = cat.meta("postings", "t")
        assert len(m.files) >= 3, "postings must span multiple files"
        ex = explain_scan(
            cat, "postings", 'token=in.("spark","hash","window","merge")',
            database="t",
        )
        assert ex["files_skipped"] > 0, ex
        got = [
            (r["doc_id"], r["bm25"])
            for r in bm25_collection_topk(
                cat, "postings", self.TERMS, k=20, database="t"
            ).collect()
        ]
        want = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, self.TERMS, k=20).collect()
        ]
        assert got == want

    def test_incremental_extension_equals_full_rebuild(
        self, docs, spark, tmp_path
    ):
        """Index half the corpus, extend with the other half: queries must
        equal the direct BM25 over the FULL corpus (df derived at query
        time can't go stale; totals advance atomically)."""
        from xcube_geodb_spark.catalog import GeoDBCatalog
        from xcube_geodb_spark.functions.retrieval import (
            bm25_collection_topk,
            bm25_topk,
            build_bm25_collection,
            extend_bm25_collection,
        )

        first = docs.filter(F.col("doc_id") % 2 == 0)
        second = docs.filter(F.col("doc_id") % 2 == 1)
        cat = GeoDBCatalog(spark, str(tmp_path / "whx"), user="t")
        cat.create_database("t")
        build_bm25_collection(cat, "p2", first, database="t")
        extend_bm25_collection(cat, "p2", second, database="t")
        got = [
            (r["doc_id"], r["bm25"])
            for r in bm25_collection_topk(
                cat, "p2", self.TERMS, k=20, database="t"
            ).collect()
        ]
        want = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, self.TERMS, k=20).collect()
        ]
        assert got == want


class TestBm25ConcurrentExtend:
    def test_racing_extender_conflicts_not_lost(
        self, spark, tmp_path, monkeypatch
    ):
        """The corpus totals an extender commits are ABSOLUTE values
        derived from its stats-read snapshot; a commit landing between
        that read and the extender's own commit must surface as the
        concurrent-modification error — not silently overwrite the other
        writer's delta (advice r5: lost update). Retrying after the
        conflict re-derives and lands; final totals = full corpus."""
        import pytest as _pytest

        import xcube_geodb_spark.functions.retrieval as R
        from xcube_geodb_spark.catalog import GeoDBCatalog
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.functions.retrieval import (
            build_bm25_collection,
            corpus_totals,
            extend_bm25_collection,
        )

        docs = spark.createDataFrame(
            [(i, f"tok{i} common words here {i}") for i in range(30)],
            "doc_id long, text string",
        )
        base = docs.filter(F.col("doc_id") < 10)
        mine = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
        theirs = docs.filter(F.col("doc_id") >= 20)
        cat = GeoDBCatalog(spark, str(tmp_path / "whrace"), user="t")
        cat.create_database("t")
        build_bm25_collection(cat, "p3", base, database="t")

        orig = R.corpus_totals
        raced = {"done": False}

        def racing(df, text_col="text"):
            out = orig(df, text_col)
            if not raced["done"]:
                raced["done"] = True
                # another extender lands between our stats read and commit
                extend_bm25_collection(cat, "p3", theirs, database="t")
            return out

        monkeypatch.setattr(R, "corpus_totals", racing)
        with _pytest.raises(GeoDBError, match="Concurrent modification"):
            extend_bm25_collection(cat, "p3", mine, database="t")
        # conflict surfaced; re-derive and retry — now both deltas land
        extend_bm25_collection(cat, "p3", mine, database="t")
        stats = cat.meta("p3", "t").d["bm25_stats"]
        n, dl = corpus_totals(docs)
        assert (int(stats["n_docs"]), int(stats["total_dl"])) == (n, dl)


class TestFtsFromIndex:
    """Boolean fts from the postings index must equal the filter-grammar
    scan for every query shape, and reject what a bag-of-words index
    can't answer."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark shuffles data across the cluster"),
                (2, "duckdb scans parquet fast"),
                (3, "window functions rank rows"),
                (4, "hash joins and window aggregates"),
                (5, "plain text with no keywords"),
            ],
            "doc_id long, text string",
        )

    def _scan_ids(self, corpus, q, lang=""):
        from xcube_geodb_spark.filters import apply_postgrest_query

        tag = f"({lang})" if lang else ""
        out = apply_postgrest_query(
            corpus, f"text=fts{tag}.{q.replace('&', '%26')}"
        )
        return sorted(r["doc_id"] for r in out.collect())

    def test_matches_scan_for_boolean_shapes(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus)
        for q in ("spark", "window&!hash", "spark&data|window&rank",
                  "!spark&parquet"):
            got = sorted(
                r["doc_id"]
                for r in fts_docs_from_index(idx, q).collect()
            )
            assert got == self._scan_ids(corpus, q), q

    @pytest.mark.slow
    def test_stemmed_matches_stemmed_scan(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus, stemmed=True)
        for q in ("scanning", "windowing&!hashes", "sparked|ranked"):
            got = sorted(
                r["doc_id"]
                for r in fts_docs_from_index(
                    idx, q, stemmed=True
                ).collect()
            )
            assert got == self._scan_ids(corpus, q, "english"), q

    def test_plfts_and_wfts_match_scan(self, corpus):
        from xcube_geodb_spark.filters import apply_postgrest_query
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus)
        for op, q in (
            ("plfts", "window rank"),
            ("wfts", "window -hash or parquet"),
            ("wfts", "spark data"),
        ):
            got = sorted(
                r["doc_id"]
                for r in fts_docs_from_index(idx, q, op=op).collect()
            )
            want = sorted(
                r["doc_id"]
                for r in apply_postgrest_query(
                    corpus, f"text={op}.{q}"
                ).collect()
            )
            assert got == want, (op, q)

    def test_mixed_negation_prefixes_match_scan(self, corpus):
        """The scan grammar negates both '!' and '-' in fts AND wfts
        (filters._fts.term); the index path must agree for both spellings
        (advice r5: 'a&-b' evaluated '-b' as positive, '!word' in wfts
        likewise)."""
        from xcube_geodb_spark.filters import apply_postgrest_query
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus)
        for op, q in (
            ("fts", "window&-hash"),
            ("fts", "spark&-parquet|window&-rank"),
            ("wfts", "window !hash"),
            ("wfts", "spark !data or window"),
        ):
            got = sorted(
                r["doc_id"]
                for r in fts_docs_from_index(idx, q, op=op).collect()
            )
            want = sorted(
                r["doc_id"]
                for r in apply_postgrest_query(
                    corpus, f"text={op}.{q.replace('&', '%26')}"
                ).collect()
            )
            assert got == want, (op, q)

    def test_duplicate_positive_terms(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus)
        got = sorted(
            r["doc_id"]
            for r in fts_docs_from_index(idx, "spark&spark").collect()
        )
        assert got == [1]

    def test_phrase_and_pure_negation_rejected(self, corpus):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        idx = inverted_index(corpus)
        with pytest.raises(GeoDBError):
            fts_docs_from_index(idx, "!spark")
        with pytest.raises(GeoDBError):
            fts_docs_from_index(idx, '"window functions"')
        with pytest.raises(GeoDBError):
            fts_docs_from_index(idx, '"window functions" rank', op="wfts")
        with pytest.raises(GeoDBError):
            fts_docs_from_index(idx, "window", op="phfts")


class TestNewOperatorPlans:
    """Plan pins for the round's additions: pure-codegen stemming and
    heap top-k on the index path — no Python in any hot path."""

    def test_stemmed_fts_filter_plan_has_no_python(self, spark):
        from xcube_geodb_spark.filters import apply_postgrest_query

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        out = apply_postgrest_query(df, "text=fts(english).querying%26tables")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_index_topk_plan_heap_and_no_python(self, spark):
        from xcube_geodb_spark.functions.retrieval import (
            bm25_topk_from_index,
            inverted_index,
        )

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "b c")], "doc_id long, text string"
        )
        out = bm25_topk_from_index(
            inverted_index(docs), 2, 4, ["a", "b"], k=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_stemmed_index_build_plan_has_no_python(self, spark):
        from xcube_geodb_spark.functions.retrieval import inverted_index

        docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        plan = (
            inverted_index(docs, stemmed=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPostingsMaintenance:
    TERMS = ["spark", "hash", "window", "merge"]

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return (
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("doc_id", "text")
        )

    def test_optimize_restores_postings_clustering(
        self, docs, spark, tmp_path
    ):
        """Incremental appends interleave token ranges across files;
        optimize_collection re-clusters by the btree(token) layout so
        token-range pruning returns — results unchanged throughout."""
        from xcube_geodb_spark.catalog import GeoDBCatalog
        from xcube_geodb_spark.functions.retrieval import (
            bm25_collection_topk,
            bm25_topk,
            build_bm25_collection,
            extend_bm25_collection,
        )
        from xcube_geodb_spark.operators.maintenance import (
            optimize_collection,
        )
        from xcube_geodb_spark.operators.scan import explain_scan

        cat = GeoDBCatalog(spark, str(tmp_path / "who"), user="t")
        cat.create_database("t")
        build_bm25_collection(
            cat, "p3", docs.filter(F.col("doc_id") % 3 == 0),
            database="t", max_file_rows=800,
        )
        for r in (1, 2):
            extend_bm25_collection(
                cat, "p3", docs.filter(F.col("doc_id") % 3 == r),
                database="t",
            )
        optimize_collection(cat, "p3", "t")
        q = 'token=in.("spark","hash","window","merge")'
        m = cat.meta("p3", "t")
        if len(m.files) > 1:
            ex = explain_scan(cat, "p3", q, database="t")
            assert ex["files_skipped"] > 0, ex
        got = [
            (r["doc_id"], r["bm25"])
            for r in bm25_collection_topk(
                cat, "p3", self.TERMS, k=20, database="t"
            ).collect()
        ]
        want = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, self.TERMS, k=20).collect()
        ]
        assert got == want

    def test_collection_topk_rejects_non_token_terms(
        self, docs, spark, tmp_path
    ):
        from xcube_geodb_spark.catalog import GeoDBCatalog
        from xcube_geodb_spark.functions.retrieval import (
            bm25_collection_topk,
            build_bm25_collection,
        )

        cat = GeoDBCatalog(spark, str(tmp_path / "whq"), user="t")
        cat.create_database("t")
        build_bm25_collection(
            cat, "p4", docs.limit(5), database="t"
        )
        with pytest.raises(ValueError):
            bm25_collection_topk(cat, "p4", ['a"b'], database="t")
        with pytest.raises(ValueError):
            bm25_collection_topk(cat, "p4", ["Spark"], database="t")

    @pytest.mark.slow
    def test_fts_collection_docs_prunes_and_matches(
        self, docs, spark, tmp_path
    ):
        """Warehouse GIN path: boolean fts over the at-rest stemmed
        postings, file-pruned by token range, equals the direct stemmed
        scan."""
        from xcube_geodb_spark.catalog import (
            GeoDBCatalog,
            _atomic_write_json,
        )
        from xcube_geodb_spark.admin import IndexManager
        from xcube_geodb_spark.filters import apply_postgrest_query
        from xcube_geodb_spark.functions.retrieval import (
            fts_collection_docs,
            inverted_index,
        )
        from xcube_geodb_spark.operators import dml

        cat = GeoDBCatalog(spark, str(tmp_path / "whg"), user="t")
        cat.create_database("t")
        cat.create_collection(
            "gin",
            {"token": "text", "doc_id": "bigint", "tf": "int", "dl": "int"},
            database="t",
        )
        m = cat.meta("gin", "t")
        m.d["max_file_rows"] = 2000
        _atomic_write_json(m.path, m.d)
        IndexManager(cat).create_index("gin", "token", "t", kind="btree")
        dml.insert_into_collection(
            cat, "gin", inverted_index(docs, stemmed=True), database="t"
        )
        assert len(cat.meta("gin", "t").files) >= 3
        q = "querying&tables|merges&!windows"
        got = sorted(
            r["doc_id"]
            for r in fts_collection_docs(
                cat, "gin", q, database="t"
            ).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in apply_postgrest_query(
                docs, f"text=fts(english).{q.replace('&', '%26')}"
            ).collect()
        )
        assert got == want and len(got) > 0
        from xcube_geodb_spark.operators.scan import explain_scan

        ex = explain_scan(
            cat, "gin",
            'token=in.("queri","tabl","merg","window")', database="t",
        )
        assert ex["files_skipped"] > 0, ex


class TestPositionalIndex:
    """Phrase queries from a positional index must equal the phfts scan
    — consecutive-token semantics, stemmed and raw."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "window functions rank rows"),
                (2, "functions window rank"),          # words, wrong order
                (3, "the window the functions meet"),  # not consecutive
                (4, "big window functions window functions rank"),
                (5, "window"),
            ],
            "doc_id long, text string",
        )

    def _scan_ids(self, corpus, phrase, lang=""):
        from xcube_geodb_spark.filters import apply_postgrest_query

        tag = f"({lang})" if lang else ""
        out = apply_postgrest_query(corpus, f"text=phfts{tag}.{phrase}")
        return sorted(r["doc_id"] for r in out.collect())

    def test_phrase_matches_scan(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            phrase_docs_from_index,
            positional_index,
        )

        idx = positional_index(corpus)
        for phrase in ("window functions", "window functions rank",
                       "functions window", "window", "rank rows"):
            got = sorted(
                r["doc_id"]
                for r in phrase_docs_from_index(idx, phrase).collect()
            )
            assert got == self._scan_ids(corpus, phrase), phrase

    @pytest.mark.slow
    def test_stemmed_phrase_matches_stemmed_scan(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            phrase_docs_from_index,
            positional_index,
        )

        idx = positional_index(corpus, stemmed=True)
        for phrase in ("windows function", "ranked rows"):
            got = sorted(
                r["doc_id"]
                for r in phrase_docs_from_index(
                    idx, phrase, stemmed=True
                ).collect()
            )
            assert got == self._scan_ids(corpus, phrase, "english"), phrase

    def test_repeated_word_phrase(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            phrase_docs_from_index,
            positional_index,
        )

        corpus2 = corpus.sparkSession.createDataFrame(
            [(1, "the the end"), (2, "the end the")],
            "doc_id long, text string",
        )
        idx = positional_index(corpus2)
        got = sorted(
            r["doc_id"]
            for r in phrase_docs_from_index(idx, "the the").collect()
        )
        assert got == [1]

    def test_requires_positions(self, corpus):
        from xcube_geodb_spark.errors import GeoDBError
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,  # noqa: F401
            inverted_index,
            phrase_docs_from_index,
        )

        with pytest.raises(GeoDBError):
            phrase_docs_from_index(inverted_index(corpus), "window")

    def test_plan_no_python(self, corpus):
        from xcube_geodb_spark.functions.retrieval import (
            phrase_docs_from_index,
            positional_index,
        )

        out = phrase_docs_from_index(
            positional_index(corpus), "window functions"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    @pytest.mark.slow
    def test_warehouse_phrase_search_prunes_and_matches(
        self, corpus, spark, tmp_path
    ):
        from xcube_geodb_spark.admin import IndexManager
        from xcube_geodb_spark.catalog import (
            GeoDBCatalog,
            _atomic_write_json,
        )
        from xcube_geodb_spark.functions.retrieval import (
            phrase_collection_docs,
            positional_index,
        )
        from xcube_geodb_spark.operators import dml

        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        ).select("doc_id", "text")
        cat = GeoDBCatalog(spark, str(tmp_path / "whp"), user="t")
        cat.create_database("t")
        cat.create_collection(
            "pos",
            {"token": "text", "doc_id": "bigint", "tf": "int",
             "dl": "int", "positions": "int[]"},
            database="t",
        )
        m = cat.meta("pos", "t")
        m.d["max_file_rows"] = 2000
        _atomic_write_json(m.path, m.d)
        IndexManager(cat).create_index("pos", "token", "t", kind="btree")
        dml.insert_into_collection(
            cat, "pos", positional_index(docs, stemmed=True), database="t"
        )
        assert len(cat.meta("pos", "t").files) >= 3
        got = sorted(
            r["doc_id"]
            for r in phrase_collection_docs(
                cat, "pos", "tables tables", database="t"
            ).collect()
        )
        from xcube_geodb_spark.filters import apply_postgrest_query

        want = sorted(
            r["doc_id"]
            for r in apply_postgrest_query(
                docs, "text=phfts(english).tables tables"
            ).collect()
        )
        assert got == want and len(got) > 0
        from xcube_geodb_spark.operators.scan import explain_scan

        ex = explain_scan(
            cat, "pos", 'token=in.("tabl")', database="t"
        )
        assert ex["files_skipped"] > 0


class TestTsStat:
    def test_ts_stat_counts(self, spark):
        from xcube_geodb_spark.functions.retrieval import ts_stat

        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "a c")], "doc_id long, text string"
        )
        rows = {
            r["word"]: (r["ndoc"], r["nentry"])
            for r in ts_stat(docs).collect()
        }
        assert rows == {"a": (2, 3), "b": (1, 1), "c": (1, 1)}

    def test_ts_stat_stemmed_merges_forms(self, spark):
        from xcube_geodb_spark.functions.retrieval import ts_stat

        docs = spark.createDataFrame(
            [(1, "running runs"), (2, "run")], "doc_id long, text string"
        )
        rows = {
            r["word"]: (r["ndoc"], r["nentry"])
            for r in ts_stat(docs, stemmed=True).collect()
        }
        assert rows == {"run": (2, 3)}


class TestFtsIndexExhaustive:
    """Exhaustive boolean-shape sweep: every and/or/not combination over
    a 3-token vocabulary, index path vs filter-grammar scan. The corpus
    enumerates all 8 subsets of {a,b,c} so every truth assignment exists."""

    @pytest.mark.slow
    def test_all_boolean_shapes(self, spark):
        from itertools import product

        from xcube_geodb_spark.filters import apply_postgrest_query
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
        )

        rows = []
        for i, bits in enumerate(product([0, 1], repeat=3)):
            words = [w for w, b in zip(("aa", "bb", "cc"), bits) if b]
            rows.append((i, " ".join(words) if words else "zz"))
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        idx = inverted_index(corpus).cache()
        idx.count()

        # every 2-term and 3-term combination of plain/negated terms in
        # one or two OR-groups (pure-negation groups excluded: rejected
        # by design)
        terms = ["aa", "bb", "cc", "!aa", "!bb"]
        queries = set()
        for t1, t2 in product(terms, terms):
            if not (t1.startswith("!") and t2.startswith("!")):
                queries.add(f"{t1}&{t2}")
            if not t1.startswith("!") and not t2.startswith("!"):
                queries.add(f"{t1}|{t2}")
        for t1, t2, t3 in product(["aa", "!aa"], ["bb", "!bb"], ["cc"]):
            if not (t1.startswith("!") and t2.startswith("!")):
                queries.add(f"{t1}&{t2}|{t3}")

        mismatches = []
        for q in sorted(queries):
            got = sorted(
                r["doc_id"] for r in fts_docs_from_index(idx, q).collect()
            )
            want = sorted(
                r["doc_id"]
                for r in apply_postgrest_query(
                    corpus, f"text=fts.{q.replace('&', '%26')}"
                ).collect()
            )
            if got != want:
                mismatches.append((q, got, want))
        assert not mismatches, mismatches[:5]
