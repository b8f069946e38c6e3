"""fts(english) stopword elision (functions/stopwords.py): PG's english
dictionary drops Snowball stopwords from both the tsvector and the
tsquery before stemming. Covers query-side elision semantics (dropped
terms, collapsed groups, empty-tsquery-matches-nothing), doc-side token
filtering, consistency of scan vs GIN-index vs phrase-index paths, and
the DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.filters import apply_postgrest_query
from xcube_geodb_spark.functions.stopwords import (
    ENGLISH_STOPWORDS,
    is_stopword,
    stopword_filter_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "a dog barked at cats"),
            (3, "connections were established quickly"),
            (4, "nothing relevant here"),
            (5, "cat flap installed on door"),
        ],
        "doc_id long, text string",
    )


def _ids(df, q):
    return sorted(r.doc_id for r in apply_postgrest_query(df, q).collect())


class TestQueryElision:
    def test_stopword_dropped_from_and_group(self, docs):
        # PG: to_tsquery('the & cat') -> 'cat'
        assert _ids(docs, "text=fts(english).the%26cat") == [1, 2, 5]

    def test_all_stopword_query_matches_nothing(self, docs):
        # PG: the empty tsquery matches no document
        assert _ids(docs, "text=fts(english).the") == []
        assert _ids(docs, "text=fts(english).the%26a%26on") == []
        assert _ids(docs, "text=plfts(english).the a on") == []
        assert _ids(docs, "text=phfts(english).on the") == []
        assert _ids(docs, "text=wfts(english).the a") == []

    def test_elided_group_collapses_in_or(self, docs):
        # 'the|cat' -> 'cat'; 'the&a | dog' -> 'dog'
        assert _ids(docs, "text=fts(english).the|cat") == [1, 2, 5]
        assert _ids(docs, "text=fts(english).the%26a|dog") == [2]

    def test_negated_stopword_dropped(self, docs):
        assert _ids(docs, "text=fts(english).!the%26dog") == [2]
        assert _ids(docs, "text=wfts(english).-the dog") == [2]

    def test_not_over_empty_tsquery_matches_all(self, docs):
        assert _ids(docs, "text=not.fts(english).the") == [1, 2, 3, 4, 5]

    def test_phrase_elision_consecutive_after_removal(self, docs):
        # 'the cat sat' -> 'cat <-> sat' (adjacent in the query): doc 1
        # has cat@1 sat@2 -> match
        assert _ids(docs, "text=phfts(english).the cat sat") == [1]
        # 'a cat flap' -> 'cat <-> flap': doc 5 cat@0 flap@1
        assert _ids(docs, "text=phfts(english).a cat flap") == [5]

    def test_phrase_gap_semantics_pg_parity(self, spark):
        # PG: phraseto_tsquery('english','the cat on the mat') =
        # 'cat <3> mat' — mat must sit exactly 3 positions after cat,
        # and ANY token may fill the gap.
        gap_docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),   # cat@1 mat@5: dist 4 -> no
                (2, "cat naps near the mat"),    # cat@0 mat@4: dist 4 -> no
                (3, "a cat got on a mat"),       # cat@1 mat@5: dist 4 -> no
                (4, "cat lay down the mat"),     # cat@0 mat@4: dist 4 -> no
                (5, "the cat big dog mat here"), # cat@1 mat@4: dist 3 -> YES
                                                 # (non-stopwords in gap)
                (6, "cat on the mat"),           # cat@0 mat@3: dist 3 -> YES
                (7, "cat mat"),                  # dist 1 -> no
            ],
            "doc_id long, text string",
        )
        got = _ids(gap_docs, "text=phfts(english).the cat on the mat")
        assert got == [5, 6], got
        # the old (pre-gap) behavior matched the stopword-FILTERED stream
        # consecutively, which would have accepted docs 6 AND 7 and
        # rejected 5 — this pins the PG-parity change
        from xcube_geodb_spark.functions.retrieval import (
            phrase_docs_from_index,
            positional_index,
        )

        pidx = positional_index(gap_docs, stemmed=True)
        via_idx = sorted(
            r.doc_id
            for r in phrase_docs_from_index(
                pidx, "the cat on the mat", stemmed=True
            ).collect()
        )
        assert via_idx == got

    def test_stem_equal_to_stopword_never_matches_filler(self, spark):
        """'dos' stems to 'do', which is ALSO a stopword literal: in PG
        the doc's elided 'do' position carries no lexeme, so the query
        stem must not match it — the gap stream namespaces filler tokens
        out of the stem alphabet."""
        docs = spark.createDataFrame(
            [
                (1, "x do mat"),     # 'do' elided: no lexeme at pos 1
                (2, "x dos mat"),    # real token stemming to 'do' at 1
            ],
            "doc_id long, text string",
        )
        got = _ids(docs, "text=phfts(english).the dos mat")
        assert got == [2], got

    def test_simple_dictionary_unaffected(self, docs):
        assert _ids(docs, "text=fts.the%26cat") == [1]
        assert _ids(docs, "text=fts.the") == [1]


class TestPathConsistency:
    @pytest.mark.slow
    def test_index_paths_equal_scan(self, docs):
        from xcube_geodb_spark.functions.retrieval import (
            fts_docs_from_index,
            inverted_index,
            phrase_docs_from_index,
            positional_index,
        )

        idx = inverted_index(docs, stemmed=True)
        for q in ("the&cat", "the", "the&a|dog", "!the&dog", "cats&!the"):
            got = sorted(
                r.doc_id
                for r in fts_docs_from_index(idx, q, stemmed=True).collect()
            )
            want = _ids(docs, f"text=fts(english).{q.replace('&', '%26')}")
            assert got == want, q
        pidx = positional_index(docs, stemmed=True)
        for ph in ("the cat sat", "a cat flap", "on the"):
            got = sorted(
                r.doc_id
                for r in phrase_docs_from_index(
                    pidx, ph, stemmed=True
                ).collect()
            )
            want = _ids(docs, f"text=phfts(english).{ph}")
            assert got == want, ph

    def test_bloom_pruning_never_hides_stopword_matches(self, spark, tmp_path):
        """English blooms are stopword-free; an UNTAGGED literal query
        for a stopword must not be pruned into wrong emptiness."""
        from xcube_geodb_spark.catalog import GeoDBCatalog, _atomic_write_json
        from xcube_geodb_spark.operators import dml
        from xcube_geodb_spark.operators.scan import explain_scan, get_collection

        cat = GeoDBCatalog(spark, str(tmp_path / "wh"), user="sw")
        cat.create_database("d")
        cat.create_collection("c", {"n": "int", "text": "text"}, database="d")
        m = cat.meta("c", "d")
        m.d["max_file_rows"] = 20
        _atomic_write_json(m.path, m.d)
        from xcube_geodb_spark.admin import IndexManager

        IndexManager(cat).create_index(
            "c", "text", "d", kind="fts", options={"dictionary": "english"}
        )
        rows = [(i, f"the quick fox {i}" if i < 20 else f"calm owl {i}")
                for i in range(40)]
        dml.insert_into_collection(
            cat, "c", spark.createDataFrame(rows, "n int, text string"),
            database="d",
        )
        # untagged literal query for a stopword: must return the rows
        # containing it (first 20), never pruned away by the elided bloom
        out = get_collection(cat, "c", "text=fts.the", database="d")
        assert sorted(r["n"] for r in out.collect()) == list(range(20))
        ex = explain_scan(cat, "c", "text=fts.the", database="d")
        assert ex["files_skipped"] == 0  # stopword contributes no pruning
        # tagged query with a stopword still prunes on the real terms
        out = get_collection(
            cat, "c", "text=fts(english).the%26fox", database="d"
        )
        assert sorted(r["n"] for r in out.collect()) == list(range(20))

    def test_tsvector_sql_surface_elides(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        row = spark.sql(
            "select to_tsvector('english', 'the cat sat') v,"
            " plainto_tsquery('english', 'the cats') q"
        ).collect()[0]
        assert "the" not in row["v"] and "cat" in row["v"]
        assert row["q"] == ["cat"]


class TestDuckDBTwin:
    def test_filter_sql_matches_python_list(self):
        con = duckdb.connect()
        expr = stopword_filter_sql("['the','cat','on','mats']")
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == ["cat", "mats"]

    def test_list_is_snowball_sized_and_lowercase(self):
        # Snowball list minus the apostrophe forms our tokenizer can
        # never produce (module doc)
        assert 110 <= len(ENGLISH_STOPWORDS) <= 150
        assert all(w == w.lower() and w.isalpha() for w in ENGLISH_STOPWORDS)
        for w in ("the", "and", "is", "not", "very", "i"):
            assert is_stopword(w)
        for w in ("cat", "spark", "don", "t"):
            assert not is_stopword(w)
