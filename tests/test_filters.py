"""Filter-grammar parser tests — every form observed in the reference's own
tests/notebooks (SURVEY.md §2.2 must-pass set) plus the wider PostgREST v6
operator set."""

import pytest

from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.filters import apply_postgrest_query, parse_postgrest_query


@pytest.fixture(scope="module")
def land_use(spark):
    rows = [
        (i, 5_900_000 + i, raba, f"2019-0{1 + i % 9}-01", name)
        for i, (raba, name) in enumerate(
            [
                (1410, "a"),
                (1410, "b"),
                (1300, "c"),
                (1100, "d"),
                (7000, "e"),
                (1600, "f"),
                (1410, "g"),
                (1300, "h"),
                (1100, None),
                (1410, "j"),
            ],
            start=1,
        )
    ]
    return spark.createDataFrame(
        rows, "id long, raba_pid long, raba_id long, d_od string, name string"
    )


class TestGrammar:
    def test_eq(self, land_use):
        out = apply_postgrest_query(land_use, "raba_id=eq.1410").collect()
        assert sorted(r.id for r in out) == [1, 2, 7, 10]

    def test_gt_ge_aliases(self, land_use):
        assert apply_postgrest_query(land_use, "id=ge.9").count() == 2
        assert apply_postgrest_query(land_use, "id=gte.9").count() == 2
        assert apply_postgrest_query(land_use, "id=gt.9").count() == 1
        assert apply_postgrest_query(land_use, "id=le.2").count() == 2
        assert apply_postgrest_query(land_use, "id=lt.2").count() == 1

    def test_or_group(self, land_use):
        out = apply_postgrest_query(
            land_use, "or=(raba_id.eq.1300,raba_id.eq.1410)"
        ).collect()
        assert sorted(r.id for r in out) == [1, 2, 3, 7, 8, 10]

    def test_nested_and_or(self, land_use):
        # the eurocrops notebook form: and=(or(...),x.gt.y)
        q = "and=(or(raba_id.eq.1100,raba_id.eq.1300),raba_pid.gt.5900003)"
        out = apply_postgrest_query(land_use, q).collect()
        assert sorted(r.id for r in out) == [4, 8, 9]

    def test_paging_with_order(self, land_use):
        out = apply_postgrest_query(
            land_use, "id=ge.1&order=id.asc&limit=2&offset=3"
        ).collect()
        assert [r.id for r in out] == [4, 5]

    def test_explicit_paging_overrides(self, land_use):
        out = apply_postgrest_query(
            land_use, "order=id.asc", limit=2, offset=8
        ).collect()
        assert [r.id for r in out] == [9, 10]

    def test_like_ilike(self, land_use):
        assert apply_postgrest_query(land_use, "name=like.*a*").count() == 1
        assert apply_postgrest_query(land_use, "name=ilike.A*").count() == 1

    def test_in(self, land_use):
        out = apply_postgrest_query(land_use, "raba_id=in.(1100,1600)").collect()
        assert sorted(r.id for r in out) == [4, 6, 9]

    def test_is_null_and_not(self, land_use):
        assert apply_postgrest_query(land_use, "name=is.null").count() == 1
        assert apply_postgrest_query(land_use, "name=not.is.null").count() == 9
        assert apply_postgrest_query(land_use, "raba_id=not.eq.1410").count() == 6

    def test_not_or(self, land_use):
        out = apply_postgrest_query(
            land_use, "not.or=(raba_id.eq.1410,raba_id.eq.1300)"
        ).collect()
        assert sorted(r.id for r in out) == [4, 5, 6, 9]

    def test_select_projection(self, land_use):
        out = apply_postgrest_query(land_use, "select=id,raba_id&raba_id=eq.7000")
        assert out.columns == ["id", "raba_id"]
        assert out.count() == 1

    def test_multiple_filters_are_anded(self, land_use):
        out = apply_postgrest_query(land_use, "raba_id=eq.1410&id=gt.5").collect()
        assert sorted(r.id for r in out) == [7, 10]

    def test_order_desc_nulls(self, land_use):
        out = apply_postgrest_query(land_use, "order=name.desc.nullslast").collect()
        assert out[-1].name is None
        # r12: defaults are PG's (nulls LAST asc / FIRST desc), not
        # Spark's opposite
        out = apply_postgrest_query(land_use, "order=name.asc").collect()
        assert out[-1].name is None
        out = apply_postgrest_query(land_use, "order=name.desc").collect()
        assert out[0].name is None
        out = apply_postgrest_query(
            land_use, "order=name.asc.nullsfirst"
        ).collect()
        assert out[0].name is None

    def test_quoted_string_in_in(self, land_use):
        out = apply_postgrest_query(land_use, 'name=in.("a","c")').collect()
        assert sorted(r.id for r in out) == [1, 3]

    def test_date_string_comparison(self, land_use):
        assert apply_postgrest_query(land_use, "d_od=eq.2019-02-01").count() >= 1

    def test_errors(self, land_use):
        with pytest.raises(GeoDBError):
            parse_postgrest_query("raba_id=bogus.1")
        with pytest.raises(GeoDBError):
            parse_postgrest_query("or=raba_id.eq.1")
        with pytest.raises(GeoDBError):
            parse_postgrest_query("raba_id=in.1,2")

    def test_predicate_pushdown_reaches_scan(self, land_use, tmp_path):
        # the whole point of compiling to Column trees: filters must reach the
        # parquet scan as PushedFilters
        p = str(tmp_path / "land_use_pq")
        land_use.write.mode("overwrite").parquet(p)
        df = land_use.sparkSession.read.parquet(p)
        plan = apply_postgrest_query(df, "raba_id=eq.1410")._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "raba_id" in plan

    def test_order_by_non_selected_column(self, land_use):
        # PostgREST allows ordering by a column absent from select=
        out = apply_postgrest_query(
            land_use, "select=id&order=raba_id.desc,id.asc&limit=3"
        )
        assert out.columns == ["id"]
        assert [r.id for r in out.collect()] == [5, 6, 1]

    def test_text_column_keeps_numeric_looking_literal(self, land_use):
        spark = land_use.sparkSession
        df = spark.createDataFrame(
            [(1, "0123"), (2, "123"), (3, "x")], "id long, code string"
        )
        # PostgREST compares by column type: text '0123' != text '123'
        assert [
            r.id for r in apply_postgrest_query(df, "code=eq.0123").collect()
        ] == [1]
        assert [
            r.id for r in apply_postgrest_query(df, "code=in.(0123)").collect()
        ] == [1]


class TestContainmentAndFts:
    """cs/cd (array containment) + fts family (PostgREST v6 full set;
    geodb.py:1335 pins the contract). The fts(english) tag applies the
    built-in Porter stemmer; untagged/simple = exact token match."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "Spark shuffles data across the cluster", ["a", "b"]),
                (2, "DuckDB scans parquet fast", ["a"]),
                (3, "window functions rank rows", ["b", "c"]),
                (4, "hash joins and window aggregates", ["a", "b", "c"]),
                (5, "plain text with no keywords", []),
            ],
            "id long, text string, tags array<string>",
        )

    def ids(self, df, q):
        return sorted(r.id for r in apply_postgrest_query(df, q).collect())

    def test_cs_superset(self, docs):
        assert self.ids(docs, "tags=cs.{a,b}") == [1, 4]

    def test_cd_subset(self, docs):
        assert self.ids(docs, "tags=cd.{a,b,c}") == [1, 2, 3, 4, 5]
        assert self.ids(docs, "tags=cd.{a}") == [2, 5]

    def test_cs_negated(self, docs):
        assert self.ids(docs, "tags=not.cs.{a}") == [3, 5]

    def test_fts_and_or_not(self, docs):
        # &-conjunction, |-alternative, !-negation; %26 is the URL-encoded &
        assert self.ids(docs, "text=fts.spark%26data|window%26!hash") == [1, 3]

    @pytest.mark.slow
    def test_fts_english_tag_stems(self, docs):
        # 'scanning' is no document token; its stem 'scan' matches doc 2's
        # token 'scans' (stem 'scan') — the exact matcher returns nothing
        assert self.ids(docs, "text=fts.scanning") == []
        assert self.ids(docs, "text=fts(english).scanning") == [2]
        # stemming applies to every family member
        assert self.ids(docs, "text=plfts(english).ranked windowing") == [3]
        assert self.ids(docs, "text=phfts(english).window function") == [3]
        assert self.ids(
            docs, 'text=wfts(english).aggregation -ranking'
        ) == [4]
        # negated stemmed term
        assert self.ids(docs, "text=fts(english).window%26!hashes") == [3]

    def test_fts_simple_tag_exact(self, docs):
        assert self.ids(docs, "text=fts(simple).scanning") == []
        assert self.ids(docs, "text=fts(simple).scans") == [2]

    def test_fts_unknown_dictionary_rejected(self, docs):
        with pytest.raises(GeoDBError):
            apply_postgrest_query(docs, "text=fts(french).le")

    def test_plfts_all_words(self, docs):
        assert self.ids(docs, "text=plfts.window rank") == [3]

    def test_phfts_phrase_consecutive(self, docs):
        assert self.ids(docs, "text=phfts.window functions") == [3]
        # words present but not consecutive -> no match
        assert self.ids(docs, "text=phfts.functions window") == []

    def test_wfts_websearch(self, docs):
        assert self.ids(docs, 'text=wfts.window -hash or "parquet fast"') == [2, 3]

    def test_fts_case_and_punct_normalized(self, docs):
        assert self.ids(docs, "text=fts.SPARK") == [1]

    def test_cs_requires_brace_list(self, docs):
        with pytest.raises(GeoDBError):
            apply_postgrest_query(docs, "tags=cs.(a,b)")


class TestSelectShapesAndJsonArrows:
    """select= aliasing/casts and ->/->> json paths (PostgREST v6 contract;
    the reference forwards these verbatim to PostgREST, geodb.py:1866)."""

    @pytest.fixture(scope="class")
    def ev(self, spark):
        return spark.createDataFrame(
            [
                (1, '{"k": 7, "tags": ["a", "b"], "m": {"x": "deep"}}'),
                (2, '{"k": 40}'),
                (3, '{"k": 7, "m": {"x": "other"}}'),
            ],
            "id long, props string",
        )

    def test_select_alias(self, ev):
        out = apply_postgrest_query(ev, "select=key:id")
        assert out.columns == ["key"]

    def test_select_cast(self, ev):
        out = apply_postgrest_query(ev, "select=id::text")
        assert out.columns == ["id"]
        assert dict(out.dtypes)["id"] == "string"

    def test_select_json_arrow_default_name(self, ev):
        out = apply_postgrest_query(ev, "select=id,props->>k")
        assert out.columns == ["id", "k"]
        assert {r.k for r in out.collect()} == {"7", "40"}

    def test_select_alias_cast_json_combo(self, ev):
        out = apply_postgrest_query(ev, "select=n:props->>k::bigint&order=id.asc")
        assert out.columns == ["n"]
        assert [r.n for r in out.collect()] == [7, 40, 7]

    def test_filter_on_json_path(self, ev):
        out = apply_postgrest_query(ev, "props->>k=eq.7&select=id")
        assert sorted(r.id for r in out.collect()) == [1, 3]

    def test_nested_path_and_array_index(self, ev):
        out = apply_postgrest_query(ev, "select=id,x:props->m->>x&props->tags->>0=eq.a")
        rows = out.collect()
        assert [(r.id, r.x) for r in rows] == [(1, "deep")]

    def test_order_by_json_path(self, ev):
        # ->> is text: lexicographic order ('7' > '40'), same as PostgREST
        out = apply_postgrest_query(ev, "select=id&order=props->>k.desc,id.asc")
        assert [r.id for r in out.collect()] == [1, 3, 2]

    def test_json_eq_compares_as_text(self, ev):
        # ->> yields text; PostgREST compares text, so eq.07 != '7'
        assert apply_postgrest_query(ev, "props->>k=eq.07").count() == 0


class TestGrammarFuzz:
    """Property layer over the parser: any query assembled from valid
    grammar fragments must either apply cleanly or raise GeoDBError —
    never leak an internal exception — and compilation is deterministic."""

    COLS = ["id", "raba_id", "name", "d_od"]

    @pytest.fixture(scope="class")
    def hyp(self):
        hypothesis = pytest.importorskip("hypothesis")
        from hypothesis import strategies as st

        cond = st.builds(
            lambda c, o, v: f"{c}={o}.{v}",
            st.sampled_from(self.COLS),
            st.sampled_from(
                ["eq", "neq", "gt", "gte", "lt", "lte", "like", "ilike",
                 "match", "not.eq", "not.gt", "is"]
            ),
            st.sampled_from(["1410", "a", "*x*", "null", "2019-01-01", '"q v"']),
        )
        group = st.builds(
            lambda c1, v1, c2, v2, conj:
            f"{conj}=({c1}.eq.{v1},or({c2}.gt.{v2},{c1}.lte.{v2}))",
            st.sampled_from(self.COLS), st.sampled_from(["1", "z"]),
            st.sampled_from(self.COLS), st.sampled_from(["2", "9"]),
            st.sampled_from(["and", "or", "not.and"]),
        )
        tail = st.sampled_from(
            ["", "&select=id,raba_id", "&order=id.desc&limit=3",
             "&select=x:raba_id&offset=1", "&order=raba_id.asc.nullslast"]
        )
        query = st.builds(
            lambda a, b, t: "&".join(x for x in (a, b) if x) + t, cond,
            st.one_of(st.just(""), cond, group), tail,
        )
        return hypothesis, query

    def test_fuzz_never_leaks_internal_errors(self, land_use, hyp):
        hypothesis, query = hyp
        from hypothesis import HealthCheck, given, settings

        @given(q=query)
        @settings(
            max_examples=120,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        def run(q):
            try:
                out = apply_postgrest_query(land_use, q)
                cols_a = out.columns  # forces analysis
                cols_b = apply_postgrest_query(land_use, q).columns
                assert cols_a == cols_b  # deterministic compilation
            except GeoDBError:
                pass  # the one sanctioned failure mode

        run()

    def test_junk_strings_raise_geodb_error(self, land_use):
        for junk in [
            "raba_id=zz.5", "=eq.1", "and=raba_id.eq.1", "raba_id=not.",
            "or=(raba_id.eq)", "limit=x", "raba_id=in.5", "tags=cs.[a]",
        ]:
            with pytest.raises((GeoDBError, ValueError)):
                out = apply_postgrest_query(land_use, junk)
                out.columns


class TestReviewRegressions:
    """Regressions from the round-2 self-review: parser error contract."""

    def test_wfts_empty_raises_geodb_error(self, land_use):
        for q in ["name=wfts.", "name=wfts.or", "name=phfts. "]:
            with pytest.raises(GeoDBError):
                apply_postgrest_query(land_use, q).columns

    def test_cs_on_non_array_column_raises_geodb_error(self, land_use):
        with pytest.raises(GeoDBError, match="array-typed"):
            apply_postgrest_query(land_use, "name=cs.{a}").columns
        with pytest.raises(GeoDBError, match="array-typed"):
            apply_postgrest_query(land_use, "name=cd.{a,b}").columns
