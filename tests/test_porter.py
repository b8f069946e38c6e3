"""Porter stemmer: the pure-Python reference against classic vectors, and
three-way backend parity (python == generated DuckDB SQL == Spark Column
tree) on corpus tokens, crafted suffix families, and random fuzz.

The stemmer backs the fts(english) dictionary (filters._fts); parity is
what makes the driver's DuckDB oracle able to replay stemmed fts gates."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.porter import (
    porter_col,
    porter_py,
    porter_sql,
)

# classic full-pipeline vectors (Porter 1980; step-table examples composed
# through the whole pipeline)
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "radicalli": "radic", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    # engine-corpus words the gates rely on
    "querying": "queri", "query": "queri", "tables": "tabl",
    "table": "tabl", "merges": "merg", "merge": "merg",
    "windows": "window", "values": "valu", "value": "valu",
    # guards
    "as": "as", "is": "is", "a": "a", "": "",
}


def _word_pool() -> list[str]:
    corpus = [
        r[0]
        for r in duckdb.sql(
            "select distinct unnest(string_split_regex(lower(text),"
            " '[^a-z0-9]+')) from"
            " '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
        if r[0]
    ]
    rng = random.Random(7)
    fuzz = [
        "".join(
            rng.choice("abcdefgilmnorstuyz")
            for _ in range(rng.randint(1, 14))
        )
        for _ in range(2000)
    ]
    crafted = [
        stem + suf
        for stem in ("run", "runn", "hope", "happ", "rat", "ration",
                     "yyz", "syzygy", "tr", "abl", "s")
        for suf in ("ing", "ed", "s", "ies", "ation", "iveness", "abli",
                    "ement", "ll", "e", "y", "yy", "yyy", "sses", "eed")
    ]
    return sorted(set(list(VECTORS) + corpus + fuzz + crafted))


class TestPorterPython:
    def test_classic_vectors(self):
        bad = {
            w: (porter_py(w), want)
            for w, want in VECTORS.items()
            if porter_py(w) != want
        }
        assert not bad

    def test_idempotent_on_common_words(self):
        # stemming a stem must not drift for the corpus vocabulary
        for w in ("queri", "tabl", "merg", "window", "valu", "scan"):
            assert porter_py(porter_py(w)) == porter_py(w)


class TestPorterBackendParity:
    def test_duckdb_matches_python(self):
        words = _word_pool()
        con = duckdb.connect()
        con.execute("create table w(t varchar)")
        con.executemany("insert into w values (?)", [(x,) for x in words])
        got = dict(
            con.execute(f"select t, {porter_sql('t')} from w").fetchall()
        )
        mism = [
            (w, got[w], porter_py(w)) for w in words if got[w] != porter_py(w)
        ]
        assert not mism, mism[:5]

    def test_spark_matches_python(self, spark):
        words = _word_pool()
        df = spark.createDataFrame([(w,) for w in words], "w string")
        out = df.select("w", porter_col(F.col("w")).alias("s")).collect()
        mism = [
            (r["w"], r["s"], porter_py(r["w"]))
            for r in out
            if r["s"] != porter_py(r["w"])
        ]
        assert not mism, mism[:5]

    def test_spark_inside_transform_lambda(self, spark):
        words = _word_pool()[:80]
        df = spark.createDataFrame([(words,)], "toks array<string>")
        out = df.select(
            F.transform("toks", lambda t: porter_col(t)).alias("st")
        ).collect()[0]["st"]
        assert out == [porter_py(w) for w in words]


class TestTextSqlSurface:
    """PG text-search family on the raw-SQL path (functions/textsql)."""

    def test_tsvector_family(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        row = spark.sql(
            "SELECT geodb_stem('running') AS st,"
            " to_tsvector('english', 'Running the queries, querying!') AS v,"
            " plainto_tsquery('english', 'queried runs') AS q,"
            " to_tsvector('simple', 'Running runs') AS vs"
        ).collect()[0]
        assert row["st"] == "run"
        # 'the' elided: PG's english config drops stopwords before
        # stemming (functions/stopwords.py)
        assert row["v"] == sorted({"run", "queri"})
        assert row["q"] == ["queri", "run"]
        assert row["vs"] == ["running", "runs"]
        m = spark.sql(
            "SELECT ts_match_all(array('run','queri'), array('queri')) AS a,"
            " ts_match_all(array('run'), array('queri','run')) AS b,"
            " ts_match_any(array('run'), array('queri','run')) AS c"
        ).collect()[0]
        assert (m["a"], m["b"], m["c"]) == (True, False, True)

    def test_unknown_config_rejected(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        with pytest.raises(Exception):
            spark.sql(
                "SELECT to_tsvector('german', 'wort')"
            ).collect()

    def test_ts_headline(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        row = spark.sql(
            "SELECT ts_headline('english',"
            " 'He runs while running very fast indeed.',"
            " plainto_tsquery('english', 'run')) AS h,"
            " ts_headline('simple', 'a b c', plainto_tsquery('simple','z'))"
            " AS miss"
        ).collect()[0]
        assert row["h"] == (
            "He <b>runs</b> while <b>running</b> very fast indeed."
        )
        assert row["miss"] == "a b c"

    def test_ts_headline_crops_window(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        text = " ".join(f"w{i}" for i in range(100)) + " target tail"
        row = spark.sql(
            f"SELECT ts_headline('simple', '{text}',"
            " plainto_tsquery('simple', 'target')) AS h"
        ).collect()[0]
        assert row["h"].startswith("... ")
        assert "<b>target</b>" in row["h"]
        assert len(row["h"].split()) <= 35 + 2


class TestTsRank:
    """ts_rank (word-frequency n/(n+1)) and ts_rank_cd (cover density)
    — hand-computed fixtures over the english lexeme stream."""

    def test_rank_frequency_weights(self):
        from xcube_geodb_spark.functions.textsql import _ts_rank

        # stream: [cat, cat, dog] (the/a elided) -> cat n=2, dog n=1
        text = "the cat a cat dog"
        assert _ts_rank("english", text, ["cat"]) == pytest.approx(2 / 3)
        assert _ts_rank("english", text, ["cat", "dog"]) == pytest.approx(
            2 / 3 + 1 / 2
        )
        assert _ts_rank("english", text, ["fox"]) == 0.0
        # duplicate query terms count once (distinct semantics)
        assert _ts_rank("english", text, ["cat", "cat"]) == pytest.approx(
            2 / 3
        )
        assert _ts_rank("english", None, ["cat"]) is None
        assert _ts_rank("english", text, None) is None

    def test_rank_normalization_bits(self):
        import math

        from xcube_geodb_spark.functions.textsql import _ts_rank

        text = "cat cat dog"
        base = 2 / 3
        assert _ts_rank("english", text, ["cat"], 1) == pytest.approx(
            base / (1 + math.log(3))
        )
        assert _ts_rank("english", text, ["cat"], 2) == pytest.approx(
            base / 3
        )

    def test_rank_cd_minimal_covers(self):
        from xcube_geodb_spark.functions.textsql import _ts_rank_cd

        # stream: [cat, x1, dog] -> one cover of width 3
        assert _ts_rank_cd(
            "simple", "cat x1 dog", ["cat", "dog"]
        ) == pytest.approx(1 / 3)
        # adjacent -> width 2
        assert _ts_rank_cd(
            "simple", "cat dog", ["cat", "dog"]
        ) == pytest.approx(1 / 2)
        # THREE minimal covers: [cat0,dog1] w2, [dog1..cat3] w3,
        # [cat3,dog4] w2 — the straddling window is minimal too (PG's
        # Cover() enumerates it as well) -> 1/2 + 1/3 + 1/2
        assert _ts_rank_cd(
            "simple", "cat dog zz cat dog", ["cat", "dog"]
        ) == pytest.approx(4 / 3)
        # tighter cover wins: cat cat dog -> cover [cat(1), dog] width 2
        assert _ts_rank_cd(
            "simple", "cat cat dog", ["cat", "dog"]
        ) == pytest.approx(1 / 2)
        # a term absent -> 0
        assert _ts_rank_cd("simple", "cat cat", ["cat", "dog"]) == 0.0
        # single-term query: every occurrence is a width-1 cover
        assert _ts_rank_cd("simple", "cat zz cat", ["cat"]) == pytest.approx(
            2.0
        )

    def test_sql_surface_arrow(self, spark):
        from xcube_geodb_spark.functions.textsql import (
            register_text_sql_functions,
        )

        register_text_sql_functions(spark)
        df = spark.sql(
            "SELECT ts_rank('english', 'the cat a cat dog',"
            " array('cat','dog')) AS r,"
            " ts_rank_cd('simple', 'cat dog', array('cat','dog')) AS rc"
        )
        row = df.collect()[0]
        assert row["r"] == pytest.approx(2 / 3 + 1 / 2)
        assert row["rc"] == pytest.approx(0.5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


class TestHeadlineCover:
    def test_window_centers_on_best_cover_not_first_match(self, spark):
        """'cat' appears early, but the only window containing BOTH
        terms is far into the document: the fragment must move there
        (PG's cover-density fragment choice), not stick to the first
        hit."""
        from xcube_geodb_spark.functions.textsql import _headline

        filler = " ".join(f"w{i}" for i in range(60))
        text = f"cat {filler} cat dog tail"
        out = _headline("simple", text, ["cat", "dog"])
        assert "<b>cat</b> <b>dog</b>" in out
        assert out.startswith("... ")  # moved past the leading words

    def test_partial_match_falls_back_to_first_hit(self, spark):
        from xcube_geodb_spark.functions.textsql import _headline

        filler = " ".join(f"w{i}" for i in range(50))
        text = f"{filler} cat more words"
        out = _headline("simple", text, ["cat", "dog"])
        assert "<b>cat</b>" in out

    def test_no_match_returns_leading_words(self, spark):
        from xcube_geodb_spark.functions.textsql import _headline

        out = _headline("simple", "a b c", ["zzz"])
        assert out == "a b c"
