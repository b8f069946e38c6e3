import pytest
"""Train/test contamination detection (functions/contamination)."""

from pyspark.sql import functions as F

from xcube_geodb_spark.functions.contamination import (
    contamination_report,
    decontaminate,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from xcube_geodb_spark.suite.util import load

    return load(spark, SF, "documents").select("doc_id", "text")


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestContamination:
    def test_benchmark_members_always_flagged(self, spark):
        docs = _docs(spark)
        bench = docs.filter(F.col("doc_id") % 5 == 0)
        flagged = {
            r["doc_id"] for r in contamination_report(docs, bench).collect()
        }
        bench_ids = {r["doc_id"] for r in bench.collect()}
        assert bench_ids <= flagged  # every leaked doc catches itself

    @pytest.mark.slow
    def test_decontaminate_removes_exactly_the_flagged(self, spark):
        docs = _docs(spark)
        bench = docs.filter(F.col("doc_id") % 5 == 0)
        flagged = {
            r["doc_id"] for r in contamination_report(docs, bench).collect()
        }
        kept = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
        all_ids = {r["doc_id"] for r in docs.collect()}
        assert kept == all_ids - flagged

    def test_disjoint_corpora_not_flagged(self, spark):
        corpus = _df(
            spark,
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        )
        bench = _df(
            spark,
            [(2, "one two three four five six seven eight nine ten")],
        )
        assert contamination_report(corpus, bench).count() == 0

    def test_single_shared_ngram_is_enough(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"
        corpus = _df(spark, [(1, f"intro words here {shared} closing words")])
        bench = _df(spark, [(2, f"{shared} totally different continuation")])
        rows = contamination_report(corpus, bench).collect()
        assert len(rows) == 1
        assert rows[0]["doc_id"] == 1
        assert rows[0]["n_hits"] == 1
        assert rows[0]["n_bench_docs"] == 1

    def test_short_documents_fall_back_to_whole_text(self, spark):
        # under n tokens: whole-text comparison still catches exact leaks
        corpus = _df(spark, [(1, "tiny leaked doc"), (2, "another tiny doc")])
        bench = _df(spark, [(9, "tiny leaked doc")])
        flagged = [r["doc_id"] for r in contamination_report(corpus, bench).collect()]
        assert flagged == [1]

    def test_min_hits_threshold(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one shared 8-gram
        corpus = _df(spark, [(1, f"intro words here {shared} closing words")])
        bench = _df(spark, [(9, f"{shared} unrelated tail")])
        assert decontaminate(corpus, bench, min_hits=1).count() == 0
        assert decontaminate(corpus, bench, min_hits=2).count() == 1

    def test_benchmark_side_is_broadcast(self, spark):
        docs = _docs(spark)
        bench = docs.filter(F.col("doc_id") % 5 == 0)
        plan = (
            contamination_report(docs, bench)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
