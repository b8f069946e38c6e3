"""Skew tools (plans/skew.py): salting must be a result-invariant rewrite —
every test compares against the plain operator on data where one key
dominates (the scenario the rewrite exists for)."""

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.plans import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 1; keys 2..5 thin; key 99 has no dim match
    rows = [(1, i, float(i % 7)) for i in range(900)]
    rows += [(k, 1000 + k * 10 + j, float(j)) for k in range(2, 6) for j in range(5)]
    rows += [(99, 9999, 1.0)]
    return spark.createDataFrame(rows, "k long, rid long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d")], "k long, name string"
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, skewed, dim):
        plain = skewed.join(dim, ["k"])
        salted = salted_join(skewed, dim, ["k"], salts=4)
        assert salted.columns == plain.columns
        assert _sorted(salted) == _sorted(plain)

    def test_left_preserves_unmatched(self, skewed, dim):
        plain = skewed.join(dim, ["k"], "left")
        salted = salted_join(skewed, dim, ["k"], salts=4, how="left")
        assert _sorted(salted) == _sorted(plain)
        assert salted.filter("k = 99").count() == 1  # null-extended row kept

    def test_salt_actually_splits_hot_key(self, skewed):
        from xcube_geodb_spark.plans.skew import _SALT, _salt_of

        n = (
            skewed.filter("k = 1")
            .withColumn(_SALT, _salt_of(skewed, 8))
            .select(_SALT)
            .distinct()
            .count()
        )
        assert n > 1  # the hot key's rows spread over several buckets

    def test_rejects_unsupported_how(self, skewed, dim):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, ["k"], how="full")


class TestSaltedAgg:
    def test_exact_distinct_under_skew(self, skewed):
        plain = skewed.groupBy("k").agg(
            F.countDistinct("v").alias("nv")
        )
        salted = salted_agg(
            skewed,
            ["k"],
            partial_aggs=[F.collect_set("v").alias("vs")],
            final_aggs=[
                F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).alias(
                    "nv"
                )
            ],
            salts=4,
        )
        assert _sorted(salted) == _sorted(plain)

    def test_second_stage_sees_only_partials(self, skewed):
        # the merge shuffle moves <= salts rows per group, never raw rows
        staged_rows = (
            salted_agg(
                skewed,
                ["k"],
                partial_aggs=[F.count(F.lit(1)).alias("c")],
                final_aggs=[F.sum("c").alias("n")],
                salts=4,
            )
        )
        plain = skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        assert _sorted(staged_rows) == _sorted(plain)
