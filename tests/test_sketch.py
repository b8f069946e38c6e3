"""Count-min and KMV sketches: estimator guarantees + plan shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.sketch import (
    count_min_build,
    count_min_lookup,
    kmv_distinct,
)


def _words(spark, counts: dict):
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["w"])


class TestCountMin:
    COUNTS = {"a": 50, "b": 7, "c": 1, "d": 120}

    def test_never_undercounts_and_is_tight_when_sparse(self, spark):
        df = _words(spark, self.COUNTS)
        sk = count_min_build(df, "w", depth=4, width=1024)
        probes = spark.createDataFrame([(w,) for w in "abcdz"], ["w"])
        est = {r["w"]: r["est"] for r in
               count_min_lookup(sk, probes, "w", depth=4, width=1024).collect()}
        for w, n in self.COUNTS.items():
            assert est[w] >= n            # CM never undercounts
        # 4 items in a 4x1024 sketch: collisions are (4/1024)^4-unlikely
        assert est == {**self.COUNTS, "z": 0}

    def test_sketch_size_bounded(self, spark):
        df = _words(spark, {f"w{i}": 3 for i in range(500)})
        sk = count_min_build(df, "w", depth=4, width=32)
        assert sk.count() <= 4 * 32
        total = sk.filter(F.col("row") == 0).agg(F.sum("cnt")).collect()[0][0]
        assert total == 1500              # every occurrence hits each row once

    def test_overcount_bounded_under_collisions(self, spark):
        # width 8 forces collisions; error of any estimate <= total mass
        counts = {f"w{i}": i + 1 for i in range(40)}
        df = _words(spark, counts)
        sk = count_min_build(df, "w", depth=4, width=8)
        probes = spark.createDataFrame([(w,) for w in counts], ["w"])
        est = {r["w"]: r["est"] for r in
               count_min_lookup(sk, probes, "w", depth=4, width=8).collect()}
        n_total = sum(counts.values())
        for w, n in counts.items():
            assert n <= est[w] <= n + n_total


class TestKmv:
    def test_exact_below_k(self, spark):
        df = _words(spark, {f"t{i}": 2 for i in range(60)})
        (row,) = kmv_distinct(df, "w", k=128).collect()
        assert row["est_distinct"] == 60.0

    def test_estimate_within_relative_error(self, spark):
        df = _words(spark, {f"t{i}": 1 for i in range(5000)})
        (row,) = kmv_distinct(df, "w", k=256).collect()
        # standard error ~ 1/sqrt(k-1) ~ 6%; allow 4 sigma
        assert row["est_distinct"] == pytest.approx(5000, rel=0.25)

    def test_shard_count_invariance(self, spark):
        df = _words(spark, {f"t{i}": 1 for i in range(3000)})
        a = kmv_distinct(df, "w", k=64, n_shards=4).collect()[0]["est_distinct"]
        b = kmv_distinct(df, "w", k=64, n_shards=64).collect()[0]["est_distinct"]
        assert a == b

    def test_grouped(self, spark):
        rows = [("g1", f"x{i}") for i in range(30)] + [
            ("g2", f"y{i % 10}") for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["g", "w"])
        est = {r["g"]: r["est_distinct"]
               for r in kmv_distinct(df, "w", ["g"], k=128).collect()}
        assert est == {"g1": 30.0, "g2": 10.0}

    def test_matches_python_replay(self, spark):
        # below-k exactness aside, the k-th-smallest path must replay
        vals = [f"v{i}" for i in range(1000)]
        df = spark.createDataFrame([(v,) for v in vals], ["w"])
        k = 32
        (row,) = kmv_distinct(df, "w", k=k).collect()
        hashes = sorted(
            int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:8], 16) / 2**32
            for v in set(vals)
        )
        want = round((k - 1) / hashes[k - 1], 6)
        assert row["est_distinct"] == want
