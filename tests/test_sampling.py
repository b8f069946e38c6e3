"""Deterministic sampling / splitting / packing (functions/sampling.py):
the properties that make these usable on a growing 100 TB corpus —
stability under growth, seed independence, and budget safety."""

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.functions.sampling import (
    hash_sample,
    pack_by_token_budget,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"en" if i % 3 else "de", 50 + (i * 37) % 400) for i in range(2000)],
        "doc_id long, lang string, toks long",
    )


class TestHashSample:
    def test_fraction_approximate(self, docs):
        n = hash_sample(docs, "doc_id", 0.2, seed="a").count()
        assert 300 <= n <= 500  # 0.2 of 2000 within generous tolerance

    def test_deterministic(self, docs):
        a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
        b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
        assert a == b

    def test_stable_under_growth(self, docs, spark):
        # membership decided per row: sampling a subset gives the subset of
        # the sample — nothing reshuffles as the corpus grows
        full = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
        half = docs.filter("doc_id < 1000")
        sub = {r.doc_id for r in hash_sample(half, "doc_id", 0.3).collect()}
        assert sub == {d for d in full if d < 1000}

    def test_nested_fractions(self, docs):
        # a 10% sample is a subset of the 30% sample under the same seed
        s10 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect()}
        s30 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
        assert s10 <= s30

    def test_seeds_independent(self, docs):
        a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, seed="a").collect()}
        b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, seed="b").collect()}
        assert a != b


class TestSplit:
    def test_disjoint_exhaustive(self, docs):
        out = train_val_test_split(docs, "doc_id", 0.1, 0.1)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert set(counts) == {"train", "val", "test"}
        assert 120 <= counts["val"] <= 280 and 120 <= counts["test"] <= 280


class TestPacking:
    def test_preceding_total_fits_budget(self, docs):
        out = pack_by_token_budget(
            docs, "toks", "doc_id", budget=1000, partition_cols=["lang"]
        )
        # within every pack, the tokens BEFORE the last doc fit the budget
        agg = (
            out.groupBy("lang", "pack_id")
            .agg(
                F.sum("toks").alias("total"),
                F.max_by("toks", "doc_id").alias("last"),
            )
            .collect()
        )
        assert agg and all(r.total - r.last < 1000 for r in agg)

    def test_packs_consecutive_per_partition(self, docs):
        out = pack_by_token_budget(
            docs, "toks", "doc_id", budget=1000, partition_cols=["lang"]
        )
        for lang in ("en", "de"):
            ids = [
                r.pack_id
                for r in out.filter(F.col("lang") == lang)
                .orderBy("doc_id")
                .collect()
            ]
            assert ids[0] == 0
            assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))

    def test_oversized_doc_gets_own_pack(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 5000), (3, 10)], "doc_id long, toks long"
        )
        out = {
            r.doc_id: r.pack_id
            for r in pack_by_token_budget(df, "toks", "doc_id", 1000).collect()
        }
        assert out[1] == 0 and out[2] == 0 and out[3] == 5
        # doc 2 exceeds the budget alone; doc 3 starts a fresh pack

    def test_global_path_matches_naive_window_and_is_partitioned(
        self, docs, spark
    ):
        """The global (no partition_cols) path must equal the naive
        unpartitioned-window cumsum — including RANGE-frame tie semantics
        — while planning NO single-partition window (verdict r5 task 2:
        two-phase cumsum, every window keyed by the range-partition id)."""
        from pyspark.sql import Window

        out = pack_by_token_budget(docs, "toks", "doc_id", budget=1000)
        naive_cum = F.sum("toks").over(Window.orderBy("doc_id"))
        naive = docs.withColumn(
            "pack_id",
            F.floor((naive_cum - F.col("toks")) / F.lit(1000)).cast("long"),
        )
        got = {(r.doc_id, r.pack_id) for r in out.collect()}
        want = {(r.doc_id, r.pack_id) for r in naive.collect()}
        assert got == want
        # tie semantics: duplicate order keys share a cumsum (RANGE frame)
        ties = spark.createDataFrame(
            [(1, 100), (1, 200), (1, 300), (2, 450), (2, 50), (3, 500)],
            "k long, toks long",
        )
        got_t = {
            (r.k, r.toks, r.pack_id)
            for r in pack_by_token_budget(ties, "toks", "k", 500).collect()
        }
        naive_t_cum = F.sum("toks").over(Window.orderBy("k"))
        want_t = {
            (r.k, r.toks, r.pack_id)
            for r in ties.withColumn(
                "pack_id",
                F.floor((naive_t_cum - F.col("toks")) / F.lit(500)).cast(
                    "long"
                ),
            ).collect()
        }
        assert got_t == want_t
        # plan shape: every window spec carries a partition key
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "__pid" in spec, plan


class TestChunking:
    def test_chunks_cover_with_overlap(self, spark):
        from xcube_geodb_spark.functions.sampling import chunk_by_tokens

        text = " ".join(f"t{i}" for i in range(100))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_by_tokens(df, chunk_size=40, overlap=10).collect(),
            key=lambda r: r.chunk_idx,
        )
        # stride 30: starts 0, 30, 60; window [60, 100) reaches the end
        assert [r.chunk_idx for r in rows] == [0, 1, 2]
        first = rows[0].chunk_text.split(" ")
        second = rows[1].chunk_text.split(" ")
        assert first == [f"t{i}" for i in range(40)]
        assert second[:10] == [f"t{i}" for i in range(30, 40)]  # overlap
        assert rows[2].chunk_text.split(" ") == [f"t{i}" for i in range(60, 100)]

    def test_short_doc_single_chunk(self, spark):
        from xcube_geodb_spark.functions.sampling import chunk_by_tokens

        df = spark.createDataFrame([(1, "just a few words")], "doc_id long, text string")
        rows = chunk_by_tokens(df, chunk_size=64, overlap=16).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "just a few words"

    def test_bad_overlap_raises(self, spark):
        from xcube_geodb_spark.functions.sampling import chunk_by_tokens

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            chunk_by_tokens(df, chunk_size=10, overlap=10)

    def test_reassembly_is_faithful(self, spark):
        # non-overlapping chunks concatenate back to the original text
        from xcube_geodb_spark.functions.sampling import chunk_by_tokens

        text = " ".join(f"w{i}" for i in range(50))
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        rows = sorted(
            chunk_by_tokens(df, chunk_size=20, overlap=0).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert " ".join(r.chunk_text for r in rows) == text


class TestStratifiedSample:
    def _docs(self, spark):
        from xcube_geodb_spark.suite.util import load

        return load(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", "lang"
        )

    def test_per_stratum_cutoffs(self, spark):
        from xcube_geodb_spark.functions.sampling import stratified_sample

        docs = self._docs(spark)
        out = stratified_sample(
            docs, "doc_id", "lang",
            {"de": 1.0, "en": 0.25}, default_fraction=0.0, seed="s",
        )
        got = {r["lang"]: r["cnt"] for r in
               out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        totals = {r["lang"]: r["cnt"] for r in
                  docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert got["de"] == totals["de"]          # fraction 1.0 keeps all
        assert 0 < got.get("en", 0) < totals["en"]
        assert set(got) == {"de", "en"}           # default 0 drops the rest

    def test_deterministic_and_growth_stable(self, spark):
        from xcube_geodb_spark.functions.sampling import stratified_sample

        docs = self._docs(spark)
        kw = dict(fractions={"en": 0.3}, default_fraction=0.2, seed="x")
        a = {r["doc_id"] for r in
             stratified_sample(docs, "doc_id", "lang", **kw).collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs, "doc_id", "lang", **kw).collect()}
        assert a == b
        # membership of old rows survives data growth
        half = docs.filter(F.col("doc_id") < 250)
        c = {r["doc_id"] for r in
             stratified_sample(half, "doc_id", "lang", **kw).collect()}
        assert c == {i for i in a if i < 250}


class TestCapPerGroup:
    def test_caps_and_preserves_small_groups(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_per_group

        rows = [(i, "big" if i < 50 else "small") for i in range(60)]
        df = spark.createDataFrame(rows, ["id", "grp"])
        out = cap_per_group(df, "grp", "id", max_rows=10)
        counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
            F.count("*").alias("n")).collect()}
        assert counts == {"big": 10, "small": 10}

    def test_survivors_stable_under_growth(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_per_group

        small = spark.createDataFrame(
            [(i, "g") for i in range(100)], ["id", "grp"])
        grown = spark.createDataFrame(
            [(i, "g") for i in range(200)], ["id", "grp"])
        kept_small = {r["id"] for r in cap_per_group(
            small, "grp", "id", 5, seed="s").collect()}
        kept_grown = {r["id"] for r in cap_per_group(
            grown, "grp", "id", 5, seed="s").collect()}
        # hash order is a fixed preference: new rows can displace old ones
        # only by hashing earlier, never by arrival order — rerunning on a
        # superset keeps every survivor that still ranks in the top 5
        hash_rank = lambda i: __import__("hashlib").md5(
            f"s{i}".encode()).hexdigest()
        expect_grown = set(sorted(range(200), key=hash_rank)[:5])
        assert kept_grown == expect_grown
        assert kept_small == set(sorted(range(100), key=hash_rank)[:5])

    def test_rejects_zero_cap(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_per_group

        df = spark.createDataFrame([(1, "g")], ["id", "grp"])
        with pytest.raises(ValueError):
            cap_per_group(df, "grp", "id", 0)


class TestDeterministicShuffle:
    def test_is_permutation_and_reproducible(self, spark):
        from xcube_geodb_spark.functions.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
        out = deterministic_shuffle(df, "id", seed="e0")
        pos = [r["shuffle_pos"] for r in out.collect()]
        assert sorted(pos) == list(range(500))
        again = {(r["id"], r["shuffle_pos"]) for r in
                 deterministic_shuffle(df, "id", seed="e0").collect()}
        assert again == {(r["id"], r["shuffle_pos"]) for r in out.collect()}

    def test_permutation_valid_at_larger_scale(self, spark):
        """Regression for the r5 bug: offsets were collected in one job
        and ranks computed in another over repartitionByRange, whose
        sampled bounds differ per execution — positions near every bound
        duplicated/skipped (visible only once data >> bucket count)."""
        from xcube_geodb_spark.functions.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
        for _ in range(3):
            pos = [
                r["shuffle_pos"]
                for r in deterministic_shuffle(df, "id", seed="s").collect()
            ]
            assert sorted(pos) == list(range(5000))

    def test_seed_changes_permutation(self, spark):
        from xcube_geodb_spark.functions.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
        a = {r["id"]: r["shuffle_pos"] for r in
             deterministic_shuffle(df, "id", seed="a").collect()}
        b = {r["id"]: r["shuffle_pos"] for r in
             deterministic_shuffle(df, "id", seed="b").collect()}
        assert any(a[i] != b[i] for i in a)

    def test_matches_md5_order(self, spark):
        import hashlib

        from xcube_geodb_spark.functions.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(64)], ["id"])
        got = {r["id"]: r["shuffle_pos"] for r in
               deterministic_shuffle(df, "id", seed="x").collect()}
        order = sorted(range(64),
                       key=lambda i: hashlib.md5(f"x{i}".encode()).hexdigest())
        assert got == {i: p for p, i in enumerate(order)}

    def test_plan_has_no_unpartitioned_window(self, spark):
        from xcube_geodb_spark.functions.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(64)], ["id"])
        plan = deterministic_shuffle(df, "id")._jdf.queryExecution() \
            .executedPlan().toString()
        # every Window node must partition by the range-partition id --
        # an empty partitionBy would serialize the corpus into one task
        for line in plan.splitlines():
            if "Window [" in line or "RunningWindowFunction" in line:
                assert "__pid" in line, line


class TestWeightedSample:
    def test_extreme_weights(self, spark):
        from xcube_geodb_spark.functions.sampling import hash_sample_weighted

        rows = [(i, 1.0 if i < 50 else 0.0) for i in range(100)]
        df = spark.createDataFrame(rows, ["id", "w"])
        kept = {r["id"] for r in hash_sample_weighted(df, "id", "w").collect()}
        assert kept == set(range(50))  # weight 1 always kept, 0 never

    def test_fraction_matches_unweighted(self, spark):
        from xcube_geodb_spark.functions.sampling import (
            hash_sample,
            hash_sample_weighted,
        )

        df = spark.createDataFrame([(i, 0.3) for i in range(500)], ["id", "w"])
        a = {r["id"] for r in hash_sample_weighted(df, "id", "w", seed="s").collect()}
        b = {r["id"] for r in hash_sample(df, "id", 0.3, seed="s").collect()}
        assert a == b  # constant weight == plain hash_sample

    def test_clamps_out_of_range_weights(self, spark):
        from xcube_geodb_spark.functions.sampling import hash_sample_weighted

        df = spark.createDataFrame([(1, 7.5), (2, -3.0)], ["id", "w"])
        kept = {r["id"] for r in hash_sample_weighted(df, "id", "w").collect()}
        assert kept == {1}


class TestTokenCap:
    def test_budget_fills_greedily_and_first_row_survives(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_tokens_per_group

        df = spark.createDataFrame(
            [(i, "a" if i < 6 else "b", 100) for i in range(10)],
            "id long, grp string, toks long",
        )
        out = cap_tokens_per_group(df, "grp", "id", "toks", 250, seed="s")
        counts = {
            r["grp"]: r["n"]
            for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
        }
        # 100-token rows against a 250 budget: rows at cum 100, 200, 300
        # -> cum-toks = 0, 100, 200 < 250 -> exactly 3 kept per group
        assert counts == {"a": 3, "b": 3}

    def test_oversized_first_row_kept(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_tokens_per_group

        df = spark.createDataFrame(
            [(1, "a", 9999), (2, "a", 10)], "id long, grp string, toks long"
        )
        out = cap_tokens_per_group(df, "grp", "id", "toks", 100, seed="s")
        # whichever row the hash orders first survives (cum-toks = 0);
        # the second exceeds the spent budget
        assert out.count() == 1

    def test_deterministic_and_stable_under_growth(self, spark):
        from xcube_geodb_spark.functions.sampling import cap_tokens_per_group

        df = spark.createDataFrame(
            [(i, "g", 50) for i in range(40)], "id long, grp string, toks long"
        )
        kept1 = {r["id"] for r in
                 cap_tokens_per_group(df, "grp", "id", "toks", 500).collect()}
        kept2 = {r["id"] for r in
                 cap_tokens_per_group(df, "grp", "id", "toks", 500).collect()}
        assert kept1 == kept2 and len(kept1) == 10
        # widening the budget only ADDS rows (prefix property of the
        # hash order)
        wider = {r["id"] for r in
                 cap_tokens_per_group(df, "grp", "id", "toks", 1000).collect()}
        assert kept1 <= wider

    def test_rejects_nonpositive_budget(self, spark):
        import pytest as _pytest

        from xcube_geodb_spark.functions.sampling import cap_tokens_per_group

        df = spark.createDataFrame([(1, "a", 5)], "id long, grp string, toks long")
        with _pytest.raises(ValueError):
            cap_tokens_per_group(df, "grp", "id", "toks", 0)


class TestMixCorpora:
    """Token-weighted training-mixture composition
    (functions/sampling.mix_corpora): per-source budgets from
    normalized weights, greedy hash-order fill, two-phase parallel
    cumsum (never a single-partition window)."""

    def _sources(self, spark):
        rows = [(i, 10) for i in range(100)]
        a = spark.createDataFrame(rows, "doc_id long, toks long")
        b = spark.createDataFrame(
            [(1000 + i, 10) for i in range(100)], "doc_id long, toks long"
        )
        return {"a": a, "b": b}

    def test_budgets_follow_normalized_weights(self, spark):
        from xcube_geodb_spark.functions.sampling import mix_corpora

        out = mix_corpora(
            self._sources(spark), {"a": 3.0, "b": 1.0},
            total_tokens=400, key_col="doc_id", token_col="toks",
        ).collect()
        by = {}
        for r in out:
            by.setdefault(r["mix_source"], []).append(r["doc_id"])
        # budgets 300/100 over 10-token docs -> exactly 30 and 10 docs
        assert len(by["a"]) == 30 and len(by["b"]) == 10
        assert all(d < 1000 for d in by["a"])
        assert all(d >= 1000 for d in by["b"])

    def test_matches_python_replay_and_first_doc_survives(self, spark):
        import hashlib

        from xcube_geodb_spark.functions.sampling import mix_corpora

        rows = [(i, 7 + (i % 5)) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, toks long")
        out = mix_corpora(
            {"s": df}, {"s": 1.0}, total_tokens=100,
            key_col="doc_id", token_col="toks", seed="z",
        ).collect()
        order = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"zs{r[0]}".encode()).hexdigest(), r[0]
            ),
        )
        want, cum = set(), 0
        for doc, t in order:
            if cum < 100:
                want.add(doc)
            cum += t
        assert {r["doc_id"] for r in out} == want
        assert order[0][0] in want  # first doc always survives

    def test_plan_has_no_unpartitioned_window(self, spark):
        from xcube_geodb_spark.functions.sampling import mix_corpora

        out = mix_corpora(
            self._sources(spark), {"a": 1.0, "b": 1.0},
            total_tokens=100, key_col="doc_id", token_col="toks",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window [" in line or "RunningWindowFunction" in line:
                assert "__pid" in line, line

    def test_validation(self, spark):
        from xcube_geodb_spark.functions.sampling import mix_corpora

        src = self._sources(spark)
        with pytest.raises(ValueError, match="identical keys"):
            mix_corpora(src, {"a": 1.0}, 100, "doc_id", "toks")
        with pytest.raises(ValueError, match="positive"):
            mix_corpora(src, {"a": 1.0, "b": 0.0}, 100, "doc_id", "toks")
        with pytest.raises(ValueError, match="total_tokens"):
            mix_corpora(src, {"a": 1.0, "b": 1.0}, 0, "doc_id", "toks")
        with pytest.raises(ValueError, match="at least one"):
            mix_corpora({}, {}, 100, "doc_id", "toks")
        # a floored zero budget must fail loudly, not drop the source
        with pytest.raises(ValueError, match="zero token budget"):
            mix_corpora(
                src, {"a": 1.0, "b": 30.0}, 20, "doc_id", "toks"
            )
