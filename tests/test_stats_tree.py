"""Stats-tree manifest probes: shard-level min/max hulls stored in the
manifest let a probe skip whole stats shards without loading them, so
probe cost is O(shards) + O(files in surviving shards) instead of
O(all files) (SCALE_r05 showed warm probes linear in file count).

Covers the summary algebra (hulls must be conservative), the commit-side
maintenance (delta summaries, compaction re-sharding into clustered
chunks, the stats_complete flag lifecycle), and tree-vs-flat probe
equivalence on a real collection."""

import pandas as pd
import pytest

import xcube_geodb_spark.catalog as catmod
from xcube_geodb_spark.catalog import GeoDBCatalog, _atomic_write_json
from xcube_geodb_spark.operators import dml
from xcube_geodb_spark.operators.pruning import (
    shard_summary,
    split_files_by_constraints,
    summary_excludes,
)
from xcube_geodb_spark.operators.scan import explain_scan, get_collection


class TestSummaryAlgebra:
    def test_hull_covers_all_files(self):
        s = shard_summary(
            {
                "a": {"id": [0, 9], "v": [5.0, 7.0]},
                "b": {"id": [10, 19], "v": [1.0, 2.0]},
            }
        )
        assert s["cols"]["id"] == [0, 19]
        assert s["cols"]["v"] == [1.0, 7.0]
        assert s["n"] == 2

    def test_file_missing_column_drops_it_from_hull(self):
        # a file without stats for v is un-prunable on v: the hull must
        # not claim a v range for the shard
        s = shard_summary(
            {"a": {"id": [0, 9], "v": [5.0, 7.0]}, "b": {"id": [10, 19]}}
        )
        assert "v" not in s["cols"]
        assert s["cols"]["id"] == [0, 19]

    def test_nan_and_null_stats_drop_column(self):
        s = shard_summary(
            {
                "a": {"v": [float("nan"), float("nan")], "w": [None, None]},
                "b": {"v": [1.0, 2.0], "w": [0.0, 1.0]},
            }
        )
        assert s["cols"] == {}

    def test_rows_marker_ignored(self):
        s = shard_summary({"a": {"id": [0, 9], "::rows": [10, 10]}})
        assert set(s["cols"]) == {"id"}

    def test_exclusion_matches_interval_semantics(self):
        s = {"cols": {"id": [100, 199]}}
        assert summary_excludes(s, [("id", "eq", 50)])
        assert summary_excludes(s, [("id", "gt", 300)])
        assert summary_excludes(s, [("id", "in", [1, 2, 3])])
        assert not summary_excludes(s, [("id", "eq", 150)])
        assert not summary_excludes(s, [("other", "eq", 5)])
        assert not summary_excludes({"cols": {}}, [("id", "eq", 5)])

    def test_incomparable_types_never_exclude(self):
        s = {"cols": {"id": ["a", "z"]}}
        assert not summary_excludes(s, [("id", "eq", 5)])


@pytest.fixture(scope="module")
def tree_cat(spark, tmp_path_factory):
    """A collection with many small files across several commits, so the
    manifest carries several summarized stats shards."""
    wh = str(tmp_path_factory.mktemp("treewh"))
    cat = GeoDBCatalog(spark, wh, user="tree")
    cat.create_database("t")
    cat.create_collection("c", {"v": "int"}, database="t")
    m = cat.meta("c", "t")
    m.d["max_file_rows"] = 25
    _atomic_write_json(m.path, m.d)
    for batch in range(4):
        pdf = pd.DataFrame({"v": [batch * 100 + i for i in range(100)]})
        dml.insert_into_collection(cat, "c", pdf, database="t")
    return cat


class TestCommitMaintenance:
    def test_every_shard_summarized_and_complete(self, tree_cat):
        m = tree_cat.meta("c", "t")
        assert m.stats_complete
        shards = m.stats_shards()
        assert len(shards) == 4  # one delta shard per insert
        for name, summary in shards:
            assert summary is not None, name
            assert "id" in summary["cols"]
            assert summary["n"] >= 1

    def test_tree_probe_equals_flat_probe(self, tree_cat):
        m = tree_cat.meta("c", "t")
        paths = tree_cat.manifest_paths("c", "t", meta=m)
        for q in [
            [("id", "eq", 107)],
            [("id", "gte", 350)],
            [("id", "in", [5, 210])],
            [("id", "lt", -1)],
            [("v", "eq", 250)],
        ]:
            cols = sorted({c for c, _, _ in q})
            tree = split_files_by_constraints(paths, cols, q, meta=m)
            flat = split_files_by_constraints(
                paths, cols, q, stats_map=m.file_stats()
            )
            assert sorted(tree[0]) == sorted(flat[0]), q
            assert sorted(tree[1]) == sorted(flat[1]), q

    def test_excluded_shards_never_loaded(self, tree_cat, spark):
        """The point of the tree: a point probe must parse only the
        shard(s) whose hull admits it. Fresh catalog -> empty shard
        cache; after the probe, exactly the surviving shards are
        cached."""
        cat2 = GeoDBCatalog(spark, tree_cat.warehouse, user="tree")
        m = cat2.meta("c", "t")
        paths = cat2.manifest_paths("c", "t", meta=m)
        touched, untouched = split_files_by_constraints(
            paths, ["id"], [("id", "eq", 3)], meta=m
        )
        assert touched and len(touched) < len(paths)
        loaded = len(cat2._stats_shard_cache)
        assert loaded < len(m.stats_shards()), (
            "probe must not load summary-excluded shards"
        )

    def test_scan_results_unaffected(self, tree_cat):
        out = get_collection(tree_cat, "c", "v=eq.307", database="t")
        assert [r["v"] for r in out.collect()] == [307]
        ex = explain_scan(tree_cat, "c", "id=eq.3", database="t")
        assert ex["files_skipped"] > 0


class TestCompaction:
    def test_compaction_reshards_clustered_chunks(
        self, spark, tmp_path, monkeypatch
    ):
        monkeypatch.setattr(catmod, "STATS_SHARD_COMPACT_AT", 3)
        monkeypatch.setattr(catmod, "STATS_SHARD_CHUNK_FILES", 2)
        cat = GeoDBCatalog(spark, str(tmp_path / "whc"), user="tree")
        cat.create_database("t")
        cat.create_collection("c", {"v": "int"}, database="t")
        m = cat.meta("c", "t")
        m.d["max_file_rows"] = 10
        _atomic_write_json(m.path, m.d)
        for batch in range(5):  # 5 commits > compact-at 3
            pdf = pd.DataFrame({"v": [batch * 20 + i for i in range(20)]})
            dml.insert_into_collection(cat, "c", pdf, database="t")
        m = cat.meta("c", "t")
        assert m.stats_complete
        shards = m.stats_shards()
        # re-sharded into 2-file chunks (+ post-compaction deltas)
        assert len(shards) >= 2
        for name, summary in shards:
            assert summary is not None
            assert summary["n"] <= 2 or name  # chunk bound on compacted
        # chunks are id-clustered: hull ranges must be non-overlapping in
        # id for the compacted chunks (sorted by id-min at compaction)
        hulls = sorted(s["cols"]["id"] for _n, s in shards if s["cols"])
        for (lo1, hi1), (lo2, _hi2) in zip(hulls, hulls[1:]):
            assert hi1 <= lo2 or lo2 >= lo1  # ordered by min
        # correctness after compaction
        out = get_collection(cat, "c", "id=eq.42", database="t")
        assert out.count() == 1
        paths = cat.manifest_paths("c", "t", meta=m)
        tree = split_files_by_constraints(
            paths, ["id"], [("id", "eq", 42)], meta=m
        )
        flat = split_files_by_constraints(
            paths, ["id"], [("id", "eq", 42)], stats_map=m.file_stats()
        )
        assert sorted(tree[0]) == sorted(flat[0])

    def test_legacy_manifest_without_flag_uses_flat_path(
        self, spark, tmp_path
    ):
        cat = GeoDBCatalog(spark, str(tmp_path / "whl"), user="tree")
        cat.create_database("t")
        cat.create_collection("c", {"v": "int"}, database="t")
        dml.insert_into_collection(
            cat, "c", pd.DataFrame({"v": list(range(30))}), database="t"
        )
        m = cat.meta("c", "t")
        # simulate a pre-tree manifest
        m.d.pop("stats_complete", None)
        m.d.pop("stats_summaries", None)
        _atomic_write_json(m.path, m.d)
        m2 = cat.meta("c", "t")
        assert not m2.stats_complete
        out = get_collection(cat, "c", "v=eq.7", database="t")
        assert [r["v"] for r in out.collect()] == [7]


class TestRestoreCoverage:
    def test_restore_past_compaction_rederives_completeness(
        self, spark, tmp_path, monkeypatch
    ):
        """Restore is the one commit that can resurrect files a later
        compaction dropped from the shard chain; stats_complete must be
        re-derived from actual coverage, or the tree probe would
        silently skip the restored files."""
        monkeypatch.setattr(catmod, "STATS_SHARD_COMPACT_AT", 2)
        monkeypatch.setattr(catmod, "STATS_SHARD_CHUNK_FILES", 2)
        cat = GeoDBCatalog(spark, str(tmp_path / "whr"), user="tree")
        cat.create_database("t")
        cat.create_collection("c", {"v": "int"}, database="t")
        m = cat.meta("c", "t")
        m.d["max_file_rows"] = 10
        _atomic_write_json(m.path, m.d)
        dml.insert_into_collection(
            cat, "c", pd.DataFrame({"v": list(range(20))}), database="t"
        )
        v1 = cat.meta("c", "t").version
        # delete the high half (drops a file), then insert until the
        # shard chain compacts (compaction drops dead files' stats)
        dml.delete_from_collection(cat, "c", "v=gte.10", database="t")
        for b in range(3):
            dml.insert_into_collection(
                cat, "c",
                pd.DataFrame({"v": [100 + b * 10 + i for i in range(10)]}),
                database="t",
            )
        cat.restore_collection("c", "t", v1)
        m = cat.meta("c", "t")
        from xcube_geodb_spark.operators.scan import get_collection

        out = get_collection(cat, "c", "v=gte.10", database="t")
        got = sorted(r["v"] for r in out.collect())
        assert got == list(range(10, 20)), (
            "restored rows must be visible through the probed scan "
            f"(stats_complete={m.stats_complete})"
        )
        # the flag must only be True when coverage really holds
        if m.stats_complete:
            assert set(m.files) <= set(m.file_stats())


class TestSummaryConservativeness:
    def test_hull_exclusion_implies_every_file_excluded(self):
        """THE tree-safety invariant, fuzzed: whenever the shard hull
        excludes a constraint set, every individual file's stats must
        exclude it too (a hull that skips a shard containing one
        matching file would silently drop rows)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from xcube_geodb_spark.operators.pruning import file_may_match

        val = st.one_of(
            st.integers(-50, 50),
            st.floats(-50, 50, allow_nan=False, allow_infinity=False),
            st.none(),
        )
        interval = st.tuples(val, val).map(
            lambda t: [t[0], t[1]]
            if t[0] is None or t[1] is None or t[0] <= t[1]
            else [t[1], t[0]]
        )
        file_stats = st.dictionaries(
            st.sampled_from(["a", "b"]), interval, min_size=0, max_size=2
        )
        shard = st.dictionaries(
            st.text("xyz", min_size=1, max_size=3), file_stats,
            min_size=1, max_size=6,
        )
        op = st.sampled_from(["eq", "gt", "gte", "lt", "lte"])
        constraint = st.tuples(st.sampled_from(["a", "b", "c"]), op,
                               st.integers(-60, 60))
        constraints = st.lists(constraint, min_size=1, max_size=3)

        @settings(max_examples=300, deadline=None)
        @given(shard, constraints)
        def check(stats, cons):
            summary = shard_summary(stats)
            if summary_excludes(summary, cons):
                for rel, raw in stats.items():
                    fs = {
                        c: tuple(v)
                        for c, v in raw.items()
                        if not c.startswith("::")
                    }
                    assert not file_may_match(fs, cons), (
                        stats, cons, summary, rel
                    )

        check()


class TestExplainTree:
    def test_explain_reports_shard_skips(self, tree_cat):
        ex = explain_scan(tree_cat, "c", "id=eq.3", database="t")
        t = ex["stats_tree"]
        assert t["complete"] is True
        assert t["shards_total"] == 4
        assert 1 <= t["shards_skipped"] <= 3  # point probe keeps 1 shard
        ex2 = explain_scan(tree_cat, "c", None, database="t")
        assert ex2["stats_tree"]["shards_skipped"] == 0


class TestRebuildUnderRace:
    """Shard summaries are rebuilt per commit; racing writers must leave
    the tree CONSISTENT — stats_complete still true, every live file
    covered by a summarized shard, and tree probes identical to the flat
    per-file probe (r6 verdict order 9)."""

    def _probe_consistency(self, cat):
        m = cat.meta("c", "t")
        assert m.stats_complete
        shards = m.stats_shards()
        assert shards and all(s is not None for _, s in shards)
        covered = set()
        for name, _ in shards:
            covered |= set(m.load_stats_shard(name))
        assert set(m.files) <= covered, "live file missing from shards"
        paths = cat.manifest_paths("c", "t", meta=m)
        for q in [
            [("v", "eq", 305)],
            [("v", "gte", 690)],
            [("v", "lt", 0)],
            [("id", "eq", 3)],
        ]:
            cols = sorted({c for c, _, _ in q})
            tree = split_files_by_constraints(paths, cols, q, meta=m)
            flat = split_files_by_constraints(
                paths, cols, q, stats_map=m.file_stats()
            )
            assert sorted(tree[0]) == sorted(flat[0]), q
            assert sorted(tree[1]) == sorted(flat[1]), q

    def test_threaded_append_storm_keeps_tree_complete(
        self, spark, tmp_path
    ):
        import threading

        wh = str(tmp_path / "wh")
        cat = GeoDBCatalog(spark, wh, user="tree")
        cat.create_database("t")
        cat.create_collection("c", {"v": "int"}, database="t")
        m = cat.meta("c", "t")
        m.d["max_file_rows"] = 20
        _atomic_write_json(m.path, m.d)
        errs = []

        def writer(w):
            try:
                own = GeoDBCatalog(spark, wh, user=f"w{w}")
                for b in range(3):
                    pdf = pd.DataFrame(
                        {"v": [w * 1000 + b * 100 + i for i in range(60)]}
                    )
                    dml.insert_into_collection(
                        own, "c", pdf, database="t", retries=20
                    )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        out = get_collection(cat, "c", database="t")
        assert out.count() == 3 * 3 * 60
        self._probe_consistency(cat)
        ex = explain_scan(cat, "c", "v=eq.205", database="t")
        assert ex["files_skipped"] > 0
        assert [r["v"] for r in get_collection(
            cat, "c", "v=eq.205", database="t"
        ).collect()] == [205]

    def test_cas_retry_mid_insert_keeps_tree_complete(self, spark, tmp_path):
        """A writer whose pinned snapshot goes stale (another commit lands
        between pin and CAS) retries against the fresh manifest — the
        rebuilt shard list must cover BOTH commits' files afterwards."""
        wh = str(tmp_path / "wh2")
        cat = GeoDBCatalog(spark, wh, user="a")
        cat.create_database("t")
        cat.create_collection("c", {"v": "int"}, database="t")
        m = cat.meta("c", "t")
        m.d["max_file_rows"] = 20
        _atomic_write_json(m.path, m.d)
        dml.insert_into_collection(
            cat, "c", pd.DataFrame({"v": list(range(100, 160))}),
            database="t",
        )
        other = GeoDBCatalog(spark, wh, user="b")
        orig_meta = cat.meta
        state = {"fired": False}

        def stale_once(collection, database):
            mm = orig_meta(collection, database)
            if not state["fired"]:
                state["fired"] = True
                dml.insert_into_collection(
                    other, "c",
                    pd.DataFrame({"v": list(range(300, 360))}),
                    database="t",
                )
            return mm

        cat.meta = stale_once
        try:
            dml.insert_into_collection(
                cat, "c", pd.DataFrame({"v": list(range(600, 700))}),
                database="t", retries=3,
            )
        finally:
            cat.meta = orig_meta
        out = get_collection(cat, "c", database="t")
        assert out.count() == 60 + 60 + 100
        self._probe_consistency(cat)
