"""Snapshot time travel (catalog history manifests): every commit retains
its manifest under history/, reads can target any retained version,
restore is a metadata-only commit, and vacuum is what expires snapshots —
never a data commit."""

import tempfile

import pandas as pd
import pytest

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.errors import GeoDBError


@pytest.fixture()
def client(spark):
    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_tt_"), user="t"
    )
    c.create_collection("tt", {"k": "int", "name": "text"})
    c.insert_into_collection(
        "tt", pd.DataFrame({"k": [1, 2], "name": ["a", "b"]})
    )  # v1
    c.insert_into_collection(
        "tt", pd.DataFrame({"k": [3, 4], "name": ["c", "d"]})
    )  # v2
    c.delete_from_collection("tt", "k=lt.3")  # v3
    return c


def _ks(client, version=None):
    df = client.catalog.load_df("tt", "t", version=version)
    return sorted(r.k for r in df.select("k").collect())


class TestTimeTravel:
    def test_versions_listed(self, client):
        # v0 is the empty creation snapshot; one snapshot per commit after
        vs = [v["version"] for v in client.get_collection_versions("tt")]
        assert vs == [0, 1, 2, 3]

    def test_v0_is_empty_and_restorable(self, client):
        df = client.catalog.load_df("tt", "t", version=0)
        assert df.count() == 0
        assert "k" in df.columns
        # restore to empty is a metadata-only forward commit
        client.restore_collection("tt", 0)
        assert _ks(client) == []
        assert client.catalog.meta("tt", "t").version == 4

    def test_v0_anchored_change_feed(self, client):
        from xcube_geodb_spark.operators.changes import collection_changes

        ch = collection_changes(client.catalog, "tt", "t", 0, 1)
        got = {(r.k, r._change_type) for r in ch.collect()}
        assert got == {(1, "insert"), (2, "insert")}

    def test_read_at_each_version(self, client):
        assert _ks(client, version=1) == [1, 2]
        assert _ks(client, version=2) == [1, 2, 3, 4]
        assert _ks(client, version=3) == [3, 4]
        assert _ks(client) == [3, 4]  # current

    def test_unknown_version_raises(self, client):
        with pytest.raises(GeoDBError, match="does not exist or was expired"):
            client.catalog.load_df("tt", "t", version=99)

    def test_restore_is_new_metadata_commit(self, client):
        client.restore_collection("tt", 2)
        assert _ks(client) == [1, 2, 3, 4]
        m = client.catalog.meta("tt", "t")
        assert m.version == 4  # rollback commits forward, never rewrites
        # and the pre-restore state is itself still time-travelable
        assert _ks(client, version=3) == [3, 4]

    def test_optimize_preserves_history(self, client):
        client.optimize_collection("tt")
        assert _ks(client, version=1) == [1, 2]

    def test_vacuum_expires_old_snapshots(self, client):
        stats = client.vacuum_collection("tt", older_than_seconds=0.0)
        assert stats["expired_versions"] == [0, 1, 2]
        with pytest.raises(GeoDBError):
            client.catalog.load_df("tt", "t", version=1)
        assert _ks(client) == [3, 4]  # current untouched

    def test_vacuum_then_restore_refuses_cleanly(self, client):
        client.vacuum_collection("tt", older_than_seconds=0.0)
        with pytest.raises(GeoDBError):
            client.restore_collection("tt", 1)

    def test_vacuum_retention_keeps_files_readable(self, client):
        # default retention: nothing expires, all versions stay readable
        client.vacuum_collection("tt")
        assert _ks(client, version=1) == [1, 2]
        assert _ks(client, version=2) == [1, 2, 3, 4]


class TestRestoreSchema:
    def test_restore_rolls_back_dropped_property(self, client):
        # add/drop_properties mutate metadata without a data commit; restore
        # must bring the snapshot's SCHEMA back or v1 files would be read
        # under the post-drop schema and silently prune the column
        client.catalog.drop_properties("tt", ["name"], "t")
        assert "name" not in client.catalog.meta("tt", "t").properties
        client.restore_collection("tt", 1)
        m = client.catalog.meta("tt", "t")
        assert "name" in m.properties
        df = client.catalog.load_df("tt", "t")
        assert sorted(r.name for r in df.select("name").collect()) == ["a", "b"]


class TestMergeMeta:
    def test_merge_meta_cannot_clobber_sibling_keys(self, client):
        # the exactly-once guarantee for two streams on one collection:
        # each commit merges only ITS epoch key against the fresh metadata
        cat = client.catalog
        cat.commit_version(
            "tt", "t", None, merge_meta={"stream_epochs": {"a": 7}}
        )
        cat.commit_version(
            "tt", "t", None, merge_meta={"stream_epochs": {"b": 3}}
        )
        assert cat.meta("tt", "t").d["stream_epochs"] == {"a": 7, "b": 3}
        # a replayed/stale writer advancing only its own key leaves b alone
        cat.commit_version(
            "tt", "t", None, merge_meta={"stream_epochs": {"a": 8}}
        )
        assert cat.meta("tt", "t").d["stream_epochs"] == {"a": 8, "b": 3}


class TestChangeFeed:
    def test_insert_update_delete_classification(self, client):
        # fixture history: v1 insert {1,2}, v2 insert {3,4}, v3 delete k<3
        from xcube_geodb_spark.operators.changes import collection_changes

        ch = collection_changes(client.catalog, "tt", "t", 1, 3)
        got = {(r.k, r._change_type) for r in ch.collect()}
        assert got == {(3, "insert"), (4, "insert"), (1, "delete"), (2, "delete")}

    def test_update_shows_post_image_and_skips_rewrites(self, client):
        from xcube_geodb_spark.operators.changes import collection_changes

        v_before = client.catalog.meta("tt", "t").version
        client.update_collection("tt", {"name": "Z"}, "k=eq.3", database="t")
        ch = collection_changes(client.catalog, "tt", "t", v_before)
        rows = ch.collect()
        # only the updated row appears — k=4 was rewritten into a new file
        # by the same DML pass but its payload is unchanged
        assert {(r.k, r._change_type, r.name) for r in rows} == {
            (3, "update", "Z")
        }

    def test_update_to_null_surfaces_null(self, client):
        from xcube_geodb_spark.operators.changes import collection_changes

        v = client.catalog.meta("tt", "t").version
        client.update_collection("tt", {"name": None}, "k=eq.4", database="t")
        rows = collection_changes(client.catalog, "tt", "t", v).collect()
        assert [(r.k, r._change_type, r.name) for r in rows] == [
            (4, "update", None)
        ]

    def test_feed_spans_add_properties_boundary(self, client):
        # a property added between the two versions has no FROM-side
        # column; deletes must project a typed NULL for it instead of
        # crashing on a missing o.<col> reference
        from xcube_geodb_spark.operators.changes import collection_changes

        v = client.catalog.meta("tt", "t").version
        client.catalog.add_properties("tt", {"score": "float"}, "t")
        client.insert_into_collection(
            "tt", pd.DataFrame({"k": [9], "name": ["i"], "score": [1.5]})
        )
        client.delete_from_collection("tt", "k=eq.3")
        ch = collection_changes(client.catalog, "tt", "t", v)
        got = {(r.k, r._change_type, r.score) for r in ch.collect()}
        assert got == {(9, "insert", 1.5), (3, "delete", None)}

    def test_bad_version_order_raises(self, client):
        from xcube_geodb_spark.operators.changes import collection_changes

        with pytest.raises(GeoDBError, match="newer than"):
            collection_changes(client.catalog, "tt", "t", 3, 1)

    def test_client_facade(self, client):
        pdf = client.get_collection_changes("tt", 1, 2, database="t")
        assert set(pdf["_change_type"]) == {"insert"}
        assert sorted(pdf["k"]) == [3, 4]


class TestChangeFeedFilePruning:
    def test_diff_reads_only_symmetric_difference(self, client):
        # fixture: v2 -> v3 was a delete rewriting only touched files
        from xcube_geodb_spark.operators.changes import diff_file_sets

        m2 = client.catalog.meta_at_version("tt", "t", 2)
        m3 = client.catalog.meta_at_version("tt", "t", 3)
        from_only, to_only = diff_file_sets(m2.files, m3.files)
        shared = set(m2.files) & set(m3.files)
        # the delete rewrote a strict subset: shared files exist and are
        # excluded from both diff sides
        assert from_only and set(from_only).isdisjoint(shared)
        assert set(to_only).isdisjoint(shared)

    def test_append_only_diff_has_empty_from_side(self, client):
        from xcube_geodb_spark.operators.changes import diff_file_sets

        m1 = client.catalog.meta_at_version("tt", "t", 1)
        m2 = client.catalog.meta_at_version("tt", "t", 2)
        from_only, to_only = diff_file_sets(m1.files, m2.files)
        assert from_only == []  # appends never rewrite: nothing to re-read
        assert to_only  # only the new files are scanned


class TestTimestampTravel:
    def test_timestamp_resolves_to_newest_version_not_after(
        self, spark, tmp_path
    ):
        import pandas as pd

        from xcube_geodb_spark.client import GeoDBSparkClient
        from xcube_geodb_spark.errors import GeoDBError

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh"), user="tt")
        c.create_collection("t", {"v": "int"})
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (0 0)"], "v": [1]})
        )
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (1 1)"], "v": [2]})
        )
        versions = c.catalog.list_versions("t", "tt")
        assert len(versions) >= 3  # v0 + two commits
        latest = versions[-1]
        # the current wall clock sees the latest version
        got = c.catalog.version_at_timestamp("t", "tt", "9999-01-01T00:00:00")
        assert got == latest["version"]
        # exactly at the newest commit's stamp: that version (<= semantics)
        got = c.catalog.version_at_timestamp("t", "tt", latest["modified_at"])
        assert got == latest["version"]
        # before the collection existed: error
        with pytest.raises(GeoDBError, match="No snapshot"):
            c.catalog.version_at_timestamp("t", "tt", "2000-01-01T00:00:00")
        # tz-aware datetimes convert to UTC before comparing: the same
        # instant expressed at UTC+10 must resolve identically
        import datetime as dt

        naive = dt.datetime.strptime(
            latest["modified_at"], "%Y-%m-%dT%H:%M:%S"
        )
        utc = naive.replace(tzinfo=dt.timezone.utc)
        plus10 = utc.astimezone(dt.timezone(dt.timedelta(hours=10)))
        assert c.catalog.version_at_timestamp("t", "tt", plus10) == got
        assert c.catalog.version_at_timestamp("t", "tt", utc) == got

    def test_client_reads_historic_content(self, spark, tmp_path):
        import pandas as pd

        from xcube_geodb_spark.client import GeoDBSparkClient

        c = GeoDBSparkClient(spark, warehouse=str(tmp_path / "wh2"), user="tt")
        c.create_collection("t", {"v": "int"})
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (0 0)"], "v": [1]})
        )
        v1 = c.catalog.list_versions("t", "tt")[-1]
        c.insert_into_collection(
            "t", pd.DataFrame({"geometry": ["POINT (1 1)"], "v": [2]})
        )
        # the instant of v1 shows only the first row (same-second commits
        # resolve to the newest <= ts, so assert through the version API)
        resolved = c.catalog.version_at_timestamp("t", "tt", v1["modified_at"])
        assert resolved >= v1["version"]
        df = c.get_collection_at_timestamp("t", "9999-01-01T00:00:00")
        assert sorted(df["v"]) == [1, 2]
