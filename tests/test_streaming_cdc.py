"""Streaming CDC source (streaming/cdc.py): readStream over collection
commit versions -> per-version row-level diffs via the batch change feed.
"""

import tempfile

import pandas as pd
import pytest

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.streaming import stream_collection_changes


@pytest.fixture()
def client(spark):
    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_cdc_"), user="s"
    )
    c.create_collection("n", {"k": "int", "name": "text"})
    c.insert_into_collection(
        "n", pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    )  # v1
    c.delete_from_collection("n", "k=eq.2")  # v2
    c.update_collection("n", {"name": "Z"}, "k=eq.3")  # v3
    return c


def _run_feed(client, tmp_path, ckpt="ckpt", from_version=0):
    got = []

    def feed(df, bid):
        got.extend(
            df.select("k", "name", "_change_type", "_commit_version").collect()
        )

    q = stream_collection_changes(
        client.catalog,
        "n",
        "s",
        feed,
        checkpoint_dir=str(tmp_path / ckpt),
        from_version=from_version,
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    return sorted((r.k, r._change_type, r._commit_version) for r in got)


class TestStreamingCDC:
    def test_full_history_feed(self, client, tmp_path):
        assert _run_feed(client, tmp_path) == [
            (1, "insert", 1),
            (2, "delete", 2),
            (2, "insert", 1),
            (3, "insert", 1),
            (3, "update", 3),
        ]

    def test_from_version_skips_prefix(self, client, tmp_path):
        assert _run_feed(client, tmp_path, from_version=2) == [
            (3, "update", 3)
        ]

    def test_restart_processes_only_new_commits(self, client, tmp_path):
        first = _run_feed(client, tmp_path, ckpt="inc")
        assert len(first) == 5
        client.insert_into_collection(
            "n", pd.DataFrame({"k": [9], "name": ["i"]})
        )  # v4
        second = _run_feed(client, tmp_path, ckpt="inc")
        assert second == [(9, "insert", 4)]

    def test_no_new_commits_feeds_nothing(self, client, tmp_path):
        _run_feed(client, tmp_path, ckpt="idle")
        assert _run_feed(client, tmp_path, ckpt="idle") == []

    def test_feed_spans_schema_evolution(self, client, tmp_path):
        # incremental restart AFTER add_properties: the per-version diffs
        # must project typed NULLs for the new column on old-side rows
        first = _run_feed(client, tmp_path, ckpt="evo")
        assert len(first) == 5
        client.catalog.add_properties("n", {"score": "float"}, "s")
        client.insert_into_collection(
            "n", pd.DataFrame({"k": [7], "name": ["g"], "score": [2.5]})
        )  # v4
        client.delete_from_collection("n", "k=eq.1")  # v5
        got = []

        def feed(df, bid):
            got.extend(df.collect())

        q = stream_collection_changes(
            client.catalog,
            "n",
            "s",
            feed,
            checkpoint_dir=str(tmp_path / "evo"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)
        rows = {(r.k, r._change_type): r for r in got}
        assert rows[(7, "insert")].score == 2.5
        assert rows[(1, "delete")].score is None  # pre-schema row

    def test_deletes_carry_preimage(self, client, tmp_path):
        rows = _run_feed(client, tmp_path)
        # helper returns tuples; re-run keeping names for the delete row
        got = []

        def feed(df, bid):
            got.extend(df.collect())

        q = stream_collection_changes(
            client.catalog,
            "n",
            "s",
            feed,
            checkpoint_dir=str(tmp_path / "pre"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)
        deletes = [r for r in got if r._change_type == "delete"]
        assert [(r.k, r.name) for r in deletes] == [(2, "b")]
