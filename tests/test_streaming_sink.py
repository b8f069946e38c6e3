"""Streaming ingest into warehouse collections (streaming/sink.py): real
readStream -> foreachBatch -> collection commits, with the exactly-once
epoch guarantee exercised both through Spark and by direct batch replay.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.streaming import (
    collection_batch_writer,
    streaming_events_source,
    write_stream_to_collection,
)

EVENT_PROPS = {
    "event_id": "bigint",
    "ts": "timestamp",
    "user_id": "bigint",
    "event_type": "text",
    "value": "double",
    "props": "json",
}


def _events(spark, lo, hi):
    rows = [
        (i, f"2024-01-01 10:{i % 60:02d}:00", i % 3, "click", float(i), "{}")
        for i in range(lo, hi)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


@pytest.fixture()
def client(spark):
    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_sink_"), user="s"
    )
    c.create_collection("ev", EVENT_PROPS)
    return c


def _ids(client):
    return sorted(
        r.event_id
        for r in client.catalog.load_df("ev", "s").select("event_id").collect()
    )


class TestStreamingSink:
    def test_stream_ingest_available_now(self, spark, client, tmp_path):
        src = str(tmp_path / "src")
        _events(spark, 0, 20).write.parquet(src)
        stream = streaming_events_source(spark, src)
        q = write_stream_to_collection(
            stream,
            client.catalog,
            "ev",
            "s",
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="ingest",
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        assert _ids(client) == list(range(20))
        # epoch watermark durably recorded in the manifest
        m = client.catalog.meta("ev", "s")
        assert m.d["stream_epochs"]["ingest"] >= 0

    def test_restart_ingests_only_new_files(self, spark, client, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        _events(spark, 0, 10).write.parquet(src)
        stream = streaming_events_source(spark, src)
        q = write_stream_to_collection(
            stream, client.catalog, "ev", "s",
            checkpoint_dir=ckpt, query_name="ingest",
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        # second wave of files; same checkpoint -> incremental catch-up
        _events(spark, 10, 15).write.mode("append").parquet(src)
        q2 = write_stream_to_collection(
            streaming_events_source(spark, src), client.catalog, "ev", "s",
            checkpoint_dir=ckpt, query_name="ingest",
            trigger={"availableNow": True},
        )
        q2.awaitTermination(120)
        assert _ids(client) == list(range(15))  # no duplicates, nothing lost

    def test_replayed_batch_is_noop(self, spark, client):
        fn = collection_batch_writer(
            client.catalog, "ev", "s", query_name="replay"
        )
        batch = _events(spark, 0, 5)
        fn(batch, 7)
        v = client.catalog.meta("ev", "s").version
        fn(batch, 7)  # foreachBatch redelivery after a crash
        assert _ids(client) == list(range(5))
        assert client.catalog.meta("ev", "s").version == v
        fn(_events(spark, 5, 8), 8)  # next epoch still applies
        assert _ids(client) == list(range(8))

    def test_independent_epoch_keys_per_stream(self, spark, client):
        a = collection_batch_writer(client.catalog, "ev", "s", query_name="a")
        b = collection_batch_writer(client.catalog, "ev", "s", query_name="b")
        a(_events(spark, 0, 3), 0)
        b(_events(spark, 3, 6), 0)  # same batch_id, different stream
        assert _ids(client) == list(range(6))
        m = client.catalog.meta("ev", "s")
        assert m.d["stream_epochs"] == {"a": 0, "b": 0}

    def test_empty_batch_skipped(self, spark, client):
        fn = collection_batch_writer(client.catalog, "ev", "s", query_name="e")
        v = client.catalog.meta("ev", "s").version
        fn(_events(spark, 0, 5).filter("event_id < 0"), 0)
        assert client.catalog.meta("ev", "s").version == v


class TestDedupStreamingSink:
    """Continuously-deduplicated ingest: each micro-batch deduped within
    itself and against the already-ingested collection before appending."""

    @pytest.fixture()
    def doc_client(self, spark):
        c = GeoDBSparkClient(
            spark, warehouse=tempfile.mkdtemp(prefix="geodb_ddsink_"), user="s"
        )
        c.create_collection("docs", {"doc_ref": "bigint", "text": "text"})
        return c

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_ref long, text string")

    def _texts(self, client):
        return sorted(
            r.text
            for r in client.catalog.load_df("docs", "s").select("text").collect()
        )

    def test_stream_dedup_across_batches(self, spark, doc_client, tmp_path):
        from xcube_geodb_spark.streaming import write_stream_dedup_to_collection

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        # first increment: one in-batch duplicate
        self._docs(
            spark,
            [(1, "alpha document"), (2, "beta document"), (3, "alpha document")],
        ).write.parquet(src)
        stream = spark.readStream.schema("doc_ref long, text string").parquet(src)
        q = write_stream_dedup_to_collection(
            stream, doc_client.catalog, "docs", "s",
            checkpoint_dir=ckpt, trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        assert self._texts(doc_client) == ["alpha document", "beta document"]

        # second increment: one known text, one new
        self._docs(
            spark, [(4, "beta document"), (5, "gamma document")]
        ).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema("doc_ref long, text string").parquet(src)
        q2 = write_stream_dedup_to_collection(
            stream2, doc_client.catalog, "docs", "s",
            checkpoint_dir=ckpt, trigger={"availableNow": True},
        )
        q2.awaitTermination(120)
        assert self._texts(doc_client) == [
            "alpha document", "beta document", "gamma document",
        ]

    def test_all_duplicate_batch_commits_nothing(self, spark, doc_client):
        from xcube_geodb_spark.streaming import dedup_batch_writer

        w = dedup_batch_writer(doc_client.catalog, "docs", "s")
        w(self._docs(spark, [(1, "only doc")]), batch_id=0)
        v1 = doc_client.catalog.meta("docs", "s").d["version"]
        w(self._docs(spark, [(2, "only doc")]), batch_id=1)
        assert doc_client.catalog.meta("docs", "s").d["version"] == v1
        assert self._texts(doc_client) == ["only doc"]
        # replaying the committed batch is a no-op too
        w(self._docs(spark, [(9, "other")]), batch_id=0)
        assert self._texts(doc_client) == ["only doc"]

    def test_near_dedup_against_corpus(self, spark, doc_client):
        from xcube_geodb_spark.streaming import dedup_batch_writer

        base = (
            "the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every day"
        )
        w = dedup_batch_writer(
            doc_client.catalog, "docs", "s", near=True, jaccard_threshold=0.5
        )
        w(self._docs(spark, [(1, base)]), batch_id=0)
        # near-duplicate (small tail) + genuinely new doc
        w(
            self._docs(
                spark,
                [
                    (2, base + " tail"),
                    (3, "completely unrelated short corpus entry"),
                ],
            ),
            batch_id=1,
        )
        texts = self._texts(doc_client)
        assert base in texts
        assert "completely unrelated short corpus entry" in texts
        assert len(texts) == 2  # the near-dup was dropped
