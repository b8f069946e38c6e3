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
