"""Streaming windows (real readStream), ingest readers, and plan utilities."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from xcube_geodb_spark.geometry.geom import parse_wkb, to_wkt
from xcube_geodb_spark.plans import (
    broadcast_join_count,
    has_pushed_filter,
    zorder_key,
)
from xcube_geodb_spark.sources import (
    read_csv_wkt,
    read_geojson,
    with_geometry_from_wkt,
)
from xcube_geodb_spark.streaming import (
    session_window_agg,
    sliding_window_counts,
    streaming_events_source,
    tumbling_window_counts,
)


@pytest.fixture(scope="module")
def events_batch(spark):
    rows = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:25:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 11:15:00", 1, "view", 3.0, "{}"),  # new session (50min gap)
        (4, "2024-01-01 10:10:00", 2, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


class TestStreamingWindows:
    def test_tumbling_streaming_end_to_end(self, spark, events_batch, tmp_path):
        src = str(tmp_path / "stream_src")
        events_batch.write.parquet(src)
        stream = streaming_events_source(spark, src)
        assert stream.isStreaming
        out = tumbling_window_counts(stream, "1 hour", "2 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM tumbling_test ORDER BY window_start, event_type"
            ).collect()
        finally:
            q.stop()
        got = {
            (str(r["window_start"]), r["event_type"]): r["n_events"] for r in rows
        }
        assert got[("2024-01-01 10:00:00", "click")] == 3
        assert got[("2024-01-01 11:00:00", "view")] == 1

    def test_session_window_streaming(self, spark, events_batch, tmp_path):
        src = str(tmp_path / "stream_src2")
        events_batch.write.parquet(src)
        stream = streaming_events_source(spark, src)
        out = session_window_agg(stream, gap="30 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("session_test")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM session_test").collect()
        finally:
            q.stop()
        per_user = {}
        for r in rows:
            per_user.setdefault(r["user_id"], 0)
            per_user[r["user_id"]] += 1
        # user 1: two sessions (50-minute gap); user 2: one
        assert per_user[1] == 2
        assert per_user[2] == 1

    def test_dedup_events_stream(self, spark, events_batch, tmp_path):
        from xcube_geodb_spark.streaming import dedup_events_stream

        src = str(tmp_path / "dup_src")
        dup = events_batch.union(events_batch.limit(2))  # event_ids 1,2 twice
        dup.write.parquet(src)
        stream = streaming_events_source(spark, src)
        q = (
            dedup_events_stream(stream)
            .writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT event_id FROM dedup_test").collect()
        finally:
            q.stop()
        ids = sorted(r["event_id"] for r in rows)
        assert ids == [1, 2, 3, 4]

    def test_running_user_totals_stateful(self, spark, events_batch, tmp_path):
        from xcube_geodb_spark.streaming import running_user_totals

        src = str(tmp_path / "state_src")
        events_batch.write.parquet(src)
        stream = streaming_events_source(spark, src)
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("state_test")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT user_id, max(n_events) AS n, max(total_value) AS t "
                "FROM state_test GROUP BY user_id"
            ).collect()
        finally:
            q.stop()
        got = {r["user_id"]: (r["n"], r["t"]) for r in rows}
        assert got[1] == (3, 6.0)
        assert got[2] == (1, 4.0)

    def test_sliding_batch_shape(self, events_batch):
        out = sliding_window_counts(events_batch.drop("props"), "1 hour", "30 minutes")
        rows = out.collect()  # batch mode: windows still computed
        assert {"window_start", "window_end", "event_type", "n_events"} <= set(
            out.columns
        )
        assert sum(r["n_events"] for r in rows) >= len(rows)


class TestSources:
    def test_read_geojson(self, spark, tmp_path):
        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"name": "a", "value": 1},
                    "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                },
                {
                    "type": "Feature",
                    "properties": {"name": "b", "value": 2},
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]],
                    },
                },
            ],
        }
        p = str(tmp_path / "fc.geojson")
        with open(p, "w") as f:
            json.dump(fc, f)
        df = read_geojson(spark, p)
        rows = {r["name"]: r for r in df.collect()}
        assert to_wkt(parse_wkb(rows["a"]["geometry"])) == "POINT (1 2)"
        assert "POLYGON" in to_wkt(parse_wkb(rows["b"]["geometry"]))

    def test_read_csv_wkt(self, spark, tmp_path):
        p = str(tmp_path / "d.csv")
        with open(p, "w") as f:
            f.write("id,geometry,score\n1,POINT (3 4),0.5\n2,\"POLYGON ((0 0, 1 0, 1 1, 0 0))\",0.9\n")
        df = read_csv_wkt(spark, p)
        rows = sorted(df.collect(), key=lambda r: r["id"])
        assert to_wkt(parse_wkb(rows[0]["geometry"])) == "POINT (3 4)"

    def test_with_geometry_from_wkt(self, spark):
        df = spark.createDataFrame([(1, "POINT (9 9)")], "id long, wkt string")
        out = with_geometry_from_wkt(df, "wkt").collect()[0]
        assert to_wkt(parse_wkb(out["geometry"])) == "POINT (9 9)"


class TestPlans:
    def test_zorder_key_locality(self, spark):
        df = spark.createDataFrame(
            [(0.0, 0.0), (0.1, 0.1), (100.0, 80.0)], "x double, y double"
        )
        keys = [
            r["z"] for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
        ]
        # nearby points get closer keys than far ones
        assert abs(keys[0] - keys[1]) < abs(keys[0] - keys[2])

    def test_pushdown_and_broadcast_helpers(self, spark, tmp_path):
        p = str(tmp_path / "t")
        spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(p)
        df = spark.read.parquet(p).filter(F.col("id") > 10)
        assert has_pushed_filter(df, "id")
        small = spark.range(10)
        j = df.join(F.broadcast(small), "id")
        assert broadcast_join_count(j) == 1


class TestWriters:
    """Distributed exports (sources/writers.py): both formats must
    round-trip through the engine's own readers."""

    @pytest.fixture()
    def geo_df(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a", "POINT (1 2)"),
                (2, "b", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
                (3, None, None),
            ],
            "id long, name string, wkt string",
        )
        return with_geometry_from_wkt(df, "wkt").drop("wkt")

    def test_geojson_seq_roundtrip(self, spark, geo_df, tmp_path):
        from xcube_geodb_spark.sources import read_geojson, write_geojson_seq

        p = str(tmp_path / "export_geojsonl")
        write_geojson_seq(geo_df, p)
        back = read_geojson(spark, p, multiline=False)
        got = {
            r.id: (r.name, None if r.geometry is None else to_wkt(parse_wkb(bytes(r.geometry))))
            for r in back.collect()
        }
        assert got[1] == ("a", "POINT (1 2)")
        assert got[2][1].startswith("POLYGON")
        assert got[3] == (None, None)

    def test_geojson_features_are_valid_json_lines(self, spark, geo_df, tmp_path):
        p = str(tmp_path / "export_geojsonl2")
        from xcube_geodb_spark.sources import write_geojson_seq

        write_geojson_seq(geo_df, p)
        lines = [
            json.loads(ln)
            for ln in spark.read.text(p).toPandas()["value"]
        ]
        assert all(f["type"] == "Feature" for f in lines)
        assert {f["properties"]["id"] for f in lines} == {1, 2, 3}

    def test_csv_wkt_roundtrip(self, spark, geo_df, tmp_path):
        from xcube_geodb_spark.sources import read_csv_wkt, write_csv_wkt

        p = str(tmp_path / "export_csv")
        write_csv_wkt(geo_df, p)
        back = read_csv_wkt(spark, p)
        got = {
            r.id: None if r.geometry is None else to_wkt(parse_wkb(bytes(r.geometry)))
            for r in back.collect()
        }
        assert got == {1: "POINT (1 2)", 2: "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", 3: None}


class TestStreamingTiles:
    def test_streaming_tile_counts_matches_batch_twin(self, spark, tmp_path):
        from xcube_geodb_spark.functions.tiles import tile_counts
        from xcube_geodb_spark.streaming import streaming_tile_counts

        rows = [
            (i, f"2024-01-01 10:{i % 60:02d}:00",
             float((i * 7919) % 360 - 180) / 2.0,
             float((i * 104729) % 170 - 85) / 2.0)
            for i in range(40)
        ]
        batch = spark.createDataFrame(
            rows, "event_id long, ts string, lon double, lat double"
        ).withColumn("ts", F.to_timestamp("ts"))
        src = str(tmp_path / "tile_stream_src")
        batch.write.parquet(src)

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, lon double, lat double"
            )
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        out = streaming_tile_counts(stream, zoom=5, window="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("tile_stream_test")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (str(r["window_start"]), r["tile_x"], r["tile_y"]): r["n_events"]
                for r in spark.sql("SELECT * FROM tile_stream_test").collect()
            }
        finally:
            q.stop()

        expected = {
            ("2024-01-01 10:00:00", r["tile_x"], r["tile_y"]): r["n"]
            for r in tile_counts(batch, 5, "lon", "lat").collect()
        }
        assert got == expected
        assert sum(got.values()) == 40


class TestWatermarkSemantics:
    def test_late_rows_beyond_watermark_are_dropped(self, spark, tmp_path):
        """Real late-data behavior, not just plan shape: feed a first
        micro-batch that advances the watermark far past an old window,
        then a second batch with an event older than the watermark. In
        append mode the closed window must emit WITHOUT the late event."""
        import os

        src = str(tmp_path / "late_src")
        os.makedirs(src)
        on_time = spark.createDataFrame(
            [
                (1, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),
                # far-future event pushes the watermark (2h delay) past
                # the 10:00 window's end
                (3, "2024-01-02 00:00:00", 1, "view", 1.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        on_time.coalesce(1).write.parquet(os.path.join(src, "batch1"))

        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
        out = tumbling_window_counts(stream, "1 hour", "2 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("late_test")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            late = spark.createDataFrame(
                [(9, "2024-01-01 10:30:00", 2, "click", 1.0, "{}")],
                "event_id long, ts string, user_id long, event_type string, value double, props string",
            ).withColumn("ts", F.to_timestamp("ts"))
            late.coalesce(1).write.parquet(os.path.join(src, "batch2"))
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT window_start, event_type, n_events FROM late_test"
            ).collect()
        finally:
            q.stop()
        clicks = [
            r for r in rows
            if r["event_type"] == "click"
            and str(r["window_start"]) == "2024-01-01 10:00:00"
        ]
        # the 10:00 click window closed with 2 events; the 10:30 straggler
        # arrived after the watermark passed and must not reopen it
        assert [r["n_events"] for r in clicks] == [2]


class TestStreamingCountMin:
    def test_stream_sketch_equals_batch_sketch_per_window(self, spark, tmp_path):
        from xcube_geodb_spark.functions.sketch import (
            count_min_build,
            count_min_lookup,
        )
        from xcube_geodb_spark.streaming import streaming_count_min

        toks = ["spark", "hash", "merge", "spark", "spark", "window"]
        rows = [
            (i, f"2024-01-01 {10 + (i % 2)}:{(i * 7) % 60:02d}:00",
             toks[i % len(toks)])
            for i in range(60)
        ]
        batch = spark.createDataFrame(
            rows, "event_id long, ts string, token string"
        ).withColumn("ts", F.to_timestamp("ts"))
        src = str(tmp_path / "cm_stream_src")
        batch.write.parquet(src)

        stream = (
            spark.readStream.schema("event_id long, ts timestamp, token string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        out = streaming_count_min(
            stream, "token", window="1 hour", depth=4, width=64
        )
        q = (
            out.writeStream.format("memory")
            .queryName("cm_stream_test")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (str(r["window_start"]), r["row"], r["bucket"]): r["cnt"]
                for r in spark.sql("SELECT * FROM cm_stream_test").collect()
            }
        finally:
            q.stop()

        # per window, the streamed sketch is EXACTLY the batch sketch of
        # that window's rows (deterministic construction, no sampling)
        expected = {}
        for hour in (10, 11):
            win = batch.filter(F.hour("ts") == hour)
            for r in count_min_build(win, "token", depth=4, width=64).collect():
                expected[
                    (f"2024-01-01 {hour}:00:00", r["row"], r["bucket"])
                ] = r["cnt"]
        assert got == expected
        # state bound: never more than depth*width cells per window
        for hour in (10, 11):
            cells = [k for k in got if k[0].startswith(f"2024-01-01 {hour}")]
            assert len(cells) <= 4 * 64

        # the streamed window sketch probes like any batch sketch
        win10 = spark.createDataFrame(
            [(k[1], k[2], v) for k, v in got.items()
             if k[0] == "2024-01-01 10:00:00"],
            "row int, bucket long, cnt long",
        )
        probes = spark.createDataFrame([("spark",), ("absent",)], ["token"])
        est = {
            r["token"]: r["est"]
            for r in count_min_lookup(win10, probes, "token", 4, 64).collect()
        }
        true_spark = batch.filter(
            (F.hour("ts") == 10) & (F.col("token") == "spark")
        ).count()
        assert est["spark"] >= true_spark  # CM never undercounts
        assert est["absent"] == 0
