"""Streaming window operators over an events stream.

Design notes for scale:

- watermarks bound state: every windowed aggregate takes an explicit
  ``watermark`` delay so late data is handled deterministically and state
  is evicted (without it, a 100 TB stream accumulates unbounded state);
- the aggregations are standard hash-aggregates over window structs —
  Spark's incremental execution maintains partial aggregates per window in
  the state store, keyed by (window, group keys): the same shuffle keying
  as the batch twin, so skew characteristics match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_events_source(
    spark: SparkSession,
    events_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
) -> DataFrame:
    """File-source stream over a directory of events parquet/json files."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )


def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window, event_type) counts + value sums; late rows beyond the
    watermark are dropped deterministically."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based), the streaming twin of the
    batch lag/cumsum sessionization in suite/core.py."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_tile_counts(
    events: DataFrame,
    zoom: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Windowed web-mercator tile counts over a geo-event stream: the
    live-map heatmap query. Tile keys (functions/tiles) are pure column
    math, so the streaming plan is exactly a windowed hash aggregate —
    state keyed by (window, tile), bounded by the watermark, incremental
    partials per micro-batch. The batch twin is
    ``tile_counts(df.filter(ts window))`` with identical semantics."""
    from xcube_geodb_spark.functions.tiles import with_tile

    tiled = with_tile(events, zoom, lon_col, lat_col)
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window),
            F.col("tile_z"),
            F.col("tile_x"),
            F.col("tile_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "tile_z",
            "tile_x",
            "tile_y",
            "n_events",
        )
    )


def stream_attribution_join(
    clicks: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    max_lag: str = "30 minutes",
    click_watermark: str = "1 hour",
    conversion_watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream attribution join (functions/temporal.attribution_join
    on two live streams): every conversion paired with the same-key clicks
    it trails by at most ``max_lag``.

    Spark's stream-stream inner join requires exactly what the batch
    builder already provides — watermarks on both inputs plus a time-range
    join condition — and uses them to bound join state: a buffered click
    is dropped once the conversion watermark passes ``click_ts +
    max_lag``, so state is O(events within the lag window), not O(stream).
    The conversion watermark should exceed the click watermark by at least
    ``max_lag`` for no-loss semantics."""
    from xcube_geodb_spark.functions.temporal import attribution_join

    return attribution_join(
        clicks.withWatermark(ts_col, click_watermark),
        conversions.withWatermark(ts_col, conversion_watermark),
        key=key,
        max_lag=max_lag,
    )


def streaming_count_min(
    stream: DataFrame,
    item_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Windowed count-min sketch over a stream: per time window, the d x w
    counter matrix tracking item frequencies (trending-token / heavy-hitter
    monitoring with BOUNDED state — at most ``depth * width`` counters per
    open window no matter the stream rate, vs unbounded per-item state for
    an exact windowed count).

    Same deterministic md5 construction as the batch
    :func:`~xcube_geodb_spark.functions.sketch.count_min_build`, so
    estimates replay engine-independently and a window's sketch from the
    stream equals the batch sketch of that window's rows (asserted in
    tests); :func:`~xcube_geodb_spark.functions.sketch.count_min_lookup`
    probes each window's rows unchanged. The streaming plan is one
    windowed hash aggregate: incremental map-side partials per
    micro-batch, state keyed by (window, row, bucket), expired by the
    watermark.
    """
    from xcube_geodb_spark.functions.sketch import _bucket

    item = F.col(item_col)
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(item, r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), coords.alias("rb"))
        .groupBy(
            F.window(F.col(ts_col), window),
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "row",
            "bucket",
            "cnt",
        )
    )
