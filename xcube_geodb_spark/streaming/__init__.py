"""Structured Streaming operators (engine superset — SURVEY.md §2.11).

The reference has no streaming surface; these are the extensions the
TESTDATA ``events`` table is shaped for: windowed aggregations with
watermarks, sessionization, and streaming ingest into warehouse
collections. Each has a batch twin in :mod:`xcube_geodb_spark.suite.core`
(same SQL semantics) so correctness is oracle-checkable; the streaming
variants are tested with the rate/file sources in tests/test_streaming.py.
"""

from xcube_geodb_spark.streaming.windows import (
    sliding_window_counts,
    session_window_agg,
    streaming_events_source,
    stream_attribution_join,
    streaming_count_min,
    streaming_tile_counts,
    tumbling_window_counts,
)
from xcube_geodb_spark.streaming.stateful import (
    dedup_events_stream,
    running_user_totals,
)
from xcube_geodb_spark.streaming.sink import (
    collection_batch_writer,
    dedup_batch_writer,
    write_stream_dedup_to_collection,
    write_stream_to_collection,
    bm25_index_batch_writer,
    write_stream_to_bm25_index,
)
from xcube_geodb_spark.streaming.cdc import (
    GeoDBVersionsDataSource,
    register_cdc_source,
    stream_collection_changes,
)

__all__ = [
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_agg",
    "streaming_events_source",
    "streaming_count_min",
    "streaming_tile_counts",
    "stream_attribution_join",
    "dedup_events_stream",
    "running_user_totals",
    "collection_batch_writer",
    "dedup_batch_writer",
    "write_stream_dedup_to_collection",
    "write_stream_to_collection",
    "bm25_index_batch_writer",
    "write_stream_to_bm25_index",
    "GeoDBVersionsDataSource",
    "register_cdc_source",
    "stream_collection_changes",
]
