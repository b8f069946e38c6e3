"""Custom stateful streaming operators.

- :func:`dedup_events_stream` — exactly-once event-id dedup inside the
  watermark horizon (state bounded by the watermark; the streaming twin of
  batch exact dedup).
- :func:`running_user_totals` — an ``applyInPandasWithState`` operator
  keeping a per-user running aggregate across micro-batches: the template
  for arbitrary custom state machines (the reference has no streaming
  surface at all — SURVEY.md §2.11 marks these as engine supersets).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_events_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate events by key within the watermark horizon.
    State size is bounded: keys older than the watermark are evicted."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def running_user_totals(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit state —
    emits one updated row per user per micro-batch."""

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
