"""Watermarked windowed aggregation over the events stream.

The reference never needed event-time windows (its merge is
order-insensitive, SURVEY §2.10); this is the engine-extension shape
for the driver's ``events`` table: tumbling-window counts/sums per
event_type with bounded state under a watermark. The identical
expression tree runs in batch mode — ``st_event_window_counts`` in the
query inventory is this function applied to the batch events table,
oracle-checked against DuckDB's ``time_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window agg: (window_start, event_type) → count, sum(value).

    With ``watermark`` set and a streaming input, state for windows
    older than the watermark is dropped (late rows beyond it are
    discarded — the explicit lateness contract the reference's
    append-anytime model never had to state). Pass ``watermark=None``
    for batch use.
    """
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
