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


def stream_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    gap_minutes: int = 60,
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream interval join: every 'view'-side event paired
    with each same-user 'click'-side event in the preceding
    ``gap_minutes`` (c_ts ≤ v_ts ≤ c_ts + gap). The one §2.10 shape
    the rest of the streaming family doesn't cover — both inputs are
    unbounded, so the join buffers BOTH sides in state.

    Scale contract: the time-range predicate plus watermarks on BOTH
    sides is what bounds that state — Spark evicts a buffered row
    once the opposite watermark passes its join-window end, so state
    is O(rate × (gap + watermark delay)) per side, independent of
    stream length. Without the range bound (or with ``watermark=None``
    outside batch mode) state grows with the stream — which is why the
    gap is part of the operator, not the caller's filter. The same
    expression tree runs in batch (``st_stream_join`` in the registry)
    where the watermark is simply omitted.

    Output: one row per qualifying (view, click) pair, keyed by both
    event ids.
    """
    v = views.select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    c = clicks.select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    if watermark is not None:
        v = v.withWatermark("v_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("v_ts"))
        & (F.col("v_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES"))
    )
    return v.join(c, cond, "inner").select(
        "v_event_id", "c_event_id", "user_id",
        "v_ts", "c_ts", "v_value", "c_value",
    )
