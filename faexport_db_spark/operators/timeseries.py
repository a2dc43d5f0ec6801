"""Time-series regularization operators: gap-filled resampling with
last-observation-carried-forward.

The reference serves irregular snapshot streams (scan_datetime rows
arrive whenever a crawler ran — website_states / submission snapshots,
faexport_db/models.py); consumers asking "what was the state on day X"
need a regular grid. Spark has no native ``time_bucket`` gap-fill, so
this composes one from ``sequence`` + explode + an ignore-nulls
``last`` window — all JVM expressions, no UDFs.

Scale shape: the grid explode is linear in (entity x days-in-span) and
happens AFTER the per-day aggregate, so the exploded frame is already
reduced; the fill window partitions by entity — uniform for snapshot
streams — and the left join back to observations is an equi-join on
(entity, bucket) that AQE plans. Nothing global; no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_locf(
    observed: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Regularize a per-(key, bucket) frame onto each key's full
    contiguous daily bucket range, carrying the last observed value
    forward into gap buckets.

    ``observed`` must hold ONE row per (key, bucket) — aggregate
    first (the per-day reduce is what keeps the grid explode small).
    ``bucket_col`` must be a date column. Output: one row per (key,
    every day between that key's min and max bucket), each
    ``value_cols`` entry filled LOCF, plus ``observed`` marking real
    rows. Leading gaps cannot exist (the span starts at the first
    observation), so filled values are never null.
    """
    spans = observed.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__d0"), F.max(bucket_col).alias("__d1")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias(bucket_col),
    )
    joined = grid.join(observed, [*key_cols, bucket_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    flag = F.lit(False)
    for vc in value_cols:
        flag = flag | F.col(vc).isNotNull()
    out = out.withColumn("observed", flag)
    for vc in value_cols:
        out = out.withColumn(vc, F.last(vc, ignorenulls=True).over(w))
    return out


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_n",
) -> DataFrame:
    """BATCH sessionization — assign every event a per-key session
    ordinal, where a new session starts when the gap from the key's
    previous event exceeds ``gap_minutes`` (the batch twin of the
    streaming session windows in streaming/stateful.py, for backfill
    and reprocessing runs where Structured Streaming state is the
    wrong tool).

    Classic lag + cumulative-sum-of-boundaries: both windows share ONE
    partitioning (the key), so the whole operator is a single exchange
    + one sorted pass per key — no self-join, no driver loop. Equal
    timestamps within a key are order-stable by construction: a tied
    row's gap to its predecessor is 0 (never a boundary), so every
    ordering of the tie yields the same session assignment. At 100 TB
    the partition is per entity (uniform for event streams); one
    dominant key degrades to a single task's sort — the same hazard
    class as asof_join, and the same salting remedy applies if a key
    ever dominates."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    boundary = F.when(
        prev.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        session_col,
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def ohlc_bars(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    unit: str = "week",
) -> DataFrame:
    """Candlestick resampling: per (key, time-bucket) open / high /
    low / close of an irregular value stream — the standard
    downsample-for-dashboards shape (and the financial-bars classic).
    Open/close are SELECTED values, not computed ones: min_by/max_by
    over the (ts, id) struct picks the first/last observation with a
    total deterministic order (``tiebreak_col`` breaks equal
    timestamps), so no float arithmetic is introduced anywhere and
    the bars replay exactly in any engine.

    One map-side-combining groupBy on (key, bucket) — min/max/min_by/
    max_by all have partial aggregates, so each executor contributes
    one row per open bar regardless of row count. No window, no sort:
    at 100 TB a windowed first/last would sort every key's history;
    the struct-argmin aggregate is the shuffle-light form.

    Output: (key, bar, open, high, low, close, n) — bar is the
    truncated timestamp.
    """
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        events.groupBy(
            F.col(key_col),
            F.date_trunc(unit, F.col(ts_col)).alias("bar"),
        )
        .agg(
            F.min_by(F.col(value_col), order).alias("open"),
            F.max(F.col(value_col)).alias("high"),
            F.min(F.col(value_col)).alias("low"),
            F.max_by(F.col(value_col), order).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
