"""Streaming-shape operators demonstrated in batch mode (SURVEY.md §2.10).

The streaming module (faexport_db_spark/streaming/) runs these same
expression trees under Structured Streaming; the registry entries apply
them to the batch ``events`` table so the driver's DuckDB oracle can
check the aggregation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register
from faexport_db_spark.streaming.events_stream import windowed_event_counts


@register(
    "st_event_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type, batch form of the
    watermarked streaming aggregation (streaming/events_stream.py)."""
    return windowed_event_counts(
        load_table(spark, sf_dir, "events"), window="1 hour", watermark=None
    )


@register(
    "st_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) — Spark's
    ``session_window`` in batch mode; under streaming the same
    expression runs with a watermark and merging session state. The
    oracle derives identical sessions via gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


@register(
    "st_first_seen",
    oracle="""
    SELECT user_id, min(ts) AS first_ts, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def st_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the cross-batch first-seen stateful operator
    (streaming/stateful.py: applyInPandasWithState emits each key once,
    on first arrival, with an idle-timeout-evicted state row). In batch
    the same contract is a plain min-per-key aggregation — which is the
    oracle the streaming tests also reconcile against."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "st_asof_enrich",
    oracle="""
    WITH l AS (
      SELECT user_id AS key, ts, value FROM events WHERE event_type = 'view'
    ),
    r AS (
      SELECT user_id AS key, ts, arg_max(value, event_id) AS ref_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT l.key, l.ts, l.value, r.ts AS asof_ts, r.ref_value
    FROM l ASOF LEFT JOIN r ON l.key = r.key AND l.ts >= r.ts
    """,
)
def st_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming as-of enrichment (streaming/
    stateful.py::asof_enrich — applyInPandasWithState carrying one
    (ts, value) reference pair per key): every 'view' event enriched
    with the latest at-or-before 'click' value. In batch the contract
    is exactly operators/asof.py::asof_join, which the streaming test
    reconciles against the stateful operator batch-for-batch; the
    DuckDB ASOF JOIN is the independent oracle for both."""
    from pyspark.sql import functions as F

    from faexport_db_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("key"), "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("key"), "ts")
        .agg(F.max_by("value", "event_id").alias("ref_value"))
    )
    return asof_join(views, clicks, on="key")


@register(
    "st_stream_join",
    oracle="""
    SELECT v.event_id AS v_event_id, c.event_id AS c_event_id,
           v.user_id, v.ts AS v_ts, c.ts AS c_ts,
           v.value AS v_value, c.value AS c_value
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts <= v.ts AND v.ts <= c.ts + INTERVAL 60 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def st_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join
    (streaming/events_stream.py::stream_interval_join): views paired
    with same-user clicks in the preceding hour. Under streaming both
    sides buffer in watermark-bounded state; in batch the identical
    expression tree is a plain range join the oracle reproduces."""
    from faexport_db_spark.streaming.events_stream import stream_interval_join

    ev = load_table(spark, sf_dir, "events")
    return stream_interval_join(
        ev.filter(ev.event_type == "view"),
        ev.filter(ev.event_type == "click"),
        gap_minutes=60,
        watermark=None,
    )
