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
           ROUND(SUM(value), 2) AS sum_value
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
