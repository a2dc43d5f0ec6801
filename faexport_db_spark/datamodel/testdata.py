"""Loaders for the driver's synthetic fixture tables (TESTDATA.md).

One Parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}``.
All engine queries load through here so partition-level knobs live in
one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# reference's data model implies (websites/contributors/hash_algos are
# tens of rows; region/nation are 5/25 rows at every TPC-H SF).
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# events.ts is written as parquet TIMESTAMP(NANOS), which Spark refuses
# to read natively (PARQUET_TYPE_ILLEGAL). We read nanos as int64 and
# truncate to microseconds with exact integer division — matching what
# DuckDB does when it reads the same file (its TIMESTAMP is µs).
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    # Pin UTC on whatever session the driver handed us: the reference is
    # tz-aware UTC throughout and the DuckDB oracle is tz-naive, so a
    # non-UTC session would shift every collected timestamp.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Fixture timestamps are untagged parquet timestamp[us]; read them
    # as session-TZ TIMESTAMP (UTC instants), not TIMESTAMP_NTZ, so
    # event-time watermarks typecheck and DuckDB (naive µs) agrees on
    # the collected wall-clock values.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    nano_cols = NANO_TS_COLUMNS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in nano_cols:
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
