"""foxo.blue user-list CSV adapter (reference:
scripts/ingest/foxoblue_userlist/main.py).

User snapshots only: (username, updated_at, error) with literal "NULL"
strings; ``error == 'unknown_user'`` rows are skipped; any other error
marks the account deleted with the error kept as deletion_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FOXOBLUE_CSV_SCHEMA = "username string, updated_at string, error string"


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, schema=FOXOBLUE_CSV_SCHEMA, header=True)


def to_user_snapshots(
    raw: DataFrame, contributor_id: int, website_id: str = "fa"
) -> DataFrame:
    """Raw rows → user snapshots (main.py:54-76)."""
    rows = raw.filter(F.col("error") != "unknown_user")
    earliest = rows.filter(F.col("updated_at") != "NULL").agg(
        F.min(F.try_to_timestamp(F.col("updated_at"))).alias("__earliest")
    )
    rows = rows.crossJoin(F.broadcast(earliest))
    is_deleted = F.col("error") != "NULL"
    return rows.select(
        F.lit(website_id).alias("website_id"),
        F.col("username").alias("site_user_id"),
        F.when(
            F.col("updated_at") != "NULL", F.try_to_timestamp(F.col("updated_at"))
        ).otherwise(F.col("__earliest")).alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        is_deleted.alias("is_deleted"),
        F.lit(None).cast("string").alias("display_name"),
        F.when(
            is_deleted,
            F.to_json(F.struct(F.col("error").alias("deletion_type"))),
        ).alias("extra_data"),
    )
