"""FA-indexer JSON-directory adapter (reference:
scripts/ingest/fa_indexer/main.py).

Each file under the dump dir is a JSON object mapping submission id →
submission dict (or null for missing ids); the reference fans rows out
over 10 worker processes with a response-queue barrier per file
(main.py:116-144) — in Spark that entire apparatus is partition
parallelism of one read + explode.

NUL-scrub fidelity: descriptions are cleaned of NUL characters
(main.py:76-83, C7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.functions.scalars import strip_nul
from faexport_db_spark.ingest.base import ordered_keywords

SUBMISSION_VALUE_SCHEMA = (
    "map<string, struct<id:bigint, username:string, title:string, "
    "description:string, date:string, rating:string, keywords:array<string>, "
    "filename:string>>"
)


def read_json_dir(spark: SparkSession, path: str) -> DataFrame:
    """S3 — recursive JSON-directory scan. Files are one JSON object
    each (id → submission|null), so read wholetext and parse the map
    explicitly — schema inference over variable keys would produce an
    unbounded struct."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("wholetext", "true")
        .text(path)
        .select(F.from_json("value", SUBMISSION_VALUE_SCHEMA).alias("m"))
        .select(F.explode("m").alias("sid", "sub"))
        .filter(F.col("sub").isNotNull())  # null submissions skipped (main.py:132-133)
    )


def to_snapshots(
    parsed: DataFrame, contributor_id: int, scan_datetime_lit, website_id: str = "fa"
) -> DataFrame:
    """Parsed rows → nested submission snapshots (main.py:71-113)."""
    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        F.col("sub.filename").alias("file_url"),
        F.lit(None).cast("bigint").alias("file_size"),
        F.lit(None).cast("string").alias("extra_data"),
        F.lit([]).cast("array<struct<algo_id:bigint,hash_value:binary>>").alias("hashes"),
    )
    return parsed.select(
        F.lit(website_id).alias("website_id"),
        F.col("sub.id").cast("string").alias("site_submission_id"),
        F.lit(scan_datetime_lit).cast("timestamp").alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("sub.username").alias("uploader_site_user_id"),
        F.lit(False).alias("is_deleted"),
        F.col("sub.title").alias("title"),
        strip_nul(F.col("sub.description")).alias("description"),
        F.try_to_timestamp(F.col("sub.date")).alias("datetime_posted"),
        F.to_json(F.struct(F.col("sub.rating").alias("rating"))).alias("extra_data"),
        ordered_keywords(F.col("sub.keywords")).alias("keywords"),
        F.array(file_struct).alias("files"),
    )


def uploader_user_snapshots(
    parsed: DataFrame, contributor_id: int, scan_datetime_lit, website_id: str = "fa"
) -> DataFrame:
    """The reference emits one user snapshot per first-seen username
    (seen_usernames set, main.py:85-93) — distributed form: distinct
    (A7/dropDuplicates) instead of driver-side state."""
    return (
        parsed.select(F.col("sub.username").alias("site_user_id"))
        .filter(F.col("site_user_id").isNotNull())
        .dropDuplicates()
        .select(
            F.lit(website_id).alias("website_id"),
            "site_user_id",
            F.lit(scan_datetime_lit).cast("timestamp").alias("scan_datetime"),
            F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
            F.current_timestamp().alias("ingest_datetime"),
            F.lit(False).alias("is_deleted"),
            F.lit(None).cast("string").alias("display_name"),
            F.lit(None).cast("string").alias("extra_data"),
        )
    )
