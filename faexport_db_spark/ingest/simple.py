"""Simple push-ingest formats — the reference's ``submission`` and
``user`` API formats (ingest_formats/base.py:33-48), which accept
snapshot-shaped JSON directly (SubmissionSnapshot.from_web_json,
models/submission.py:282-306; UserSnapshot.from_web_json,
models/user.py:162-171).

Keyword precedence mirrors the reference's last-assignment-wins walk
over ``keywords`` → ``ordered_keywords`` → ``unordered_keywords``
(models/submission.py:283-289). Top-level ``extra_data`` keeps full
JSON fidelity via ``get_json_object`` (raw JSON text extraction);
per-file ``extra_data`` is typed ``map<string,string>`` — the push
formats only ever carry flat per-file extras (models/file.py:41-48
adapters populate width/height/ext style keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faexport_db_spark.ingest.base import ordered_keywords, unordered_keywords

SIMPLE_SUBMISSION_SCHEMA = (
    "struct<website_id:string, site_submission_id:string, scan_datetime:string, "
    "uploader_site_user_id:string, is_deleted:boolean, title:string, "
    "description:string, datetime_posted:string, "
    "keywords:array<struct<keyword:string,ordinal:int>>, "
    "ordered_keywords:array<string>, unordered_keywords:array<string>, "
    "files:array<struct<site_file_id:string,file_url:string,file_size:bigint,"
    "extra_data:map<string,string>,"
    "file_hashes:array<struct<algo_id:bigint,hash_value:string>>>>>"
)

SIMPLE_USER_SCHEMA = (
    "struct<website_id:string, site_user_id:string, scan_datetime:string, "
    "is_deleted:boolean, display_name:string>"
)

KW_TYPE = "array<struct<ordinal:int,keyword:string>>"


def submission_snapshots(
    payloads: DataFrame, contributor_id: int, payload_col: str = "payload", scan_time=None
) -> DataFrame:
    """``POST /api/ingest/submission`` payloads → nested snapshot frame
    (same shape ``explode_to_store`` consumes)."""
    p = F.from_json(F.col(payload_col), SIMPLE_SUBMISSION_SCHEMA).alias("p")
    rows = payloads.select(p, F.col(payload_col))
    default_scan = (
        F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    )
    kw_explicit = F.transform(
        F.col("p.keywords"),
        lambda k: F.struct(k["ordinal"].alias("ordinal"), k["keyword"].alias("keyword")),
    )
    keywords = F.coalesce(
        unordered_keywords(F.col("p.unordered_keywords")),
        ordered_keywords(F.col("p.ordered_keywords")),
        kw_explicit,
    ).cast(KW_TYPE)
    files = F.transform(
        F.col("p.files"),
        lambda f: F.struct(
            f["site_file_id"].alias("site_file_id"),
            f["file_url"].alias("file_url"),
            f["file_size"].alias("file_size"),
            F.when(f["extra_data"].isNotNull(), F.to_json(f["extra_data"])).alias(
                "extra_data"
            ),
            F.transform(
                f["file_hashes"],
                lambda h: F.struct(
                    h["algo_id"].alias("algo_id"),
                    F.unbase64(h["hash_value"]).alias("hash_value"),
                ),
            ).alias("hashes"),
        ),
    )
    return rows.select(
        F.col("p.website_id").alias("website_id"),
        F.col("p.site_submission_id").alias("site_submission_id"),
        F.coalesce(F.to_timestamp("p.scan_datetime"), default_scan).alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("p.uploader_site_user_id").alias("uploader_site_user_id"),
        F.coalesce(F.col("p.is_deleted"), F.lit(False)).alias("is_deleted"),
        F.col("p.title").alias("title"),
        F.col("p.description").alias("description"),
        F.to_timestamp("p.datetime_posted").alias("datetime_posted"),
        F.get_json_object(payload_col, "$.extra_data").alias("extra_data"),
        keywords.alias("keywords"),
        files.alias("files"),
    )


def user_snapshots(
    payloads: DataFrame, contributor_id: int, payload_col: str = "payload", scan_time=None
) -> DataFrame:
    """``POST /api/ingest/user`` payloads → user-snapshot rows (without
    surrogate ids — the caller mints them)."""
    p = F.from_json(F.col(payload_col), SIMPLE_USER_SCHEMA).alias("p")
    rows = payloads.select(p, F.col(payload_col))
    default_scan = (
        F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    )
    return rows.select(
        F.col("p.website_id").alias("website_id"),
        F.col("p.site_user_id").alias("site_user_id"),
        F.coalesce(F.to_timestamp("p.scan_datetime"), default_scan).alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.coalesce(F.col("p.is_deleted"), F.lit(False)).alias("is_deleted"),
        F.col("p.display_name").alias("display_name"),
        F.get_json_object(payload_col, "$.extra_data").alias("extra_data"),
    )
