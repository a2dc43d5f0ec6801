"""e621 DB-export CSV adapter (reference: scripts/ingest/e621_db_export/main.py).

29 positional columns; one submission snapshot per row with a single
file (md5-sharded static URL), unordered keywords from tag_string, and
a wide extra_data payload. Pure column expressions — the reference's
convert_row loop (main.py:48-97) becomes one select.

Fidelity note: the reference base64-decodes the hex md5 string into the
hash value (main.py:66) — an apparent bug (yields 12 garbage bytes);
we store the md5 as real bytes via unhex, which is the evident intent
(the hash_algos row is 'md5'). Recorded here for the parity audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.functions.scalars import md5_shard_url, parse_bool_literal
from faexport_db_spark.ingest.base import unordered_keywords

E621_COLUMNS = [
    "post_id", "uploader_id", "created_at", "md5", "source", "rating",
    "image_width", "image_height", "tag_string", "locked_tags", "fav_count",
    "file_ext", "parent_id", "change_seq", "approver_id", "file_size",
    "comment_count", "description", "duration", "updated_at", "is_deleted",
    "is_pending", "is_flagged", "score", "up_score", "down_score",
    "is_rating_locked", "is_status_locked", "is_note_locked",
]

E621_CSV_SCHEMA = ", ".join(f"{c} string" for c in E621_COLUMNS)

MD5_ALGO_ID = 1


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — positional CSV scan, header skipped. The reference needed a
    csv.field_size_limit hack for huge fields (main.py:38-44); Spark's
    reader has no such limit and splits by spark.sql.files.maxPartitionBytes."""
    return spark.read.csv(path, schema=E621_CSV_SCHEMA, header=True, multiLine=True, escape='"')


def to_snapshots(
    raw: DataFrame, contributor_id: int, scan_datetime_lit, website_id: str = "e621"
) -> DataFrame:
    """Raw CSV rows → nested submission snapshots (main.py:48-97)."""
    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        md5_shard_url(F.col("md5"), F.col("file_ext"), "https://static1.e621.net/data").alias(
            "file_url"
        ),
        F.col("file_size").try_cast("bigint").alias("file_size"),
        F.to_json(
            F.struct(
                F.col("image_width").try_cast("int").alias("width"),
                F.col("image_height").try_cast("int").alias("height"),
                F.col("file_ext").alias("ext"),
                F.when(F.col("duration") != "", F.col("duration").try_cast("double")).alias(
                    "duration"
                ),
            ),
            {"ignoreNullFields": "false"},
        ).alias("extra_data"),
        F.array(
            F.struct(
                F.lit(MD5_ALGO_ID).cast("bigint").alias("algo_id"),
                F.unhex(F.col("md5")).alias("hash_value"),
            )
        ).alias("hashes"),
    )
    extra = F.to_json(
        F.struct(
            F.transform(F.split("source", "\n"), lambda s: F.trim(s)).alias("sources"),
            F.col("rating").alias("rating"),
            F.split(F.col("locked_tags"), r"\s+").alias("locked_tags"),
            F.col("fav_count").try_cast("int").alias("fav_count"),
            F.col("comment_count").try_cast("int").alias("comment_count"),
            F.col("parent_id").alias("parent_id"),
            F.col("change_seq").alias("change_seq"),
            F.col("approver_id").alias("approver_id"),
            F.when(
                F.col("updated_at") != "",
                F.date_format(F.try_to_timestamp(F.col("updated_at")), "yyyy-MM-dd'T'HH:mm:ssXXX"),
            ).alias("updated_datetime"),
            parse_bool_literal(F.col("is_pending")).alias("is_pending"),
            parse_bool_literal(F.col("is_flagged")).alias("is_flagged"),
            F.col("score").try_cast("int").alias("score"),
            F.col("up_score").try_cast("int").alias("up_score"),
            F.col("down_score").try_cast("int").alias("down_score"),
            parse_bool_literal(F.col("is_rating_locked")).alias("is_rating_locked"),
            parse_bool_literal(F.col("is_status_locked")).alias("is_status_locked"),
            parse_bool_literal(F.col("is_note_locked")).alias("is_note_locked"),
        ),
        {"ignoreNullFields": "false"},
    )
    return raw.select(
        F.lit(website_id).alias("website_id"),
        F.col("post_id").alias("site_submission_id"),
        F.lit(scan_datetime_lit).cast("timestamp").alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("uploader_id").alias("uploader_site_user_id"),
        (F.col("is_deleted") == "t").alias("is_deleted"),
        F.lit(None).cast("string").alias("title"),
        F.col("description").alias("description"),
        F.try_to_timestamp(F.col("created_at")).alias("datetime_posted"),
        extra.alias("extra_data"),
        unordered_keywords(F.split(F.trim(F.col("tag_string")), r"\s+")).alias("keywords"),
        F.array(file_struct).alias("files"),
    )


def validation_rules() -> dict[str, F.Column]:
    """Validation-mode rules (violations), mirroring main.py:99-123."""
    return {
        "created_at_missing": F.col("created_at").isNull() | (F.col("created_at") == ""),
        "created_at_unparseable": F.try_to_timestamp(F.col("created_at")).isNull()
        & F.col("created_at").isNotNull()
        & (F.col("created_at") != ""),
        "md5_too_short": F.col("md5").isNull() | (F.length("md5") <= 4),
        "is_deleted_not_tf": ~F.col("is_deleted").isin("t", "f"),
        "rating_not_eqs": ~F.col("rating").isin("e", "q", "s"),
        "fav_count_negative": F.col("fav_count").try_cast("int") < 0,
        "up_score_negative": F.col("up_score").try_cast("int") < 0,
        "down_score_positive": F.col("down_score").try_cast("int") > 0,
        "width_not_int": F.col("image_width").try_cast("int").isNull(),
        "bool_flags_not_tf": ~F.col("is_pending").isin("t", "f")
        | ~F.col("is_flagged").isin("t", "f")
        | ~F.col("is_rating_locked").isin("t", "f")
        | ~F.col("is_status_locked").isin("t", "f")
        | ~F.col("is_note_locked").isin("t", "f"),
    }


def investigate_domains(raw: DataFrame, top_k: int = 5) -> DataFrame:
    """Investigate mode (A5): top source domains (main.py:144-186)."""
    domains = raw.select(
        F.explode(F.split("source", "\n")).alias("src")
    ).filter(F.col("src") != "").select(
        F.regexp_replace(
            F.parse_url(F.trim(F.col("src")), F.lit("HOST")), r"^www\.", ""
        ).alias("domain")
    ).filter(F.col("domain").isNotNull())
    return (
        domains.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("domain"))
        .limit(top_k)
    )
