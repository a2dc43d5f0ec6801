"""FuzzySearch dump CSV adapter (reference: scripts/ingest/fuzzysearch/main.py).

Dict-style CSV (site, submission_id, artists, hash, posted_at,
updated_at, sha256, deleted, content_url); rows with an empty dhash are
skipped (~5M in the real dump, main.py:133). The int64 dhash packs to
8 big-endian bytes (C15); sha256 arrives base64.

The user-lookup enrichment (user_lookup.py) is external/rate-limited
and deliberately outside the engine (SURVEY §7.4.6): pass a
pre-resolved ``artist_lookup`` DataFrame (artists → site_user_id) and
it joins broadcast (J8); omit it and uploader stays null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.functions.scalars import int64_be_bytes_hex

FUZZYSEARCH_CSV_SCHEMA = (
    "site string, submission_id string, artists string, hash string, "
    "posted_at string, updated_at string, sha256 string, deleted string, "
    "content_url string"
)

DHASH_ALGO_ID = 3
SHA256_ALGO_ID = 2

SITE_IDS = {"furaffinity": "fa", "weasyl": "weasyl", "e621": "e621"}


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 — DictReader-style CSV scan (header names the columns)."""
    return spark.read.csv(path, schema=FUZZYSEARCH_CSV_SCHEMA, header=True)


def to_snapshots(
    raw: DataFrame,
    contributor_id: int,
    artist_lookup: DataFrame | None = None,
) -> DataFrame:
    """Raw rows → nested submission snapshots (main.py:76-129).

    scan_datetime = updated_at when present else the dump-wide earliest
    updated_at (the reference caches that scalar to a file,
    main.py:58-65; here it's one min() aggregation broadcast as a
    scalar subquery via crossJoin of a 1-row frame).
    """
    rows = raw.filter(F.col("hash").isNotNull() & (F.col("hash") != ""))
    earliest = rows.agg(
        F.min(F.try_to_timestamp(F.col("updated_at"))).alias("__earliest")
    )
    rows = rows.crossJoin(F.broadcast(earliest))

    if artist_lookup is not None:
        rows = rows.join(F.broadcast(artist_lookup), "artists", "left")
    else:
        rows = rows.withColumn("site_user_id", F.lit(None).cast("string"))

    dhash_bytes = F.unhex(int64_be_bytes_hex(F.col("hash").try_cast("bigint")))
    hashes = F.filter(
        F.array(
            F.struct(
                F.lit(DHASH_ALGO_ID).cast("bigint").alias("algo_id"),
                dhash_bytes.alias("hash_value"),
            ),
            F.when(
                F.col("sha256").isNotNull() & (F.col("sha256") != ""),
                F.struct(
                    F.lit(SHA256_ALGO_ID).cast("bigint").alias("algo_id"),
                    F.when(F.col("sha256").rlike("^[A-Za-z0-9+/]*=*$"), F.unbase64(F.col("sha256"))).alias("hash_value"),
                ),
            ),
        ),
        lambda h: h.isNotNull(),
    )
    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        F.when(F.col("content_url") != "", F.col("content_url")).alias("file_url"),
        F.lit(None).cast("bigint").alias("file_size"),
        F.lit(None).cast("string").alias("extra_data"),
        hashes.alias("hashes"),
    )
    site_map = F.create_map(
        *[F.lit(x) for kv in SITE_IDS.items() for x in kv]
    )
    return rows.select(
        F.coalesce(site_map.getItem(F.col("site")), F.col("site")).alias("website_id"),
        F.col("submission_id").alias("site_submission_id"),
        F.coalesce(F.try_to_timestamp(F.col("updated_at")), F.col("__earliest")).alias(
            "scan_datetime"
        ),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("site_user_id").alias("uploader_site_user_id"),
        (F.col("deleted") == "true").alias("is_deleted"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.try_to_timestamp(F.col("posted_at")).alias("datetime_posted"),
        F.lit(None).cast("string").alias("extra_data"),
        F.lit(None).cast("array<struct<ordinal:int,keyword:string>>").alias("keywords"),
        F.array(file_struct).alias("files"),
    )


def validation_rules() -> dict[str, F.Column]:
    """Mirrors main.py:131-151 (violations)."""
    allowed_sub_id = r"^[0-9a-zA-Z\-]*$"
    return {
        "site_unknown": ~F.col("site").isin(*SITE_IDS.keys()),
        "submission_id_charset": ~F.col("submission_id").rlike(allowed_sub_id),
        "hash_not_int64": (F.col("hash") != "")
        & F.col("hash").isNotNull()
        & F.col("hash").try_cast("bigint").isNull(),
        "deleted_not_bool": ~F.col("deleted").isin("true", "false"),
        "posted_at_unparseable": (F.col("posted_at") != "")
        & F.try_to_timestamp(F.col("posted_at")).isNull(),
        "sha256_not_base64": (F.col("sha256") != "")
        & F.col("sha256").isNotNull()
        & ~F.col("sha256").rlike("^[A-Za-z0-9+/]*=*$"),
    }
