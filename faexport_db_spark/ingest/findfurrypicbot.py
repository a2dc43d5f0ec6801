"""FindFurryPicBot SQLite adapter (reference:
scripts/ingest/findfurrypicbot/main.py).

``posts(id, a_hash, p_hash, d_hash, w_hash)`` — one snapshot per row,
one file carrying the four perceptual hashes.

S4 note: no SQLite JDBC jar ships in this environment, so
``read_sqlite`` loads via the stdlib driver on the Spark driver and
parallelizes with createDataFrame — appropriate for the dim-table
scale this source has in the reference (and the pattern at real scale
is a one-time convert-to-Parquet, SURVEY §2.1 S4). A JDBC path is used
automatically if the driver class is present.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AHASH_ALGO_ID = 4
DHASH_ALGO_ID = 3
PHASH_ALGO_ID = 5
WHASH_ALGO_ID = 6

SQLITE_SCHEMA = "id bigint, a_hash binary, p_hash binary, d_hash binary, w_hash binary"


def read_sqlite(spark: SparkSession, db_path: str) -> DataFrame:
    """S4 — SQLite table scan (main.py:64-69)."""
    try:
        return (
            spark.read.format("jdbc")
            .option("url", f"jdbc:sqlite:{db_path}")
            .option("dbtable", "posts")
            .option("driver", "org.sqlite.JDBC")
            .load()
        )
    except Exception:
        con = sqlite3.connect(db_path)
        try:
            rows = con.execute(
                "SELECT id, a_hash, p_hash, d_hash, w_hash FROM posts"
            ).fetchall()
        finally:
            con.close()
        return spark.createDataFrame(
            [(r[0], bytes(r[1]), bytes(r[2]), bytes(r[3]), bytes(r[4])) for r in rows],
            SQLITE_SCHEMA,
        )


def to_snapshots(
    raw: DataFrame, contributor_id: int, scan_datetime_lit, website_id: str = "fa"
) -> DataFrame:
    """Rows → nested snapshots (main.py:43-62)."""
    def hash_struct(algo_id: int, col: str):
        return F.struct(
            F.lit(algo_id).cast("bigint").alias("algo_id"),
            F.col(col).alias("hash_value"),
        )

    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        F.lit(None).cast("string").alias("file_url"),
        F.lit(None).cast("bigint").alias("file_size"),
        F.lit(None).cast("string").alias("extra_data"),
        F.array(
            hash_struct(AHASH_ALGO_ID, "a_hash"),
            hash_struct(DHASH_ALGO_ID, "d_hash"),
            hash_struct(PHASH_ALGO_ID, "p_hash"),
            hash_struct(WHASH_ALGO_ID, "w_hash"),
        ).alias("hashes"),
    )
    return raw.select(
        F.lit(website_id).alias("website_id"),
        F.col("id").cast("string").alias("site_submission_id"),
        F.lit(scan_datetime_lit).cast("timestamp").alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.lit(None).cast("string").alias("uploader_site_user_id"),
        F.lit(False).alias("is_deleted"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("timestamp").alias("datetime_posted"),
        F.lit(None).cast("string").alias("extra_data"),
        F.lit(None).cast("array<struct<ordinal:int,keyword:string>>").alias("keywords"),
        F.array(file_struct).alias("files"),
    )
