"""FindFurryPicBot SQLite adapter (reference:
scripts/ingest/findfurrypicbot/main.py).

``posts(id, a_hash, p_hash, d_hash, w_hash)`` — one snapshot per row,
one file carrying the four perceptual hashes.

S4 note: a SQLite file is inherently a single-host artifact — even at
scale the read itself is one process (the reference's too,
main.py:64-69). The scale-correct pattern is therefore ONE streaming
convert-to-Parquet pass (bounded driver memory: chunked cursor →
incremental row groups), after which every downstream op is a
distributed parquet scan with pruning/pushdown. ``read_sqlite`` does
exactly that; a JDBC path is tried first and used automatically when a
sqlite-jdbc driver class is on the classpath.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AHASH_ALGO_ID = 4
DHASH_ALGO_ID = 3
PHASH_ALGO_ID = 5
WHASH_ALGO_ID = 6

SQLITE_SCHEMA = "id bigint, a_hash binary, p_hash binary, d_hash binary, w_hash binary"


def _default_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("id", pa.int64()),
            ("a_hash", pa.binary()),
            ("p_hash", pa.binary()),
            ("d_hash", pa.binary()),
            ("w_hash", pa.binary()),
        ]
    )


def sqlite_to_parquet(
    db_path: str,
    out_dir: str,
    query: str = "SELECT id, a_hash, p_hash, d_hash, w_hash FROM posts",
    batch_rows: int = 50_000,
    arrow_schema=None,
) -> str:
    """One-time streaming SQLite → Parquet conversion (the S4 scale
    path). The cursor fetches ``batch_rows`` at a time and each chunk
    becomes a parquet row group — driver memory stays bounded by one
    chunk regardless of table size, and the result is a splittable file
    Spark scans partition-parallel.

    The Arrow schema is EXPLICIT, never inferred per chunk: a chunk
    whose column is all-NULL would otherwise pin (or clash with) a
    ``null``-typed writer schema, crashing the conversion mid-table —
    and an empty table would write NullType columns Spark can't use.
    Custom ``query`` column sets must pass ``arrow_schema``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "data.parquet")
    con = sqlite3.connect(db_path)
    writer = None
    try:
        cur = con.execute(query)
        names = [d[0] for d in cur.description]
        if arrow_schema is None:
            default = _default_arrow_schema()
            if names != default.names:
                raise ValueError(
                    f"query columns {names} don't match the default schema "
                    f"{default.names}; pass arrow_schema= explicitly"
                )
            arrow_schema = default
        writer = pq.ParquetWriter(out_path, arrow_schema)
        while True:
            rows = cur.fetchmany(batch_rows)
            if not rows:
                break
            batch = pa.table(
                {n: [r[i] for r in rows] for i, n in enumerate(names)},
                schema=arrow_schema,
            )
            writer.write_table(batch)
    finally:
        if writer is not None:
            writer.close()
        con.close()
    return out_path


def read_sqlite(spark: SparkSession, db_path: str) -> DataFrame:
    """S4 — SQLite table scan (main.py:64-69): JDBC when a driver is on
    the classpath, else the streaming convert-to-parquet path (never a
    full driver materialization)."""
    try:
        return (
            spark.read.format("jdbc")
            .option("url", f"jdbc:sqlite:{db_path}")
            .option("dbtable", "posts")
            .option("driver", "org.sqlite.JDBC")
            .load()
        )
    except Exception:
        out_dir = tempfile.mkdtemp(prefix="sqlite_s4_")
        return spark.read.parquet(sqlite_to_parquet(db_path, out_dir))


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
