"""Persisted snapshot-store layout — the 100 TB answer made concrete.

The reference keeps snapshots in Postgres behind composite covering
indexes (schema/indexes.sql). The Spark-native analog is a parquet
store whose LAYOUT does the index's job:

- **Hive-partitioned by ``website_id``** — every per-site read (F1/F2
  compound-key filters, the serve listings, per-site exports) prunes to
  one directory before a single byte is scanned. The reference's data
  is dominated by one site (SURVEY §4), so partition pruning is the
  difference between scanning ~100 TB and scanning one site's slice.
- **Bucketed + sorted by the join key** (``submission_snapshot_id`` for
  child tables, the entity key for merged views) — co-bucketed tables
  join with ZERO exchanges on either side (the Spark analog of the
  reference's covering-index merge join): the scan itself delivers the
  co-partitioning, so the J5 child-attach and the M-family entity
  aggregation never reshuffle the fact tables.

Bucket counts must match on both sides of a co-located join; 32 is the
default here to match local[32], at real scale size buckets so one
bucket ≈ one executor-core task (e.g. 4096 for a 100 TB store).

Reference: scripts/ingest writes via plain INSERT (base.py), the web
layer reads via the indexes — file:line cites in the query modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Child tables join their parent on the snapshot surrogate key; the
# snapshot tables themselves are read per-site and joined per-snapshot.
DEFAULT_BUCKETS = 32


def write_store_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    partition_cols: list[str] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist one store table in the pruning + co-bucketed layout.

    ``partition_cols`` become hive directories (prune-able), and within
    each partition files are bucketed+sorted on ``bucket_cols`` so
    equi-joins and groupBys on that key need no exchange. Bucketing
    requires the table catalog; ``path`` keeps the data external so the
    store survives catalog resets.
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(table)


def write_snapshot_store(
    submission_snapshots: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Snapshot store: partitioned by site, bucketed by snapshot id
    (the key every child table attaches on)."""
    write_store_table(
        submission_snapshots,
        table,
        path,
        bucket_cols=["submission_snapshot_id"],
        partition_cols=["website_id"],
        n_buckets=n_buckets,
    )


def write_child_store(
    child: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Child table (files/keywords/hashes): bucketed on the snapshot
    key it joins through; no site column, so no hive partitions."""
    write_store_table(
        child, table, path, bucket_cols=["submission_snapshot_id"], n_buckets=n_buckets
    )


# The reference seeds its settings table with a single version row
# (schema/faexport_db.sql:116-124); nothing queries it at runtime, but
# migrations key off it. Same contract here.
SCHEMA_VERSION = "0.2.1"


def seed_settings(spark: SparkSession) -> DataFrame:
    """The reference's ``settings`` seed row as a DataFrame, typed with
    the shared SETTINGS schema — persist alongside the dim tables when
    materializing a store."""
    from faexport_db_spark.datamodel.schemas import SETTINGS

    return spark.createDataFrame([("version", SCHEMA_VERSION)], SETTINGS)


def read_site(spark: SparkSession, table: str, website_id: str) -> DataFrame:
    """Per-site slice of a store table. The equality predicate on the
    partition column turns into a PartitionFilter — only the one
    ``website_id=…`` directory is ever listed or scanned."""
    from pyspark.sql import functions as F

    return spark.table(table).filter(F.col("website_id") == website_id)
