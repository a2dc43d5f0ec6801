"""Small-file compaction for append-heavy store paths.

Every streaming micro-batch append (ingest_stream, dedup_stream) and
every incremental index append writes at least one parquet file per
partition — after a day of 60-second triggers that is ~1,440 files per
partition, and at 100 TB the NameNode/object-store listing cost plus
per-file open overhead dominates scan time long before data size does.
Compaction is the standing maintenance job that rewrites a path's many
small files into few target-sized ones, preserving the hive partition
layout. (Table formats with built-in OPTIMIZE — Delta, Iceberg — make
this a metadata operation; on plain parquet it is an explicit rewrite,
same as the reference's cron-style maintenance jobs.)

The rewrite goes through a temp directory + atomic-ish rename swap so a
crash mid-compaction never leaves the live path half-written: readers
see the old files until the swap, and a crashed run leaves only a
``_compact_tmp`` directory to garbage-collect.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Inspect a parquet path: file count, total bytes, and the file
    count a compaction would produce. Pure metadata (no data read)."""
    total = 0
    n_files = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    target_files = max(1, -(-total // target_bytes))  # ceil
    return {
        "n_files": n_files,
        "total_bytes": total,
        "target_files": target_files,
        "worthwhile": n_files > 2 * target_files,
    }


def compact_path(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite ``path``'s parquet files into ~``target_bytes`` files,
    keeping the hive partition columns in ``partition_by`` (pass the
    same columns the writers used, e.g. ``["band_idx"]`` for the
    MinHash index, ``["website_id"]`` for store tables).

    Unpartitioned paths shrink with ``coalesce`` (no shuffle at all);
    partitioned layouts need one shuffle on the partition columns so
    each output partition directory gets few, full files. Returns the
    plan stats plus the file count actually written.
    """
    stats = plan_compaction(spark, path, target_bytes)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "_compact_tmp"
    if partition_by:
        writer = (
            df.repartition(stats["target_files"], *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    else:
        writer = df.coalesce(stats["target_files"]).write.mode("overwrite")
    writer.parquet(tmp)
    old = path.rstrip("/") + "_compact_old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    after = plan_compaction(spark, path, target_bytes)
    return {**stats, "files_after": after["n_files"]}
