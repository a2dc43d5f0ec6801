"""Incremental maintenance of the merged current-entity view.

The reference recomputes the merged entity on every read
(models/user.py:8-48) — correct but O(history) per request. The
streaming restatement keeps a materialized merged view fresh without
full recomputes: each micro-batch of new snapshots identifies the
TOUCHED entity keys, re-merges only those entities from the full
snapshot store, and rewrites only the partitions they live in
(dynamic partition overwrite). Untouched entities are never read.

Correctness leans on the merge being order-insensitive w.r.t. ingest
order (README.md:11, SURVEY §2.10): a late-arriving old snapshot just
lands in its entity's history and the next touch recomputes the same
answer a batch rebuild would give — no watermark needed for the view
to converge; a periodic full rebuild stays as the audit backstop.

Scale notes: per batch the work is (touched keys ⋉ snapshot store)
— a broadcast semi-join when batches are small — plus one merge agg
over just those entities' snapshots. The merged view is partitioned by
``website_id``; with dynamic partition overwrite only partitions
containing touched entities rewrite. On a real deployment the
partition key would be (website_id, bucket(site_user_id)) so one hot
site doesn't rewrite wholesale; Delta/Iceberg MERGE INTO replaces the
overwrite entirely.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.operators.merge import merged_users

ENTITY_KEY = ["website_id", "site_user_id"]


def refresh_touched_users(
    spark: SparkSession,
    snapshot_store_dir: str,
    merged_view_dir: str,
    touched_keys: DataFrame,
) -> None:
    """Re-merge the entities in ``touched_keys`` and upsert them into
    the merged-view parquet via dynamic partition overwrite."""
    store = spark.read.parquet(snapshot_store_dir)
    touched_snaps = store.join(F.broadcast(touched_keys.distinct()), ENTITY_KEY, "left_semi")
    recomputed = merged_users(touched_snaps)

    touched_sites = [r[0] for r in touched_keys.select("website_id").distinct().collect()]
    try:
        existing = spark.read.parquet(merged_view_dir)
        # Keep rows from touched partitions whose entity was NOT touched:
        # the partition rewrite must carry them through.
        keep = existing.filter(F.col("website_id").isin(touched_sites)).join(
            F.broadcast(touched_keys.distinct()), ENTITY_KEY, "left_anti"
        )
        # Break lineage before overwriting the path we just read
        # ("Cannot overwrite a path that is also being read from");
        # Delta/Iceberg MERGE would make this a metadata-only concern.
        out = keep.unionByName(recomputed).localCheckpoint(eager=True)
    except AnalysisException as exc:
        # ONLY the no-committed-data cases mean "first batch": missing
        # view, or a directory a crashed first write left with zero
        # parquet footers (UNABLE_TO_INFER_SCHEMA) — without the latter
        # a batch-1 crash wedges the stream in a permanent retry loop.
        # Any other failure (transient IO, corrupt footer, permissions)
        # must propagate so the micro-batch retries — swallowing it
        # here would rewrite the touched partitions with just the
        # recomputed entities and silently drop every untouched entity
        # in them.
        if exc.getCondition() not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        out = recomputed

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy("website_id").parquet(merged_view_dir)


def start_incremental_merged_users(
    spark: SparkSession,
    snapshot_stream: DataFrame,
    snapshot_store_dir: str,
    merged_view_dir: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Maintain the merged-user view from a stream of user snapshots.

    ``snapshot_stream`` is a streaming DataFrame of user-snapshot rows
    (e.g. the parquet store written by ``ingest_stream`` read back with
    ``spark.readStream``). Each batch appends the new snapshots to the
    store, then refreshes exactly the touched entities.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        batch.write.mode("append").partitionBy("website_id").parquet(snapshot_store_dir)
        refresh_touched_users(
            batch.sparkSession,
            snapshot_store_dir,
            merged_view_dir,
            batch.select(*ENTITY_KEY),
        )

    writer = snapshot_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    writer = writer.trigger(**(trigger or {"processingTime": "60 seconds"}))
    return writer.start()
