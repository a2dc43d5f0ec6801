"""Streaming sketch maintenance: a HyperLogLog register store kept up
to date per micro-batch — continuous approximate distinct-counting
over an unbounded stream with CONSTANT state.

The enabling algebra is that register merge (elementwise MAX per
bucket) is idempotent AND commutative, so the store needs none of the
dedup streams' commit-marker protocol: each batch writes ITS OWN
register table under an idempotent per-batch partition directory
(the line-dedup count-partition pattern — a re-delivered batch
overwrites the same directory with identical rows), and the read path
merges all partitions with one bounded groupBy. A crash anywhere
leaves either the old partition content or the new identical content;
double-merging changes nothing.

Scale: each partition is ≤ 2^p rows (p=8 → ≤256); merge-on-read costs
n_batches × 2^p rows — compact with ``maintenance.compaction`` when
the partition count grows, or periodically replace the store with its
own merge (also idempotent). The sketch answers "distinct users/URLs
ever seen" on a stream where an exact seen-set would grow without
bound — the classic stream-analytics trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.training.pipeline import hll_register_table


def hll_batch_into_store(
    batch: DataFrame,
    store_path: str,
    col: str,
    p: int = 8,
    batch_id: int | None = None,
    stream_id: str | None = None,
) -> None:
    """Fold one micro-batch into the register store: compute the
    batch's own register table (one bounded map-side-combining
    groupBy) and publish it under a per-batch partition directory.

    The publish is write-to-hidden-dir then rename: Spark's parquet
    reader skips dot-prefixed paths, so a concurrent
    ``read_hll_store`` never observes partial files mid-write — at
    worst it misses a not-yet-renamed partition (a transient
    undercount that the monotone MAX-merge repairs on the next read).
    Re-delivery of a crashed batch rewrites the identical rows, so a
    crash at any point (partial hidden dir, missing final dir) is
    repaired by idempotence — see the module docstring."""
    from faexport_db_spark.operators.hadoop_fs import HadoopFs

    ns = stream_id or "direct"
    base = store_path.rstrip("/")
    tag = f"{ns}-{batch_id if batch_id is not None else 0}"
    part = f"{base}/batch={tag}"
    tmp = f"{base}/.tmp-batch={tag}"
    hll_register_table(batch, col, p).write.mode("overwrite").parquet(tmp)
    fs = HadoopFs(batch.sparkSession, base)
    if fs.exists(part):
        fs.delete(part, recursive=True)
    fs.rename(tmp, part)


def read_hll_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Merged register table over every batch partition — the same
    (bucket, register) shape ``hll_register_table`` produces, so
    ``hll_estimate`` reads it directly and further merges (other
    stores, other engines' tables) compose."""
    return (
        spark.read.parquet(store_path)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )


def start_streaming_hll(
    spark: SparkSession,
    source: DataFrame,
    store_path: str,
    checkpoint: str,
    col: str,
    p: int = 8,
    trigger: dict | None = None,
):
    """Wire ``hll_batch_into_store`` into a streaming query via
    foreachBatch. ``source`` is any streaming DataFrame carrying
    ``col``; distinct counts over everything ever streamed come from
    ``hll_estimate(read_hll_store(...))`` at any time, concurrent with
    the stream — the hidden-dir-then-rename publish means a concurrent
    read never sees partial files, only (at worst) a transient
    undercount of the in-flight batch."""
    from faexport_db_spark.streaming.dedup_stream import _stream_id

    sid = _stream_id(spark, checkpoint)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        hll_batch_into_store(batch_df, store_path, col, p, batch_id, sid)

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def kmv_batch_into_store(
    batch: DataFrame,
    store_path: str,
    col: str,
    k: int = 256,
    batch_id: int | None = None,
    stream_id: str | None = None,
) -> None:
    """Fold one micro-batch into a KMV bottom-k store — the
    set-algebra sibling of ``hll_batch_into_store``: the batch's own
    ≤k-row sketch lands under an idempotent per-batch partition via
    the same hidden-dir-then-rename publish. KMV union (bottom-k of a
    concatenation) is idempotent and commutative exactly like the HLL
    MAX, so re-delivery and mid-write crashes need no commit marker."""
    from faexport_db_spark.operators.hadoop_fs import HadoopFs
    from faexport_db_spark.training.pipeline import kmv_sketch

    ns = stream_id or "direct"
    base = store_path.rstrip("/")
    tag = f"{ns}-{batch_id if batch_id is not None else 0}"
    part = f"{base}/batch={tag}"
    tmp = f"{base}/.tmp-batch={tag}"
    kmv_sketch(batch, col, k).write.mode("overwrite").parquet(tmp)
    fs = HadoopFs(batch.sparkSession, base)
    if fs.exists(part):
        fs.delete(part, recursive=True)
    fs.rename(tmp, part)


def read_kmv_store(spark: SparkSession, store_path: str, k: int = 256) -> DataFrame:
    """Merged bottom-k sketch over every batch partition — the same
    (hval) shape ``kmv_sketch`` produces, so ``kmv_estimate`` and the
    intersection estimator read it directly, and stores from other
    streams/engines compose by a further union. Merge-on-read costs
    n_batches × k rows. The ``batch=`` partition directories surface
    as a discovered partition column — project it away BEFORE the
    distinct, or duplicate hashes shared by two batches would consume
    sketch slots."""
    return (
        spark.read.parquet(store_path)
        .select("hval")
        .distinct()
        .orderBy("hval")
        .limit(k)
    )


def start_streaming_kmv(
    spark: SparkSession,
    source: DataFrame,
    store_path: str,
    checkpoint: str,
    col: str,
    k: int = 256,
    trigger: dict | None = None,
):
    """Wire ``kmv_batch_into_store`` into a streaming query via
    foreachBatch: a continuously-maintained distinct sketch whose
    set algebra (union/intersection vs OTHER corpora or streams)
    stays available at any time, with the same no-partial-files
    read guarantee as the HLL store."""
    from faexport_db_spark.streaming.dedup_stream import _stream_id

    sid = _stream_id(spark, checkpoint)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        kmv_batch_into_store(batch_df, store_path, col, k, batch_id, sid)

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def qsketch_batch_into_store(
    batch: DataFrame,
    store_path: str,
    value,
    batch_id: int | None = None,
    stream_id: str | None = None,
) -> None:
    """Fold one micro-batch into a dyadic QUANTILE-sketch store — the
    rank sibling of the HLL/KMV stores. Register counts merge by SUM,
    which is NOT idempotent, so correctness leans entirely on the
    per-batch partition contract: each batch's own ≤64-row register
    table lands under its idempotent ``batch=`` directory (re-delivery
    overwrites identical rows; the hidden-dir-then-rename publish
    keeps concurrent readers off partial files), and the read path
    sums each batch's contribution exactly once — the line-dedup
    count-partition scheme, where the IDEMPOTENT WRITE stands in for
    an idempotent merge."""
    from faexport_db_spark.operators.hadoop_fs import HadoopFs
    from faexport_db_spark.training.pipeline import qsketch_register_table

    ns = stream_id or "direct"
    base = store_path.rstrip("/")
    tag = f"{ns}-{batch_id if batch_id is not None else 0}"
    part = f"{base}/batch={tag}"
    tmp = f"{base}/.tmp-batch={tag}"
    qsketch_register_table(batch, value).write.mode("overwrite").parquet(tmp)
    fs = HadoopFs(batch.sparkSession, base)
    if fs.exists(part):
        fs.delete(part, recursive=True)
    fs.rename(tmp, part)


def read_qsketch_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Merged register table over every batch partition — the same
    (bucket, cnt) shape ``qsketch_register_table`` produces, so
    ``qsketch_quantile_brackets`` reads it directly and cross-store /
    cross-engine merges compose by further SUM. Project the
    discovered ``batch=`` column away before the sum so each batch
    counts exactly once per bucket."""
    return (
        spark.read.parquet(store_path)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def start_streaming_qsketch(
    spark: SparkSession,
    source: DataFrame,
    store_path: str,
    checkpoint: str,
    value,
    trigger: dict | None = None,
):
    """Wire ``qsketch_batch_into_store`` into a streaming query via
    foreachBatch: continuously-maintained rank statistics — "p99 of
    everything ever streamed" — from constant per-batch state, read
    at any time via ``qsketch_quantile_brackets(read_qsketch_store)``.
    """
    from faexport_db_spark.streaming.dedup_stream import _stream_id

    sid = _stream_id(spark, checkpoint)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        qsketch_batch_into_store(batch_df, store_path, value, batch_id, sid)

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
