"""Storage-strategy seam: the mutation surface a table format provides.

The engine's store paths need exactly four mutations beyond plain
reads: append a batch (K1/K2), delete by predicate (K4, reference
scripts/cron/remove_duplicates.py:61-84), overwrite touched hive
partitions (merged-view maintenance), and upsert-by-key within
partitions (incremental merged view). On plain parquet each of these
is a rewrite with specific care (lineage breaks, dynamic partition
overwrite, first-batch races); on a transactional table format
(Delta Lake, Iceberg) they are native commands (``MERGE INTO``,
``DELETE WHERE``, ``replaceWhere``) with snapshot isolation and
metadata-only planning.

This module confines that difference to one interface so
``maintenance/`` and ``streaming/`` never hard-code a format:
``ParquetFormat`` is the zero-dependency default that reproduces the
engine's existing behavior byte-for-byte; a ``DeltaFormat`` /
``IcebergFormat`` slots in by implementing the same five methods with
the native commands (each method's docstring names the command).

The seam is deliberately path-based, not catalog-based — the
reference's store is a directory tree, and CCR-style deployments pass
explicit locations. A catalog-table format can treat ``path`` as a
table identifier.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import Column, DataFrame, SparkSession


class TableFormat(ABC):
    """Mutation strategy for one store table at ``path``."""

    @abstractmethod
    def read(self, spark: SparkSession, path: str) -> DataFrame: ...

    @abstractmethod
    def append(
        self, df: DataFrame, path: str, partition_cols: list[str] | None = None
    ) -> None:
        """K1/K2 bulk/micro-batch append."""

    @abstractmethod
    def delete_where(self, spark: SparkSession, path: str, predicate: Column) -> None:
        """K4: delete matching rows. Delta/Iceberg: ``DELETE FROM t
        WHERE p`` — metadata + touched-file rewrite under snapshot
        isolation."""

    @abstractmethod
    def overwrite_partitions(
        self, df: DataFrame, path: str, partition_cols: list[str]
    ) -> None:
        """Replace exactly the hive partitions present in ``df``.
        Delta: ``replaceWhere`` / dynamic overwrite; Iceberg:
        ``overwritePartitions()``."""

    @abstractmethod
    def upsert_keys(
        self,
        recomputed: DataFrame,
        path: str,
        key_cols: list[str],
        partition_cols: list[str],
        keys: DataFrame | None = None,
    ) -> None:
        """Replace rows matching the touched key set in the touched
        partitions with ``recomputed``, keeping every other row — the
        incremental merged-view maintenance step. ``keys`` is the
        touched key set (``key_cols`` columns; defaults to
        ``recomputed``'s keys) — pass it explicitly when a touched key
        may have NO recomputed row (all its source rows deleted), so
        its stale row is purged rather than kept; ``partition_cols``
        must be a subset of ``key_cols``. Delta/Iceberg: one ``MERGE
        INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT WHEN NOT
        MATCHED BY SOURCE DELETE`` — no read-union-rewrite, no lineage
        dance."""


class ParquetFormat(TableFormat):
    """Plain-parquet implementation — rewrites with the care the
    engine's streaming/maintenance paths need (lineage breaks before
    overwriting a path being read, dynamic partition overwrite so
    untouched partitions survive, first-batch tolerance)."""

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def append(
        self, df: DataFrame, path: str, partition_cols: list[str] | None = None
    ) -> None:
        writer = df.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)

    def delete_where(self, spark: SparkSession, path: str, predicate: Column) -> None:
        # SQL DELETE WHERE p removes rows where p IS TRUE; rows where p
        # is NULL survive. A plain filter(~p) would silently delete the
        # NULL rows too, diverging from the Delta/Iceberg command this
        # method mirrors.
        survivors = self.read(spark, path).filter(~predicate.eqNullSafe(True))
        # Break lineage before overwriting the path we just read.
        survivors.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    def overwrite_partitions(
        self, df: DataFrame, path: str, partition_cols: list[str]
    ) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def upsert_keys(
        self,
        recomputed: DataFrame,
        path: str,
        key_cols: list[str],
        partition_cols: list[str],
        keys: DataFrame | None = None,
    ) -> None:
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        spark = recomputed.sparkSession
        touched_keys = (keys if keys is not None else recomputed).select(*key_cols)
        # Partitions come from the TOUCHED KEYS, not from recomputed: a
        # touched key whose rows were all deleted has no recomputed
        # row, but its partition must still rewrite so the stale row
        # is purged.
        touched_parts = [
            tuple(r) for r in touched_keys.select(*partition_cols).distinct().collect()
        ]
        try:
            existing = self.read(spark, path)
            part_pred = F.lit(False)
            for vals in touched_parts:
                clause = F.lit(True)
                for c, v in zip(partition_cols, vals):
                    # eqNullSafe: a NULL partition value must still
                    # select its (__HIVE_DEFAULT_PARTITION__) rows —
                    # plain == is never true against NULL, which would
                    # both skip the keep-side and leave stale rows
                    # (ADVICE r03).
                    clause = clause & F.col(c).eqNullSafe(F.lit(v))
                part_pred = part_pred | clause
            # The anti-join must be null-safe too: with a plain
            # equi-join a NULL-keyed stale row never matches its
            # touched key and silently survives next to its
            # replacement.
            tk = touched_keys.distinct().alias("__tk")
            ex = existing.filter(part_pred).alias("__ex")
            anti_cond = F.lit(True)
            for c in key_cols:
                anti_cond = anti_cond & F.col(f"__ex.{c}").eqNullSafe(
                    F.col(f"__tk.{c}")
                )
            keep = ex.join(F.broadcast(tk), anti_cond, "left_anti")
            out = recomputed.unionByName(keep).localCheckpoint(eager=True)
        except AnalysisException as exc:
            # First-batch cases only: missing path, or a crashed first
            # write's footerless directory. Anything else propagates —
            # swallowing it would drop untouched rows of the touched
            # partitions (see merged_view_stream for the full rationale).
            if exc.getCondition() not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
            out = recomputed
        self.overwrite_partitions(out, path, partition_cols)
        # Dynamic partition overwrite only replaces partitions PRESENT
        # in the written data — a touched partition whose every row was
        # purged has no output rows, so its stale directory would
        # silently survive (ADVICE r03). Delete those explicitly.
        out_parts = {
            tuple(r) for r in out.select(*partition_cols).distinct().collect()
        }
        emptied = [p for p in touched_parts if p not in out_parts]
        if emptied:
            from faexport_db_spark.operators.hadoop_fs import HadoopFs

            fs = HadoopFs(spark, path)
            for vals in emptied:
                reldir = "/".join(
                    f"{c}={_hive_partition_value(spark, v)}"
                    for c, v in zip(partition_cols, vals)
                )
                fs.delete(f"{path.rstrip('/')}/{reldir}", recursive=True)


def _hive_partition_value(spark: SparkSession, v) -> str:
    """The directory-name form Spark gives a partition VALUE — null
    sentinel and path escaping included, via the same catalyst helper
    the writer uses (``ExternalCatalogUtils.escapePathName``) so the
    deleted directory is byte-identical to the written one."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):  # Python str(True) != Spark "true"
        s = "true" if v else "false"
    else:
        s = str(v)
    return (
        spark.sparkContext._jvm.org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(s)
    )


DEFAULT_FORMAT = ParquetFormat()
