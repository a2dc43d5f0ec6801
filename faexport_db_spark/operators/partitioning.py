"""Partition-layout helpers.

``fan_out`` fixes the small-file/parallelism mismatch: a compute-heavy
operator (hash signatures, shingling, vector math) reading a source
with fewer splits than the cluster has cores would otherwise run on a
fraction of the machine — a single-file parquet table scans as ONE
task no matter how many cores exist, because a row group can't be
split. At real scale inputs arrive in thousands of splits and this is
a no-op (the guard keeps it shuffle-free); it only rebalances when the
input genuinely under-parallelizes the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition up to ``multiple × defaultParallelism``
    — only when the input has fewer partitions than that (never a
    coalesce, never a shuffle on already-wide inputs)."""
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
