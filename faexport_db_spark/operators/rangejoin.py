"""Interval (range) join: pair left rows whose timestamp falls inside
a right-side [start, end] interval sharing the join key — the operator
class Spark's DataFrame API only expresses as a theta join, which
physically degenerates to BroadcastNestedLoopJoin (small side) or a
per-key cartesian (sort-merge on the key, filter after) and dies at
scale when keys are hot or intervals many.

Implemented as the time-bucketing shape every large-scale engine uses
(it is the 1-D special case of spatial grid joins): quantize time into
``bucket_width``-second bins; each LEFT row lands in exactly one bin,
each interval fans out to ceil(span/width)+1 bins; equi-join on
(key, bin) — a plain hash shuffle Catalyst/AQE can plan, skew-split
and partially prune — then the exact containment predicate filters
bin-collision false positives. Join cost is linear in rows + interval
fan-out instead of |left_key| × |right_key| per key.

Choosing ``bucket_width``: ≈ the median interval span. Too small →
interval fan-out explodes (each interval replicated span/width times);
too large → bins collapse and the per-bin product reappears. At 100 TB
pick from interval statistics (one cheap agg) rather than a constant;
the fan-out is explicit in the plan (posexplode of the bin sequence),
so a misconfigured width is visible as row-count amplification, not a
silent hot partition.

Semantics: inclusive on both endpoints, null-hostile (rows with null
ts/bounds drop, like the SQL predicate would); inner join — callers
needing left-outer re-attach via a left-anti on the matched ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    # microsecond-precision epoch seconds as double: unix_timestamp()
    # truncates to seconds and would make bucket edges disagree with
    # the exact predicate for sub-second timestamps.
    return F.unix_micros(col) / F.lit(1e6)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width: int = 86_400,
) -> DataFrame:
    """Inner interval join: left rows × right intervals with
    ``right_start <= left_ts <= right_end`` and equal key columns.
    Output = all left columns + all right columns (names must not
    collide; keys appear once). ``bucket_width`` is in seconds."""
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} exist on both sides; rename before "
            "interval_join"
        )
    w = F.lit(float(bucket_width))
    l_binned = left.filter(F.col(left_ts).isNotNull()).withColumn(
        "_bin", F.floor(_epoch(F.col(left_ts)) / w)
    )
    bins = F.sequence(
        F.floor(_epoch(F.col(right_start)) / w),
        F.floor(_epoch(F.col(right_end)) / w),
    )
    r_binned = (
        right.filter(
            F.col(right_start).isNotNull()
            & F.col(right_end).isNotNull()
            & (F.col(right_start) <= F.col(right_end))
        )
        .withColumn("_bin", F.explode(bins))
    )
    joined = l_binned.join(r_binned, [*keys, "_bin"])
    return joined.filter(
        (F.col(right_start) <= F.col(left_ts)) & (F.col(left_ts) <= F.col(right_end))
    ).drop("_bin")
