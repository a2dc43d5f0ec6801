"""Time-series as-of join: for every left row, attach the single right
row with the nearest timestamp at-or-before it (``backward``, the
default) or at-or-after it (``forward``), per join key — the operator
kdb/DuckDB/Pandas call ASOF JOIN and Spark's DataFrame API lacks.

Implemented as the union-and-carry shape rather than a range join:
both sides are tagged and unioned, ONE shuffle partitions by the join
key, and an ordered window carries the most recent right payload
forward (``last(..., ignorenulls)``) into each left row. A range/theta
join (``l.k = r.k AND l.ts >= r.ts`` + per-row max) would compute the
same thing but materializes every (left, earlier-right) pairing before
pruning — quadratic per key — while the carry is linear and sorts each
key-partition once. This is the standard large-scale Spark as-of shape;
Structured Streaming reuses it as a stateful carry.

Scale notes: the single exchange hashes on the join key, so skew
follows key skew (a device emitting most events lands in one
partition's sort) — mitigate upstream with the usual salting split
when one key dominates, trading exactness at salt boundaries, or
pre-aggregate the right side to epoch granularity. Both inputs stay
columnar until the window; only the carried payload columns ride
through the union (nulls on the opposite side compress to nothing in
shuffle). Ties: a right row at exactly the left timestamp matches
(inclusive, both directions — DuckDB parity); among multiple right
rows sharing (key, ts) the operator's contract requires a unique
right row per (key, ts) — pre-dedup with a deterministic rule, or
output order would depend on shuffle arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Output = every ``left`` row plus all non-key
    ``right`` columns (null when no right row qualifies). ``right``'s
    timestamp column is emitted as ``asof_ts`` so callers can measure
    staleness. Column names shared by both sides (other than the keys)
    must be disambiguated by the caller first."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns {sorted(overlap)} collide with left; "
            "rename before asof_join"
        )

    reserved = {"_ts", "_is_left", "asof_ts"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad - {right_ts}:
        raise ValueError(f"columns {sorted(bad)} are reserved by asof_join")

    # a NULL right timestamp can never satisfy ts >= r.ts — drop such
    # rows, or they would sort first and their payload would be carried
    # into every left row
    right = right.filter(F.col(right_ts).isNotNull())

    l_pass = [c for c in left.columns if c not in keys and c != left_ts]
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in l_pass],
        F.lit(None).cast("timestamp").alias("asof_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pass],
        F.col(right_ts).alias("asof_ts"),
        *payload,
    )
    u = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right sorts before left at equal ts → inclusive match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left sorts before right at equal ts → inclusive match ahead
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    carried = u.select(
        *keys,
        "_ts",
        "_is_left",
        *l_pass,
        carry("asof_ts").alias("_asof_ts"),
        *[carry(c).alias(f"_c_{c}") for c in payload],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *l_pass,
        F.col("_asof_ts").alias("asof_ts"),
        *[F.col(f"_c_{c}").alias(c) for c in payload],
    )
