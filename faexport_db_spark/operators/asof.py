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
    salt: int | None = None,
    hot_keys: list | None = None,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Left as-of join. Output = every ``left`` row plus all non-key
    ``right`` columns (null when no right row qualifies). ``right``'s
    timestamp column is emitted as ``asof_ts`` so callers can measure
    staleness. Column names shared by both sides (other than the keys)
    must be disambiguated by the caller first.

    Skew (``salt``): the default shape sorts each key inside ONE
    partition, so one dominant key (the reference workload's FA
    ``website_id``, SURVEY §4) serializes into a single task at scale.
    ``salt=N`` turns on the EXACT skew path: keys whose combined row
    count exceeds ``hot_threshold`` (or the explicit ``hot_keys`` list
    — each entry a tuple in ``on`` order) get their time axis cut into
    ``N`` per-key quantile slices; every (key, slice) windows
    independently (parallelism × N for the hot key), and a tiny
    per-slice summary frame (≤ hot_keys × N rows) prefix-carries the
    last right row across slice boundaries, so results are IDENTICAL
    to the plain shape — no boundary approximation. Cold keys take the
    plain single-exchange path and the two halves union."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if salt is not None and salt < 2:
        raise ValueError(f"salt must be >= 2 slices, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns {sorted(overlap)} collide with left; "
            "rename before asof_join"
        )

    reserved = {
        "_ts", "_is_left", "asof_ts", "_r", "_m",
        "_k", "_hot", "_slice", "_bounds", "_sl_last", "_carry",
    }
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad - {right_ts}:
        raise ValueError(f"columns {sorted(bad)} are reserved by asof_join")

    # a NULL right timestamp can never satisfy ts >= r.ts — drop such
    # rows, or they would sort first and their payload would be carried
    # into every left row
    right = right.filter(F.col(right_ts).isNotNull())

    # The matched right row must be taken AS A UNIT — carrying each
    # payload column independently with last(..., ignorenulls) would
    # let a NULL in the matched row's column resurrect the value from
    # an OLDER right row, mixing columns across rows (diverging from
    # DuckDB/pandas ASOF semantics). So the whole right payload rides
    # in ONE struct column: NULL for left rows (skipped by
    # ignorenulls), non-null (possibly with null fields) for right
    # rows, and one carry picks the entire matched row.
    l_pass = [c for c in left.columns if c not in keys and c != left_ts]
    r_struct = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(c) for c in payload],
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pass],
        r_struct.alias("_r"),
    )
    struct_type = r_tag.schema["_r"].dataType
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in l_pass],
        F.lit(None).cast(struct_type).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)

    def _carry_window(extra_parts: list[str]) -> "F.Column":
        if direction == "backward":
            # right sorts before left at equal ts → inclusive match
            w = (
                Window.partitionBy(*keys, *extra_parts)
                .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return F.last("_r", ignorenulls=True).over(w)
        # left sorts before right at equal ts → inclusive match ahead
        w = (
            Window.partitionBy(*keys, *extra_parts)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        return F.first("_r", ignorenulls=True).over(w)

    def _finish(carried: DataFrame) -> DataFrame:
        return carried.filter(F.col("_is_left") == 1).select(
            *keys,
            F.col("_ts").alias(left_ts),
            *l_pass,
            F.col("_m.asof_ts").alias("asof_ts"),
            *[F.col(f"_m.{c}").alias(c) for c in payload],
        )

    if salt is None:
        carried = u.select(
            *keys, "_ts", "_is_left", *l_pass, _carry_window([]).alias("_m")
        )
        return _finish(carried)
    return _finish(
        _salted_carry(u, keys, l_pass, direction, _carry_window,
                      salt, hot_keys, hot_threshold)
    )


def _order_key(u: DataFrame) -> "F.Column":
    """A numeric, order-preserving image of ``_ts`` (µs for temporal
    types) the slice machinery can quantile and compare."""
    from pyspark.sql.types import DateType, NumericType, TimestampNTZType, TimestampType

    dt = u.schema["_ts"].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
        return F.unix_micros(F.col("_ts").cast("timestamp"))
    if isinstance(dt, NumericType):
        return F.col("_ts").cast("double")
    raise ValueError(f"asof_join salt path cannot order type {dt.simpleString()}")


def _salted_carry(
    u: DataFrame,
    keys: list[str],
    l_pass: list[str],
    direction: str,
    carry_window,
    salt: int,
    hot_keys: list | None,
    hot_threshold: int,
) -> DataFrame:
    """EXACT skew split of the union-and-carry. Hot keys' time axis is
    cut into ``salt`` per-key quantile slices (quantiles only balance
    the cut — correctness never depends on where the boundaries land):
    each (key, slice) windows independently, and the boundary carry-in
    is prefix-computed on a per-slice summary frame of ≤ |hot| × salt
    rows, then broadcast back. Forward direction reuses the backward
    slice/carry machinery on a NEGATED order key (slices stay
    contiguous in time; within-slice semantics come from the shared
    window, which is already direction-aware)."""
    spark = u.sparkSession
    plain = lambda df: df.select(  # noqa: E731
        *keys, "_ts", "_is_left", *l_pass, carry_window([]).alias("_m")
    )
    if hot_keys is None:
        hot_rows = (
            u.groupBy(*keys)
            .count()
            .filter(F.col("count") > hot_threshold)
            .select(*keys)
            .collect()
        )
        hot_keys = [tuple(r) for r in hot_rows]
    else:
        hot_keys = [k if isinstance(k, tuple) else (k,) for k in hot_keys]
    if not hot_keys:
        return plain(u)

    key_schema = u.select(*keys).schema
    hot_df = spark.createDataFrame(hot_keys, key_schema).withColumn(
        "_hot", F.lit(1)
    )
    tagged = u.join(F.broadcast(hot_df), keys, "left")
    cold = plain(tagged.filter(F.col("_hot").isNull()).drop("_hot"))

    sign = 1 if direction == "backward" else -1
    hot = (
        tagged.filter(F.col("_hot") == 1)
        .drop("_hot")
        .withColumn("_k", _order_key(u) * F.lit(sign))
    )
    # per-key quantile boundaries: a bounded agg (|hot| rows out),
    # broadcast back; a row's slice = #boundaries at-or-below its key
    bounds = hot.groupBy(*keys).agg(
        F.percentile_approx(
            "_k", [i / salt for i in range(1, salt)], 10_000
        ).alias("_bounds")
    )
    sliced = (
        hot.join(F.broadcast(bounds), keys)
        .withColumn(
            "_slice",
            F.aggregate(
                "_bounds",
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("_k") >= b, F.lit(1)).otherwise(F.lit(0)),
            ),
        )
        .drop("_bounds")
    )
    within = sliced.select(
        *keys, "_ts", "_is_left", *l_pass, "_k", "_slice",
        carry_window(["_slice"]).alias("_m"),
    )
    # boundary carry-in: per (key, slice) last right row, prefix-carried
    # across the slice order on a tiny summary frame
    domain = sliced.select(*keys, "_slice").distinct()
    per_slice = (
        sliced.filter(F.col("_is_left") == 0)
        .groupBy(*keys, "_slice")
        .agg(F.max_by("_r", "_k").alias("_sl_last"))
    )
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_slice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        domain.join(per_slice, [*keys, "_slice"], "left")
        .withColumn("_carry", F.last("_sl_last", ignorenulls=True).over(w_prev))
        .select(*keys, "_slice", "_carry")
    )
    hot_done = (
        within.join(F.broadcast(carry_in), [*keys, "_slice"], "left")
        .withColumn("_m", F.coalesce("_m", "_carry"))
        .select(*keys, "_ts", "_is_left", *l_pass, "_m")
    )
    return cold.unionByName(hot_done)
