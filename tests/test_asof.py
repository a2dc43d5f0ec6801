"""asof_join operator semantics (operators/asof.py): inclusive ties in
both directions, null on no-match, per-key isolation, payload-collision
guard — the matrix the j9 DuckDB ASOF differential can't isolate."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from faexport_db_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(2), 10.0),   # right rows at day1, day2 → tie picks day2
            (1, _ts(5), 20.0),   # latest right at-or-before = day3
            (2, _ts(1), 30.0),   # other key: only key-2 rows qualify
            (3, _ts(4), 40.0),   # key with no right rows at all
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(1), 100.0),
            (1, _ts(2), 200.0),
            (1, _ts(3), 300.0),
            (2, _ts(1, 1), 400.0),
        ],
        ["k", "ts", "rv"],
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {r["lv"]: r for r in asof_join(left, right, on="k").collect()}
    assert out[10.0]["rv"] == 200.0 and out[10.0]["asof_ts"] == _ts(2)  # tie
    assert out[20.0]["rv"] == 300.0
    assert out[30.0]["rv"] is None  # key 2's right row is LATER
    assert out[40.0]["rv"] is None and out[40.0]["asof_ts"] is None
    assert len(out) == 4  # every left row survives exactly once


def test_asof_forward_inclusive(spark, frames):
    left, right = frames
    out = {
        r["lv"]: r
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out[10.0]["rv"] == 200.0  # tie matches forward too
    assert out[20.0]["rv"] is None  # nothing at-or-after day 5
    assert out[30.0]["rv"] == 400.0  # key 2's later row qualifies forward
    assert out[40.0]["rv"] is None


def test_asof_ignores_null_right_timestamps(spark, frames):
    left, right = frames
    poisoned = right.unionByName(
        right.limit(1).select(
            "k", F.lit(None).cast("timestamp").alias("ts"),
            F.lit(-1.0).alias("rv"),
        )
    )
    # a NULL-ts right row can never satisfy ts >= r.ts — results must be
    # identical to the clean right side (not carried into every row)
    base = {(r["lv"], r["rv"]) for r in asof_join(left, right, on="k").collect()}
    got = {(r["lv"], r["rv"]) for r in asof_join(left, poisoned, on="k").collect()}
    assert got == base
    assert -1.0 not in {rv for _lv, rv in got}


def test_asof_matched_row_nulls_are_kept(spark):
    """The matched right row is taken AS A UNIT: a NULL payload column
    in the nearest at-or-before row must stay NULL in the output (DuckDB
    / pandas merge_asof parity), not resurrect the value from an older
    right row (ADVICE r05 medium: per-column last(ignorenulls) mixed
    columns from different right rows)."""
    left = spark.createDataFrame([(1, _ts(5), 1.0)], ["k", "ts", "lv"])
    right = spark.createDataFrame(
        [
            (1, _ts(1), 100.0, "old"),
            (1, _ts(3), None, "new"),  # matched row: rv is NULL
        ],
        ["k", "ts", "rv", "tag"],
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["asof_ts"] == _ts(3) and row["tag"] == "new"
    assert row["rv"] is None  # NOT 100.0 from the older row

    # forward direction: matched row at-or-after, same unit semantics
    fleft = spark.createDataFrame([(1, _ts(2), 1.0)], ["k", "ts", "lv"])
    frow = asof_join(fleft, right, on="k", direction="forward").collect()[0]
    assert frow["asof_ts"] == _ts(3) and frow["rv"] is None


def test_asof_rejects_colliding_payload(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lv"), on="k")
    with pytest.raises(ValueError, match="backward"):
        asof_join(left, right, on="k", direction="nearest")


def _skewed_frames(spark, seed=7):
    """One dominant key (0) with ~300 rows on each side + 5 cold keys,
    NULL payloads sprinkled in so the struct-unit semantics are also
    exercised across slice boundaries."""
    import random

    rng = random.Random(seed)
    lrows, rrows = [], []
    for i in range(300):
        lrows.append((0, _ts(1 + i % 25, i % 24), float(i)))
        v = None if i % 11 == 0 else float(1000 + i)
        rrows.append((0, _ts(1 + (i * 7) % 25, (i * 5) % 24), v))
    for k in range(1, 6):
        for i in range(10):
            lrows.append((k, _ts(1 + rng.randrange(25), rng.randrange(24)), float(k * 100 + i)))
            rrows.append((k, _ts(1 + rng.randrange(25), rng.randrange(24)), float(k * 1000 + i)))
    left = spark.createDataFrame(lrows, "k bigint, ts timestamp, lv double")
    right = (
        spark.createDataFrame(rrows, "k bigint, ts timestamp, rv double")
        # contract: unique right row per (key, ts)
        .dropDuplicates(["k", "ts"])
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.slow
def test_asof_salted_equals_plain_on_skew(spark, direction):
    """The exact skew path (per-key quantile slices + boundary
    prefix-carry) returns IDENTICAL rows to the plain single-partition
    sort, on a fixture where one key dominates (VERDICT r05 #4)."""
    left, right = _skewed_frames(spark)
    base = asof_join(left, right, on="k", direction=direction)
    salted = asof_join(
        left, right, on="k", direction=direction, salt=8, hot_threshold=100
    )
    key = lambda r: (r["k"], r["ts"], r["lv"])  # noqa: E731
    b = sorted([tuple(r) for r in base.collect()], key=lambda t: t[:3])
    s = sorted([tuple(r) for r in salted.collect()], key=lambda t: t[:3])
    assert s == b


@pytest.mark.slow
def test_asof_salted_explicit_hot_keys_and_fallback(spark, frames):
    left, right = frames
    base = {tuple(r) for r in asof_join(left, right, on="k").collect()}
    # explicit hot key list (scalars auto-tupled)
    got = {
        tuple(r)
        for r in asof_join(left, right, on="k", salt=4, hot_keys=[1]).collect()
    }
    assert got == base
    # nothing hot under the threshold -> falls back to the plain shape
    got2 = {
        tuple(r)
        for r in asof_join(
            left, right, on="k", salt=4, hot_threshold=10**9
        ).collect()
    }
    assert got2 == base
    with pytest.raises(ValueError, match="salt"):
        asof_join(left, right, on="k", salt=1)


def test_asof_salted_plan_splits_hot_key(spark):
    """The hot half's window must partition by (key, _slice) — the
    property that gives the dominant key salt-way parallelism instead
    of one task's sort."""
    left, right = _skewed_frames(spark)
    out = asof_join(left, right, on="k", salt=8, hot_keys=[0])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_slice" in plan  # slice column reaches the physical window


def test_asof_is_single_exchange(spark, frames):
    from faexport_db_spark.plans.audit import shuffle_count

    left, right = frames
    # union-and-carry: ONE hash exchange on the join key feeds the
    # window — the property that makes the shape viable at scale
    assert shuffle_count(asof_join(left, right, on="k")) <= 1
