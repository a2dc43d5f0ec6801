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


def test_asof_rejects_colliding_payload(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lv"), on="k")
    with pytest.raises(ValueError, match="backward"):
        asof_join(left, right, on="k", direction="nearest")


def test_asof_is_single_exchange(spark, frames):
    from faexport_db_spark.plans.audit import shuffle_count

    left, right = frames
    # union-and-carry: ONE hash exchange on the join key feeds the
    # window — the property that makes the shape viable at scale
    assert shuffle_count(asof_join(left, right, on="k")) <= 1
