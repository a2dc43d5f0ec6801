"""interval_join operator semantics (operators/rangejoin.py): endpoint
inclusivity at bin edges, multi-bin interval fan-out, null/degenerate
handling, and the plan property that motivates the operator — the range
predicate runs as a hash equi-join, never a nested-loop/cartesian."""

import datetime as dt

import pytest

from faexport_db_spark.operators.rangejoin import interval_join


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _t(0)),       # exactly on win A start (inclusive)
            (1, 101, _t(5)),       # inside win A
            (1, 102, _t(10)),      # exactly on win A end (inclusive)
            (1, 103, _t(10, 1)),   # one second past win A
            (2, 104, _t(5)),       # right key, but key-2 window is later
            (1, 105, None),        # null ts drops
        ],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, 7, _t(0), _t(10)),    # win A: spans many 60s bins
            (2, 8, _t(30), _t(31)),
            (1, 9, _t(5), _t(5)),     # degenerate point interval
            (1, 10, _t(20), _t(15)),  # inverted → dropped
            (1, 11, None, _t(50)),    # null bound → dropped
        ],
        ["k", "rid", "ws", "we"],
    )
    return left, right


@pytest.mark.slow
def test_interval_join_inclusive_edges_and_fanout(spark, frames):
    left, right = frames
    out = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, on="k", left_ts="ts",
            right_start="ws", right_end="we", bucket_width=60,
        ).collect()
    }
    assert out == {(100, 7), (101, 7), (102, 7), (101, 9)}


def test_interval_join_width_invariance(spark, frames):
    left, right = frames
    args = dict(on="k", left_ts="ts", right_start="ws", right_end="we")
    base = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, bucket_width=60, **args).collect()
    }
    for width in (1, 7, 3600):
        got = {
            (r["lid"], r["rid"])
            for r in interval_join(left, right, bucket_width=width, **args).collect()
        }
        assert got == base, width


def test_interval_join_rejects_column_collision(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="rename"):
        interval_join(
            left, right.withColumnRenamed("rid", "lid"),
            on="k", left_ts="ts", right_start="ws", right_end="we",
        )


def test_interval_join_plans_as_equi_join(spark, frames):
    from tests.test_plans import join_strategies

    left, right = frames
    strategies = join_strategies(
        interval_join(
            left, right, on="k", left_ts="ts",
            right_start="ws", right_end="we", bucket_width=60,
        )
    )
    assert strategies["CartesianProduct"] == 0, strategies
    assert strategies["BroadcastNestedLoopJoin"] == 0, strategies
