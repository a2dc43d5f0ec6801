"""resample_locf / scd2_collapse golden tests: gap filling, flag
semantics, island collapse."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_resample_locf_fills_gaps_and_flags(spark):
    from faexport_db_spark.operators.timeseries import resample_locf

    d = dt.date
    daily = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 10.0),
            (1, d(2024, 1, 4), 40.0),
            (2, d(2024, 1, 2), 5.0),
        ],
        "k bigint, day date, v double",
    )
    out = resample_locf(daily, ["k"], "day", ["v"])
    rows = {(r["k"], str(r["day"])): r for r in out.collect()}
    assert len(rows) == 5  # 4 days for k=1, 1 day for k=2
    assert rows[(1, "2024-01-02")]["v"] == 10.0  # LOCF
    assert rows[(1, "2024-01-02")]["observed"] is False
    assert rows[(1, "2024-01-03")]["v"] == 10.0
    assert rows[(1, "2024-01-04")]["v"] == 40.0
    assert rows[(1, "2024-01-04")]["observed"] is True
    assert rows[(2, "2024-01-02")]["observed"] is True


def test_scd2_collapse_islands(spark):
    from faexport_db_spark.operators.merge import scd2_collapse

    d = dt.date
    snaps = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 1, "A"),
            (1, d(2024, 1, 2), 2, "A"),
            (1, d(2024, 1, 3), 3, "B"),
            (1, d(2024, 1, 4), 4, "A"),  # A returns -> NEW interval
            (2, d(2024, 1, 1), 5, "C"),
        ],
        "k bigint, day date, sid bigint, status string",
    )
    out = scd2_collapse(snaps, ["k"], ["day", "sid"], "status")
    ivals = sorted(
        (r["k"], r["status"], str(r["valid_from"]), str(r["valid_to"]), r["n_snapshots"])
        for r in out.collect()
    )
    assert ivals == [
        (1, "A", "2024-01-01", "2024-01-02", 2),
        (1, "A", "2024-01-04", "2024-01-04", 1),
        (1, "B", "2024-01-03", "2024-01-03", 1),
        (2, "C", "2024-01-01", "2024-01-01", 1),
    ]


def test_funnel_fold_strict_ordering(spark):
    """The single-fold funnel must match strict-sequence semantics:
    stages only advance on events STRICTLY after the previous stage,
    pre-signup clicks don't count, and repeats don't double-advance."""
    import datetime as dt

    from faexport_db_spark.queries.timeseries import ts3_funnel_stages  # noqa: F401
    from faexport_db_spark.queries.registry import QUERIES
    import pyspark.sql.functions as F  # noqa: F401

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: click BEFORE signup (ignored), then full funnel
        (1, t(1), "click"), (1, t(2), "signup"), (1, t(3), "click"), (1, t(4), "purchase"),
        # user 2: signup only
        (2, t(1), "signup"),
        # user 3: purchase before click -> stops at stage 2
        (3, t(1), "signup"), (3, t(2), "purchase"), (3, t(3), "click"),
        # user 4: no signup at all
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    ev.createOrReplaceTempView("__funnel_events")

    # drive the registered callable's fold logic directly on the fixture
    from faexport_db_spark.queries import timeseries as ts_mod

    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda spark, sf, name: ev
        out = {r["user_id"]: r["funnel_stage"] for r in QUERIES["ts3_funnel_stages"](spark, "unused").collect()}
    finally:
        ts_mod.load_table = orig
    assert out == {1: 3, 2: 1, 3: 2, 4: 0}
