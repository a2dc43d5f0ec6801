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


def test_sessionize_gap_boundary_semantics(spark):
    """A gap of EXACTLY the threshold is not a boundary (> not >=);
    one µs over is; each key's ordinals restart at 1; equal timestamps
    never open a session."""
    import datetime as dt

    from faexport_db_spark.operators.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),                      # == gap: same session
        (1, t0 + dt.timedelta(minutes=60, microseconds=1)),      # 30m+1µs: new session
        (1, t0 + dt.timedelta(minutes=60, microseconds=1)),      # tie: same session
        (2, t0 + dt.timedelta(hours=9)),                         # other key restarts
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["ts"]): r["session_n"]
        for r in sessionize(df, ["user_id"], "ts", gap_minutes=30).collect()
    }
    assert got[(1, rows[0][1])] == 1
    assert got[(1, rows[1][1])] == 1
    assert got[(1, rows[2][1])] == 2
    assert got[(2, rows[4][1])] == 1


def test_sessionize_is_single_exchange(spark):
    import datetime as dt

    from faexport_db_spark.operators.timeseries import sessionize
    from faexport_db_spark.plans.audit import shuffle_count

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id bigint, ts timestamp"
    )
    # lag window and cumulative-sum window share one partitioning —
    # the whole operator must plan as ONE exchange
    assert shuffle_count(sessionize(df, ["user_id"], "ts")) <= 1


def test_pagerank_chain_graph_known_values(spark):
    """Hand-checkable chain 1→2→3: node 1 never receives mass, node 2
    receives from 1, node 3 from 2; ranks strictly increase along the
    chain and total mass stays ≤ 1 (leak formulation)."""
    from faexport_db_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    r = {row["node"]: row["rank"] for row in pagerank(e, iters=3).collect()}
    base = 0.15 / 3
    assert abs(r[1] - round(base, 6)) < 1e-9          # source: base only
    assert r[1] < r[2] < r[3]
    assert sum(r.values()) <= 1.0 + 1e-9


def test_interval_coverage_merges_overlaps(spark):
    """Hand-checkable islands: [0,10] + [5,15] merge (coverage 15),
    [20,25] is its own island; a fully-contained interval adds
    nothing."""
    import datetime as dt

    from faexport_db_spark.queries.registry import QUERIES
    from faexport_db_spark.queries import timeseries as ts_mod

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, off_s, dur_s):
        return (eid, t0 + dt.timedelta(seconds=off_s), 1, "e", float(dur_s), "{}")

    rows = [ev(1, 0, 10), ev(2, 5, 10), ev(3, 20, 5), ev(4, 6, 1)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda spark, sf, name: df
        out = QUERIES["ts6_interval_coverage"](spark, "unused").collect()
    finally:
        ts_mod.load_table = orig
    row = out[0]
    assert row["n_islands"] == 2
    assert row["covered_us"] == 20_000_000  # 15s + 5s


def test_ts9_ewma_hand_computed(spark):
    """Dyadic EWMA over observed daily totals: hand-checkable exact
    values, absent history as 0, per-user isolation."""
    import datetime as dt

    from faexport_db_spark.queries.timeseries import ts9_ewma
    from faexport_db_spark.datamodel import testdata as td

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1, "c", 1.00, None),
        (2, dt.datetime(2024, 1, 1, 9), 1, "c", 1.00, None),  # same day: 2.00
        (3, dt.datetime(2024, 1, 2, 5), 1, "c", 4.00, None),
        (4, dt.datetime(2024, 1, 1, 5), 2, "c", 8.00, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    import unittest.mock as mock

    with mock.patch.object(td, "load_table", return_value=ev):
        from faexport_db_spark.queries import timeseries as tsq

        with mock.patch.object(tsq, "load_table", return_value=ev):
            got = {(r["user_id"], r["day"]): r for r in ts9_ewma(spark, "ignored").collect()}
    assert got[(1, "2024-01-01")]["daily_value"] == 2.0
    assert got[(1, "2024-01-01")]["ewma"] == 2.0          # no history
    assert got[(1, "2024-01-02")]["ewma"] == 4.0 + 1.0    # 4 + 2/2
    assert got[(2, "2024-01-01")]["ewma"] == 8.0          # user isolation
