"""Time-series regularization queries (TS1+): the irregular
snapshot-stream -> regular-grid shapes downstream dashboards and
state-on-day-X lookups need over the reference's scan_datetime
streams (faexport_db/models.py website_states / submission
snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.operators.timeseries import resample_locf
from faexport_db_spark.queries.registry import register


@register(
    "ts1_gapfill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             round(CAST(sum(value) AS DOUBLE), 2) AS day_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    ),
    joined AS (
      SELECT g.user_id, g.day, d.day_value,
             d.day_value IS NOT NULL AS observed
      FROM grid g LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value,
           observed
    FROM joined
    """,
)
def ts1_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS1 — daily resample with LOCF gap fill: per-user daily value
    totals regularized onto each user's full day span; days with no
    events repeat the last observed total and are flagged
    ``observed=false``. sequence+explode grid, one entity-keyed fill
    window, zero UDFs — see operators/timeseries.py for the 100 TB
    shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    filled = resample_locf(
        daily, key_cols=["user_id"], bucket_col="day", value_cols=["day_value"]
    )
    # computed DATEs round-trip differently through the two engines'
    # pandas bridges (datetime64 vs datetime.date), so the driver
    # surface renders the bucket as a string — same convention as A4.
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_value",
        "observed",
    )


@register(
    "ts2_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.d0, a.d) AS INT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def ts2_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS2 — cohort retention triangle: users bucket into cohorts by
    first-seen day; each later active day counts toward (cohort,
    day-offset). Two aggregates + one equi-join on user_id — the
    firsts side is user-cardinality (large at scale), so it stays a
    shuffle join AQE plans rather than a broadcast; the distinct
    pre-aggregate shrinks the activity side to user×day before the
    join."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "ts3_funnel_stages",
    oracle="""
    WITH s AS (
      SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
       AND e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT s.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_stage
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def ts3_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS3 — ordered funnel (signup -> click -> purchase): how deep
    each user progressed, where each stage must STRICTLY follow the
    previous stage's first completion. The oracle is the textbook
    3-pass self-join; the Spark side folds each user's time-sorted
    event array with ONE aggregate expression (collect -> array_sort
    -> higher-order fold) — a single exchange instead of three
    aggregate+join rounds, and the fold is whole-stage-codegen, no
    UDFs. Greedy-first semantics are equivalent: the fold advances at
    exactly the earliest qualifying event per stage."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_type")))
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )
    needed = {1: "signup", 2: "click", 3: "purchase"}

    def step(acc, ev_s):
        advance = F.lit(False)
        for stage, etype in needed.items():
            advance = advance | (
                (acc["stage"] == stage - 1)
                & (ev_s["event_type"] == etype)
                & (acc["t"].isNull() | (ev_s["ts"] > acc["t"]))
            )
        return F.when(
            advance,
            F.struct((acc["stage"] + 1).alias("stage"), ev_s["ts"].alias("t")),
        ).otherwise(acc)

    folded = ev.groupBy("user_id").agg(
        F.aggregate(arr, init, step).alias("__f")
    )
    return folded.select(
        "user_id", F.col("__f.stage").cast("int").alias("funnel_stage")
    )


@register(
    "ts4_rolling_zscore",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             CAST(avg(value) OVER win AS DOUBLE) AS mu,
             stddev_samp(value) OVER win AS sd,
             count(*) OVER win AS nw
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round(CAST((value - mu) / sd AS DOUBLE), 4) AS z,
           abs((value - mu) / sd) > 2.0 AS is_anomaly
    FROM w WHERE nw >= 7 AND sd > 0
    """,
)
def ts4_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS4 — rolling z-score anomaly flag: each event scored against
    the trailing 7-event mean/stddev of its own user (warm-up rows
    with fewer than 7 observations are excluded, like the oracle's nw
    filter). One entity-keyed window pass, all three aggregates
    sharing the same frame — at scale the partition key is the
    entity, uniform for event streams."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("nw"),
    ).filter((F.col("nw") >= 7) & (F.col("sd") > 0))
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return scored.select(
        "user_id",
        "event_id",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@register(
    "ts5_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
      FROM flagged
    )
    SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(value) AS DOUBLE), 2) AS total_value,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_n
    """,
)
def ts5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS5 — batch sessionization: per-user sessions cut at >30-minute
    inactivity gaps (operators/timeseries.py::sessionize — lag +
    cumulative boundary sum, ONE exchange on the entity key), rolled
    up to one row per session. The batch twin of st_session_windows,
    for backfills where streaming state is the wrong tool; tied
    timestamps are assignment-stable by construction (gap 0 is never
    a boundary)."""
    from faexport_db_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, ["user_id"], "ts", gap_minutes=30)
    return s.groupBy("user_id", "session_n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    ).select(
        "user_id",
        F.col("session_n").cast("bigint").alias("session_n"),
        "n_events", "total_value", "session_start", "session_end",
    )


@register(
    "ts6_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 1000000.0, 0) AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= s
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island, min(s) AS i_start, max(e) AS i_end
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
    FROM per_island GROUP BY user_id
    """,
)
def ts6_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS6 — union-of-intervals coverage (gaps-and-islands): each event
    spans [ts, ts + value seconds]; overlapping spans per user merge
    into islands and the TOTAL covered time is summed — the
    utilization / uptime primitive (how long was the device actually
    busy). One entity-keyed sort carries both windows (running max of
    interval end → island boundary flag → cumulative island id), then
    two map-side-combining aggregates; all integer µs arithmetic, so
    the cross-engine match is exact, not rounded. The same single
    exchange + skew profile as sessionize."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            # round, not truncate: DuckDB's double->BIGINT cast rounds
            # while Spark's truncates — make both round explicitly or
            # durations like 9.64 s diverge by 1 µs
            F.unix_micros("ts")
            + F.round(F.col("value") * F.lit(1000000.0), 0).cast("bigint")
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e >= F.col("s"), 0).otherwise(1),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("bigint").alias("covered_us"),
    )


@register(
    "ts7_seasonal_baseline",
    oracle="""
    SELECT event_type,
           CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(avg(value) AS DOUBLE), 6) AS mean_value,
           round(CAST(stddev_samp(value) AS DOUBLE), 6) AS sd_value
    FROM events GROUP BY event_type, date_part('hour', ts)
    """,
)
def ts7_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS7 — hour-of-day seasonal profile per event type (the
    seasonal-naive baseline anomaly detectors subtract before
    thresholding, and the capacity-planning heatmap's data): one
    map-side-combining aggregate over a 24×|types| key domain.
    Session timezone is pinned UTC by the loader, so both engines
    bucket identical hours."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
    )


@register(
    "ts8_daily_delta",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, n,
           n - lag(n) OVER w AS delta,
           round(CAST(n - lag(n) OVER w AS DOUBLE)
                 / lag(n) OVER w, 6) AS pct_change
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts8_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS8 — day-over-day volume deltas per event type (the ingest-
    health trend a pipeline alerts on): daily counts then a lag window
    over the tiny (type, day) aggregate — the corpus shuffles once for
    the count; the window sorts |types|×|days| rows, never raw events.
    First day per type has NULL delta on both engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    delta = F.col("n") - F.lag("n").over(w)
    return daily.select(
        "event_type", F.col("day").cast("string").alias("day"), "n",
        delta.alias("delta"),
        F.round(delta.cast("double") / F.lag("n").over(w), 6).alias("pct_change"),
    )


@register(
    "ts9_ewma",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           cents / 100.0 AS daily_value,
           (coalesce(lag(cents, 0) OVER w, 0) * 128
          + coalesce(lag(cents, 1) OVER w, 0) * 64
          + coalesce(lag(cents, 2) OVER w, 0) * 32
          + coalesce(lag(cents, 3) OVER w, 0) * 16
          + coalesce(lag(cents, 4) OVER w, 0) * 8
          + coalesce(lag(cents, 5) OVER w, 0) * 4
          + coalesce(lag(cents, 6) OVER w, 0) * 2
          + coalesce(lag(cents, 7) OVER w, 0)) / 12800.0 AS ewma
    FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)
    """,
)
def ts9_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS9 — exponentially-weighted moving activity per user: the
    8-term dyadic EWMA (weights 2^-k) over the user's observed daily
    value totals, the trend smoother behind per-entity activity
    scores. Every step is EXACT: daily totals quantize to integer
    cents (order-independent sums), the weighted sum runs entirely in
    INTEGER arithmetic (weights 2^(7-k), one final division by 12800),
    and the output double is the identical correctly-rounded quotient
    in every engine — deliberately NOT re-rounded to decimals: the
    values are exact multiples of 2^-7 cents, which sit on 6dp decimal
    ties for 1/8 of outputs, exactly where engines' decimal-rounding
    implementations disagree.

    Shape: the corpus shuffles once for the (user, day) aggregate; the
    lag window runs over the small daily table, partitioned per user —
    nothing single-partitions. Missing history (first days) treats
    absent lags as 0 on both engines.

    Output: (user_id, day, daily_value, ewma).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    terms = [
        F.coalesce(F.lag("cents", k).over(w), F.lit(0)) * F.lit(1 << (7 - k))
        for k in range(8)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return daily.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        (F.col("cents") / F.lit(100.0)).alias("daily_value"),
        (ewma / F.lit(12800.0)).alias("ewma"),
    )


@register(
    "ts10_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('week', ts) AS bar, ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, bar
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bar
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT user_id, strftime(bar, '%Y-%m-%d') AS bar,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY user_id, bar
    """,
)
def ts10_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS10 — weekly OHLC candlesticks per user over the event value
    stream. Engine: one struct-argmin groupBy (min_by/max_by on the
    (ts, event_id) order key — no window, no per-key sort,
    operators/timeseries.py::ohlc_bars); oracle: double row_number
    pick of the same first/last observations. Open/close/high/low are
    SELECTED doubles, never computed, so parity is bit-exact."""
    from faexport_db_spark.operators.timeseries import ohlc_bars

    ev = load_table(spark, sf_dir, "events")
    bars = ohlc_bars(ev, unit="week")
    return bars.select(
        "user_id",
        F.date_format("bar", "yyyy-MM-dd").alias("bar"),
        "open",
        "high",
        "low",
        "close",
        "n",
    )


@register(
    "ts11_cusum_flags",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(round(round(CAST(sum(value) AS DOUBLE), 2) * 100, 0)
               AS BIGINT) AS cents
      FROM events GROUP BY user_id, day
    ),
    m AS (
      SELECT user_id,
             CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
               AS mean_cents
      FROM daily GROUP BY user_id
    ),
    c AS (
      SELECT d.user_id, d.day, d.cents, m.mean_cents,
             CAST(sum(d.cents - m.mean_cents) OVER (
               PARTITION BY d.user_id ORDER BY d.day) AS BIGINT)
               AS cusum_cents
      FROM daily d JOIN m USING (user_id)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, cents, cusum_cents,
           abs(cusum_cents) > 2 * mean_cents AS flagged
    FROM c
    """,
)
def ts11_cusum_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS11 — CUSUM change-detection over per-user daily totals: the
    running sum of deviations from the user's mean day (all INTEGER
    cents — the ts9 dyadic-weight discipline: floats leave the
    pipeline at the daily rounding and never re-enter), flagged when
    drift exceeds 2 mean-days. A level shift shows as a sustained
    cusum ramp long before any single day trips a threshold — the
    pipeline-health signal ts4's pointwise z-score can't see. One
    (user, day) aggregate + a user-partitioned cumulative window on
    the daily table."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.round(F.sum("value"), 2) * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
    )
    # per-user mean as a WINDOW over the daily table, not a groupBy +
    # join: both windows share the user_id partitioning, so the whole
    # cusum costs two exchanges total (daily agg + one window
    # exchange) instead of four
    wu = Window.partitionBy("user_id")
    w = Window.partitionBy("user_id").orderBy("day")
    joined = (
        daily.withColumn("__sum", F.sum("cents").over(wu).cast("bigint"))
        .withColumn("__cnt", F.count(F.lit(1)).over(wu).cast("bigint"))
        # integer floor division — float division would round past 2^53
        .withColumn("mean_cents", F.expr("__sum DIV __cnt"))
        .withColumn(
            "cusum_cents",
            F.sum(F.col("cents") - F.col("mean_cents")).over(w).cast("bigint"),
        )
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "cusum_cents",
        (F.abs("cusum_cents") > 2 * F.col("mean_cents")).alias("flagged"),
    )


@register(
    "ts12_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             CAST(round(round(CAST(sum(value) AS DOUBLE), 2) * 100, 0)
               AS BIGINT) AS cents
      FROM events GROUP BY user_id, wk
    ),
    lagged AS (
      SELECT user_id, wk, cents,
             lag(cents) OVER (PARTITION BY user_id ORDER BY wk) AS prev
      FROM weekly
    )
    SELECT user_id, strftime(wk, '%Y-%m-%d') AS wk, cents, prev,
           CASE WHEN prev > 0 THEN (cents - prev) * 10000 // prev END
             AS growth_bp
    FROM lagged
    """,
)
def ts12_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS12 — week-over-week growth per user in integer basis points:
    weekly totals pinned to cents at aggregation (the ts9/ts11
    discipline — floats leave the pipeline once and never re-enter),
    lag + integer DIV growth. NULL growth for first weeks and
    zero-baseline weeks rather than a fake infinity. One (user, week)
    aggregate + one user-partitioned lag window."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).agg(
        F.round(F.round(F.sum("value"), 2) * 100, 0).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    return (
        weekly.withColumn("prev", F.lag("cents").over(w))
        .select(
            "user_id",
            F.date_format("wk", "yyyy-MM-dd").alias("wk"),
            "cents",
            "prev",
            F.when(
                F.col("prev") > 0,
                F.expr("(cents - prev) * 10000 DIV prev"),
            ).alias("growth_bp"),
        )
    )
