"""A1-A7 aggregation operators (SURVEY.md §2.4).

All aggregations get map-side partial combine for free from Catalyst;
counts/min/max never move raw rows across the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "a1_filtered_count",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def a1_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-key COUNT(*): the reference issues one filtered count
    per website/contributor (models/website.py:19-35,
    models/archive_contributor.py:13-29); the batch form is a single
    groupBy over all keys."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "a2_full_count",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
)
def a2_full_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — full table count (ingest row count cache,
    scripts/ingest/ingestion_job.py:19-22). Parquet row-group metadata
    answers this without reading data pages."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a3_distinct_projection",
    oracle="SELECT DISTINCT user_id FROM events",
)
def a3_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — DISTINCT projection (unique site ids per website,
    web.py:143-147, models/submission.py:193-200)."""
    return load_table(spark, sf_dir, "events").select("user_id").distinct()


@register(
    "a4_min_string_date",
    oracle="SELECT min(strftime(o_orderdate, '%Y-%m-%d')) AS earliest FROM orders",
)
def a4_min_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — MIN over ISO-formatted date strings (the reference scans its
    dump for the earliest updated_at as a string,
    scripts/ingest/fuzzysearch/main.py:58-65)."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("earliest"))
    )


@register(
    "a5_group_count_topk",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM part
    GROUP BY p_brand ORDER BY n DESC, p_brand ASC LIMIT 5
    """,
)
def a5_group_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — Counter.most_common(5): group-count + deterministic top-k
    (count desc, key asc tiebreak). Reference:
    scripts/ingest/e621_db_export/main.py:163-186."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(5)
    )


@register(
    "a6_count_per_group",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS snapshot_count
    FROM orders GROUP BY o_custkey
    """,
)
def a6_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — snapshot_count per entity (models/submission.py:111)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("snapshot_count"))
    )


@register(
    "a7_seen_set_dedup",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def a7_seen_set_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — the reference's in-memory ``seen_usernames`` set
    (scripts/ingest/fa_indexer/main.py:85-93) is a dropDuplicates —
    distributed, no driver-side state."""
    return load_table(spark, sf_dir, "documents").select("lang", "source").dropDuplicates()


@register(
    "a1s_salted_skew_count",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def a1s_salted_skew_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 variant through ``salted_agg`` — the two-phase skew-spreading
    aggregation demonstrated on a genuinely skewed key:
    ``o_orderstatus`` has 3 values with two of them holding ~49% of
    rows each (the reference's analog is ``website_id``, where one
    site dominates — SURVEY §4 skew note). Phase 1 groups by
    (key, salt) so a hot key's reduce state spreads over 16 reducers;
    phase 2 re-combines partials (count→sum, max→max). Results are
    EXACTLY the plain GROUP BY — the oracle checks that, and
    tests/test_partitioning.py pins the two-phase plan shape."""
    from faexport_db_spark.operators.partitioning import salted_agg

    return salted_agg(
        load_table(spark, sf_dir, "orders"),
        ["o_orderstatus"],
        {"n": ("count", "sum", "*"), "max_price": ("max", "max", "o_totalprice")},
    ).select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        F.col("max_price").cast("double").alias("max_price"),
    )


@register(
    "a8_grouped_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS p50,
           round(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 6) AS p90,
           round(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a8_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exact grouped quantiles via ``percentile`` (linear
    interpolation at index p·(n−1), the same continuous-quantile
    definition DuckDB's quantile_cont implements — checked value-exact,
    not approximately). Scale note: exact percentile buffers each
    group's values in the reduce state; this is fine for bounded-group
    reporting, while corpus-scale distributions should use the
    ``approx_percentile`` (t-digest) form whose plan is identical but
    whose values are estimator-dependent and therefore not
    oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_extendedprice", F.lit(p)), 6).alias(name)
            for p, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    )


@register(
    "a9_rollup_totals",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a9_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — hierarchical subtotals via ``rollup`` (GROUPING SETS):
    per-(flag, status), per-flag, and grand-total rows in ONE pass —
    Catalyst expands the sets into a single aggregate whose map-side
    partials are shared, where the naive form is three scans + a
    union. Subtotal rows carry NULL group keys exactly like SQL
    ROLLUP, which the DuckDB oracle checks value-for-value."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    )


@register(
    "a10_pivot_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def a10_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — pivot to a per-user event-type count matrix. The value
    list is EXPLICIT (the five fixture types): without it Spark runs an
    extra distinct scan to discover columns, and at scale an unbounded
    category domain would explode the schema — pivots at 100 TB must
    pin their columns. One aggregate pass; absent combinations
    back-fill 0 like the oracle's FILTER form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "a11_cube_matrix",
    oracle="""
    WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value FROM events)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
    FROM e GROUP BY CUBE (event_type, day)
    """,
)
def a11_cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — full CUBE over (event_type, day): every marginal — per
    cell, per type, per day, grand total — in ONE aggregate pass.
    Like ``rollup`` (A9) this compiles to GROUPING SETS inside a
    single Expand + aggregate, sharing map-side partials across all
    2^k set combinations instead of 4 scans + union; at 100 TB the
    Expand multiplies rows 4x BEFORE the exchange, so the map-side
    combine is what keeps the shuffle proportional to group count,
    not input size."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "a12_histogram",
    oracle="""
    WITH stats AS (
      SELECT min(l_extendedprice) AS lo,
             (max(l_extendedprice) - min(l_extendedprice)) / 10.0 AS w
      FROM lineitem
    )
    SELECT CAST(least(CAST(floor((l_extendedprice - lo) / w) AS INT), 9) AS INT)
             AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem, stats
    GROUP BY 1
    """,
)
def a12_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — 10-bin equi-width histogram of l_extendedprice: global
    min/width come from one stats aggregate broadcast back as a 1-row
    frame (the sketch_bounds pattern — never a driver collect), then
    the binning is a pure expression into a 10-group aggregate whose
    map-side combine reduces each partition to <=10 rows before the
    exchange. The top edge folds into bin 9 (least), matching the
    oracle exactly because both engines run the identical IEEE double
    ops."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"),
        ((F.max("l_extendedprice") - F.min("l_extendedprice")) / 10.0).alias("w"),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("l_extendedprice") - F.col("lo")) / F.col("w")).cast(
                    "int"
                ),
                F.lit(9),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "a13_approx_quantile_checked",
    oracle="""
    SELECT event_type,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS exact_p50,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def a13_approx_quantile_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — sketch-based median with a verified error bound: Spark's
    approx_percentile (KLL/GK-style mergeable sketch — the only way a
    quantile is computed at 100 TB, where exact percentile means a
    per-group sort) must land between the exact p45 and p55. The
    sketch value itself is merge-order-dependent, so the driver-checked
    contract is the BOUND, not the estimate — same pattern as
    t_sketch_bounds. The exact p50 rides along, value-checked against
    quantile_cont."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        (
            F.expr("approx_percentile(value, 0.5, 100)")
            .between(
                F.expr("percentile(value, 0.45)"),
                F.expr("percentile(value, 0.55)"),
            )
        ).alias("within_bound"),
    )


@register(
    "a14_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def a14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — explicit GROUPING SETS with grouping-id disambiguation:
    detail, per-flag subtotal and grand total in ONE pass. Catalyst
    compiles grouping sets to a single Expand + hash aggregate — one
    scan, one shuffle — where a union-of-aggregates formulation would
    scan the fact table once per set; grouping_id() (leftmost column =
    most significant bit, the SQL-standard encoding DuckDB shares)
    distinguishes a genuine NULL group key from a rolled-up one."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__a14_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM __a14_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@register(
    "a15_approx_distinct_checked",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
           TRUE AS within_bound
    FROM orders GROUP BY o_orderstatus
    """,
)
def a15_approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — HyperLogLog distinct-count with a verified error bound:
    approx_count_distinct (HLL++, the only way COUNT DISTINCT is
    computed at 100 TB — a mergeable fixed-size sketch instead of a
    shuffle of every distinct value) must land within 5× its
    configured 2% rsd of the exact count. Like a13/t_sketch_bounds,
    the driver-checked contract is the BOUND (the estimate itself is
    merge-order-dependent); the exact count rides along value-checked."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_nd"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02)
                - F.countDistinct("o_custkey")
            )
            <= F.greatest(
                F.countDistinct("o_custkey") * 0.10, F.lit(5.0)
            )
        ).alias("within_bound"),
    )


@register(
    "a16_mad",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS med
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(m.med, 6) AS median_price,
           round(CAST(quantile_cont(abs(l.l_extendedprice - m.med), 0.5)
                      AS DOUBLE), 6) AS mad
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag, m.med
    """,
)
def a16_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — median absolute deviation per group: the robust spread
    statistic (σ estimated as 1.4826·MAD survives the outliers that
    wreck stddev). Two exact-percentile passes: per-group medians
    (group-cardinality-sized, broadcast back — the corpus is never
    re-shuffled for the join), then the median of absolute deviations.
    Exact percentile buffers per-group values; at corpus scale swap
    approx_percentile into the same plan."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    joined = li.join(F.broadcast(med), "l_returnflag")
    return (
        joined.groupBy("l_returnflag", "med")
        .agg(
            F.percentile(
                F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)
            ).alias("mad_raw")
        )
        .select(
            "l_returnflag",
            F.round("med", 6).alias("median_price"),
            F.round("mad_raw", 6).alias("mad"),
        )
    )
