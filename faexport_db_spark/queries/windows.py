"""W1-W4 row_number dedup windows (SURVEY.md §2.6) — the maintenance
job's duplicate-snapshot detection patterns.

Reference: scripts/cron/remove_duplicates.py. Tie-break direction
matters and differs by table (SURVEY §7.4.5): hashes/files keep the
HIGHEST surrogate id (107-124, 161-178), snapshot tables keep the
LOWEST (253-271, 290-307).

The generic engine-side implementation is
``maintenance.dedup.keep_one_per_key``; these entries demonstrate the
same window shapes on the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


def _keep_one(df: DataFrame, keys: list[str], order_col: str, keep: str) -> DataFrame:
    from faexport_db_spark.operators.partitioning import fan_out

    order = F.desc(order_col) if keep == "highest" else F.asc(order_col)
    w = Window.partitionBy(*keys).orderBy(order)
    # fan_out by the window keys: the single-file fixture scan arrives
    # as ONE task, so the pre-shuffle Sort+WindowGroupLimit pass ran
    # single-threaded over the whole table; hash fan-out on the window
    # keys both spreads that sort AND is the very exchange the Window
    # required (no-op on wide inputs at real scale).
    return (
        fan_out(df, by=keys)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "w1_dedup_keep_highest",
    oracle="""
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w1_dedup_keep_highest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — hash-row dedup: keep the highest id per (file_id, algo_id).

    Reference: scripts/cron/remove_duplicates.py:107-124.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")
    return _keep_one(ev, ["user_id", "event_type"], "event_id", "highest")


@register(
    "w2_dedup_files",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber DESC, l_partkey DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def w2_dedup_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — file-row dedup: keep highest id per (snapshot, site_file_id).

    Reference: scripts/cron/remove_duplicates.py:161-178. l_linenumber
    repeats within an order at larger SFs, so the window carries a
    second tiebreak column (the reference orders by a unique surrogate
    id, which needs no tiebreak).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_linenumber"), F.desc("l_partkey")
    )
    return (
        li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


@register(
    "w3_dedup_keep_lowest",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w3_dedup_keep_lowest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — submission-snapshot dedup keeps the LOWEST id (note the ASC
    vs W1/W2's DESC — SURVEY §7.4.5).

    Reference: scripts/cron/remove_duplicates.py:253-271.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    return _keep_one(ev, ["user_id", "event_type"], "event_id", "lowest")


@register(
    "w4_dedup_user_snapshots",
    oracle="""
    SELECT user_id, day, event_id FROM (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_id,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w4_dedup_user_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — user-snapshot dedup on (website, user, scan_datetime,
    contributor), keep lowest. Reference:
    scripts/cron/remove_duplicates.py:290-307.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_id"
    )
    return _keep_one(ev, ["user_id", "day"], "event_id", "lowest")


@register(
    "w5_topk_per_group",
    oracle="""
    SELECT user_id, event_id, value, CAST(rn AS INT) AS rnk FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def w5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — top-k rows PER GROUP (k=3 highest-value events per user),
    the per-entity leaderboard shape. One window pass; row_number
    (not rank) with an id tiebreak keeps the result deterministic.
    At scale the partition key is the group key, so skew = hottest
    group; for pathological groups the two-phase bucketed variant
    (training/pipeline.py group_cap) bounds partition width —
    this query demonstrates the direct form on a uniform key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "value")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "w6_percent_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def w6_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — relative standing within a partition: percent_rank +
    cume_dist of order value inside its priority class (the "is this
    order in the top decile of its class" primitive). One window sort
    per partition key; ties share a rank in both engines, so the
    result is deterministic without a tie-break column."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "w7_ntile_quartiles",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS INT)
             AS quartile
    FROM orders
    """,
)
def w7_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — equal-frequency binning: quartile of order value within
    its priority class via ntile(4). Both engines implement the SQL
    standard's remainder rule (first n%4 tiles get the extra row);
    the id tie-break pins a total order so the assignment is
    deterministic. One window sort per partition key — the same
    shuffle the percent_rank twin already pays."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
    )
