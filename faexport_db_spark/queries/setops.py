"""U1-U3 set operations (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "u1_upsert_returning",
    oracle="""
    SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT n_nationkey, 'NEW ' || n_name AS n_name FROM nation WHERE n_nationkey >= 10
    """,
)
def u1_upsert_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the INSERT … ON CONFLICT DO NOTHING RETURNING idiom
    (models/archive_contributor.py:43-57, models/file.py:293-310):
    existing rows win, only genuinely-new keys append. Spark form:
    incoming left_anti existing, union.
    """
    nation = load_table(spark, sf_dir, "nation")
    existing = nation.filter(F.col("n_nationkey") < 10).select("n_nationkey", "n_name")
    incoming = nation.select(
        "n_nationkey", F.concat(F.lit("NEW "), F.col("n_name")).alias("n_name")
    )
    new_rows = incoming.join(existing, "n_nationkey", "left_anti")
    return existing.unionByName(new_rows)


@register(
    "u2_intersection",
    oracle="""
    SELECT c_mktsegment FROM customer WHERE c_nationkey = 1
    INTERSECT
    SELECT c_mktsegment FROM customer WHERE c_nationkey = 2
    """,
)
def u2_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — set intersection (the clash check intersects hash-algo id
    sets, models/file.py:56-58)."""
    customer = load_table(spark, sf_dir, "customer")
    seg1 = customer.filter(F.col("c_nationkey") == 1).select("c_mktsegment")
    seg2 = customer.filter(F.col("c_nationkey") == 2).select("c_mktsegment")
    return seg1.intersect(seg2)


@register(
    "u3_union_frames",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'view'
    """,
)
def u3_union_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — concatenation of snapshot batches
    (ingest_formats/faexport.py:130 concatenates watcher snapshot
    lists)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("event_type") == "view")
    )


@register(
    "u4_except_all",
    oracle="""
    SELECT user_id, event_type FROM events
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE value > 100.0
    """,
)
def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — multiset difference (EXCEPT ALL): per-row multiplicity
    subtraction, the set op the dedup-audit queries need when "how
    many copies remain" matters (plain EXCEPT collapses to distinct
    and hides partial removals). Spark plans ``exceptAll`` as one
    count-aggregate per side + a generate — two exchanges, no
    sort-merge anti-join fan-out."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    high = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 100.0)
        .select("user_id", "event_type")
    )
    return ev.exceptAll(high)


@register(
    "u5_symmetric_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 0),
    b AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 0)
    SELECT 'only_a' AS side, o_orderkey, o_custkey
    FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT 'only_b', o_orderkey, o_custkey
    FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
)
def u5_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 — tagged symmetric difference of two snapshots: the
    two-sided reconciliation view (what's only in yesterday's load,
    what's only in today's) that v5's fingerprints POINT at — this op
    shows the actual rows. Two hash-keyed EXCEPTs sharing the same
    exchange key; each side tags its provenance so one frame carries
    the whole diff."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 0)
    only_a = a.exceptAll(b).select(
        F.lit("only_a").alias("side"), "o_orderkey", "o_custkey"
    )
    only_b = b.exceptAll(a).select(
        F.lit("only_b").alias("side"), "o_orderkey", "o_custkey"
    )
    return only_a.unionAll(only_b)
