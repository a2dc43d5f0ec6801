"""F1-F7 projection/filter/predicate operators (SURVEY.md §2.2).

Every reference read path is a SELECT with explicit columns and simple
predicates; in Spark all of these compile to a single parquet scan with
pushed filters + pruned columns (verify with .explain: PushedFilters /
ReadSchema). No shuffle in any F-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "f1_compound_key_filter",
    oracle="""
    SELECT event_id, ts, value FROM events
    WHERE user_id = 7 AND event_type = 'click'
    """,
)
def f1_compound_key_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — snapshots of one entity by compound key.

    Reference: models/submission.py:139-147 (website_id +
    site_submission_id equality).
    """
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("user_id") == 7) & (F.col("event_type") == "click"))
        .select("event_id", "ts", "value")
    )


@register(
    "f2_compound_key_filter_users",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_custkey = 5 AND o_orderstatus = 'O'
    """,
)
def f2_compound_key_filter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — the user-table variant of F1. Reference: models/user.py:78-87."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_custkey") == 5) & (F.col("o_orderstatus") == "O"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "f3_single_column_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def f3_single_column_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — all snapshots for one website. Reference: models/submission.py:369-377."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "f4_point_lookup",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey = 7",
)
def f4_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — point lookup by PK on a (broadcastable) dim table.

    Reference: models/website.py:58-70, models/archive_contributor.py:76-88.
    """
    return load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") == 7)


@register(
    "f5_in_list",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
    WHERE l_orderkey IN (1, 2, 3, 5, 8)
    """,
)
def f5_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — IN-list child fetch (batched, avoids N+1).

    Reference: models/file.py:118-124, models/keyword.py:87-97. Small
    literal lists stay a pushed-down scan filter; large id sets should
    use a left_semi broadcast join instead (see j7_semi_join).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isin(1, 2, 3, 5, 8))
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@register(
    "f6_skip_invalid_rows",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL AND lang <> ''
    """,
)
def f6_skip_invalid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — null/empty-row skip predicates used by every ingest job.

    Reference: scripts/ingest/fuzzysearch/main.py:79-80,
    ingest_formats/faexport.py:21-22, fa_indexer/main.py:132-133.
    """
    return (
        load_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & F.col("lang").isNotNull()
            & (F.col("lang") != "")
        )
        .select("doc_id", "lang")
    )


@register(
    "f7_projection",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
)
def f7_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — explicit projection; parquet reads exactly two columns
    (ReadSchema pruning). Reference: models/submission.py:140-143.
    """
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
