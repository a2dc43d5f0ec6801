"""O1-O5 sorts / limits / top-k / offsets (SURVEY.md §2.7).

Every ordered query carries a unique tiebreak column so results are
deterministic (the reference relies on storage order for ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "o1_sort_desc_recency",
    oracle="""
    SELECT event_id, user_id, ts FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def o1_sort_desc_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — newest-first ordering (models/submission.py:27-29). A
    global sort with a limit compiles to TakeOrderedAndProject: each
    partition keeps its top-100, no full sort."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@register(
    "o2_composite_sort",
    oracle="""
    SELECT p_partkey, p_size, p_brand FROM part
    ORDER BY p_size ASC, p_brand ASC, p_partkey ASC LIMIT 50
    """,
)
def o2_composite_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — composite (ordinal, keyword)-style sort
    (models/submission.py:83-86)."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_size", "p_brand")
        .orderBy("p_size", "p_brand", "p_partkey")
        .limit(50)
    )


@register(
    "o3_row_cap",
    oracle="SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 10",
)
def o3_row_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — export row caps (scripts/cron/dump_db.py:17-25). The
    reference caps at 10/100 rows because its per-row child fetch was
    'very slow'; the cap here is ordered so it's deterministic."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(10)
    )


@register(
    "o4_topk_by_count",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
    GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 3
    """,
)
def o4_topk_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — top-5-by-count report (e621_db_export/main.py:168-177)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(3)
    )


@register(
    "o5_offset_resume",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    ORDER BY event_id LIMIT 50 OFFSET 100
    """,
)
def o5_offset_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — skip-rows resume (ingestion_job.py:45-46,84-85): the
    reference re-reads a dump skipping already-ingested rows. Expressed
    with a row_number filter (works on any Spark version and makes the
    resume point explicit).

    Note: at scale the Spark-native answer is idempotent re-ingest +
    dedup (SURVEY §2.7 O5), not offsets; this exists for parity.
    """
    w = Window.orderBy("event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 150))
        .drop("rn")
    )


@register(
    "o6_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (DATE '1996-06-15', 1000)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 50
    """,
)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — keyset (seek) pagination: the scale-correct counterpart to
    O5's offset resume. The page anchor is a (date, key) tuple
    predicate, so the scan PRUNES to rows after the anchor (pushed
    filter on the leading column) and the sort-limit touches only
    candidate rows — where OFFSET must produce and discard every
    earlier row through a single-partition window, O(pages²) across a
    full crawl. Spark's TakeOrderedAndProject handles the global
    top-50 without materializing a total sort. The composite
    row-value comparison is expanded to its boolean form (Spark has
    no tuple <); anchor values are deterministic literals, the resume
    token a real crawler would carry."""
    d0, k0 = "1996-06-15", 1000
    o = load_table(spark, sf_dir, "orders")
    after_anchor = (F.col("o_orderdate") > F.lit(d0).cast("date")) | (
        (F.col("o_orderdate") == F.lit(d0).cast("date"))
        & (F.col("o_orderkey") > k0)
    )
    return (
        o.filter(after_anchor)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(50)
    )
