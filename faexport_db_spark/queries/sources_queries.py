"""S1-S8 sources and K1-K4 sinks (SURVEY.md §2.1) on the driver
harness: each entry round-trips fixture data through the real
reader/writer (CSV, JSON dir, SQLite, parquet append, JSONL) in a
fresh temp dir, with the oracle reading the original parquet — so a
format-fidelity bug (quoting, escaping, schema drift) shows up as a
value mismatch, not just a crash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"faexport_spark_{prefix}_")


@register(
    "s1_csv_scan_positional",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s1_csv_scan_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — headerless positional CSV scan with an explicit schema
    (e621 dump shape, e621_db_export/main.py:125-130). Fixture data is
    staged out as CSV and read back through the production reader."""
    out = _tmp("s1")
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").option("header", "false").csv(out)
    return spark.read.csv(out, schema="r_regionkey int, r_name string", header=False)


@register(
    "s2_csv_scan_header",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def s2_csv_scan_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — DictReader-style CSV (header row names columns;
    fuzzysearch/main.py:188-192)."""
    out = _tmp("s2")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", "true"
    ).csv(out)
    return spark.read.csv(
        out, schema="n_nationkey int, n_name string, n_regionkey int", header=True
    )


@register(
    "s3_json_dir_scan",
    oracle="SELECT n_nationkey, n_name FROM nation",
)
def s3_json_dir_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — recursive JSON-directory scan (fa_indexer/main.py:128-135):
    nested subdirectories of JSON files, recursiveFileLookup read."""
    out = _tmp("s3")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.filter(F.col("n_nationkey") < 10).write.mode("overwrite").json(f"{out}/a/x")
    nation.filter(F.col("n_nationkey") >= 10).write.mode("overwrite").json(f"{out}/b/y/z")
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema("n_nationkey int, n_name string")
        .json(out)
    )


@register(
    "s4_sqlite_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s4_sqlite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — SQLite table scan (findfurrypicbot/main.py:64-69) via the
    streaming convert-to-parquet path (ingest/findfurrypicbot.py):
    chunked cursor → incremental parquet row groups → distributed scan.
    The scan Spark executes is a plain parquet read — no driver-side
    createDataFrame of the table."""
    import sqlite3

    from faexport_db_spark.ingest.findfurrypicbot import sqlite_to_parquet

    work = _tmp("s4")
    db_path = os.path.join(work, "fixture.sqlite")
    rows = [(r["r_regionkey"], r["r_name"]) for r in load_table(spark, sf_dir, "region").collect()]
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE region (r_regionkey INTEGER, r_name TEXT)")
    con.executemany("INSERT INTO region VALUES (?, ?)", rows)
    con.commit()
    con.close()

    import pyarrow as pa

    path = sqlite_to_parquet(
        db_path, os.path.join(work, "pq"),
        query="SELECT r_regionkey, r_name FROM region", batch_rows=2,
        arrow_schema=pa.schema([("r_regionkey", pa.int64()), ("r_name", pa.string())]),
    )
    return (
        spark.read.parquet(path)
        .select(F.col("r_regionkey").cast("int"), F.col("r_name"))
    )


@register(
    "s5_streaming_cursor_scan",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def s5_streaming_cursor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — the reference streams large results through a server-side
    cursor at 5000 rows/fetch (db.py:77-89); the Spark equivalent is
    simply a partition-parallel scan — no driver bottleneck at all."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "s6_point_select",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_suppkey = 3",
)
def s6_point_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — point select (db.py:58-75): pushed-down PK filter."""
    return (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") == 3)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "s7_http_push_parse",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type AS format_name
    FROM events WHERE event_type IN ('click', 'view')
    """,
)
def s7_http_push_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — HTTP push-ingest body parsing (web.py:156-169): raw JSON
    payload strings → format adapter expressions. events.props plays
    the POST body; the streaming micro-batch wrapper lives in
    streaming/ingest_stream.py."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.col("event_type").alias("format_name"),
        )
    )


@register(
    "s8_preresolved_lookup_join",
    oracle="""
    SELECT DISTINCT e.user_id, c.c_name AS resolved_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'signup'
    """,
)
def s8_preresolved_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — the rate-limited external REST lookup
    (fuzzysearch/user_lookup.py:79-126) stays OUTSIDE the engine
    (SURVEY §7.4.6): the resolved results become a broadcast lookup
    table joined J8-style. This entry demonstrates that composition."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    lookup = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("resolved_name")
    )
    return events.join(F.broadcast(lookup), "user_id").select(
        "user_id", "resolved_name"
    ).distinct()


@register(
    "k1_bulk_append_sink",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def k1_bulk_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 — bulk insert sink (db.py:102-127's chunked multi-VALUES →
    a single distributed parquet append). Writes the table out, reads
    it back, aggregates — so write-path fidelity is value-checked."""
    out = _tmp("k1")
    load_table(spark, sf_dir, "lineitem").write.mode("append").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "k2_microbatch_sink",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM events",
)
def k2_microbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — micro-batch buffered appends (ingestion_job.py:42-43,
    78-115: flush every 1000 rows / 60s). Batch restatement: successive
    appends of slices land in one consistent table; the true streaming
    trigger lives in streaming/ingest_stream.py (tested there)."""
    out = _tmp("k2")
    events = load_table(spark, sf_dir, "events")
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(out)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(out)
    return spark.read.parquet(out).agg(F.count(F.lit(1)).alias("n"))


@register(
    "k3_jsonl_export",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
)
def k3_jsonl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 — JSONL dump (scripts/cron/dump_db.py:13-42). The reference
    capped exports at 10/100 rows because its per-row child fetch was
    'very slow' (dump_db.py:21); the distributed write needs no cap —
    full table out, full table back."""
    out = _tmp("k3")
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").json(out)
    return spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(out)


@register(
    "k4_delete_rewrite",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    """,
)
def k4_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — chunked DELETE (remove_duplicates.py:61-84) as a
    rewrite-with-anti-join: survivors = table ⟂ ids-to-delete. The id
    set here is 'lineitems of finished orders'."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    doomed = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return lineitem.join(doomed, "l_orderkey", "left_anti").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "v1_validation_report",
    oracle="""
    SELECT 'quantity_out_of_range' AS rule,
           CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'negative_price', CAST(count(*) FILTER (l_extendedprice < 0) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'bad_flag', CAST(count(*) FILTER (l_returnflag NOT IN ('A','N','R')) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'null_shipdate', CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT) FROM lineitem
    """,
)
def v1_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation mode as one aggregation pass (ingest/base.py
    ``validation_report``): the reference asserts per row and dies on
    the first violation (ingestion_job.py:117-122, e621 rules
    main.py:99-123); the engine counts every rule in one job."""
    from faexport_db_spark.ingest.base import validation_report

    li = load_table(spark, sf_dir, "lineitem")
    return validation_report(
        li,
        {
            "quantity_out_of_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "negative_price": F.col("l_extendedprice") < 0,
            "bad_flag": ~F.col("l_returnflag").isin("A", "N", "R"),
            "null_shipdate": F.col("l_shipdate").isNull(),
        },
    )


def _zvalue_oracle(bits: int = 8) -> str:
    """Generate the DuckDB replica of z_value over events(user_id,
    value): equal-width buckets from in-query min/max, then the Morton
    interleave expanded as explicit shift/mask arithmetic — the same
    closed-form integer expression the Spark side compiles."""
    n = 1 << bits
    interleave = " + ".join(
        f"(((b{c} >> {i}) & 1) << {i * 2 + c})"
        for i in range(bits)
        for c in (0, 1)
    )

    def bucket(expr: str, lo: str, hi: str) -> str:
        return (
            f"LEAST(GREATEST(CAST(FLOOR((CAST({expr} AS DOUBLE) - {lo}) "
            f"/ ({hi} - {lo}) * {n}) AS BIGINT), 0), {n - 1})"
        )

    return f"""
    WITH stats AS (
      SELECT CAST(min(user_id) AS DOUBLE) AS lo0, CAST(max(user_id) AS DOUBLE) AS hi0,
             CAST(min(value) AS DOUBLE) AS lo1, CAST(max(value) AS DOUBLE) AS hi1
      FROM events
    ),
    b AS (
      SELECT event_id,
             {bucket("user_id", "lo0", "hi0")} AS b0,
             {bucket("value", "lo1", "hi1")} AS b1
      FROM events, stats
    )
    SELECT event_id, CAST({interleave} AS BIGINT) AS zval FROM b
    """


@register("k5_zorder_curve", oracle=_zvalue_oracle())
def k5_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 — the z-order curve value behind ``zorder_write``
    (operators/zorder.py): events mapped onto the Morton interleave of
    equal-width-bucketed (user_id, value). The oracle regenerates the
    identical shift/mask arithmetic in SQL, pinning quantization edges
    (clamp, floor, null→0) and bit placement — layout correctness is
    exactly this expression; the file-locality effect is asserted in
    tests/test_zorder.py against an unordered write."""
    from faexport_db_spark.operators.zorder import z_value

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.min("user_id").cast("double").alias("lo0"),
        F.max("user_id").cast("double").alias("hi0"),
        F.min("value").cast("double").alias("lo1"),
        F.max("value").cast("double").alias("hi1"),
    ).collect()[0]
    z = z_value(
        [
            (F.col("user_id"), row["lo0"], row["hi0"]),
            (F.col("value"), row["lo1"], row["hi1"]),
        ],
        bits=8,
    )
    return ev.select("event_id", z.alias("zval"))


@register(
    "s9_orc_roundtrip",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(value) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def s9_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — ORC format adapter: write the events table as ORC, read
    it back through the vectorized ORC reader, aggregate. ORC is the
    second columnar format Spark ships natively (predicate pushdown,
    column pruning and vectorized decode all apply, same as parquet);
    interchange with Hive-era warehouses is read/write-symmetric.
    Value-checking the aggregate pins the whole write-read path —
    timestamp/decimal round-trip included."""
    out = _tmp("s9")
    load_table(spark, sf_dir, "events").write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "k6_partitioned_sink",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def k6_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — hive-partitioned sink + partition-pruned scan: events
    land as event_type= directories; the reader's IN-filter prunes to
    2 of 5 partitions BEFORE any IO (asserted on the physical plan in
    tests/test_plans.py). This is the layout contract every persisted
    index in this engine builds on (band_idx=/tbl=/cid= dirs): at
    100 TB the difference between scanning 2/5 and 5/5 partitions IS
    the query budget."""
    out = _tmp("k6")
    load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "k7_time_travel_diff",
    oracle="""
    WITH v1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
    v2 AS (SELECT o_orderkey FROM orders
           WHERE o_orderkey % 3 = 0 OR o_orderkey % 3 = 1)
    SELECT CAST((SELECT count(*) FROM v1) AS BIGINT) AS n_v1,
           CAST((SELECT count(*) FROM v2) AS BIGINT) AS n_v2,
           CAST((SELECT count(*) FROM v2
                 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v1))
                AS BIGINT) AS n_added
    """,
)
def k7_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 — versioned time travel through ManifestParquetFormat: two
    appends produce manifests v1/v2; reading both versions and
    diffing answers "what did this commit add" — the change-data-feed
    question — from IMMUTABLE manifests alone, no log replay. The
    oracle derives both versions from the orders table, value-checking
    the whole commit/manifest/resolve path (counts + anti-join
    diff)."""
    from faexport_db_spark.datamodel.table_format import ManifestParquetFormat

    fmt = ManifestParquetFormat()
    out = _tmp("k7")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    fmt.append(orders.filter(F.col("o_orderkey") % 3 == 0), out)
    fmt.append(orders.filter(F.col("o_orderkey") % 3 == 1), out)
    v1 = fmt.read(spark, out, version=1)
    v2 = fmt.read(spark, out, version=2)
    added = v2.join(v1, "o_orderkey", "left_anti")
    return (
        v1.agg(F.count(F.lit(1)).alias("n_v1"))
        .crossJoin(v2.agg(F.count(F.lit(1)).alias("n_v2")))
        .crossJoin(added.agg(F.count(F.lit(1)).alias("n_added")))
    )


@register(
    "v2_column_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT), NULL, NULL
    FROM orders
    """,
)
def v2_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 — one-pass column profiler (the DQ report a pipeline runs
    on every new drop before trusting it): per column null count,
    distinct count, numeric min/max. ONE aggregate over the table
    computes every statistic (Catalyst plans the multi-distinct via
    expand — still a single scan), then a constant-width stack pivots
    the 1-row result to one row per column; the stack input is
    1×(4·ncols), so the pivot is free at any scale."""
    o = load_table(spark, sf_dir, "orders")
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = []
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    one = o.agg(*aggs)
    stack_args = []
    for c in cols:
        mn = f"mn_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{c}', nn_{c}, nd_{c}, {mn}, {mx}")
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (col_name, n_nulls, n_distinct, min_num, max_num)"
        )
    )


@register(
    "v3_referential_orphans",
    oracle="""
    SELECT 'orders->customer' AS relationship,
           CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 10 <> 3
    )
    UNION ALL
    SELECT 'lineitem->orders',
           CAST(count(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey % 7 <> 2
    )
    UNION ALL
    SELECT 'supplier->nation',
           CAST(count(*) AS BIGINT)
    FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey
    )
    """,
)
def v3_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 — referential-integrity audit: per-relationship orphan counts
    via LEFT ANTI joins (the validate/investigate mode of the
    reference's ingest pipelines, lifted to a standing cross-table
    report — its per-row existence checks become three set-level
    anti-joins). Two parents are deterministically broken (customers
    ending in 3 dropped, every 7th-congruent order dropped) so the
    counts are non-trivial; the intact supplier->nation row pins the
    zero case. Anti-joins shuffle only the key columns; the small
    parents broadcast."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 != 3
    ).select(F.col("c_custkey").alias("k"))
    orders = load_table(spark, sf_dir, "orders")
    ordk = orders.filter(F.col("o_orderkey") % 7 != 2).select(
        F.col("o_orderkey").alias("k")
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")

    def orphans(child, key, parent, name):
        return (
            child.select(F.col(key).alias("k"))
            .join(parent, "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    return (
        orphans(orders, "o_custkey", cust, "orders->customer")
        .unionByName(orphans(li, "l_orderkey", ordk, "lineitem->orders"))
        .unionByName(orphans(sup, "s_nationkey", nat, "supplier->nation"))
    )


@register(
    "k8_bucketed_join",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_nationkey
    """,
)
def k8_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 — bucketed co-located join: both tables are written
    ``bucketBy(custkey)`` + sorted (Spark's saveAsTable bucket layout),
    so the fact-dim join consumes bucket-aligned files and plans with
    NO Exchange on either side (asserted in tests/test_plans.py) — the
    canonical way to pre-pay a 100 TB join's shuffle once at write
    time and amortize it over every later query. The aggregate reuses
    the same clustering. Bucket count is small here (fixture scale);
    at cluster scale it is sized so each bucket ≈ one task's memory."""
    import hashlib

    # deterministic per-fixture names + overwrite: repeat runs REUSE
    # the two warehouse tables instead of accumulating uuid-named junk
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_orders, t_cust = f"k8_orders_{tag}", f"k8_customer_{tag}"
    # The in-memory catalog dies with each session but the warehouse
    # DIRECTORY persists, and saveAsTable refuses a managed-table
    # location that exists without a catalog entry
    # (LOCATION_ALREADY_EXISTS) — drop both layers before writing.
    from faexport_db_spark.operators.hadoop_fs import HadoopFs

    wh = spark.conf.get("spark.sql.warehouse.dir")
    for t in (t_orders, t_cust):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        HadoopFs(spark, wh).delete(f"{wh.rstrip('/')}/{t}", recursive=True)
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .saveAsTable(t_orders)
    )
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .format("parquet")
        .saveAsTable(t_cust)
    )
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])
    # grouping by the BUCKET key keeps the aggregate inside the
    # bucket-aligned partitioning too: the entire query plans with
    # zero Exchange nodes (plan-asserted)
    return joined.groupBy("c_custkey", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "v4_profile_drift",
    oracle="""
    WITH s AS (SELECT *, event_id % 2 = 0 AS sa FROM events),
    t AS (
      SELECT CAST(count(*) FILTER (WHERE sa) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (WHERE NOT sa) AS BIGINT) AS n_b,
             CAST(count(*) FILTER (WHERE sa AND user_id IS NULL) AS BIGINT) AS nna_user_id,
             CAST(count(*) FILTER (WHERE NOT sa AND user_id IS NULL) AS BIGINT) AS nnb_user_id,
             CAST(count(DISTINCT CASE WHEN sa THEN user_id END) AS BIGINT) AS nda_user_id,
             CAST(count(DISTINCT CASE WHEN NOT sa THEN user_id END) AS BIGINT) AS ndb_user_id,
             CAST(count(*) FILTER (WHERE sa AND event_type IS NULL) AS BIGINT) AS nna_event_type,
             CAST(count(*) FILTER (WHERE NOT sa AND event_type IS NULL) AS BIGINT) AS nnb_event_type,
             CAST(count(DISTINCT CASE WHEN sa THEN event_type END) AS BIGINT) AS nda_event_type,
             CAST(count(DISTINCT CASE WHEN NOT sa THEN event_type END) AS BIGINT) AS ndb_event_type,
             CAST(count(*) FILTER (WHERE sa AND value IS NULL) AS BIGINT) AS nna_value,
             CAST(count(*) FILTER (WHERE NOT sa AND value IS NULL) AS BIGINT) AS nnb_value,
             CAST(count(DISTINCT CASE WHEN sa THEN value END) AS BIGINT) AS nda_value,
             CAST(count(DISTINCT CASE WHEN NOT sa THEN value END) AS BIGINT) AS ndb_value
      FROM s
    ),
    rows_out AS (
      SELECT 'user_id' AS col_name, n_a, n_b,
             nna_user_id AS n_nulls_a, nnb_user_id AS n_nulls_b,
             nda_user_id AS n_distinct_a, ndb_user_id AS n_distinct_b
      FROM t
      UNION ALL
      SELECT 'event_type', n_a, n_b, nna_event_type, nnb_event_type,
             nda_event_type, ndb_event_type FROM t
      UNION ALL
      SELECT 'value', n_a, n_b, nna_value, nnb_value, nda_value, ndb_value
      FROM t
    )
    SELECT col_name, n_a, n_b, n_nulls_a, n_nulls_b, n_distinct_a, n_distinct_b,
           round(CAST(n_nulls_b AS DOUBLE) / n_b
                 - CAST(n_nulls_a AS DOUBLE) / n_a, 6) AS null_rate_delta,
           round(CAST(n_distinct_b AS DOUBLE) / n_distinct_a, 6) AS distinct_ratio
    FROM rows_out
    """,
)
def v4_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 — snapshot-drift report: per-column null-rate delta and
    distinct-count ratio between two slices of a table (the check a
    pipeline runs between yesterday's drop and today's before
    trusting a schema-compatible-but-different feed). The fixture
    splits events by id parity — stand-in for two snapshot paths;
    the shape is what matters: ONE aggregate computes both sides'
    statistics via conditional aggregation (no self-join, no second
    scan), then a constant-width stack pivots the 1-row result to a
    row per column, so drift costs exactly one table pass at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    sa = F.col("event_id") % 2 == 0
    cols = ["user_id", "event_type", "value"]
    aggs = [
        F.count(F.when(sa, 1)).alias("n_a"),
        F.count(F.when(~sa, 1)).alias("n_b"),
    ]
    for c in cols:
        aggs.append(F.count(F.when(sa & F.col(c).isNull(), 1)).alias(f"nna_{c}"))
        aggs.append(F.count(F.when(~sa & F.col(c).isNull(), 1)).alias(f"nnb_{c}"))
        aggs.append(F.count_distinct(F.when(sa, F.col(c))).alias(f"nda_{c}"))
        aggs.append(F.count_distinct(F.when(~sa, F.col(c))).alias(f"ndb_{c}"))
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nna_{c}, nnb_{c}, nda_{c}, ndb_{c}" for c in cols
    )
    stacked = one.select(
        "n_a",
        "n_b",
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col_name, n_nulls_a, n_nulls_b, n_distinct_a, n_distinct_b)"
        ),
    )
    return stacked.select(
        "col_name",
        "n_a",
        "n_b",
        "n_nulls_a",
        "n_nulls_b",
        "n_distinct_a",
        "n_distinct_b",
        F.round(
            F.col("n_nulls_b").cast("double") / F.col("n_b")
            - F.col("n_nulls_a").cast("double") / F.col("n_a"),
            6,
        ).alias("null_rate_delta"),
        F.round(
            F.col("n_distinct_b").cast("double") / F.col("n_distinct_a"), 6
        ).alias("distinct_ratio"),
    )


@register(
    "v5_table_fingerprint",
    oracle="""
    WITH h AS (
      SELECT c_nationkey,
             CAST(('0x' || substr(md5(
               coalesce(CAST(c_custkey AS VARCHAR), chr(1)) || '|'
               || coalesce(c_name, chr(1)) || '|'
               || coalesce(CAST(c_nationkey AS VARCHAR), chr(1)) || '|'
               || coalesce(CAST(CAST(floor(c_acctbal * 100) AS BIGINT)
                                AS VARCHAR), chr(1))
               || '|' || coalesce(c_mktsegment, chr(1))), 1, 12))
               AS BIGINT) AS rh
      FROM customer
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(rh) AS BIGINT) AS xor_sig,
           CAST(sum(rh % 1000003) AS BIGINT) AS modsum_sig
    FROM h GROUP BY c_nationkey
    """,
)
def v5_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 — order-insensitive per-partition table fingerprint: each
    row canonicalized to a delimited string (doubles pinned to integer
    cents — engine float formatting never enters), md5 -> 48-bit
    integer, folded two ways per nation group: XOR (48-bit, detects
    any single-row change) and a mod-prime SUM (detects the
    duplicate-pair flips XOR cancels; the 1e6 modulus keeps the
    accumulator exact past 10^12 rows/group). The cross-system
    reconciliation primitive — fingerprint source and replica
    independently, diff two tiny group tables instead of the data;
    both folds are commutative so the check is partitioning- and
    engine-independent. One map-side-combining groupBy, no joins."""
    c = load_table(spark, sf_dir, "customer")
    # NULL canonicalizes to an explicit \x01 sentinel (concat_ws would
    # silently collapse NULL to '', making ('a', NULL) == ('a', ''))
    nul = F.lit("\x01")
    row_str = F.concat_ws(
        "|",
        F.coalesce(F.col("c_custkey").cast("string"), nul),
        F.coalesce(F.col("c_name"), nul),
        F.coalesce(F.col("c_nationkey").cast("string"), nul),
        F.coalesce(
            F.floor(F.col("c_acctbal") * 100).cast("bigint").cast("string"), nul
        ),
        F.coalesce(F.col("c_mktsegment"), nul),
    )
    rh = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast("bigint")
    return (
        c.select("c_nationkey", rh.alias("rh"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("CAST(bit_xor(rh) AS BIGINT)").alias("xor_sig"),
            F.sum(F.col("rh") % 1000003).cast("bigint").alias("modsum_sig"),
        )
    )


@register(
    "k9_compaction_bins",
    oracle="""
    WITH c AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY ship_month
    ),
    p AS (
      SELECT ship_month, n_rows,
             coalesce(CAST(sum(n_rows) OVER (
               ORDER BY ship_month
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS bin_start_row
      FROM c
    )
    SELECT ship_month, n_rows,
           bin_start_row // 5000 AS bin_id,
           bin_start_row
    FROM p
    """,
)
def k9_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 — contiguous compaction-bin planner: pack consecutive
    ship-months into ~5000-row rewrite bins via a prefix sum over
    GROUP counts (maintenance/compaction.py::bin_rows — the
    data-level sibling of the byte-packing plan_compaction).
    Contiguity preserves partition-prune ranges in the rewritten
    layout; the single-partition window touches only month-cardinality
    planner rows. The whole plan replays in SQL."""
    from faexport_db_spark.maintenance.compaction import bin_rows

    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    )
    return bin_rows(li, "ship_month", target_rows=5000)


@register(
    "k10_partition_skew_report",
    oracle="""
    WITH b AS (
      SELECT l_suppkey % 64 AS bucket, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY bucket
    ),
    t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
                 CAST(max(n_rows) AS BIGINT) AS max_n,
                 CAST(count(*) AS BIGINT) AS k FROM b)
    SELECT b.bucket, b.n_rows,
           b.n_rows * 10000 // t.total AS share_bp,
           t.max_n * t.k * 100 // t.total AS skew_pct_x100
    FROM b, t
    """,
)
def k10_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 — partition-skew diagnosis: per shuffle-bucket row counts
    with basis-point shares and the global skew factor
    (max/mean, x100 integer) — the table that says WHEN the salting
    paths (a1s, j11) and AQE skew-join are worth their overhead.
    One map-side aggregate over the fact table; stats broadcast;
    all-integer."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy((F.col("l_suppkey") % 64).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    t = b.agg(
        F.sum("n_rows").cast("bigint").alias("total"),
        F.max("n_rows").cast("bigint").alias("max_n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return b.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_rows",
        F.expr("n_rows * 10000 DIV total").alias("share_bp"),
        F.expr("max_n * k * 100 DIV total").alias("skew_pct_x100"),
    )
