"""J1-J8 join operators (SURVEY.md §2.3).

All reference joins are equi-joins with broadcastable dims or
co-partitionable fact-fact keys; the Spark plans here broadcast every
dim explicitly and leave fact-fact joins to AQE (sort-merge or
shuffled-hash with skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "j1_fact_dim_left_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_brand, p.p_type
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def j1_fact_dim_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — fact ⟕ dim broadcast hash join (snapshots ⟕ contributors).

    Reference: models/submission.py:140-146. The dim side is broadcast:
    no shuffle of the fact table at any scale.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left"
    ).select("l_orderkey", "l_linenumber", "l_quantity", "p_brand", "p_type")


@register(
    "j2_fact_dim_left_join_users",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def j2_fact_dim_left_join_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — user_snapshots ⟕ contributors. Reference: models/user.py:78-87."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "left"
    ).select("event_id", "user_id", "c_name", "c_mktsegment")


@register(
    "j3_hash_search_chain",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, c.c_name, n.n_name
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_partkey = 10 AND l.l_returnflag = 'N'
    """,
)
def j3_hash_search_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the hash-search 4-way left-join chain with a selective
    two-column predicate on the driving table.

    Reference: models/submission.py:400-412 (file_hashes ⟕ files ⟕
    snapshots ⟕ contributors WHERE algo_id=? AND hash_value=?).
    Catalyst pushes the predicate below the joins, so only the few
    matching rows are joined — the reference needs a covering index
    for the same effect (schema/indexes.sql:21).
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_partkey") == 10) & (F.col("l_returnflag") == "N")
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left")
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select("l_orderkey", "l_linenumber", "o_orderdate", "c_name", "n_name")
    )


@register(
    "j4_orphan_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    """,
)
def j4_orphan_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — orphan detection: child rows whose parent is gone.

    Reference: scripts/cron/remove_duplicates.py:89-96,143-150,199-206
    (LEFT JOIN … WHERE right.id IS NULL). Spark's left_anti is the
    direct physical form.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j5_child_attach",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           coalesce(l.n_items, 0) AS n_items,
           coalesce(l.items_str, '') AS items_str
    FROM orders o LEFT JOIN (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
             string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS items_str
      FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
)
def j5_child_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — batch child-attach: nest children under parents in one join
    (replaces the reference's Python-side list-comprehension match).

    Reference: models/submission.py:154-168,416-431. Shuffle on the
    high-cardinality parent key only.
    """
    from faexport_db_spark.operators.partitioning import fan_out

    # Both single-file fixture scans arrive as ONE task; hash fan-out
    # by each side's join/group key spreads the heavy agg + SMJ sort
    # across cores and doubles as the exchange the agg/join needed
    # anyway (measured 1.46 s → 0.83 s at sf0.1; round-robin fan_out
    # was a LOSS here — its sort-before-repartition resorts 600k rows).
    orders = fan_out(load_table(spark, sf_dir, "orders"), by=["o_orderkey"])
    lineitem = fan_out(load_table(spark, sf_dir, "lineitem"), by=["l_orderkey"])
    children = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("l_linenumber"))).cast("array<string>"), ","
        ).alias("items_str"),
    )
    return orders.join(
        children, orders.o_orderkey == children.l_orderkey, "left"
    ).select(
        "o_orderkey",
        "o_orderdate",
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.coalesce("items_str", F.lit("")).alias("items_str"),
    )


@register(
    "j6_dim_dedup",
    oracle="""
    SELECT DISTINCT c.c_nationkey, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def j6_dim_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — the reference dedups dim objects in a Python dict while
    materializing rows (models/submission.py:161-164); in DataFrame
    form the join already carries dim columns, so the op reduces to a
    distinct over them."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_nationkey", "n_name")
        .distinct()
    )


@register(
    "j7_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def j7_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — semi-join form of the IN-list fetch (large id sets).

    Reference: models/file.py:118-124 (WHERE … IN %s) — at scale the
    literal list becomes a semi-join against the id set.
    """
    orders = load_table(spark, sf_dir, "orders")
    big_items = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey")
    )
    return orders.join(
        big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "j8_broadcast_enrichment",
    oracle="""
    SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_clicks, any_value(c.c_name) AS c_name
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'click'
    GROUP BY e.user_id
    """,
)
def j8_broadcast_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — broadcast-dict enrichment: the reference keeps a local
    username→user cache and joins rows against it in Python
    (scripts/ingest/fuzzysearch/user_lookup.py:86-99); Spark form is a
    broadcast join against the pre-resolved lookup table (S8 design
    note, SURVEY §7.4.6).
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    lookup = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        events.join(F.broadcast(lookup), events.user_id == F.col("c_custkey"), "left")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"), F.any_value("c_name").alias("c_name"))
    )


@register(
    "j9_asof_attribution",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT l.user_id, l.ts, l.event_id, l.purchase_value,
           r.ts AS asof_ts, r.click_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def j9_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — as-of join (operators/asof.py): each purchase attributed to
    the user's most recent at-or-before click. Spark has no native
    ASOF; the union-and-carry window implements it in ONE key-hash
    shuffle, and DuckDB's native ASOF LEFT JOIN is the oracle — an
    independent implementation of the full semantics (inclusive ties,
    unmatched → null). The right side pre-dedups (user_id, ts) with
    max_by(event_id) per the operator's determinism contract."""
    from faexport_db_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    return asof_join(purchases, clicks, on="user_id")


@register(
    "j10_interval_join",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts, event_type, value AS event_value
      FROM events WHERE event_type <> 'purchase'
    ),
    r AS (
      SELECT event_id AS purchase_id, user_id, ts AS win_start,
             ts + INTERVAL 1 HOUR AS win_end, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id, l.ts, l.event_type, l.event_value,
           r.purchase_id, r.win_start, r.win_end, r.purchase_value
    FROM l JOIN r ON l.user_id = r.user_id
                 AND r.win_start <= l.ts AND l.ts <= r.win_end
    """,
)
def j10_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — interval (range) join (operators/rangejoin.py): every
    non-purchase event inside a same-user 1-hour post-purchase window.
    Spark would plan the raw inequality as a per-key cartesian; the
    operator time-buckets both sides and equi-joins on (key, bin), so
    the oracle's plain range predicate checks the bucketing + exact
    filter reproduce the theta-join exactly (inclusive endpoints,
    bin-edge collisions filtered)."""
    from faexport_db_spark.operators.rangejoin import interval_join

    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type", F.col("value").alias("event_value")
    )
    right = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
        F.col("value").alias("purchase_value"),
    )
    return interval_join(
        left, right, on="user_id", left_ts="ts",
        right_start="win_start", right_end="win_end", bucket_width=3600,
    )


@register(
    "j11_salted_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    """,
)
def j11_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 — large×large equi-join through the hot-key salting
    operator (operators/partitioning.py::salted_join): the fact side
    is salted, the other side replicated, the join runs on
    (key, salt), and the result is EXACTLY the plain join — which is
    what the oracle checks. The salt changes only partition layout:
    the reference workload's one-dominant-website skew (SURVEY §4)
    turns a plain shuffle join into a single straggler task, and AQE's
    skew split only helps the sort-merge case after the fact; the
    salted form plans the spread a priori."""
    from faexport_db_spark.operators.partitioning import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "okey", n_salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
        )
    )


@register(
    "j12_fuzzy_join",
    oracle="""
    WITH names AS (
      SELECT n_nationkey AS id, n_name AS name FROM nation
      UNION ALL
      SELECT n_nationkey + 100,
             substr(n_name, 1, (n_nationkey % length(n_name)))
             || substr(n_name, (n_nationkey % length(n_name)) + 2)
      FROM nation
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON a.id < b.id AND levenshtein(a.name, b.name) <= 1
    """,
)
def j12_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — fuzzy self-join at edit distance ≤ 1 via SymSpell-style
    deletion neighborhoods: each name emits itself plus its 1-deletion
    variants (pure codegen transform), candidates come from an
    equi-join on the shared variant — complete for distance ≤ 1
    (equal → raw∩raw; substitution → del_i∩del_i; indel → raw∩del) —
    and an exact levenshtein verify kills the false positives the
    neighborhood admits (e.g. \'ab\'/\'ba\' share variants at distance
    2). The oracle is the quadratic theta join this equi-join shape
    replaces: at username/alias scale a levenshtein cross join is
    O(n²) string DP, while this shuffles (variant, id) pairs with
    bounded per-name fan-out (len+1). The mutated fixture copies
    guarantee real distance-1 matches."""
    from faexport_db_spark.operators.partitioning import fan_out

    n = load_table(spark, sf_dir, "nation")
    mutated = n.select(
        (F.col("n_nationkey") + 100).alias("id"),
        F.expr(
            "concat(substring(n_name, 1, n_nationkey % length(n_name)),"
            " substring(n_name, n_nationkey % length(n_name) + 2, 1000))"
        ).alias("name"),
    )
    names = n.select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    ).unionByName(mutated)
    dels = F.transform(
        F.sequence(F.lit(1), F.length("name")),
        lambda i: F.concat(
            F.col("name").substr(F.lit(1), i - F.lit(1)),
            F.col("name").substr(i + F.lit(1), F.lit(1000)),
        ),
    )
    variants = fan_out(names, by=["id"]).select(
        "id", "name",
        F.explode(F.array_union(F.array(F.col("name")), dels)).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist <= 1).select(
        "id_a", "id_b", dist.cast("bigint").alias("dist")
    )


@register(
    "j13_bloom_pruned_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(l.l_quantity) AS DOUBLE), 2) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderpriority
    """,
)
def j13_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 — selective-dim join with a runtime Bloom filter
    (operators/bloomjoin.py): the high-value orders subset folds into
    a broadcast bitmap that prunes lineitem MAP-SIDE before the
    shuffle join — at 100 TB the fact shuffle carries ~the matching
    1-2% plus the Bloom's false-positive tail instead of everything.
    No false negatives, so the oracle is simply the PLAIN join: the
    optimization must be invisible in the result."""
    from faexport_db_spark.operators.bloomjoin import bloom_pruned_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    joined = bloom_pruned_join(li, dim, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )
