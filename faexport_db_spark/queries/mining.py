"""Pattern-mining queries (X1+): co-occurrence / association-rule
shapes over the event stream — "users who do A also do B", the
market-basket question asked of any interaction log (and of training
corpora: which quality flags co-fire, which sources share users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faexport_db_spark.datamodel.testdata import load_table
from faexport_db_spark.queries.registry import register


@register(
    "x1_assoc_rules",
    oracle="""
    WITH ue AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users FROM ue),
    singles AS (
      SELECT event_type, count(*) AS n_a FROM ue GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS ante, b.event_type AS conseq, count(*) AS n_ab
      FROM ue a JOIN ue b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.conseq,
           round(p.n_ab / n.n_users, 6) AS support,
           round(p.n_ab / CAST(sa.n_a AS DOUBLE), 6) AS confidence,
           round(p.n_ab * n.n_users / (sa.n_a * CAST(sb.n_a AS DOUBLE)), 6)
             AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.ante
    JOIN singles sb ON sb.event_type = p.conseq
    CROSS JOIN n
    """,
)
def x1_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — pairwise association rules over user event baskets:
    support / confidence / lift for every ordered event-type pair.

    Plan shape for 100 TB: the only corpus-sized work is the distinct
    (user, type) projection and ONE self-join on user_id — and that
    join's per-user fan-out is bounded by the event-type vocabulary
    (tiny), not by the user's raw event count, because the distinct
    collapses first. Singles and the user count are
    vocabulary-cardinality frames broadcast onto the pair aggregate.
    """
    ue = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct()
    n_users = ue.agg(
        F.count_distinct("user_id").cast("double").alias("n_users")
    )
    singles = ue.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a"))
    a = ue.select("user_id", F.col("event_type").alias("ante"))
    b = ue.select("user_id", F.col("event_type").alias("conseq"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ante") < F.col("conseq"))
        .groupBy("ante", "conseq")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("ante"), F.col("n_a"))
    sb = singles.select(
        F.col("event_type").alias("conseq"), F.col("n_a").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sb), "conseq")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "conseq",
            F.round(F.col("n_ab") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "x2_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
             AS p_next
    FROM pairs
    """,
)
def x2_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — first-order event-transition matrix (Markov bigrams): for
    each user's time-ordered event stream, count (prev_type,
    next_type) adjacencies and normalize per source state — the
    session-flow / next-action-prediction primitive. One entity-keyed
    window pass builds the adjacency (tie-broken by event_id, so both
    engines see the same sequence), then a vocabulary-sized aggregate:
    the transition matrix is |event_types|² rows regardless of corpus
    size, so everything after the lag is effectively free at 100 TB."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"), 6
        ).alias("p_next"),
    )


@register(
    "x3_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts, value AS amount
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.pid, p.amount, e.event_type, e.ts, e.event_id,
             count(*) OVER (PARTITION BY p.pid) AS n_touches,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY e.ts ASC, e.event_id ASC) AS rn_first,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn_last
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts <= p.pts AND e.ts >= p.pts - INTERVAL 1 HOUR
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS touches,
           round(CAST(sum(amount / n_touches) AS DOUBLE), 6) AS linear_credit,
           CAST(count(*) FILTER (WHERE rn_first = 1) AS BIGINT) AS first_touch,
           CAST(count(*) FILTER (WHERE rn_last = 1) AS BIGINT) AS last_touch
    FROM touches GROUP BY event_type
    """,
)
def x3_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — multi-model purchase attribution in one pass: every view/
    click in the hour before a same-user purchase is a touch; linear
    credit splits the purchase amount across its touches, first/last
    counts credit the window's endpoints (id tie-breaks pin total
    orders). One user-keyed interval join, per-purchase windows over
    the (bounded) touch sets, one tiny final aggregate — the raw
    events are never window-sorted corpus-wide."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        F.col("value").alias("amount"),
    )
    e = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    joined = p.join(
        e,
        (
            (F.col("pts") >= F.col("ts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        )
        & (p.user_id == e.user_id),
    )
    wp = Window.partitionBy("pid")
    wf = wp.orderBy(F.asc("ts"), F.asc("event_id"))
    wl = wp.orderBy(F.desc("ts"), F.desc("event_id"))
    touched = joined.select(
        "pid", "amount", "event_type",
        F.count(F.lit(1)).over(wp).alias("n_touches"),
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return touched.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("touches"),
        F.round(F.sum(F.col("amount") / F.col("n_touches")), 6).alias("linear_credit"),
        F.count(F.when(F.col("rn_first") == 1, 1)).cast("bigint").alias("first_touch"),
        F.count(F.when(F.col("rn_last") == 1, 1)).cast("bigint").alias("last_touch"),
    )


@register(
    "x4_precedence_pairs",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, min(ts) AS first_ts
      FROM events GROUP BY user_id, event_type
    )
    SELECT a.event_type AS ante, b.event_type AS conseq,
           CAST(count(*) AS BIGINT) AS n_users
    FROM firsts a JOIN firsts b
      ON a.user_id = b.user_id AND a.event_type <> b.event_type
     AND (a.first_ts < b.first_ts
          OR (a.first_ts = b.first_ts AND a.event_type < b.event_type))
    GROUP BY ante, conseq
    """,
)
def x4_precedence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — precedence mining, the ORDER-sensitive sibling of X1's
    co-occurrence baskets: for each event-type pair, how many users
    saw their first `ante` strictly before their first `conseq`
    (simultaneous firsts break by type name, so a+b and b+a never
    both count). Where X2 counts ADJACENT transitions, this captures
    "a eventually precedes b" — the funnel-direction signal.

    Corpus-sized work is one (user, type) min-aggregate — map-side
    combining — then a self-join whose per-user fan-out is bounded by
    the event-type vocabulary squared, never the raw event count.
    """
    firsts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"))
    )
    a = firsts.select(
        "user_id", F.col("event_type").alias("ante"), F.col("first_ts").alias("ts_a")
    )
    b = firsts.select(
        "user_id", F.col("event_type").alias("conseq"), F.col("first_ts").alias("ts_b")
    )
    before = (F.col("ts_a") < F.col("ts_b")) | (
        (F.col("ts_a") == F.col("ts_b")) & (F.col("ante") < F.col("conseq"))
    )
    return (
        a.join(b, "user_id")
        .filter((F.col("ante") != F.col("conseq")) & before)
        .groupBy("ante", "conseq")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
