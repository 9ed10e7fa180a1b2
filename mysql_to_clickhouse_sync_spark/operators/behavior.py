"""Behavioral analytics over the event stream: ordered funnels and
retention cohorts (north-star extensions — the reference has no analytics
surface; SURVEY.md §2.3/§2.5 declare the category).

  * q_funnel_steps — ordered conversion funnel signup → view → click →
    purchase: a user counts at step N only if their earliest step-N event
    follows their earliest qualifying step-(N-1) event. Expressed as chained
    conditional-min aggregations (the relational funnel form — each step is
    one filter + groupBy-min + join on the cohort so far), not a per-user
    Python state machine: every stage is a narrow (user_id, ts) shuffle.
  * q_retention_cohort — classic triangle: users bucketed by the calendar
    week of their first event, counted distinct in each later week offset.

Scale notes: both shuffle only (user_id, timestamp)-shaped pairs, partially
aggregated map-side; the funnel's step joins are user-keyed equi-joins AQE
sizes from the shrinking survivor set (each stage's input is the previous
stage's output — monotonically smaller). At 100 TB the natural refinement
is pre-bucketing events by user_id so every stage is shuffle-free; the
declared plan keeps the portable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare

_STEPS = ["signup", "view", "click", "purchase"]


@declare(
    "q_funnel_steps",
    oracle=f"""
    {EVENTS_US_CTE},
    s1 AS (
        SELECT user_id, min(ts) AS t FROM events_us
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events_us e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events_us e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events_us e
        JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
    )
    SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'view', count(*) FROM s2
    UNION ALL
    SELECT 3, 'click', count(*) FROM s3
    UNION ALL
    SELECT 4, 'purchase', count(*) FROM s4
    """,
    tier="P1",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: survivors per step with strict event-order
    enforcement (step N's first event must be later than the user's first
    qualifying step-(N-1) event)."""
    events = load_table(spark, sf_dir, "events")
    cohort: DataFrame | None = None
    counts = []
    for i, step in enumerate(_STEPS):
        stage = events.filter(F.col("event_type") == step)
        if cohort is not None:
            stage = stage.join(
                cohort.select("user_id", "t"), "user_id"
            ).filter(F.col("ts") > F.col("t"))
        cohort = stage.groupBy("user_id").agg(F.min("ts").alias("t"))
        counts.append(
            cohort.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.count("*").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


FUNNEL_WINDOW_HOURS = 24  # windowFunnel chain deadline, anchored at step 1


@declare(
    "q_window_funnel",
    oracle=f"""
    {EVENTS_US_CTE},
    s1 AS (
        SELECT user_id, min(ts) AS t,
               min(ts) + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR AS dl
        FROM events_us WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t, s1.dl AS dl
        FROM events_us e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t AND e.ts <= s1.dl
        GROUP BY e.user_id, s1.dl
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t, s2.dl AS dl
        FROM events_us e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts > s2.t AND e.ts <= s2.dl
        GROUP BY e.user_id, s2.dl
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events_us e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s3.t AND e.ts <= s3.dl
        GROUP BY e.user_id
    )
    SELECT CASE WHEN s4.user_id IS NOT NULL THEN 4
                WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS level,
           count(*) AS n_users
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    LEFT JOIN s4 ON s1.user_id = s4.user_id
    GROUP BY 1
    """,
    tier="P1",
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel(24h): the funnel chain is anchored at the
    user's FIRST signup and every later step must land inside 24 hours of
    that anchor (q_funnel_steps is the unbounded twin). Returns the level
    histogram — how many signed-up users got exactly N steps deep in time.
    The oracle states the relational chained-min form; the plan is a
    single-pass per-user FOLD — sort_array(collect_list) then one
    higher-order `aggregate` carrying (level, last_ts, deadline) state
    across the ordered events, entirely inside codegen. One shuffle on
    user_id, no joins, no stage recomputation (the chained-join form
    re-evaluated each survivor stage ~3x: measured 20s vs 1s at sf0.1).
    The strict `>` step comparisons make the fold order-insensitive among
    equal timestamps, so it matches the relational min-chain exactly."""
    events = load_table(spark, sf_dir, "events")
    arr = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(None).cast("timestamp").alias("last"),
        F.lit(None).cast("timestamp").alias("dl"),
    )
    steps = ["signup", "view", "click", "purchase"]

    def fold(acc, x):
        out = None
        for lvl, step in enumerate(steps):
            advance = F.struct(
                F.lit(lvl + 1).alias("level"),
                x["ts"].alias("last"),
                (
                    (x["ts"] + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS"))
                    if lvl == 0
                    else acc["dl"]
                ).alias("dl"),
            )
            cond = (acc["level"] == lvl) & (x["event_type"] == step)
            if lvl > 0:
                cond = cond & (x["ts"] > acc["last"]) & (x["ts"] <= acc["dl"])
            out = F.when(cond, advance) if out is None else out.when(cond, advance)
        return out.otherwise(acc)

    per_user = events.groupBy("user_id").agg(
        F.aggregate(arr, init, fold).getField("level").alias("level")
    )
    return (
        per_user.filter(F.col("level") >= 1)
        .groupBy("level")
        .agg(F.count("*").alias("n_users"))
    )


@declare(
    "q_retention_cohort",
    oracle=f"""
    {EVENTS_US_CTE},
    firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events_us GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week,
                CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
                AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events_us e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tier="P1",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: distinct active users per (first-week cohort,
    week offset). Both week buckets are calendar date_trunc's, so the
    offset division is exact."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = events.join(firsts, "user_id")
    offset = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
        / 7
    ).cast("bigint")
    return joined.groupBy(
        "cohort_week", offset.alias("week_offset")
    ).agg(F.count_distinct("user_id").alias("n_users"))


@declare(
    "q_event_transitions",
    oracle=f"""
    {EVENTS_US_CTE},
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events_us
    )
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions,
           count(DISTINCT user_id) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tier="P1",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition matrix of the event stream: per-user lag
    over (ts, event_id) — the total order makes the bigram counts exact —
    then counts per (previous, next) pair. Scale: the lag window shuffles
    only (user_id, ts, type)-width rows keyed by user; the transition
    matrix itself is |types|² rows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count("*").alias("n_transitions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
