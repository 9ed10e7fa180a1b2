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


# --- q_assoc_lift ------------------------------------------------------------

AL_SCALE = 1_000_000


@declare(
    "q_assoc_lift",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), nu AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM baskets
    ), item AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS c
        FROM baskets GROUP BY event_type
    ), pair AS (
        SELECT a.event_type AS ante, b.event_type AS cons,
               CAST(count(*) AS BIGINT) AS both
        FROM baskets a JOIN baskets b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY ante, cons
    )
    SELECT pair.ante, pair.cons, pair.both,
           ia.c AS n_ante, ic.c AS n_cons,
           CAST(pair.both * {AL_SCALE} // nu.n AS BIGINT) AS support_micro,
           CAST(pair.both * {AL_SCALE} // ia.c AS BIGINT) AS confidence_micro,
           CAST((pair.both * nu.n * 1000) // (ia.c * ic.c) AS BIGINT)
               AS lift_milli
    FROM pair
    JOIN item ia ON ia.event_type = pair.ante
    JOIN item ic ON ic.event_type = pair.cons
    CROSS JOIN nu
    """,
    tier="P2",
)
def q_assoc_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type baskets:
    support, confidence and lift for every type pair (ante < cons) in
    exact integer micro/milli-units — the classic co-occurrence miner
    (lift > 1: the pair co-occurs above independence). The same shape
    mines source/tag co-occurrence in a corpus. lift_milli multiplies
    before dividing (both*n*1000 — BIGINT-safe to ~1e5 users per basket
    pair product; beyond, the two-step floor decomposition of
    q_component_removal applies).

    Scale notes: baskets dedupe with one (user, type) shuffle; the pair
    join is per-user and bounded by basket size squared (|types| is
    small by construction — for open-vocabulary items, cap baskets the
    LSH-guard way); counts are map-side combined."""
    baskets = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    nu = baskets.agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    item = baskets.groupBy("event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    a = baskets.select("user_id", F.col("event_type").alias("ante"))
    b = baskets.select("user_id", F.col("event_type").alias("cons"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("both"))
    )
    ia = item.select(F.col("event_type").alias("ante"), F.col("c").alias("n_ante"))
    ic = item.select(F.col("event_type").alias("cons"), F.col("c").alias("n_cons"))
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(nu))
        .select(
            "ante",
            "cons",
            "both",
            "n_ante",
            "n_cons",
            F.expr(f"both * {AL_SCALE} div n").alias("support_micro"),
            F.expr(f"both * {AL_SCALE} div n_ante").alias("confidence_micro"),
            F.expr("(both * n * 1000) div (n_ante * n_cons)").alias(
                "lift_milli"
            ),
        )
    )


# --- q_rfm_segments ----------------------------------------------------------

RFM_Q = 4  # quartile codes per axis
_US_PER_DAY_RFM = 86_400_000_000


@declare(
    "q_rfm_segments",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(max(epoch_us(ts) // {_US_PER_DAY_RFM}) AS BIGINT)
                   AS last_day,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS monet_cents
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT user_id, last_day, freq, monet_cents,
               ntile({RFM_Q}) OVER (ORDER BY last_day, user_id) AS r_q,
               ntile({RFM_Q}) OVER (ORDER BY freq, user_id) AS f_q,
               ntile({RFM_Q}) OVER (ORDER BY monet_cents, user_id) AS m_q
        FROM per_user
    )
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(freq) AS BIGINT) AS events,
           CAST(sum(monet_cents) AS BIGINT) AS monet_cents
    FROM scored
    GROUP BY r_q, f_q, m_q
    """,
    tier="P2",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (last active day), frequency
    (event count) and monetary (cents via floor(value*100) — floor of a
    double is engine-identical because the input doubles are
    bit-identical on both engines) quartiled with deterministic
    user_id tiebreaks into the classic 64-cell R/F/M grid, reported as
    per-segment user counts and totals. The audience-segmentation
    staple, exact-integer end to end.

    Scale notes: per-user rollup is one map-side-combined shuffle;
    each ntile is one sort window over the per-user table (three sorts
    — the unavoidable cost of exact quantile CODES; approximate
    segmentation would use q_approx_percentile's KLL bounds instead);
    the final grid is 64 cells."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            f"CAST(max(unix_micros(ts) div {_US_PER_DAY_RFM}) AS BIGINT)"
        ).alias("last_day"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("monet_cents"),
    )
    scored = per_user.select(
        "freq",
        "monet_cents",
        F.ntile(RFM_Q).over(Window.orderBy("last_day", "user_id"))
        .cast("long")
        .alias("r_q"),
        F.ntile(RFM_Q).over(Window.orderBy("freq", "user_id"))
        .cast("long")
        .alias("f_q"),
        F.ntile(RFM_Q).over(Window.orderBy("monet_cents", "user_id"))
        .cast("long")
        .alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("freq").cast("long").alias("events"),
            F.sum("monet_cents").cast("long").alias("monet_cents"),
        )
        .withColumn(
            "segment",
            F.expr("CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT)"),
        )
        .select(
            "r_q", "f_q", "m_q", "segment", "n_users", "events",
            "monet_cents",
        )
    )


# --- q_markov_stationary -----------------------------------------------------

MK_ROUNDS = 3
MK_Q = 1_000_000  # distribution in micro-units
_MK_OFF = 1 << 20


def _markov_oracle() -> str:
    rounds = []
    prev = "p0"
    for r in range(1, MK_ROUNDS + 1):
        rounds.append(
            f"""r{r} AS (
        SELECT t.dst AS state, CAST(sum(p.p * t.w_micro) AS BIGINT) AS raw
        FROM {prev} p JOIN tm t ON t.src = p.state
        GROUP BY t.dst
    ), s{r} AS (
        SELECT CAST(sum(raw) AS BIGINT) AS tot FROM r{r}
    ), p{r} AS (
        SELECT state, CAST(raw * {MK_Q} // tot AS BIGINT) AS p
        FROM r{r} CROSS JOIN s{r}
    )"""
        )
        prev = f"p{r}"
    chain = ",\n    ".join(rounds)
    return f"""
    WITH seq AS (
        -- epoch_us floors ns -> us exactly like the Spark catalog's ts,
        -- so tie-breaking by event_id agrees between engines
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
    ), pair AS (
        SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY src, dst
    ), outc AS (
        SELECT src, CAST(sum(c) AS BIGINT) AS co FROM pair GROUP BY src
    ), tm AS (
        SELECT pair.src, pair.dst,
               CAST(pair.c * {MK_Q} // outc.co AS BIGINT) AS w_micro
        FROM pair JOIN outc USING (src)
    ), states AS (
        SELECT DISTINCT src AS state FROM pair
    ), ns AS (
        SELECT CAST(count(*) AS BIGINT) AS k FROM states
    ), p0 AS (
        SELECT state, CAST({MK_Q} // ns.k AS BIGINT) AS p
        FROM states CROSS JOIN ns
    ),
    {chain}
    SELECT state AS event_type, p AS stationary_micro
    FROM p{MK_ROUNDS}
    """


@declare("q_markov_stationary", oracle=_markov_oracle(), tier="P2")
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the per-user event-type
    Markov chain: the empirical transition matrix (row-normalized
    counts of consecutive event pairs, micro-units) powered three
    unrolled rounds from uniform with L1 renormalization each round —
    where the user population spends its time at equilibrium, the
    chain-level companion to q_event_transitions' edge view. Exact
    integer program on both engines (renormalizing by the integer sum
    keeps the distribution summing to ~1e6 despite per-entry floors).

    Scale notes: the transition matrix is |types|^2 rows (broadcast);
    extracting pairs is one per-user ordered window; each round is a
    tiny join + aggregate on the matrix — the q_pca_power decomposition
    (reduce to a small dense object, iterate on it in-engine)."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    pair = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    outc = pair.groupBy("src").agg(F.sum("c").cast("long").alias("co"))
    tm = (
        pair.join(F.broadcast(outc), "src")
        .select("src", "dst", F.expr(f"c * {MK_Q} div co").alias("w_micro"))
        .localCheckpoint(eager=True)
    )
    states = tm.select(F.col("src").alias("state")).distinct()
    ns = states.agg(F.count("*").cast("long").alias("k"))
    p = states.crossJoin(F.broadcast(ns)).select(
        "state", F.expr(f"{MK_Q} div k").alias("p")
    )
    for _ in range(MK_ROUNDS):
        raw = (
            tm.join(F.broadcast(p), tm["src"] == p["state"])
            .groupBy(F.col("dst").alias("state2"))
            .agg(F.sum(F.expr("p * w_micro")).cast("long").alias("raw"))
        )
        tot = raw.agg(F.sum("raw").cast("long").alias("tot"))
        p = raw.crossJoin(F.broadcast(tot)).select(
            F.col("state2").alias("state"),
            F.expr(f"raw * {MK_Q} div tot").alias("p"),
        )
    return p.select(
        F.col("state").alias("event_type"),
        F.col("p").alias("stationary_micro"),
    )


# --- q_srm_check -------------------------------------------------------------

SRM_CHI2_CRIT_MILLI = 3841  # chi-square 0.95 critical value, 1 dof


def _srm_oracle() -> str:
    arm = """CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END"""
    return f"""
    {EVENTS_US_CTE}
    , u AS (
        SELECT user_id, {arm} AS arm_a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events_us GROUP BY user_id
    ), g AS (
        SELECT CAST(sum(arm_a) AS BIGINT) AS n_a,
               CAST(sum(1 - arm_a) AS BIGINT) AS n_b,
               CAST(sum(arm_a * converted) AS BIGINT) AS conv_a,
               CAST(sum((1 - arm_a) * converted) AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, n_b,
           -- degenerate-input guards (the q_mcc_eval pattern): an empty
           -- experiment / empty arm reads NULL, not a division error
           CAST(CASE WHEN n_a + n_b > 0 THEN
                (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) END
                AS BIGINT) AS srm_chi2_milli,
           CASE WHEN n_a + n_b > 0 THEN
                (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b)
                <= {SRM_CHI2_CRIT_MILLI} END AS srm_ok,
           CAST(CASE WHEN n_a > 0 THEN conv_a * 10000 // n_a END
                AS BIGINT) AS conv_a_bp,
           CAST(CASE WHEN n_b > 0 THEN conv_b * 10000 // n_b END
                AS BIGINT) AS conv_b_bp
    FROM g
    """


@declare("q_srm_check", oracle=_srm_oracle(), tier="P1")
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment plumbing: deterministic hash assignment of every
    user to an arm (first md5 hex digit < '8' — the q_hash_split idiom
    at the user grain, so assignment is stable across runs and engines)
    plus the SAMPLE RATIO MISMATCH check every experimentation platform
    runs before reading a result: chi-square of the observed arm sizes
    against the designed 50/50 ((n_a-n_b)^2/(n_a+n_b) for two arms,
    exact milli-units) with the 0.95 one-dof critical gate, and each
    arm's purchase-conversion rate in exact basis points — the readout
    q_welch_ttest then tests for significance. An SRM failure means the
    assignment or logging pipeline is biased and the experiment is
    unreadable; checking it is step zero.

    Scale notes: map-only assignment, one user-keyed map-side-combined
    aggregation, then scalar arithmetic on one row."""
    events = load_table(spark, sf_dir, "events")
    arm = (
        "CASE WHEN substr(md5(CAST(user_id AS STRING)), 1, 1) < '8'"
        " THEN 1 ELSE 0 END"
    )
    u = events.groupBy("user_id").agg(
        F.expr(f"max({arm})").cast("long").alias("arm_a"),
        F.expr(
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        )
        .cast("long")
        .alias("converted"),
    )
    g = u.agg(
        F.sum("arm_a").cast("long").alias("n_a"),
        F.sum(F.expr("1 - arm_a")).cast("long").alias("n_b"),
        F.sum(F.expr("arm_a * converted")).cast("long").alias("conv_a"),
        F.sum(F.expr("(1 - arm_a) * converted")).cast("long").alias("conv_b"),
    )
    chi2 = (
        "CASE WHEN n_a + n_b > 0 THEN"
        " (n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b) END"
    )
    return g.select(
        "n_a",
        "n_b",
        F.expr(f"CAST({chi2} AS BIGINT)").alias("srm_chi2_milli"),
        F.expr(f"{chi2} <= {SRM_CHI2_CRIT_MILLI}").alias("srm_ok"),
        F.expr(
            "CAST(CASE WHEN n_a > 0 THEN conv_a * 10000 div n_a END"
            " AS BIGINT)"
        ).alias("conv_a_bp"),
        F.expr(
            "CAST(CASE WHEN n_b > 0 THEN conv_b * 10000 div n_b END"
            " AS BIGINT)"
        ).alias("conv_b_bp"),
    )
