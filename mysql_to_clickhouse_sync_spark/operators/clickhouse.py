"""ClickHouse table-engine and analytics-function semantics, re-expressed
as Spark plans.

The reference's whole purpose is to land MySQL tables INTO ClickHouse
(mysql_to_clickhouse_sync.py:52-91 is a raw INSERT into an existing
ClickHouse table) — it leaves the ClickHouse-side merge semantics to
whatever table engine the user created. These operators port the three
ClickHouse behaviors a sync user actually relies on, plus two of its
signature analytics functions, so a migrating user keeps them:

  * q_collapsing_merge — CollapsingMergeTree(sign): a changelog of
    (+1 state, -1 cancel) rows collapses, pairwise, to the net state.
    ReplacingMergeTree is q_dedup_latest; SummingMergeTree is a plain
    groupBy-sum (q_topk_value et al.) — this is the remaining engine.
  * q_ttl_rollup — `TTL ts + INTERVAL ... GROUP BY` semantics: rows older
    than the TTL collapse into coarse per-hour aggregates, fresh rows stay
    raw — the standard ClickHouse hot/cold downsampling pattern.
  * q_sequence_match — sequenceMatch / sequenceCount: per-user ordered
    event-pattern detection ('click … purchase') over the event stream.
  * q_running_delta — runningDifference + running total per user, the
    ClickHouse idiom for turning gauges into deltas.
  * q_agg_state_merge — AggregatingMergeTree / materialized-view
    semantics: partial -State aggregates at fine grain, -Merge to coarse,
    provably equal to aggregating the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare

# Exact money arithmetic: double -> decimal(10,2) -> integer cents, the
# same idiom as operators/stats.py (immune to float summation order).
# (A function, not a module constant: building a Column requires an active
# SparkContext, which doesn't exist at import time.)
def _cents():
    return (F.col("value").cast("decimal(10,2)") * 100).cast("bigint")


_CENTS_SQL = "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"

TTL_DAYS = 7  # rows older than max(ts) - 7d collapse to hourly aggregates


@declare(
    "q_collapsing_merge",
    oracle=f"""
    {EVENTS_US_CTE}
    , ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(event_id) OVER w AS p_eid,
               lag(ts)       OVER w AS p_ts,
               lag(value)    OVER w AS p_val
        FROM events_us
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changelog AS (
        SELECT user_id, event_id, ts, value, 1 AS sign FROM ordered
        UNION ALL
        SELECT user_id, p_eid, p_ts, p_val, -1 FROM ordered
        WHERE p_eid IS NOT NULL
    )
    SELECT user_id, event_id, ts, value,
           CAST(sum(sign) AS BIGINT) AS net_sign
    FROM changelog
    GROUP BY user_id, event_id, ts, value
    HAVING sum(sign) != 0
    """,
    tier="P1",
)
def q_collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree(sign) merge. The writer pairs every new state
    (+1) with a cancel copy of the prior state (-1); the engine's merge
    drops rows whose signs cancel, leaving each key's live state — here,
    each user's latest event, derived end-to-end from the changelog rather
    than taken on faith. Plan: one lag window (shuffle on user_id) builds
    each row's (+1 state, -1 prior-state-cancel) pair, emitted via a single
    explode rather than a self-union — the union form would run the
    WindowExec twice over a reused exchange. The groupBy then collapses
    pairs map-side: partial aggregation kills cancelled pairs before the
    exchange, so the second shuffle carries only net rows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state = F.struct(
        F.col("event_id"), F.col("ts"), F.col("value"), F.lit(1).alias("sign")
    )
    cancel = F.struct(
        F.col("p_eid").alias("event_id"),
        F.col("p_ts").alias("ts"),
        F.col("p_val").alias("value"),
        F.lit(-1).alias("sign"),
    )
    changelog = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("event_id").over(w).alias("p_eid"),
            F.lag("ts").over(w).alias("p_ts"),
            F.lag("value").over(w).alias("p_val"),
        )
        .select(
            "user_id",
            F.explode(
                F.when(
                    F.col("p_eid").isNotNull(), F.array(state, cancel)
                ).otherwise(F.array(state))
            ).alias("r"),
        )
        .select("user_id", "r.*")
    )
    return (
        changelog.groupBy("user_id", "event_id", "ts", "value")
        .agg(F.sum("sign").alias("net_sign"))
        .filter(F.col("net_sign") != 0)
    )


@declare(
    "q_ttl_rollup",
    oracle=f"""
    {EVENTS_US_CTE}
    , bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP)
               - INTERVAL {TTL_DAYS} DAY AS cutoff
        FROM events_us
    )
    SELECT user_id, 'raw' AS granularity,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
           event_id, 1 AS n_rows, {_CENTS_SQL} AS value_cents
    FROM events_us, bounds WHERE ts >= cutoff
    UNION ALL
    SELECT user_id, 'hourly' AS granularity,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
           NULL AS event_id, CAST(count(*) AS INT) AS n_rows,
           CAST(sum({_CENTS_SQL}) AS BIGINT) AS value_cents
    FROM events_us, bounds WHERE ts < cutoff
    GROUP BY user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP)
    """,
    tier="P2",
)
def q_ttl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`TTL ts + INTERVAL 7 DAY GROUP BY user, hour` downsampling: events
    in the last week of the dataset stay raw, older ones collapse into
    per-user hourly (count, cent-sum) aggregates. The cutoff is data-
    relative (max(ts) - 7d) so the query is scale-factor-stable. Plan: the
    1-row bounds aggregate broadcasts back over the scan (no second full
    read — Spark reuses the cached relation; the filter splits one pass),
    and the cold-side groupBy map-combines before its shuffle. At 100 TB
    the hot/cold split is exactly the partition-pruning boundary a
    ts-partitioned layout would give for free."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        (F.date_trunc("day", F.max("ts")) - F.expr(f"INTERVAL {TTL_DAYS} DAYS"))
        .alias("cutoff")
    )
    e = events.crossJoin(F.broadcast(bounds))
    hour = F.date_trunc("hour", F.col("ts"))
    fresh = e.filter(F.col("ts") >= F.col("cutoff")).select(
        "user_id",
        F.lit("raw").alias("granularity"),
        hour.alias("bucket_ts"),
        "event_id",
        F.lit(1).alias("n_rows"),
        _cents().alias("value_cents"),
    )
    aged = (
        e.filter(F.col("ts") < F.col("cutoff"))
        .groupBy("user_id", hour.alias("bucket_ts"))
        .agg(
            F.count("*").cast("int").alias("n_rows"),
            F.sum(_cents()).alias("value_cents"),
        )
        .select(
            "user_id",
            F.lit("hourly").alias("granularity"),
            "bucket_ts",
            F.lit(None).cast("bigint").alias("event_id"),
            "n_rows",
            "value_cents",
        )
    )
    return fresh.unionByName(aged)


@declare(
    "q_sequence_match",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq,
           regexp_matches(
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
               'c.*p') AS has_click_then_purchase,
           CAST(len(regexp_extract_all(
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
               'c[^p]*p')) AS INT) AS n_click_purchase
    FROM events_us
    GROUP BY user_id
    """,
    tier="P1",
)
def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?1).*(?2)') / sequenceCount analog: per user, the
    ordered event-type initials form a string; 'did a click ever precede a
    purchase' is one regex, and the non-overlapping click→purchase count is
    a greedy 'c[^p]*p' scan — exactly ClickHouse's strict-order matcher.
    Plan: one groupBy(user_id) with collect_list of (ts, event_id, char)
    structs; sort_array pins the order deterministically (collect_list
    order is partition-dependent), then the regex runs JVM-side on the
    assembled string. State per key is the user's event count — bounded and
    skew-tolerant; at 100 TB this is the same one-shuffle shape as any
    sessionization."""
    events = load_table(spark, sf_dir, "events")
    ch = F.substring("event_type", 1, 1)
    agg = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", ch.alias("ch")))
        ).alias("arr"),
    )
    seq = F.array_join(F.transform("arr", lambda x: x["ch"]), "")
    return agg.select(
        "user_id",
        "n_events",
        seq.alias("seq"),
        seq.rlike("c.*p").alias("has_click_then_purchase"),
        F.size(F.regexp_extract_all(seq, F.lit("c[^p]*p"), 0)).alias(
            "n_click_purchase"
        ),
    )


@declare(
    "q_running_delta",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT user_id, event_id, ts,
           {_CENTS_SQL} AS value_cents,
           {_CENTS_SQL} - lag({_CENTS_SQL})
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS delta_cents,
           CAST(sum({_CENTS_SQL})
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
    FROM events_us
    """,
    tier="P1",
)
def q_running_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """runningDifference + running total per user: gauge-to-delta
    conversion in exact integer cents (the float value goes through
    decimal(10,2) first, so both engines sum identical integers). One
    window shuffle on user_id serves both the lag and the cumulative sum —
    Spark computes them in a single WindowExec over one sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = _cents()
    return events.select(
        "user_id",
        "event_id",
        "ts",
        cents.alias("value_cents"),
        (cents - F.lag(cents).over(w)).alias("delta_cents"),
        F.sum(cents)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cents"),
    )


AGG_STATE_ORACLE = f"""
    {EVENTS_US_CTE}
    , states AS (
        -- the "materialized view": partial aggregate states at fine grain
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS c,
               sum({_CENTS_SQL}) AS s,
               min(ts) AS mn, max(ts) AS mx
        FROM events_us
        GROUP BY event_type, day
    )
    SELECT event_type,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(sum(s) AS BIGINT) AS sum_cents,
           min(mn) AS first_ts,
           max(mx) AS last_ts,
           count(*) AS n_states
    FROM states
    GROUP BY event_type
    """


@declare("q_agg_state_merge", oracle=AGG_STATE_ORACLE, tier="P2")
def q_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree / materialized-view semantics: aggregate to
    partial STATES at fine grain (event_type, day), then MERGE the states
    to the coarse grain (event_type) — the two-phase contract ClickHouse's
    -State/-Merge combinators expose, and exactly what a sync user's
    target-side materialized views do as parts merge.

    Every aggregate here is mergeable (count/sum re-aggregate with sum;
    min/max with min/max), so merging states is provably identical to
    aggregating raw rows — the oracle states the same two-level plan so the
    intermediate n_states column is checkable too. Plan shape: two
    partial/final HashAggregates; the first shuffles on the FINE key (high
    cardinality — spreads well), the second on its prefix (tiny input, one
    row per state). At 100 TB this is the standard pre-aggregation
    pipeline: states land incrementally per micro-batch/partition and the
    coarse merge touches only state rows, never raw events again."""
    events = load_table(spark, sf_dir, "events")
    states = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("c"),
        F.sum(_cents()).alias("s"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    )
    return states.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum("s").cast("bigint").alias("sum_cents"),
        F.min("mn").alias("first_ts"),
        F.max("mx").alias("last_ts"),
        F.count("*").alias("n_states"),
    )


# --- Z-order data layout ----------------------------------------------------

ZBITS = 16  # per-dimension bits interleaved into a 32-bit z-value
ZTILE_SHIFT = 24  # keep the top 8 z-bits -> 256 quad-tree tiles


def _interleave_sql(x: str, y: str, shiftfmt) -> str:
    """Bit-interleave two ZBITS-wide ints: bit i of x -> bit 2i, bit i of
    y -> bit 2i+1. shiftfmt renders one dialect's shift expression."""
    terms = []
    for i in range(ZBITS):
        terms.append(shiftfmt(x, i, 2 * i))
        terms.append(shiftfmt(y, i, 2 * i + 1))
    return " + ".join(terms)


def _duck_shift(col: str, i: int, out: int) -> str:
    return f"((({col} >> {i}) & 1) << {out})"


def _spark_shift(col: str, i: int, out: int) -> str:
    return f"shiftleft(shiftright({col}, {i}) & 1, {out})"


@declare(
    "q_zorder_layout",
    oracle=f"""
    WITH dims AS (
        SELECT l_orderkey % 65536 AS x, l_partkey % 65536 AS y
        FROM lineitem
    ), z AS (
        SELECT x, y,
               ({_interleave_sql('x', 'y', _duck_shift)}) >> {ZTILE_SHIFT}
                   AS tile
        FROM dims
    )
    SELECT tile,
           count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max,
           CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)
               AS bbox_area
    FROM z GROUP BY tile
    """,
    tier="P2",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout: interleave the bits of two clustering
    dimensions and tile rows by the top z-bits — the multi-dimensional
    generalization of ClickHouse's ORDER BY (a, b) primary key (which
    clusters well on a, poorly on b alone; a z-layout bounds BOTH
    dimensions per tile, so min-max pruning works for predicates on
    either). The per-tile bounding boxes ARE the result: by construction
    every tile confines each dimension to a 1/16th-domain range, which a
    test pins — the 256x bbox-area reduction a lakehouse OPTIMIZE ZORDER
    buys for file skipping.

    Scale notes: the z-value and tile id are pure integer bit arithmetic
    inside codegen (map-only); the only shuffle is the 256-group bbox
    aggregate. Writing the layout is `df.repartitionByRange(tile).
    sortWithinPartitions(zval)` — same expressions, no extra machinery;
    at 100 TB the tile width dials file count vs bbox tightness."""
    li = load_table(spark, sf_dir, "lineitem")
    dims = li.select(
        (F.col("l_orderkey") % 65536).alias("x"),
        (F.col("l_partkey") % 65536).alias("y"),
    )
    z = dims.withColumn(
        "tile",
        F.expr(f"({_interleave_sql('x', 'y', _spark_shift)}) >> {ZTILE_SHIFT}"),
    )
    return z.groupBy("tile").agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
        F.expr(
            "CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)"
        ).alias("bbox_area"),
    )


# --- q_funnel (windowFunnel) -------------------------------------------------

FUNNEL_STEPS = ("signup", "click", "purchase")
FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days, exact micros


def _funnel_cte() -> str:
    w = FUNNEL_WINDOW_US
    return f"""
    {EVENTS_US_CTE}
    , e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t, event_type
        FROM events_us
        WHERE ts IS NOT NULL AND event_type IN {FUNNEL_STEPS}
    ), w1 AS (
        SELECT *,
               max(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN t END)
                   OVER wprev AS p1
        FROM e
        WINDOW wprev AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), w2 AS (
        SELECT *,
               max(s2) OVER wprev AS p2
        FROM (
            SELECT *,
                   CASE WHEN event_type = '{FUNNEL_STEPS[1]}'
                             AND p1 IS NOT NULL AND t - p1 <= {w}
                        THEN p1 END AS s2
            FROM w1
        )
        WINDOW wprev AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), w3 AS (
        SELECT *,
               CASE WHEN event_type = '{FUNNEL_STEPS[2]}'
                         AND p2 IS NOT NULL AND t - p2 <= {w}
                    THEN p2 END AS s3
        FROM w2
    )"""


@declare(
    "q_funnel",
    oracle=f"""
    {_funnel_cte()}
    SELECT user_id,
           CAST(CASE WHEN count(s3) > 0 THEN 3
                     WHEN count(s2) > 0 THEN 2
                     WHEN count(CASE WHEN event_type = '{FUNNEL_STEPS[0]}'
                                     THEN 1 END) > 0 THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_level,
           CAST(count(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN 1 END)
                AS BIGINT) AS n_step1,
           CAST(count(s2) AS BIGINT) AS n_step2_chained,
           CAST(count(s3) AS BIGINT) AS n_step3_chained
    FROM w3 GROUP BY user_id
    """,
    tier="P1",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel, OPTIMAL-CHAIN semantics: per user, the
    deepest signup -> click -> purchase chain over ANY chain start,
    strictly ordered (by ts, event_id), every step within 7 days of the
    chain start. This is deliberately NOT behavior.py q_window_funnel,
    which anchors at the user's FIRST signup and folds greedily — there
    a user whose first signup goes stale before they re-signup and
    convert scores shallow, while the true windowFunnel (and this
    query) credits the later chain at full depth. The chain search is a
    per-level dynamic program realized as chained running-max window
    passes: p_k(t) = the best (latest) chain-start among level-k chains
    completed strictly before t — taking the MAX start is optimal
    because a later start can only loosen the window constraint for the
    next step. No per-user array, no self-join: K-1 window sweeps over
    one user-keyed sort, and per-user levels (not the histogram) so the
    output composes with user-level joins.

    Scale notes: one shuffle on user_id serves every window pass
    (identical partitioning/ordering — Spark reuses the sort); work is
    O(events * K). The self-join formulation (step_k x step_{k+1} per
    user) would be quadratic in per-user event count — at 10M events
    per hot user that is the difference between a scan and a melt.

    Reference contrast: ClickHouse ships windowFunnel as a native
    aggregate (the reference's target system, not the tool itself);
    this is the engine-side equivalent a migrated user needs."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isin(*FUNNEL_STEPS)
    )
    e = events.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("t"),
        "event_type",
    )
    return funnel_levels(e)


def funnel_levels(e: DataFrame) -> DataFrame:
    """The optimal-chain window DP over (user_id, event_id, t µs,
    event_type) rows — factored so tests can feed crafted sequences
    (e.g. the stale-first-signup case that separates this law from the
    first-anchor greedy fold)."""
    w = FUNNEL_WINDOW_US
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1, s2_, s3_ = FUNNEL_STEPS
    w1 = e.withColumn(
        "p1",
        F.max(
            F.expr(f"CASE WHEN event_type = '{s1}' THEN t END")
        ).over(wprev),
    )
    w2 = w1.withColumn(
        "s2",
        F.expr(
            f"CASE WHEN event_type = '{s2_}' AND p1 IS NOT NULL"
            f" AND t - p1 <= {w} THEN p1 END"
        ),
    ).withColumn("p2", F.max("s2").over(wprev))
    w3 = w2.withColumn(
        "s3",
        F.expr(
            f"CASE WHEN event_type = '{s3_}' AND p2 IS NOT NULL"
            f" AND t - p2 <= {w} THEN p2 END"
        ),
    )
    return w3.groupBy("user_id").agg(
        F.expr(
            f"""CAST(CASE WHEN count(s3) > 0 THEN 3
                 WHEN count(s2) > 0 THEN 2
                 WHEN count(CASE WHEN event_type = '{s1}' THEN 1 END) > 0
                 THEN 1 ELSE 0 END AS BIGINT)"""
        ).alias("funnel_level"),
        F.expr(
            f"CAST(count(CASE WHEN event_type = '{s1}' THEN 1 END)"
            " AS BIGINT)"
        ).alias("n_step1"),
        F.count("s2").cast("long").alias("n_step2_chained"),
        F.count("s3").cast("long").alias("n_step3_chained"),
    )


# --- q_retention -------------------------------------------------------------

RETENTION_COHORT = ("2024-01-01", "2024-01-08")  # signup week
RETENTION_WEEKS = (
    ("2024-01-08", "2024-01-15"),
    ("2024-01-15", "2024-01-22"),
    ("2024-01-22", "2024-01-29"),
)


def _retention_oracle() -> str:
    lo, hi = RETENTION_COHORT
    flags = [
        f"bool_or(ts >= TIMESTAMP '{a}' AND ts < TIMESTAMP '{b}') AS a{i}"
        for i, (a, b) in enumerate(RETENTION_WEEKS, start=1)
    ]
    weeks = [
        f"""CAST(sum(CASE WHEN r0 AND a{i} THEN 1 ELSE 0 END) AS BIGINT)
                AS week{i}_retained,
            CAST(sum(CASE WHEN r0 AND a{i} THEN 1 ELSE 0 END) * 10000
                 // sum(CASE WHEN r0 THEN 1 ELSE 0 END) AS BIGINT)
                AS week{i}_bp"""
        for i in range(1, len(RETENTION_WEEKS) + 1)
    ]
    return f"""
    {EVENTS_US_CTE}
    , u AS (
        SELECT user_id,
               bool_or(ts >= TIMESTAMP '{lo}'
                       AND ts < TIMESTAMP '{hi}') AS r0,
               {', '.join(flags)}
        FROM events_us WHERE ts IS NOT NULL
        GROUP BY user_id
    )
    SELECT CAST(sum(CASE WHEN r0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cohort_users,
           {', '.join(weeks)}
    FROM u
    """


@declare("q_retention", oracle=_retention_oracle(), tier="P1")
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse retention() analog — EXPLICIT-CONDITION form: the
    aggregate takes fixed predicates (here: active in the Jan 1-7
    cohort week; returned in each of the next three weeks) and reports
    gated counts r0, r0&a1, r0&a2, ... plus exact basis-point rates —
    exactly retention()'s condition-array contract. The data-driven
    twin is behavior.py q_retention_cohort (every user's OWN first week
    as cohort, the full triangle); this form answers the campaign
    question ("of January-week-1 users, how many came back?") that the
    triangle must be re-filtered for. Per-user flags are one bool_or
    aggregation; the report is a second 1-row aggregation (both
    map-side combined).

    Scale notes: two skinny aggregations, no window, no join — the
    whole query is a single shuffle on user_id then a scalar fold."""
    lo, hi = RETENTION_COHORT
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    flags = [
        F.expr(
            f"bool_or(ts >= TIMESTAMP '{a}' AND ts < TIMESTAMP '{b}')"
        ).alias(f"a{i}")
        for i, (a, b) in enumerate(RETENTION_WEEKS, start=1)
    ]
    u = events.groupBy("user_id").agg(
        F.expr(
            f"bool_or(ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}')"
        ).alias("r0"),
        *flags,
    )
    weeks = []
    for i in range(1, len(RETENTION_WEEKS) + 1):
        weeks.append(
            F.expr(
                f"CAST(sum(CASE WHEN r0 AND a{i} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"week{i}_retained")
        )
        weeks.append(
            F.expr(
                f"CAST(sum(CASE WHEN r0 AND a{i} THEN 1 ELSE 0 END)"
                " * 10000 div sum(CASE WHEN r0 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"week{i}_bp")
        )
    return u.agg(
        F.expr(
            "CAST(sum(CASE WHEN r0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("cohort_users"),
        *weeks,
    )
