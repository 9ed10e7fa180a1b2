"""Window / time-bucket operators (extensions; SURVEY.md §2.5, §2.9).

The reference has no windows, but its north star — CDC into ClickHouse — is
window-shaped: ReplacingMergeTree semantics ARE "latest row per key"
(q_dedup_latest lives in operators/dedup.py). Declared here:

  * q_tumbling_count — events per 1-hour tumbling bucket per type; the batch
    analog of a Structured Streaming ``window(ts, '1 hour')`` aggregation
    (streaming twin in streaming/declared.py).
  * q_sliding_avg — running average over the preceding 3 rows.
  * q_session_window — 30-min-gap sessionization via lag + cumulative sum;
    the batch analog of ``session_window(ts, '30 minutes')``.

Hash stability: window sums of doubles go through decimal (associative) and
every window order includes the unique event_id tiebreak.

Scale notes: all three partition by a grouping key (event_type / user_id), so
state is bounded per key and the shuffle is a single hash-exchange on that
key. Tumbling buckets aggregate with map-side combine before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.operators.aggregates import (
    DECIMAL_SUM_SQL,
    decimal_sum,
)
from mysql_to_clickhouse_sync_spark.registry import declare

SESSION_GAP_MS = 30 * 60 * 1000


@declare(
    "q_tumbling_count",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           {DECIMAL_SUM_SQL.format(col='value')} AS sum_value
    FROM events_us
    GROUP BY window_start, event_type
    """,
    tier="P1",
)
def q_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        decimal_sum("value", "sum_value"),
    )


@declare(
    "q_sliding_avg",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT event_id, event_type, ts,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / count(*) OVER w AS run_avg
    FROM events_us
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tier="P2",
)
def q_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running 4-row average per event_type. The sum runs in decimal (exact,
    associative), then one double division — bitwise-identical across engines.
    No round(): Spark rounds HALF_UP on the decimal repr while DuckDB rounds
    the binary double, so rounding is what would DIVERGE, not converge."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    sum_w = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    cnt_w = F.count("*").over(w)
    return events.select(
        "event_id",
        "event_type",
        "ts",
        (sum_w.cast("double") / cnt_w).alias("run_avg"),
    )


@declare(
    "q_session_native",
    oracle=f"""
    {EVENTS_US_CTE}
    , marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events_us
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           {DECIMAL_SUM_SQL.format(col='value')} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tier="P2",
)
def q_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (gap-merged sessions as a
    first-class grouping key — also the streaming sessionization primitive,
    see streaming/declared.py). The oracle reconstructs identical sessions
    via the lag/cumsum technique: session_end = last event + gap."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@declare(
    "q_session_window",
    oracle=f"""
    {EVENTS_US_CTE}
    , gaps AS (
        SELECT user_id, event_id,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events_us
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps
    GROUP BY user_id
    """,
    tier="P2",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag(ts) marks session
    starts, summed per user. Batch analog of session_window(ts, '30 minutes')
    — the streaming twin lives in streaming/declared.py."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    is_new = F.when(
        F.lag(ms).over(w).isNull() | (ms - F.lag(ms).over(w) > SESSION_GAP_MS),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.select("user_id", "event_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


_HOUR_FRAME = (
    "OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
)


@declare(
    "q_range_frame",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT event_id, user_id, ts,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) {_HOUR_FRAME}
                AS DECIMAL(18,2)) AS DOUBLE) AS hour_sum,
           count(*) {_HOUR_FRAME} AS hour_n
    FROM events_us
    """,
    tier="P2",
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per user, the trailing-1-hour sum/count at
    every event. Unlike q_sliding_avg's ROWS frame, the frame edge is a
    timestamp predicate, so tied order keys share one frame and the result
    is deterministic without a row tiebreak. Sum runs in decimal (exact,
    associative). One hash-exchange on user_id serves both functions.

    At scale a RANGE frame is state-bounded by time, not row count — the
    window buffer holds only one hour of a user's events regardless of
    total history (contrast ROWS N PRECEDING, which is unbounded in time
    on burst traffic)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            f"CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) {_HOUR_FRAME} "
            "AS DECIMAL(18,2)) AS DOUBLE)"
        ).alias("hour_sum"),
        F.expr(f"count(*) {_HOUR_FRAME}").alias("hour_n"),
    )
