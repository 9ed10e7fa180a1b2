"""Temporal versioning operators (CDC-adjacent extensions).

A CDC pipeline lands either the LATEST state (q_dedup_latest — the
ReplacingMergeTree shape) or the FULL HISTORY with validity intervals — the
SCD Type-2 shape implemented here: each change becomes a version row with
[valid_from, valid_to) derived from the next change's timestamp via lead().

Also here: the bucketed range (interval) join — Spark has no native interval
join; the scalable composition is bucketize-both-sides + equi-join on bucket
+ exact filter, which turns an O(n^2) theta join into an equi-shuffle with
per-bucket candidate sets.

  * q_scd2_history — per-user version intervals from the events changelog.
  * q_range_join   — purchases joined to same-user clicks within a ±10 min
                     window via hour-bucket equi-join (candidate buckets:
                     own hour ± 1) + exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare

RANGE_WINDOW_MS = 10 * 60 * 1000  # ±10 minutes
BUCKET_MS = 3600 * 1000  # 1-hour buckets (>= window width, so ±1 suffices)


@declare(
    "q_scd2_history",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT user_id,
           event_id,
           event_type,
           value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM events_us
    """,
    tier="P2",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 version history: every change carries its validity
    interval; the open-ended row is the current version. One window over
    (user_id) — a single key-shuffle, linear at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ms: str,
    right_ms: str,
    window_ms: int = RANGE_WINDOW_MS,
    bucket_ms: int = BUCKET_MS,
) -> DataFrame:
    """Range join |left_ms - right_ms| <= window_ms within `on` groups,
    executed as an equi-join on (key, time bucket): the left side explodes
    to its own bucket ±1 (bucket_ms >= window_ms guarantees coverage), so
    the only shuffle is hash(key, bucket) and the theta predicate runs on
    small candidate sets instead of the full cross product."""
    assert bucket_ms >= window_ms, "bucket must cover the window"
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                *[
                    (F.col(left_ms) / F.lit(bucket_ms)).cast("bigint") + d
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", (F.col(right_ms) / F.lit(bucket_ms)).cast("bigint")
    )
    joined = lb.join(rb, [on, "__bucket"]).filter(
        F.abs(F.col(left_ms) - F.col(right_ms)) <= window_ms
    )
    return joined.drop("__bucket")


@declare(
    "q_range_join",
    oracle=f"""
    {EVENTS_US_CTE}
    , purchases AS (
        SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS p_ms
        FROM events_us WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, event_id AS click_id, epoch_ms(ts) AS c_ms
        FROM events_us WHERE event_type = 'click'
    )
    SELECT p.user_id, purchase_id, click_id,
           p_ms - c_ms AS delta_ms
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND abs(p_ms - c_ms) <= {RANGE_WINDOW_MS}
    """,
    tier="P2",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchase-click pairs of the same user within ±10
    minutes, via the bucketed composition (the oracle states the pure theta
    form — results must be identical, only the plan differs)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("p_ms"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_millis("ts").alias("c_ms"),
    )
    joined = bucketed_range_join(
        purchases, clicks, "user_id", "p_ms", "c_ms"
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        (F.col("p_ms") - F.col("c_ms")).alias("delta_ms"),
    )
