"""As-of join — an operator Spark lacks natively, composed from built-in
DataFrame ops (no Python in the path).

Semantics: for each left row, attach the single right row with the largest
timestamp <= the left timestamp within the same key (backward as-of). The
classic composition: union both sides with a side tag, sort by (key, ts),
propagate the last-seen right row forward with last_value(ignoreNulls) over
an unbounded-preceding window, then keep left rows.

This beats the naive approaches at scale:
  * theta join `l.ts >= r.ts` + row_number: builds O(|L|x|R|) pairs per key
    before pruning — quadratic blowup.
  * applyInPandas + pd.merge_asof: correct, but serializes every key group
    through Python.
The union-window form is one shuffle on the key, linear state, whole-stage
codegen throughout. DuckDB's native ASOF JOIN provides the oracle.

Declared query: for each purchase event, the user's most recent click
at-or-before it (a funnel-attribution shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import EVENTS_US_CTE, load_table
from mysql_to_clickhouse_sync_spark.registry import declare


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row with
    right_ts <= left_ts per `on` key. Right payload columns come back
    prefixed as given; left keeps all its columns.

    Ties on timestamp between a left and right row count as a match
    (<=, matching DuckDB ASOF JOIN); a right row tied with another right
    row resolves to the later-sorted one (stable because the union sort is
    total: ts, side marker, original order columns must make it unique).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # sorts AFTER right rows at equal ts
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__r_{c}").alias(f"r_{c}") for c in right_payload],
    )


@declare(
    "q_asof_join",
    oracle=f"""
    {EVENTS_US_CTE}
    , purchases AS (
        SELECT user_id, event_id, ts, value FROM events_us
        WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, event_id AS click_event_id, ts AS click_ts
        FROM events_us WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, p.ts, p.value,
           c.click_event_id AS r_click_event_id,
           c.click_ts AS r_click_ts
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    tier="P2",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attribution: each purchase joined to the user's most recent
    click at-or-before it (backward as-of, left outer)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    return asof_join_backward(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
    )
