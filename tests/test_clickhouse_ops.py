"""Semantics tests for the ClickHouse-engine operators (operators/clickhouse.py)
on constructed micro-data — the oracle-parity test covers fixture-scale
equivalence; these pin the intended merge/matcher behavior directly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
    q_collapsing_merge,
    q_sequence_match,
)
from tests.conftest import SF_DIR


def test_collapsing_merge_leaves_latest_state_per_user(spark):
    """After collapsing, the surviving rows must be exactly each user's
    latest (ts, event_id) event with net_sign = +1 — the ReplacingMergeTree
    answer reached via the CollapsingMergeTree changelog route."""
    got = {
        (r.user_id, r.event_id, r.net_sign)
        for r in q_collapsing_merge(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    want = {(r.user_id, r.event_id, 1) for r in latest.collect()}
    assert got == want


def test_sequence_match_greedy_nonoverlapping_count(spark):
    """sequenceCount semantics: 'c[^p]*p' consumes greedily left-to-right,
    so ccpp counts once, cpcp twice, and events after the last p are idle."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: click click purchase purchase view  -> 1 match, has=True
    for i, et in enumerate(["click", "click", "purchase", "purchase", "view"]):
        rows.append((i + 1, base + datetime.timedelta(minutes=i), 1, et, 1.0, "{}"))
    # user 2: click purchase click purchase -> 2 matches
    for i, et in enumerate(["click", "purchase", "click", "purchase"]):
        rows.append((i + 10, base + datetime.timedelta(minutes=i), 2, et, 1.0, "{}"))
    # user 3: purchase click -> 0 matches, has=False
    for i, et in enumerate(["purchase", "click"]):
        rows.append((i + 20, base + datetime.timedelta(minutes=i), 3, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r.user_id: (r.seq, r.has_click_then_purchase, r.n_click_purchase)
            for r in q_sequence_match(spark, d).collect()
        }
    assert out[1] == ("ccppv", True, 1)
    assert out[2] == ("cpcp", True, 2)
    assert out[3] == ("pc", False, 0)


def test_interpolate_linear_interior_null_edges(spark):
    """Interior gaps take the exact integer line between neighbors; hours
    after the last observation stay NULL; observed hours keep their sum."""
    import tempfile

    from mysql_to_clickhouse_sync_spark.operators.timeseries import q_interpolate

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: 1.00 at hour 0, 5.00 at hour 4 -> 100,200,300,400,500 cents
        (1, base, 1, "view", 1.00, "{}"),
        (2, base + datetime.timedelta(hours=4), 1, "view", 5.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r.hour_start.hour: (r.is_observed, r.cents_interp)
            for r in q_interpolate(spark, d).filter("hour_start < '2024-01-01 08:00:00'").collect()
        }
    assert out[0] == (True, 100)
    assert out[1] == (False, 200)
    assert out[2] == (False, 300)
    assert out[3] == (False, 400)
    assert out[4] == (True, 500)
    assert out[5] == (False, None) and out[7] == (False, None)


def test_funnel_optimal_chain_beats_first_anchor(spark):
    """The semantic separation between q_funnel (optimal chain over ANY
    start) and q_window_funnel (greedy fold anchored at the FIRST
    signup): a user whose first signup goes stale before converting,
    but who re-signs-up and completes inside the later window, must
    score full depth here."""
    from mysql_to_clickhouse_sync_spark.operators.clickhouse import (
        FUNNEL_WINDOW_US,
        funnel_levels,
    )

    W = FUNNEL_WINDOW_US
    rows = [
        # user 1: first signup at t=0, conversion only after 3 windows —
        # but a second signup re-opens the chain
        (1, 1, 0, "signup"),
        (1, 2, 3 * W, "signup"),
        (1, 3, 3 * W + 10, "click"),
        (1, 4, 3 * W + 20, "purchase"),
        # user 2: steps out of order (purchase before click) -> level 1
        (2, 5, 0, "signup"),
        (2, 6, 10, "purchase"),
        (2, 7, 20, "view"),
        # user 3: click lands exactly at the window edge (t1 + W) -> ok,
        # purchase one past the click's chain window -> level 2
        (3, 8, 0, "signup"),
        (3, 9, W, "click"),
        (3, 10, W + 1 + W, "purchase"),
        # user 4: never signed up -> level 0
        (4, 11, 5, "click"),
        (4, 12, 6, "purchase"),
    ]
    e = spark.createDataFrame(
        [r for r in rows if r[3] in ("signup", "click", "purchase")],
        "user_id bigint, event_id bigint, t bigint, event_type string",
    )
    out = {r.user_id: r.funnel_level for r in funnel_levels(e).collect()}
    assert out == {1: 3, 2: 1, 3: 2, 4: 0}
