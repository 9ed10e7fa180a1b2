"""As-of join edge cases: no-match -> nulls (left outer), equal-timestamp
inclusivity (<=), per-key isolation."""

from __future__ import annotations

import datetime

from mysql_to_clickhouse_sync_spark.operators.asof import asof_join_backward


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (2, 200, _ts(5))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(8)), (1, 901, _ts(15)), (2, 902, _ts(30))],
        "user_id bigint, click_event_id bigint, click_ts timestamp",
    )
    out = {
        r.event_id: r.r_click_event_id
        for r in asof_join_backward(
            left, right, "user_id", "ts", "click_ts",
            ["click_event_id", "click_ts"],
        ).collect()
    }
    assert out[100] == 900   # latest click <= :10 is :08
    assert out[101] == 901   # latest click <= :20 is :15
    assert out[200] is None  # user 2's only click is later -> left outer null


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(10))],
        "user_id bigint, click_event_id bigint, click_ts timestamp",
    )
    rows = asof_join_backward(
        left, right, "user_id", "ts", "click_ts", ["click_event_id"]
    ).collect()
    assert rows[0].r_click_event_id == 900  # ts == click_ts matches (<=)


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 900, _ts(5))],
        "user_id bigint, click_event_id bigint, click_ts timestamp",
    )
    rows = asof_join_backward(
        left, right, "user_id", "ts", "click_ts", ["click_event_id"]
    ).collect()
    assert rows[0].r_click_event_id is None  # other user's click never joins
