"""Property-based skyline validation: the linear windowed-running-max
composition must equal the O(n^2) dominance definition on arbitrary point
sets — hypothesis explores tie patterns (equal x, equal y, full duplicates)
that hand-written cases miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_to_clickhouse_sync_spark.operators.robust import skyline_2d

points_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),
    min_size=0,
    max_size=12,
)


def brute_skyline(pts: list[tuple[int, int]]) -> set[int]:
    keep = set()
    for i, (x, y) in enumerate(pts):
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y) for qx, qy in pts
        )
        if not dominated:
            keep.add(i)
    return keep


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(points_strategy)
def test_skyline_equals_quadratic_definition(spark, pts):
    if not pts:
        return
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "pid long, x long, y long"
    )
    got = {r.pid for r in skyline_2d(df, "x", "y").collect()}
    assert got == brute_skyline(pts)
