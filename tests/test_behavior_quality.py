"""Wave-14 operator tests: association lift, RFM segmentation, BFS
layers, Benford audit. Oracle parity is covered by the roster sweep;
these pin the statistics against independent recomputation."""

import math
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _collect(spark, name):
    from mysql_to_clickhouse_sync_spark.registry import (
        REGISTRY,
        _load_all_modules,
    )

    _load_all_modules()
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def _baskets(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, set()).add(r.event_type)
    return by_user


def test_assoc_lift_recount(spark):
    by_user = _baskets(spark)
    n = len(by_user)
    item = Counter(t for s in by_user.values() for t in s)
    pair = Counter(
        (a, b)
        for s in by_user.values()
        for a in s
        for b in s
        if a < b
    )
    got = {(r.ante, r.cons): r for r in _collect(spark, "q_assoc_lift")}
    assert set(got) == set(pair)
    for (a, b), r in got.items():
        both = pair[(a, b)]
        assert r.both == both
        assert r.support_micro == both * 1_000_000 // n
        assert r.confidence_micro == both * 1_000_000 // item[a]
        assert r.lift_milli == both * n * 1000 // (item[a] * item[b])


def test_rfm_segments_partition_users(spark):
    rows = _collect(spark, "q_rfm_segments")
    by_user = _baskets(spark)
    assert sum(r.n_users for r in rows) == len(by_user)
    for r in rows:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
        assert r.segment == r.r_q * 100 + r.f_q * 10 + r.m_q
        assert r.n_users > 0 and r.events >= r.n_users
    # quartiles are balanced: each axis' marginal is ~n/4 per code
    n = sum(r.n_users for r in rows)
    for axis in ("r_q", "f_q", "m_q"):
        marg = Counter()
        for r in rows:
            marg[getattr(r, axis)] += r.n_users
        assert set(marg) == {1, 2, 3, 4}
        assert max(marg.values()) - min(marg.values()) <= 1, axis


def test_bfs_layers_triangle_inequality(spark):
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        BFS_MAX_HOPS,
        BFS_SEED_STRIDE,
        LP_NODE_BOUND,
    )

    rows = {r.vec_id: r.layer for r in _collect(spark, "q_bfs_layers")}
    # all seeds present at layer 0
    seeds = {v for v in rows if v % BFS_SEED_STRIDE == 0}
    assert seeds and all(rows[s] == 0 for s in seeds)
    assert all(0 <= l <= BFS_MAX_HOPS for l in rows.values())
    assert all(v < LP_NODE_BOUND for v in rows)
    # expansion actually happened: reached set strictly exceeds the seeds
    assert len(rows) > len(seeds)


def test_benford_constants_and_chi2(spark):
    from mysql_to_clickhouse_sync_spark.operators.profiling import (
        BENFORD_MICRO,
    )

    for d in range(1, 10):
        assert BENFORD_MICRO[d - 1] == math.floor(
            math.log10(1 + 1 / d) * 1_000_000
        ), d
    rows = sorted(_collect(spark, "q_benford_quality"), key=lambda r: r.digit)
    assert [r.digit for r in rows] == list(range(1, 10))
    n = sum(r.cnt for r in rows)
    chi2 = {r.chi2_milli for r in rows}
    assert len(chi2) == 1
    total_dev = sum(r.dev_milli for r in rows)
    assert chi2.pop() == total_dev
    for r in rows:
        assert r.exp_cnt_milli == n * r.exp_micro // 1000
        want = (r.cnt * 1000 - r.exp_cnt_milli) ** 2 // r.exp_cnt_milli
        assert r.dev_milli == want, r.digit
