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


def test_markov_stationary_sums_to_one(spark):
    rows = _collect(spark, "q_markov_stationary")
    tot = sum(r.stationary_micro for r in rows)
    # L1 renormalization each round: per-entry floors cost < |states|
    assert abs(tot - 1_000_000) <= len(rows)
    assert all(r.stationary_micro > 0 for r in rows)


def test_kn_bigram_probabilities_sane(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    import re as _re

    rows = _collect(spark, "q_kn_bigram")
    assert len(rows) > 0
    assert all(0 < r.p_kn_micro <= 1_000_000 for r in rows)
    # recount the head bigram's raw count and check the KN value
    docs = load_table(spark, SF_DIR, "documents").collect()
    bi = Counter()
    for d in docs:
        toks = [
            t for t in _re.split(r"[^a-z]+", d.text.lower()) if len(t) >= 3
        ]
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    cv = Counter()
    n1post = Counter()
    n1pre = Counter()
    for (a, b), c in bi.items():
        cv[a] += c
        n1post[a] += 1
        n1pre[b] += 1
    t = len(bi)
    for r in rows[:10]:
        assert bi[(r.v, r.w)] == r.c_vw, (r.v, r.w)
        want = (r.c_vw * 1000 - 750) * 1_000_000 // (cv[r.v] * 1000) + (
            750 * n1post[r.v] * ((n1pre[r.w] * 1_000_000) // t)
        ) // (cv[r.v] * 1000)
        assert r.p_kn_micro == want, (r.v, r.w)
