"""Corpus-statistics operator tests (operators/corpusstats.py +
q_component_removal). Oracle parity is covered by the roster sweep; these
pin the statistics against independent recomputation."""

import math
import re
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


def _docs(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    return load_table(spark, SF_DIR, "documents").collect()


def test_gini_matches_direct(spark):
    docs = _docs(spark)
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d.lang, []).append((d.n_chars, d.doc_id))
    got = {r.lang: r for r in _collect(spark, "q_gini_concentration")}
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        xs.sort()
        n = len(xs)
        sx = sum(x for x, _ in xs)
        six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        want = (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx)
        r = got[lang]
        assert (r.n, r.total_chars, r.gini_micro) == (n, sx, want), lang
        assert 0 <= r.gini_micro < 1_000_000


def test_vocab_growth_monotone_concave_ish(spark):
    rows = sorted(_collect(spark, "q_vocab_growth"), key=lambda r: r.bucket)
    docs = _docs(spark)
    toks = [
        t
        for d in docs
        for t in re.split(r"[^a-z]+", d.text.lower())
        if len(t) >= 3
    ]
    # totals agree with a direct count
    assert rows[-1].cum_tokens == len(toks)
    assert rows[-1].cum_types == len(set(toks))
    # both series strictly non-decreasing; types <= tokens everywhere
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens and b.cum_types >= a.cum_types
    assert all(r.cum_types <= r.cum_tokens for r in rows)


def test_zipf_slope_in_natural_range(spark):
    (row,) = _collect(spark, "q_zipf_slope")
    # sf0.001's synthetic vocabulary is tiny (~30 types); the REAL check
    # is exact agreement with a float OLS on the same head below
    assert row.n_ranks >= 10
    # natural-language rank-frequency slopes land around -0.5 .. -1.5;
    # and compare against a float OLS on the same head within kernel error
    docs = _docs(spark)
    tf = Counter(
        t
        for d in docs
        for t in re.split(r"[^a-z]+", d.text.lower())
        if len(t) >= 3
    )
    head = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[: row.n_ranks]
    xs = [math.log2(i + 1) for i in range(len(head))]
    ys = [math.log2(f) for _, f in head]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.slope_micro - slope * 1_000_000) < 25_000
    # frequency must decay with rank — slope clearly negative
    assert -2_500_000 < row.slope_micro < -50_000


def test_kaplan_meier_matches_lifelines_free_python(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.corpusstats import (
        KM_CENSOR_DAYS,
    )

    ev = load_table(spark, SF_DIR, "events")
    ud = (
        ev.groupBy("user_id")
        .agg(
            F.expr("min(unix_micros(ts) div 86400000000)").alias("d0"),
            F.expr("max(unix_micros(ts) div 86400000000)").alias("d1"),
        )
        .collect()
    )
    wend = max(r.d1 for r in ud)
    lives = [
        (r.d1 - r.d0 + 1, 1 if r.d1 >= wend - KM_CENSOR_DAYS else 0)
        for r in ud
    ]
    durs = sorted({d for d, _ in lives})
    got = {r.duration_days: r for r in _collect(spark, "q_kaplan_meier")}
    assert set(got) == set(durs)
    s = None
    remaining = len(lives)
    for t in durs:
        d = sum(1 for dur, c in lives if dur == t and c == 0)
        c = sum(1 for dur, c in lives if dur == t and c == 1)
        r = got[t]
        assert (r.n_risk, r.n_events, r.n_censored) == (remaining, d, c), t
        s = (
            1_000_000 * (remaining - d) // remaining
            if s is None
            else s * (remaining - d) // remaining
        )
        assert r.surv_micro == s, t
        remaining -= d + c
    # survival is non-increasing and within [0, 1e6]
    sv = [got[t].surv_micro for t in durs]
    assert sv == sorted(sv, reverse=True)
    assert all(0 <= v <= 1_000_000 for v in sv)


def test_component_removal_invariants(spark):
    rows = _collect(spark, "q_component_removal")
    assert len(rows) > 0
    for r in rows:
        # Cauchy-Schwarz: residual numerator never negative
        assert r.resid_num >= 0
        assert r.resid_num == r.xx * r.vv - r.proj * r.proj
        assert 0 <= r.removed_ratio_micro <= 1_000_000
        # exact two-step floor == true floor
        assert (
            r.removed_ratio_micro
            == (r.proj * r.proj * 1_000_000) // (r.xx * r.vv)
        )


def test_isqrt_kernel_exact(spark):
    from mysql_to_clickhouse_sync_spark.operators.stats import with_isqrt

    xs = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 10**6, 10**6 + 1,
          (1 << 31) ** 2 - 1, (1 << 31) ** 2, (1 << 62) - 1,
          999999999999999999]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r.x: r.s for r in with_isqrt(df, "x", "s").collect()}
    for x in xs:
        assert got[x] == math.isqrt(x), x


def test_wilson_ci_matches_float(spark):
    rows = _collect(spark, "q_wilson_ci")
    z = 1.96
    for r in rows:
        n, k = r.n, r.k
        center = (k + z * z / 2) / (n + z * z)
        half = (
            z * math.sqrt(4 * k * (n - k) / n + z * z) / (2 * (n + z * z))
        )
        assert abs(r.center_micro - center * 1e6) <= 3, r.lang
        assert abs(r.hi_micro - min(center + half, 1) * 1e6) <= 1500, r.lang
        assert abs(r.lo_micro - max(center - half, 0) * 1e6) <= 1500, r.lang
        assert 0 <= r.lo_micro <= r.center_micro <= r.hi_micro <= 1_000_000


def test_stddev_exact_matches_float(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc")
    ).collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.xc)
    got = {r.event_type: r for r in _collect(spark, "q_stddev_exact")}
    for t, xs in by_type.items():
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        r = got[t]
        assert r.n == n
        assert abs(r.mean_cents_milli - mean * 1000) <= 1
        # one floor before the sqrt costs at most ~1/(2*sd) milli-cents
        assert abs(r.sd_cents_milli - math.sqrt(var) * 1000) <= 1000, t


def test_hill_estimator_matches_float(spark):
    (r,) = _collect(spark, "q_tail_index")
    docs = sorted(
        (d.n_chars for d in _docs(spark) if d.n_chars > 0), reverse=True
    )
    k = r.k
    xk = docs[k]  # the (k+1)-th largest
    slog = sum(math.log2(x / xk) for x in docs[:k])
    # conventional (natural-log) Hill exponent; the kernel carries up to
    # 1 q8 unit per term, so the sum error bound is k q8 units and the
    # alpha error bound is alpha * k / sum_q8 (relative)
    want = k / (slog * math.log(2))
    bound = want * 1000 * k / r.sum_log2_q8 + 5
    assert abs(r.hill_alpha_milli - want * 1000) <= bound
    assert r.hill_alpha_milli > 0


def test_welch_t_matches_float(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_type", F.expr("CAST(floor(value * 100) AS BIGINT)").alias("xc")
    ).collect()
    a = [r.xc for r in ev if r.event_type == "purchase"]
    b = [r.xc for r in ev if r.event_type == "click"]
    (r,) = _collect(spark, "q_welch_ttest")
    assert (r.na, r.nb) == (len(a), len(b))
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se = math.sqrt(va / len(a) + vb / len(b))
    t = (ma - mb) / se
    assert abs(r.mean_a_milli - ma * 1000) <= 1
    assert abs(r.mean_b_milli - mb * 1000) <= 1
    # two variance floors + one isqrt floor: se error < ~2 milli-cents
    assert abs(r.se_cents_milli - se * 1000) <= se + 2
    assert abs(r.t_milli - t * 1000) <= max(10, abs(t)), (r.t_milli, t)
