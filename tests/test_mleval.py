"""Model-evaluation operator tests (operators/mleval.py + q_holt_linear).

Oracle parity for all six queries is covered by the roster-wide sweep in
tests/test_oracle_parity.py; here we pin the STATISTICS themselves against
independent recomputations (scipy-free, pure Python) on the fixture data —
the oracle can't catch a formula that's wrong the same way on both engines.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _collect(spark, name):
    from mysql_to_clickhouse_sync_spark.registry import REGISTRY, _load_all_modules

    _load_all_modules()
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def _scored_pairs(spark):
    """(score z_q8, y) pairs straight from the logistic scorer."""
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.mlscore import logistic_scored

    docs = load_table(spark, SF_DIR, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    rows = logistic_scored(docs).select("doc_id", "lang", "z_q8", "p_milli").collect()
    src = {
        r.doc_id: r.source
        for r in docs.select("doc_id", "source").collect()
    }
    return [(src[r.doc_id], r.z_q8, r.p_milli, 1 if r.lang == "en" else 0) for r in rows]


def test_auc_matches_naive_pairwise(spark):
    """auc_micro equals the exhaustive pairwise P(score_pos > score_neg)
    + 0.5 P(tie) count, per source, to within the 1-microunit floor."""
    pairs = _scored_pairs(spark)
    got = {r.source: r for r in _collect(spark, "q_auc_roc")}
    by_src = {}
    for s, z, _p, y in pairs:
        by_src.setdefault(s, []).append((z, y))
    checked = 0
    for s, zy in by_src.items():
        pos = [z for z, y in zy if y == 1]
        neg = [z for z, y in zy if y == 0]
        if not pos or not neg:
            assert s not in got
            continue
        wins = sum(1 for p in pos for n in neg if p > n)
        ties = sum(1 for p in pos for n in neg if p == n)
        want = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))
        assert got[s].auc_micro == want, s
        assert got[s].n_pos == len(pos) and got[s].n_neg == len(neg)
        assert got[s].gini_micro == 2 * got[s].auc_micro - 1_000_000
        checked += 1
    assert checked >= 3


def test_pr_curve_monotone_and_endpoints(spark):
    rows = sorted(_collect(spark, "q_pr_curve"), key=lambda r: -r.threshold_milli)
    pairs = _scored_pairs(spark)
    pos = sum(y for _s, _z, _p, y in pairs)
    n = len(pairs)
    # recall is non-decreasing as the threshold drops; tp+fp hits n at the end
    recalls = [r.recall_micro for r in rows]
    assert recalls == sorted(recalls)
    assert rows[-1].tp + rows[-1].fp == n
    assert rows[-1].tp == pos and rows[-1].recall_micro == 1_000_000
    # spot-check one mid row against a direct recount
    mid = rows[len(rows) // 2]
    tp = sum(1 for _s, _z, p, y in pairs if p >= mid.threshold_milli and y == 1)
    fp = sum(1 for _s, _z, p, y in pairs if p >= mid.threshold_milli and y == 0)
    assert (mid.tp, mid.fp) == (tp, fp)
    assert mid.precision_micro == tp * 1_000_000 // (tp + fp)
    assert mid.f1_micro == 2 * tp * 1_000_000 // (tp + fp + pos)


def test_ks_matches_direct_scan(spark):
    pairs = _scored_pairs(spark)
    en = sorted(z for _s, z, _p, y in pairs if y == 1)
    ot = sorted(z for _s, z, _p, y in pairs if y == 0)
    zs = sorted(set(en) | set(ot))
    best = (-1, None)
    for z in zs:
        ce = sum(1 for v in en if v <= z)
        co = sum(1 for v in ot if v <= z)
        d = abs(ce * len(ot) - co * len(en))
        if d > best[0]:
            best = (d, z)
    (row,) = _collect(spark, "q_ks_2samp")
    assert row.n_en == len(en) and row.n_other == len(ot)
    assert row.ks_micro == best[0] * 1_000_000 // (len(en) * len(ot))
    assert row.arg_z_q8 == best[1]


def test_naive_bayes_beats_prior_and_is_complete(spark):
    rows = _collect(spark, "q_naive_bayes")
    n = len(rows)
    assert n > 0
    assert len({r.doc_id for r in rows}) == n  # one prediction per doc
    acc = sum(1 for r in rows if r.correct) / n
    langs = [r.lang for r in rows]
    majority = max(set(langs), key=langs.count)
    prior = langs.count(majority) / n
    # the features carry real language signal (stopword/alpha ratios);
    # NB must at least match predicting the majority class everywhere
    assert acc >= prior - 1e-9, (acc, prior)
    assert all(r.correct == (r.lang == r.pred_lang) for r in rows)


def test_knn_panel_and_vote_bounds(spark):
    from mysql_to_clickhouse_sync_spark.operators.mleval import KNN_K, KNN_STRIDE

    rows = _collect(spark, "q_knn_classify")
    assert all(r.vec_id % KNN_STRIDE == 0 for r in rows)
    assert all(1 <= r.votes <= KNN_K for r in rows)
    # majority vote with <= 5 voters over >= 2 labels: votes >= ceil(5/#labels)
    assert len({r.pred_label for r in rows}) >= 1


def test_holt_matches_python_recurrence(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    ser = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day_n"),
        )
        .agg(F.count("*").alias("y"))
        .collect()
    )
    by_type = {}
    for r in ser:
        by_type.setdefault(r.event_type, []).append((r.day_n, r.y))
    got = {r.event_type: r for r in _collect(spark, "q_holt_linear")}
    assert set(got) == set(by_type)
    for t, series in by_type.items():
        series.sort()
        l = b = sse = None
        for i, (_d, y) in enumerate(series):
            if i == 0:
                l, b, sse = y * 1000, 0, 0
            else:
                err = y * 1000 - l - b
                sse += err * err
                l_new = math.floor((y * 1000 + l + b) / 2)
                b = math.floor((b + l_new - l) / 2)
                l = l_new
        r = got[t]
        assert (r.n_days, r.level_milli, r.trend_milli) == (len(series), l, b)
        assert r.forecast_milli == l + b and r.sse == sse


def test_holt_negative_trend_floor_division(spark):
    """A strictly decreasing series drives the trend negative — pin that
    the positivity-offset div matches Python floor semantics there."""
    from mysql_to_clickhouse_sync_spark.operators.timeseries import HOLT_OFF

    df = spark.createDataFrame([(0, 100), (1, 3), (2, 1)], "day_n long, y long")
    l_new = f"((o.y * 1000 + acc.l + acc.b + {2 * HOLT_OFF}) div 2 - {HOLT_OFF})"
    b_new = f"((acc.b + {l_new} - acc.l + {2 * HOLT_OFF}) div 2 - {HOLT_OFF})"
    fold = f"""
        aggregate(
            sort_array(collect_list(named_struct('day_n', day_n, 'y', y))),
            named_struct('n', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
                         'b', CAST(0 AS BIGINT), 'sse', CAST(0 AS BIGINT)),
            (acc, o) -> CASE WHEN acc.n = 0 THEN
                named_struct('n', CAST(1 AS BIGINT), 'l', o.y * 1000,
                             'b', CAST(0 AS BIGINT), 'sse', CAST(0 AS BIGINT))
            ELSE
                named_struct('n', acc.n + 1, 'l', {l_new}, 'b', {b_new},
                             'sse', acc.sse + (o.y * 1000 - acc.l - acc.b)
                                    * (o.y * 1000 - acc.l - acc.b))
            END)
    """
    (row,) = df.agg(F.expr(fold).alias("st")).select("st.*").collect()
    # python floor reference
    l, b = 100_000, 0
    l1 = math.floor((3_000 + l + b) / 2)
    b1 = math.floor((b + l1 - l) / 2)
    l2 = math.floor((1_000 + l1 + b1) / 2)
    b2 = math.floor((b1 + l2 - l1) / 2)
    assert b1 < 0 and b2 < 0  # the regime under test
    assert (row.l, row.b) == (l2, b2)


def test_bootstrap_poisson_thresholds_pinned():
    from mysql_to_clickhouse_sync_spark.operators.mleval import (
        BOOT_T0, BOOT_T1, BOOT_T2, BOOT_T3, BOOT_T4,
    )

    e = math.exp(-1)
    cum = [e, 2 * e, 2.5 * e, e * (1 + 1 + 0.5 + 1 / 6),
           e * (1 + 1 + 0.5 + 1 / 6 + 1 / 24)]
    got = [BOOT_T0, BOOT_T1, BOOT_T2, BOOT_T3, BOOT_T4]
    for g, c in zip(got, cum):
        assert g == math.floor(c * 1_000_000), (g, c)


def test_bootstrap_interval_brackets_point(spark):
    (row,) = _collect(spark, "q_bootstrap_ci")
    assert row.n_resamples == 40
    assert row.lo_milli <= row.hi_milli
    # the resample distribution should bracket the point estimate
    assert row.lo_milli <= row.point_milli <= row.hi_milli


def test_conformal_coverage_near_level(spark):
    (row,) = _collect(spark, "q_conformal_threshold")
    assert 1 <= row.q_idx <= row.n_cal
    # distribution-free guarantee is >= 90% in expectation over splits;
    # on one fixed split allow generous slack but catch gross breakage
    assert row.coverage_micro >= 700_000, row
    assert 0 <= row.pred_en_rate_micro <= 1_000_000


def test_calibration_bins_recount(spark):
    rows = _collect(spark, "q_calibration_bins")
    pairs = _scored_pairs(spark)
    byb = {}
    for _s, _z, p, y in pairs:
        byb.setdefault(min(p // 100, 9), []).append((p, y))
    assert {r.bin for r in rows} == set(byb)
    num = den = 0
    for r in rows:
        ps = byb[r.bin]
        assert r.n == len(ps)
        assert r.mean_pred_micro == sum(p for p, _ in ps) * 1000 // len(ps)
        assert r.obs_rate_micro == sum(y for _, y in ps) * 1_000_000 // len(ps)
        assert r.gap_micro == abs(r.mean_pred_micro - r.obs_rate_micro)
        num += r.n * r.gap_micro
        den += r.n
    assert all(r.ece_micro == num // den for r in rows)


def test_psi_nonnegative_and_symmetric_zero(spark):
    rows = _collect(spark, "q_psi_drift")
    assert len(rows) == 10
    psi = {r.psi_micro for r in rows}
    assert len(psi) == 1  # repeated total
    # PSI >= 0 up to floor rounding (bounded below by -10 q8-floor slips)
    assert psi.pop() >= -40
    # halves partition the corpus
    n_a = sum(r.n_a for r in rows)
    n_b = sum(r.n_b for r in rows)
    assert n_a > 0 and n_b > 0


def test_link_predict_scores_recount(spark):
    """Recompute AA for a handful of pairs from the raw graph."""
    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from mysql_to_clickhouse_sync_spark.operators.clustering import (
        LP_NODE_BOUND, LP_TAU,
    )
    from mysql_to_clickhouse_sync_spark.operators.text import (
        with_fixed_log2_q8,
    )

    emb = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < LP_NODE_BOUND
    )
    vecs = {
        r.vec_id: [math.floor(float(v) * 1024) for v in r.embedding]
        for r in emb.collect()
    }
    ids = sorted(vecs)
    adj = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                d = sum(a * b for a, b in zip(vecs[i], vecs[j]))
                if d >= LP_TAU:
                    adj[i].add(j)
                    adj[j].add(i)
    lq8 = {
        r.d: r.l
        for r in with_fixed_log2_q8(
            spark.createDataFrame(
                [(len(adj[i]),) for i in ids if len(adj[i]) >= 2], "d long"
            ).distinct(),
            "d",
            "l",
        ).collect()
    }
    got = {(r.src, r.dst): r for r in _collect(spark, "q_link_predict")}
    want = {}
    for z in ids:
        nb = sorted(adj[z])
        if len(nb) < 2:
            continue
        wz = 1_000_000 * 256 // lq8[len(adj[z])]
        for x in range(len(nb)):
            for y in range(x + 1, len(nb)):
                u, w = nb[x], nb[y]
                if w in adj[u]:
                    continue
                k = (u, w)
                c, s = want.get(k, (0, 0))
                want[k] = (c + 1, s + wz)
    assert set(got) == set(want)
    for k, (c, s) in want.items():
        assert (got[k].n_common, got[k].aa_micro) == (c, s), k


def test_opt_threshold_is_true_argmax(spark):
    rows = {r.criterion: r for r in _collect(spark, "q_opt_threshold")}
    assert set(rows) == {"max_f1", "max_youden"}
    pr = _collect(spark, "q_pr_curve")
    pairs = _scored_pairs(spark)
    pos = sum(y for _s, _z, _p, y in pairs)
    n = len(pairs)
    best_f1 = max(r.f1_micro for r in pr)
    assert rows["max_f1"].score_micro == best_f1
    # recompute youden at the reported threshold
    r = rows["max_youden"]
    tp = sum(1 for _s, _z, p, y in pairs if p >= r.threshold_milli and y == 1)
    fp = sum(1 for _s, _z, p, y in pairs if p >= r.threshold_milli and y == 0)
    assert (r.tp, r.fp) == (tp, fp)
    assert r.score_micro == tp * 1_000_000 // pos - fp * 1_000_000 // (n - pos)


def test_word_dropout_replayable(spark):
    import hashlib

    from mysql_to_clickhouse_sync_spark.catalog import load_table

    docs = {
        d.doc_id: d.text
        for d in load_table(spark, SF_DIR, "documents").collect()
        if d.text.strip()
    }
    got = {r.doc_id: r for r in _collect(spark, "q_word_dropout")}
    assert set(got) == set(docs)
    import re

    for doc_id, text in list(docs.items())[:50]:
        toks = re.split(r"\s+", text.strip())
        kept = []
        dropped = 0
        for i, t in enumerate(toks):
            u = int(
                hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:12], 16
            ) % 1000
            if u < 150:
                dropped += 1
            else:
                kept.append(t)
        r = got[doc_id]
        assert (r.n_tokens, r.n_dropped) == (len(toks), dropped), doc_id
        assert r.aug_text == " ".join(kept), doc_id


def test_drift_stream_equals_batch_bins(spark):
    got = {r.bin: r for r in _collect(spark, "s_drift_stream")}
    psi = {r.bin: r for r in _collect(spark, "q_psi_drift")}
    # q_psi_drift reports Laplace +1 cells on a dense spine; the stream
    # reports raw counts on occupied bins — cross-check the raw counts
    for b, r in got.items():
        assert psi[b].n_a == r.n_base and psi[b].n_b == r.n_cur, b


def test_mcc_matches_float(spark):
    (r,) = _collect(spark, "q_mcc_eval")
    pairs = _scored_pairs(spark)
    tp = sum(1 for _s, _z, p, y in pairs if p >= 500 and y == 1)
    fp = sum(1 for _s, _z, p, y in pairs if p >= 500 and y == 0)
    tn = sum(1 for _s, _z, p, y in pairs if p < 500 and y == 0)
    fn = sum(1 for _s, _z, p, y in pairs if p < 500 and y == 1)
    assert (r.tp, r.fp, r.tn, r.fn) == (tp, fp, tn, fn)
    den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    mcc = (tp * tn - fp * fn) / den if den else 0.0
    assert abs(r.mcc_milli - mcc * 1000) <= 2
    assert -1000 <= r.mcc_milli <= 1000


def test_mixture_rebalance_targets_uniform(spark):
    rows = _collect(spark, "q_mixture_rebalance")
    k = len(rows)
    n = sum(r.n_i for r in rows)
    for r in rows:
        assert r.actual_micro == r.n_i * 1_000_000 // n
        assert r.target_micro == 1_000_000 // k
        assert 0 < r.rate_milli <= 1000
        assert r.expect_kept == r.n_i * r.rate_milli // 1000
        # never up-sample; under-represented langs keep everything
        if r.actual_micro <= r.target_micro:
            assert r.rate_milli == 1000
    # expected mixture after thinning is closer to uniform than before
    after = [r.expect_kept for r in rows]
    tot_after = sum(after)
    before_dev = sum(abs(r.actual_micro - 1_000_000 // k) for r in rows)
    after_dev = sum(
        abs(x * 1_000_000 // tot_after - 1_000_000 // k) for x in after
    )
    assert after_dev <= before_dev


def test_isotonic_fit_is_monotone_and_pools_violators(spark):
    """The minimax identity must produce a non-decreasing curve, agree
    with the observed rate wherever the raw rates are already ordered,
    and pool adjacent violators to the pool mean elsewhere."""
    from mysql_to_clickhouse_sync_spark.operators.mleval import (
        q_isotonic_calibration,
    )
    from tests.conftest import SF_DIR

    rows = sorted(
        q_isotonic_calibration(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    iso = [r.iso_rate_micro for r in rows]
    assert iso == sorted(iso), f"isotonic fit not monotone: {iso}"
    # the fit is a weighted projection: total mass is conserved
    assert sum(r.n * r.iso_rate_micro for r in rows) <= sum(
        r.n * r.obs_rate_micro for r in rows
    ) + len(rows) * max(r.n for r in rows)  # floor slack only
