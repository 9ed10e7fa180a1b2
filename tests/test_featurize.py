"""Featurizer + boosting operator tests (operators/featurize.py,
q_adaboost_round in operators/trees.py). Oracle parity is covered by the
roster sweep; these pin the math against independent recomputation."""

import hashlib
import math

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


def test_target_encode_loo_recount(spark):
    docs = _docs(spark)
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(1 if d.lang == "en" else 0)
    n = len(docs)
    pos = sum(1 for d in docs if d.lang == "en")
    prior = pos * 1_000_000 // n
    got = {r.doc_id: r for r in _collect(spark, "q_target_encode")}
    assert len(got) == n
    for d in docs:
        ys = by_src[d.source]
        y = 1 if d.lang == "en" else 0
        want = ((sum(ys) - y) * 1_000_000 + 10 * prior) // (len(ys) - 1 + 10)
        assert got[d.doc_id].enc_micro == want, d.doc_id
        assert got[d.doc_id].y == y


def test_feature_hash_matches_hashlib(spark):
    import re

    from mysql_to_clickhouse_sync_spark.operators.featurize import FH_DIMS

    docs = _docs(spark)
    want = {}
    for d in docs:
        for tok in re.split(r"[^a-z]+", d.text.lower()):
            if len(tok) < 3:
                continue
            u = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)
            dim = u % FH_DIMS
            sgn = 1 if (u // FH_DIMS) % 2 == 1 else -1
            v, c = want.get((d.doc_id, dim), (0, 0))
            want[(d.doc_id, dim)] = (v + sgn, c + 1)
    got = {(r.doc_id, r.dim): (r.val, r.n_tok)
           for r in _collect(spark, "q_feature_hash")}
    assert got == want


def test_mutual_info_matches_float_within_kernel_error(spark):
    """Per-cell lq8 carries < 1 q8 unit of error; four of them weighted
    by cxy bound |mi_micro - float MI| by 4e6/256 ~ 15.6k micro-bits,
    plus one more q8 truncation (~3.9k) from the two-step final div."""
    from collections import Counter

    from mysql_to_clickhouse_sync_spark.operators.mleval import milli_features
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)"
    )).collect()
    rows = {r.feat: r for r in _collect(spark, "q_mutual_info")}
    assert set(rows) == {"len", "alpha", "stop", "digit"}
    for feat in rows:
        cells = Counter(
            (min(getattr(f, f"{feat}_milli") // 64, 15), f.y) for f in feats
        )
        n = sum(cells.values())
        mx = Counter()
        my = Counter()
        for (b, y), c in cells.items():
            mx[b] += c
            my[y] += c
        mi = sum(
            (c / n) * math.log2(c * n / (mx[b] * my[y]))
            for (b, y), c in cells.items()
        )
        assert abs(rows[feat].mi_micro - mi * 1_000_000) <= 20_000, feat
    # stopword ratio is the language feature by construction — it must
    # carry clearly more information about lang='en' than doc length
    assert rows["stop"].mi_micro >= rows["len"].mi_micro


def test_mixture_diversity_against_float_math(spark):
    (row,) = _collect(spark, "q_mixture_diversity")
    docs = _docs(spark)
    from collections import Counter

    cnt = Counter(d.source for d in docs)
    n = len(docs)
    gini = 1 - sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
    h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
    assert row.n_docs == n and row.n_sources == len(cnt)
    assert abs(row.gini_simpson_micro - gini * 1_000_000) <= 1
    # Q8 kernel resolution is 1/256 bit ~ 3.9 milli-bits
    assert abs(row.shannon_milli - h * 1000) <= 4
    assert abs(row.effective_sources_milli - (2 ** h) * 1000) <= 60
    # effective sources can never exceed actual sources (+ kernel slack)
    assert row.effective_sources_milli <= row.n_sources * 1000 + 60


def test_adaboost_round2_differs_and_errors_sane(spark):
    rows = {r.round: r for r in _collect(spark, "q_adaboost_round")}
    assert set(rows) == {1, 2}
    r1, r2 = rows[1], rows[2]
    # round 1 is unweighted: tot_w = n docs; err < half (better than chance
    # because maj sides are fit on the data)
    assert r1.err_w * 2 <= r1.tot_w
    # round 2 weights mistakes x3
    from mysql_to_clickhouse_sync_spark.operators.trees import BOOST_EMPHASIS

    assert r2.tot_w == r1.tot_w + (BOOST_EMPHASIS - 1) * r1.err_w
    # the reweighted round must change the lens: different stump
    # (feature or threshold) unless round 1 was already perfect
    if r1.err_w > 0:
        assert (r1.feat, r1.thr) != (r2.feat, r2.thr) or r2.err_w != r1.err_w
    for r in (r1, r2):
        assert r.maj_l in (0, 1) and r.maj_r in (0, 1)
        assert 0 <= r.err_w <= r.tot_w


def test_adaboost_round1_matches_stump_train_winner(spark):
    """Round 1 (uniform weights) must pick exactly the global best of
    the per-feature q_stump_train table."""
    stumps = _collect(spark, "q_stump_train")
    best = min(stumps, key=lambda r: (r.imp_micro, r.feat, r.thr))
    rows = {r.round: r for r in _collect(spark, "q_adaboost_round")}
    assert (rows[1].feat, rows[1].thr, rows[1].imp_micro) == (
        best.feat,
        best.thr,
        best.imp_micro,
    )
