"""Histogram-based decision-stump training + ensemble inference.

The supervised-model companion to the mlscore module's fixed-weight
models: here the engine TRAINS the model, in the shape every gradient-
boosting library (LightGBM/XGBoost `hist` mode) uses at scale — never
scan the rows per candidate split; build one (feature, bucket) histogram
of (count, positives) and derive EVERY candidate split's statistics from
cumulative sums over that tiny table.

  * q_stump_train    — per feature, the Gini-optimal depth-1 split over
                       the shared integer milli-features
                       (operators/mlscore.py `milli_features`), target
                       y = (lang = 'en'). Exact integer Gini in
                       micro-units.
  * q_stump_ensemble — score every document with the four trained
                       stumps (majority vote of per-side majority
                       classes) and report the confusion against ground
                       truth — the query is its own accuracy audit.

Exact-integer Gini: weighted impurity of a split is
(2*p_l*q_l/n_l + 2*p_r*q_r/n_r) / n. Both engines compute
inner = (2000*p_s*(n_s-p_s)) // n_s per side (scaled to permille before
the truncating division; p*(n-p) <= n^2/4 keeps 2000*that within BIGINT
for n < ~1.4e8 — far above any fixture scale; at larger n drop the
inner scale) then imp_micro = (inner_l + inner_r) * 1000 // n. Same
truncating program on both engines — bitwise parity by construction.

The reference has no model training of any kind (SURVEY.md §2.8); this
is a north-star pipeline extension (label-model / quality-classifier
training loops of a curation pipeline).

Scale notes: one map-side stack (4 rows per doc), one
(feature, bucket)-keyed map-side-combined shuffle into a histogram whose
size is features x buckets (~4 x 64 — INDEPENDENT of corpus size), then
windows and argmin entirely on that tiny table. The ensemble pass is a
broadcast join of the 4-row model. This is the canonical 100 TB-safe
training shape: the data is touched exactly once per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.mlscore import (
    milli_feats_sql,
    milli_features,
)
from mysql_to_clickhouse_sync_spark.registry import declare

STUMP_FEATURES = ("len_milli", "alpha_milli", "stop_milli", "digit_milli")
STUMP_BUCKET = 16  # histogram bucket width in milli-units
GINI_SCALE = 1_000_000  # impurities reported in exact micro-units
_TARGET_SQL = "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)"


def _stump_sql(pred: str = "TRUE", tag: str = "") -> str:
    """Shared oracle CTE chain: milli-features (restricted to `pred` —
    the training fold) -> stacked (feat, val, y) -> (feat, bucket)
    histogram -> cumulative split stats -> per-feature Gini-argmin
    stump table `best{tag}`. `tag` suffixes every CTE so two folds'
    chains coexist in one WITH (q_stump_cv)."""
    stacked = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, y, '{f}' AS feat, {f} AS val FROM feats{tag}"
        for f in STUMP_FEATURES
    )
    return f"""
    feats{tag} AS (
        SELECT * FROM (
        {milli_feats_sql(f"doc_id, {_TARGET_SQL} AS y")}
        ) WHERE {pred}
    ), stacked{tag} AS (
            {stacked}
    ), hist{tag} AS (
        SELECT feat, val // {STUMP_BUCKET} AS b,
               CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(y) AS BIGINT) AS p_b
        FROM stacked{tag} GROUP BY feat, b
    ), tot{tag} AS (
        SELECT feat, CAST(sum(n_b) AS BIGINT) AS n,
               CAST(sum(p_b) AS BIGINT) AS p
        FROM hist{tag} GROUP BY feat
    ), cum{tag} AS (
        SELECT feat, b,
               CAST(sum(n_b) OVER w AS BIGINT) AS n_l,
               CAST(sum(p_b) OVER w AS BIGINT) AS p_l
        FROM hist{tag}
        WINDOW w AS (PARTITION BY feat ORDER BY b)
    ), cand{tag} AS (
        SELECT cum{tag}.feat, (b + 1) * {STUMP_BUCKET} AS thr,
               n_l, p_l, n - n_l AS n_r, p - p_l AS p_r, n, p
        FROM cum{tag} JOIN tot{tag} USING (feat)
        WHERE n_l < n
    ), scored{tag} AS (
        SELECT feat, thr, n_l, p_l, n_r, p_r,
               (((2000 * p_l * (n_l - p_l)) // n_l
                 + (2000 * p_r * (n_r - p_r)) // n_r) * 1000) // n
                   AS imp_micro,
               (((2000 * p * (n - p)) // n) * 1000) // n AS root_micro
        FROM cand{tag}
    ), best{tag} AS (
        SELECT feat, thr, n_l, p_l, n_r, p_r, imp_micro,
               root_micro - imp_micro AS gain_micro
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY feat
                       ORDER BY imp_micro, thr) AS rn
            FROM scored{tag}
        )
        WHERE rn = 1
    )
    """


def _stumps(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> DataFrame:
    """Spark mirror of `_stump_sql` through `best`; `pred` (a doc_id
    predicate) restricts the training fold."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(_TARGET_SQL))
    if pred is not None:
        feats = feats.filter(pred)
    pairs = ", ".join(f"'{f}', {f}" for f in STUMP_FEATURES)
    stacked = feats.selectExpr(
        "doc_id",
        "y",
        f"stack({len(STUMP_FEATURES)}, {pairs}) AS (feat, val)",
    )
    hist = stacked.groupBy(
        "feat", F.expr(f"val div {STUMP_BUCKET}").alias("b")
    ).agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("p_b"),
    )
    tot = hist.groupBy("feat").agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("p_b").cast("long").alias("p"),
    )
    w = Window.partitionBy("feat").orderBy("b")
    cum = hist.select(
        "feat",
        "b",
        F.sum("n_b").over(w).cast("long").alias("n_l"),
        F.sum("p_b").over(w).cast("long").alias("p_l"),
    )
    cand = (
        cum.join(F.broadcast(tot), "feat")
        .filter(F.col("n_l") < F.col("n"))
        .select(
            "feat",
            ((F.col("b") + 1) * STUMP_BUCKET).alias("thr"),
            "n_l",
            "p_l",
            (F.col("n") - F.col("n_l")).alias("n_r"),
            (F.col("p") - F.col("p_l")).alias("p_r"),
            "n",
            "p",
        )
    )
    scored = cand.select(
        "feat",
        "thr",
        "n_l",
        "p_l",
        "n_r",
        "p_r",
        F.expr(
            "(((2000 * p_l * (n_l - p_l)) div n_l"
            " + (2000 * p_r * (n_r - p_r)) div n_r) * 1000) div n"
        ).alias("imp_micro"),
        F.expr("(((2000 * p * (n - p)) div n) * 1000) div n").alias(
            "root_micro"
        ),
    )
    wbest = Window.partitionBy("feat").orderBy("imp_micro", "thr")
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "feat",
            "thr",
            "n_l",
            "p_l",
            "n_r",
            "p_r",
            "imp_micro",
            (F.col("root_micro") - F.col("imp_micro")).alias("gain_micro"),
        )
    )


@declare(
    "q_stump_train",
    oracle=f"""
    WITH {_stump_sql()}
    SELECT feat, thr, n_l, p_l, n_r, p_r, imp_micro, gain_micro FROM best
    """,
    tier="P1",
)
def q_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train one Gini-optimal depth-1 decision stump per milli-feature
    for the target y = (lang = 'en') — supervised model training inside
    the engine, in the histogram shape (LightGBM `hist`): candidate
    splits are bucket edges, and every split's statistics come from
    cumulative sums over a (feature x bucket) histogram whose size does
    not grow with the corpus. Impurities are exact integer micro-units
    (see module docstring for the overflow-safe division order), so the
    chosen thresholds and gains are bitwise engine-identical.

    Scale notes: one stack (map), one (feat, bucket) map-side-combined
    shuffle, then windows over ~256 rows. The data is scanned once; at
    100 TB this is a single cheap aggregation pass."""
    return _stumps(spark, sf_dir)


@declare(
    "q_stump_ensemble",
    oracle=f"""
    WITH {_stump_sql()},
    votes AS (
        SELECT s.doc_id, s.y,
               CASE WHEN (CASE WHEN s.val < b.thr
                          THEN 2 * b.p_l > b.n_l
                          ELSE 2 * b.p_r > b.n_r END)
                    THEN 1 ELSE 0 END AS v
        FROM stacked s JOIN best b USING (feat)
    )
    SELECT doc_id, CAST(max(y) AS BIGINT) AS is_en,
           CAST(sum(v) AS BIGINT) AS votes_en,
           sum(v) > {len(STUMP_FEATURES) // 2} AS pred_en,
           (sum(v) > {len(STUMP_FEATURES) // 2}) = (max(y) = 1) AS correct
    FROM votes GROUP BY doc_id
    """,
    tier="P1",
)
def q_stump_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the four freshly-trained stumps: each
    stump votes the majority class of the side the document falls on,
    the ensemble predicts by majority (ties break to negative), and the
    output carries ground truth + correctness so the query doubles as
    its own accuracy audit — the train/score loop of a label-model
    pipeline, end to end under one oracle.

    Scale notes: the model is 4 rows (broadcast); voting is map-side on
    the stacked features; the per-doc tally is one doc_id-keyed
    map-side-combined shuffle of 4 rows per doc. Linear scale-out."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(_TARGET_SQL))
    pairs = ", ".join(f"'{f}', {f}" for f in STUMP_FEATURES)
    stacked = feats.selectExpr(
        "doc_id",
        "y",
        f"stack({len(STUMP_FEATURES)}, {pairs}) AS (feat, val)",
    )
    best = _stumps(spark, sf_dir).select("feat", "thr", "n_l", "p_l", "n_r", "p_r")
    votes = stacked.join(F.broadcast(best), "feat").select(
        "doc_id",
        "y",
        F.expr(
            "CASE WHEN (CASE WHEN val < thr"
            " THEN 2 * p_l > n_l ELSE 2 * p_r > n_r END)"
            " THEN 1 ELSE 0 END"
        ).alias("v"),
    )
    half = len(STUMP_FEATURES) // 2
    return votes.groupBy("doc_id").agg(
        F.max("y").cast("long").alias("is_en"),
        F.sum("v").cast("long").alias("votes_en"),
        (F.sum("v") > half).alias("pred_en"),
        ((F.sum("v") > half) == (F.max("y") == 1)).alias("correct"),
    )


# --- 2-fold cross-validated stump evaluation --------------------------------

CV_FOLDS = (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1"))


def _stump_cv_oracle() -> str:
    chains = ",".join(
        _stump_sql(pred=pred, tag=f"_{tag}") for tag, pred in CV_FOLDS
    )
    evals = []
    for (tag, _), (otag, _) in zip(CV_FOLDS, reversed(CV_FOLDS)):
        evals.append(
            f"""
    , votes_{tag} AS (
        SELECT s.doc_id, s.y,
               CASE WHEN (CASE WHEN s.val < b.thr
                          THEN 2 * b.p_l > b.n_l
                          ELSE 2 * b.p_r > b.n_r END)
                    THEN 1 ELSE 0 END AS v
        FROM stacked_{otag} s JOIN best_{tag} b USING (feat)
    ), perdoc_{tag} AS (
        SELECT doc_id, max(y) AS y,
               sum(v) > {len(STUMP_FEATURES) // 2} AS pred_en
        FROM votes_{tag} GROUP BY doc_id
    )"""
        )
    finals = " UNION ALL ".join(
        f"""
    SELECT '{tag}' AS fold,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN pred_en = (y = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN pred_en = (y = 1) THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS acc_milli
    FROM perdoc_{tag}"""
        for tag, _ in CV_FOLDS
    )
    return f"WITH {chains} {''.join(evals)} {finals}"


@declare("q_stump_cv", oracle=_stump_cv_oracle(), tier="P1")
def q_stump_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-fold cross-validated stump-ensemble evaluation — the honest
    generalization estimate the in-sample q_stump_ensemble audit can't
    give: train the per-feature stumps on the even doc_ids, score the
    odd ones (and vice versa), and report held-out accuracy per fold in
    exact milli-units. Train/eval never touch the same document, so
    acc_milli is the number a curation pipeline would actually trust
    before deploying the label model.

    Scale notes: two histogram trainings (each one map-side-combined
    (feat, bucket) shuffle over half the corpus) + two broadcast-model
    scoring passes — the q_stump_train / q_stump_ensemble shapes, twice.
    Output is two rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(_TARGET_SQL))
    pairs = ", ".join(f"'{f}', {f}" for f in STUMP_FEATURES)
    stacked = feats.selectExpr(
        "doc_id",
        "y",
        f"stack({len(STUMP_FEATURES)}, {pairs}) AS (feat, val)",
    )
    half = len(STUMP_FEATURES) // 2
    folds = []
    for (tag, train_pred), (_, eval_pred) in zip(
        CV_FOLDS, reversed(CV_FOLDS)
    ):
        best = _stumps(spark, sf_dir, pred=train_pred).select(
            "feat", "thr", "n_l", "p_l", "n_r", "p_r"
        )
        votes = stacked.filter(eval_pred).join(
            F.broadcast(best), "feat"
        ).select(
            "doc_id",
            "y",
            F.expr(
                "CASE WHEN (CASE WHEN val < thr"
                " THEN 2 * p_l > n_l ELSE 2 * p_r > n_r END)"
                " THEN 1 ELSE 0 END"
            ).alias("v"),
        )
        perdoc = votes.groupBy("doc_id").agg(
            F.max("y").alias("y"),
            (F.sum("v") > half).alias("pred_en"),
        )
        folds.append(
            perdoc.agg(
                F.lit(tag).alias("fold"),
                F.count("*").cast("long").alias("n_eval"),
                F.sum(
                    F.when(
                        F.col("pred_en") == (F.col("y") == 1), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_correct"),
                F.expr(
                    "CAST(sum(CASE WHEN pred_en = (y = 1) THEN 1 ELSE 0 END)"
                    " * 1000 div count(*) AS BIGINT)"
                ).alias("acc_milli"),
            )
        )
    return folds[0].unionAll(folds[1])


# --- q_adaboost_round --------------------------------------------------------

BOOST_EMPHASIS = 3  # integer re-weight of round-1 mistakes (see docstring)


def _wstump_cte(tag: str, wsrc: str) -> str:
    """Weighted GLOBAL-argmin stump chain: like `_stump_sql` but (a)
    every histogram count is a weight sum from the `wsrc`(doc_id, w)
    CTE, and (b) `best{tag}` is the single best (feat, thr) across ALL
    features (boosting picks one stump per round, not one per feature),
    carrying the per-side majority classes. Assumes a shared `feats`
    CTE (doc_id, y, milli-features) exists in the enclosing WITH."""
    stacked = "\n            UNION ALL\n            ".join(
        f"SELECT f.doc_id, f.y, w.w, '{f0}' AS feat, f.{f0} AS val"
        f" FROM feats f JOIN {wsrc} w USING (doc_id)"
        for f0 in STUMP_FEATURES
    )
    return f"""
    stacked{tag} AS (
            {stacked}
    ), hist{tag} AS (
        SELECT feat, val // {STUMP_BUCKET} AS b,
               CAST(sum(w) AS BIGINT) AS nw_b,
               CAST(sum(w * y) AS BIGINT) AS pw_b
        FROM stacked{tag} GROUP BY feat, b
    ), tot{tag} AS (
        SELECT feat, CAST(sum(nw_b) AS BIGINT) AS nw,
               CAST(sum(pw_b) AS BIGINT) AS pw
        FROM hist{tag} GROUP BY feat
    ), cum{tag} AS (
        SELECT feat, b,
               CAST(sum(nw_b) OVER w AS BIGINT) AS nw_l,
               CAST(sum(pw_b) OVER w AS BIGINT) AS pw_l
        FROM hist{tag}
        WINDOW w AS (PARTITION BY feat ORDER BY b)
    ), cand{tag} AS (
        SELECT cum{tag}.feat, (b + 1) * {STUMP_BUCKET} AS thr,
               nw_l, pw_l, nw - nw_l AS nw_r, pw - pw_l AS pw_r, nw
        FROM cum{tag} JOIN tot{tag} USING (feat)
        WHERE nw_l < nw
    ), best{tag} AS (
        SELECT feat, thr,
               CASE WHEN 2 * pw_l > nw_l THEN 1 ELSE 0 END AS maj_l,
               CASE WHEN 2 * pw_r > nw_r THEN 1 ELSE 0 END AS maj_r,
               imp_micro
        FROM (
            SELECT *, (((2000 * pw_l * (nw_l - pw_l)) // nw_l
                        + (2000 * pw_r * (nw_r - pw_r)) // nw_r) * 1000)
                      // nw AS imp_micro,
                   row_number() OVER (
                       ORDER BY (((2000 * pw_l * (nw_l - pw_l)) // nw_l
                                  + (2000 * pw_r * (nw_r - pw_r)) // nw_r)
                                 * 1000) // nw, feat, thr) AS rn
            FROM cand{tag}
        )
        WHERE rn = 1
    ), p{tag} AS (
        SELECT s.doc_id, s.y, s.w,
               CASE WHEN s.val < b.thr THEN b.maj_l ELSE b.maj_r END AS pred
        FROM stacked{tag} s JOIN best{tag} b ON s.feat = b.feat
    ), e{tag} AS (
        SELECT CAST(sum(CASE WHEN y <> pred THEN w ELSE 0 END) AS BIGINT)
                   AS err_w,
               CAST(sum(w) AS BIGINT) AS tot_w
        FROM p{tag}
    )"""


def _adaboost_oracle() -> str:
    return f"""
    WITH feats AS (
        {milli_feats_sql(f"doc_id, {_TARGET_SQL} AS y")}
    ), w1 AS (
        SELECT doc_id, CAST(1 AS BIGINT) AS w FROM feats
    ),
    {_wstump_cte('1', 'w1')},
    w2 AS (
        SELECT doc_id, CAST(CASE WHEN y <> pred THEN {BOOST_EMPHASIS}
                            ELSE 1 END AS BIGINT) AS w
        FROM p1
    ),
    {_wstump_cte('2', 'w2')}
    SELECT CAST(1 AS BIGINT) AS round, b.feat, CAST(b.thr AS BIGINT) AS thr,
           CAST(b.maj_l AS BIGINT) AS maj_l, CAST(b.maj_r AS BIGINT) AS maj_r,
           CAST(b.imp_micro AS BIGINT) AS imp_micro, e.err_w, e.tot_w
    FROM best1 b CROSS JOIN e1 e
    UNION ALL
    SELECT CAST(2 AS BIGINT), b.feat, CAST(b.thr AS BIGINT),
           CAST(b.maj_l AS BIGINT), CAST(b.maj_r AS BIGINT),
           CAST(b.imp_micro AS BIGINT), e.err_w, e.tot_w
    FROM best2 b CROSS JOIN e2 e
    """


def _weighted_global_stump(stacked: DataFrame) -> DataFrame:
    """1-row best stump over stacked (doc_id, y, w, feat, val) — the
    Spark mirror of `_wstump_cte`'s best{tag} (global argmin, weighted
    counts, per-side majority classes)."""
    hist = stacked.groupBy(
        "feat", F.expr(f"val div {STUMP_BUCKET}").alias("b")
    ).agg(
        F.sum("w").cast("long").alias("nw_b"),
        F.sum(F.expr("w * y")).cast("long").alias("pw_b"),
    )
    tot = hist.groupBy("feat").agg(
        F.sum("nw_b").cast("long").alias("nw"),
        F.sum("pw_b").cast("long").alias("pw"),
    )
    w = Window.partitionBy("feat").orderBy("b")
    cum = hist.select(
        "feat",
        "b",
        F.sum("nw_b").over(w).cast("long").alias("nw_l"),
        F.sum("pw_b").over(w).cast("long").alias("pw_l"),
    )
    cand = (
        cum.join(F.broadcast(tot), "feat")
        .filter(F.col("nw_l") < F.col("nw"))
        .select(
            "feat",
            ((F.col("b") + 1) * STUMP_BUCKET).alias("thr"),
            "nw_l",
            "pw_l",
            (F.col("nw") - F.col("nw_l")).alias("nw_r"),
            (F.col("pw") - F.col("pw_l")).alias("pw_r"),
            "nw",
        )
    )
    imp = (
        "(((2000 * pw_l * (nw_l - pw_l)) div nw_l"
        " + (2000 * pw_r * (nw_r - pw_r)) div nw_r) * 1000) div nw"
    )
    scored = cand.withColumn("imp_micro", F.expr(imp))
    wbest = Window.orderBy("imp_micro", "feat", "thr")
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "feat",
            "thr",
            F.expr("CASE WHEN 2 * pw_l > nw_l THEN 1 ELSE 0 END")
            .cast("long")
            .alias("maj_l"),
            F.expr("CASE WHEN 2 * pw_r > nw_r THEN 1 ELSE 0 END")
            .cast("long")
            .alias("maj_r"),
            F.col("imp_micro").cast("long").alias("imp_micro"),
        )
    )


def _predict_and_err(stacked: DataFrame, best: DataFrame):
    """(per-doc predictions, 1-row weighted error) of `best` applied to
    stacked (doc_id, y, w, feat, val)."""
    p = stacked.join(F.broadcast(best), "feat").select(
        "doc_id",
        "y",
        "w",
        F.expr(
            "CASE WHEN val < thr THEN maj_l ELSE maj_r END"
        ).alias("pred"),
    )
    e = p.agg(
        F.sum(F.expr("CASE WHEN y <> pred THEN w ELSE 0 END"))
        .cast("long")
        .alias("err_w"),
        F.sum("w").cast("long").alias("tot_w"),
    )
    return p, e


@declare("q_adaboost_round", oracle=_adaboost_oracle(), tier="P1")
def q_adaboost_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two boosting rounds over the milli-feature stumps: round 1 trains
    the single Gini-best stump on uniform weights; its mistakes are
    re-weighted by a pinned integer emphasis factor (x3 — AdaBoost's
    (1-eps)/eps quantized to a fixed integer so the whole program stays
    BIGINT-exact; eps lands near 1/4 on this corpus, where the true
    multiplier is ~3) and round 2 trains the best stump under those
    weights — forcing a DIFFERENT view of the data exactly like real
    boosting. Output: per round, the chosen (feature, threshold),
    per-side majority classes, weighted impurity, and weighted error —
    the audit trail of the ensemble trainer.

    Scale notes: each round is the histogram-stump shape (one
    (feat, bucket)-keyed map-side-combined weight-sum shuffle into a
    features x buckets table, independent of corpus size) plus one
    broadcast-stump prediction pass. Two passes over the data total —
    the canonical distributed boosting cost. Weighted Gini products
    are BIGINT-safe for sum-of-weights < ~1.4e8 / weight-bound (the
    q_stump_train bound divided by the emphasis factor)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(_TARGET_SQL))
    pairs = ", ".join(f"'{f}', {f}" for f in STUMP_FEATURES)
    base = feats.selectExpr(
        "doc_id",
        "y",
        f"stack({len(STUMP_FEATURES)}, {pairs}) AS (feat, val)",
    ).localCheckpoint(eager=True)
    st1 = base.withColumn("w", F.lit(1).cast("long"))
    # 1-row stump tables and the per-doc weight vector are each consumed
    # by 2+ downstream branches — cut lineage so the histogram chain and
    # the prediction pass run once per round, not once per consumer
    # (at cluster scale this is the standard persisted boosting-weight
    # vector between rounds).
    best1 = _weighted_global_stump(st1).localCheckpoint(eager=True)
    p1, e1 = _predict_and_err(st1, best1)
    p1 = p1.localCheckpoint(eager=True)
    w2 = p1.select(
        "doc_id",
        F.expr(
            f"CAST(CASE WHEN y <> pred THEN {BOOST_EMPHASIS} ELSE 1 END"
            " AS BIGINT)"
        ).alias("w"),
    )
    st2 = base.join(w2, "doc_id")
    best2 = _weighted_global_stump(st2).localCheckpoint(eager=True)
    _p2, e2 = _predict_and_err(st2, best2)
    r1 = best1.crossJoin(e1).select(
        F.lit(1).cast("long").alias("round"),
        "feat",
        F.col("thr").cast("long").alias("thr"),
        "maj_l",
        "maj_r",
        "imp_micro",
        "err_w",
        "tot_w",
    )
    r2 = best2.crossJoin(e2).select(
        F.lit(2).cast("long").alias("round"),
        "feat",
        F.col("thr").cast("long").alias("thr"),
        "maj_l",
        "maj_r",
        "imp_micro",
        "err_w",
        "tot_w",
    )
    return r1.unionAll(r2)
