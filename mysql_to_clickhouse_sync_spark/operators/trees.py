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
