"""The end-to-end supervised curation loop as ONE declared query.

Round 5 built the stages — featurization (mlscore milli-features),
supervised training (trees.py Gini stumps), ensemble scoring
(q_stump_ensemble), operating-point selection (q_opt_threshold's
argmax-F1 shape) — each under its own oracle. q_filter_pipeline proves
they COMPOSE, not just coexist (the q_neardup_pipeline move applied to
the ML loop): train the stump ensemble on the even-doc_id fold, score
every document, pick the vote threshold that maximizes F1 on the
held-out odd fold, admit the corpus at that threshold, and emit the
per-stage admission ledger under a single DuckDB oracle. Any drift in
any stage — a feature ratio, a split threshold, a tie-break — changes
the ledger hash.

Ledger schema (one row per stage):
    stage        1_featurize | 2_train | 3_threshold | 4_filter
    n_in         rows entering the stage
    n_out        rows leaving it (stacked features / stumps /
                 eval-fold admissions / corpus admissions)
    detail       stage-specific integer (feature count, histogram
                 cells, chosen vote threshold, admitted positives)
    metric_micro stage quality in exact micro-units (prevalence,
                 total split gain, held-out F1, admitted precision)

Scale notes: training reads the corpus once into a (feature x bucket)
histogram (trees.py); scoring joins the broadcast 4-row model onto the
stacked features; threshold selection runs windows over a <=5-row vote
histogram; admission is one broadcast-scalar filter. The per-doc vote
tally is the only doc-keyed shuffle and is checkpoint-materialized
because three ledger stages consume it (the q_source_overlap lesson —
never recompute a shared corpus-sized subtree per consumer).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.mlscore import (
    milli_feats_sql,
    milli_features,
)
from mysql_to_clickhouse_sync_spark.operators.trees import (
    STUMP_BUCKET,
    STUMP_FEATURES,
    _TARGET_SQL,
    _stump_sql,
    _stumps,
)
from mysql_to_clickhouse_sync_spark.registry import declare

TRAIN_PRED = "doc_id % 2 = 0"  # training fold; odd doc_ids held out
EVAL_PRED = "doc_id % 2 = 1"
_SCALE = 1_000_000


def _oracle() -> str:
    stacked = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, y, '{f}' AS feat, {f} AS val FROM feats_all"
        for f in STUMP_FEATURES
    )
    return f"""
    WITH {_stump_sql(TRAIN_PRED, "tr")},
    feats_all AS (
        SELECT * FROM (
        {milli_feats_sql(f"doc_id, {_TARGET_SQL} AS y")}
        )
    ), stacked_all AS (
        {stacked}
    ), votes AS (
        SELECT s.doc_id, s.y,
               CASE WHEN (CASE WHEN s.val < b.thr
                          THEN 2 * b.p_l > b.n_l
                          ELSE 2 * b.p_r > b.n_r END)
                    THEN 1 ELSE 0 END AS v
        FROM stacked_all s JOIN besttr b USING (feat)
    ), tally AS MATERIALIZED (
        SELECT doc_id, CAST(max(y) AS BIGINT) AS y,
               CAST(sum(v) AS BIGINT) AS votes_en
        FROM votes GROUP BY doc_id
    ), vh AS (
        SELECT votes_en, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(y) AS BIGINT) AS p
        FROM tally WHERE {EVAL_PRED} GROUP BY votes_en
    ), vcw AS (
        SELECT votes_en,
               CAST(SUM(p) OVER wdesc AS BIGINT) AS tp,
               CAST(SUM(c - p) OVER wdesc AS BIGINT) AS fp,
               CAST(SUM(c) OVER wdesc AS BIGINT) AS n_adm,
               CAST(SUM(p) OVER () AS BIGINT) AS pos
        FROM vh
        WINDOW wdesc AS (ORDER BY votes_en DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), sel AS (
        SELECT votes_en AS t_star, n_adm,
               CAST(2 * tp * {_SCALE} // (tp + fp + pos) AS BIGINT)
                   AS f1_micro
        FROM vcw
        ORDER BY 2 * tp * {_SCALE} // (tp + fp + pos) DESC, votes_en DESC
        LIMIT 1
    ), adm AS (
        SELECT t.y FROM tally t, sel WHERE t.votes_en >= sel.t_star
    )
    SELECT '1_featurize' AS stage,
           (SELECT CAST(count(*) AS BIGINT) FROM tally) AS n_in,
           (SELECT CAST({len(STUMP_FEATURES)} * count(*) AS BIGINT)
            FROM tally) AS n_out,
           CAST({len(STUMP_FEATURES)} AS BIGINT) AS detail,
           (SELECT CAST(sum(y) * {_SCALE} // count(*) AS BIGINT)
            FROM tally) AS metric_micro
    UNION ALL
    SELECT '2_train',
           (SELECT CAST(count(*) AS BIGINT) FROM feats_all
            WHERE {TRAIN_PRED}),
           (SELECT CAST(count(*) AS BIGINT) FROM besttr),
           (SELECT CAST(count(*) AS BIGINT) FROM histtr),
           (SELECT CAST(sum(gain_micro) AS BIGINT) FROM besttr)
    UNION ALL
    SELECT '3_threshold',
           (SELECT CAST(count(*) AS BIGINT) FROM tally WHERE {EVAL_PRED}),
           (SELECT n_adm FROM sel),
           (SELECT t_star FROM sel),
           (SELECT f1_micro FROM sel)
    UNION ALL
    SELECT '4_filter',
           (SELECT CAST(count(*) AS BIGINT) FROM tally),
           (SELECT CAST(count(*) AS BIGINT) FROM adm),
           (SELECT CAST(sum(y) AS BIGINT) FROM adm),
           (SELECT CAST(sum(y) * {_SCALE} // count(*) AS BIGINT) FROM adm)
    """


@declare("q_filter_pipeline", oracle=_oracle(), tier="P1")
def q_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurize -> train (even fold) -> score -> pick the F1-optimal
    vote threshold on the held-out odd fold -> admit the corpus; return
    the four-stage admission ledger (see module docstring)."""
    best = _stumps(spark, sf_dir, pred=TRAIN_PRED).localCheckpoint(
        eager=True
    )  # the 4-row model: train once, broadcast everywhere below
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
    votes = stacked.join(F.broadcast(best), "feat").select(
        "doc_id",
        "y",
        F.expr(
            "CASE WHEN (CASE WHEN val < thr"
            " THEN 2 * p_l > n_l ELSE 2 * p_r > n_r END)"
            " THEN 1 ELSE 0 END"
        ).alias("v"),
    )
    tally = (
        votes.groupBy("doc_id")
        .agg(
            F.max("y").cast("long").alias("y"),
            F.sum("v").cast("long").alias("votes_en"),
        )
        .localCheckpoint(eager=True)  # three consumers below
    )

    # -- stage 3: held-out threshold selection over the vote histogram
    vh = (
        tally.filter(EVAL_PRED)
        .groupBy("votes_en")
        .agg(
            F.count("*").cast("long").alias("c"),
            F.sum("y").cast("long").alias("p"),
        )
    )
    wdesc = Window.orderBy(F.desc("votes_en")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vcw = vh.select(
        "votes_en",
        F.sum("p").over(wdesc).cast("long").alias("tp"),
        F.sum(F.expr("c - p")).over(wdesc).cast("long").alias("fp"),
        F.sum("c").over(wdesc).cast("long").alias("n_adm"),
        F.sum("p").over(Window.partitionBy()).cast("long").alias("pos"),
    )
    sel = (
        vcw.select(
            F.col("votes_en").alias("t_star"),
            "n_adm",
            F.expr(f"2 * tp * {_SCALE} div (tp + fp + pos)").alias(
                "f1_micro"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("f1_micro"), F.desc("t_star"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # -- stage 4: corpus admission at the selected threshold
    adm_stats = (
        tally.crossJoin(F.broadcast(sel.select("t_star")))
        .filter(F.col("votes_en") >= F.col("t_star"))
        .agg(
            F.count("*").cast("long").alias("n_admit"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )

    # -- assemble the one-row-per-stage ledger
    n_feats = len(STUMP_FEATURES)
    corpus = tally.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_en"),
    )
    train_n = (
        feats.filter(TRAIN_PRED)
        .agg(F.count("*").cast("long").alias("n_train"))
    )
    hist_cells = (
        stacked.filter(TRAIN_PRED)
        .groupBy("feat", F.expr(f"val div {STUMP_BUCKET}").alias("b"))
        .agg(F.count("*"))
        .agg(F.count("*").cast("long").alias("n_cells"))
    )
    model_stats = best.agg(
        F.count("*").cast("long").alias("n_stumps"),
        F.sum("gain_micro").cast("long").alias("gain_total"),
    )
    eval_n = (
        tally.filter(EVAL_PRED)
        .agg(F.count("*").cast("long").alias("n_eval"))
    )

    s1 = corpus.select(
        F.lit("1_featurize").alias("stage"),
        F.col("n_docs").alias("n_in"),
        (F.col("n_docs") * n_feats).alias("n_out"),
        F.lit(n_feats).cast("long").alias("detail"),
        F.expr(f"n_en * {_SCALE} div n_docs").alias("metric_micro"),
    )
    s2 = (
        train_n.crossJoin(F.broadcast(model_stats))
        .crossJoin(F.broadcast(hist_cells))
        .select(
            F.lit("2_train").alias("stage"),
            F.col("n_train").alias("n_in"),
            F.col("n_stumps").alias("n_out"),
            F.col("n_cells").alias("detail"),
            F.col("gain_total").alias("metric_micro"),
        )
    )
    s3 = eval_n.crossJoin(F.broadcast(sel)).select(
        F.lit("3_threshold").alias("stage"),
        F.col("n_eval").alias("n_in"),
        F.col("n_adm").alias("n_out"),
        F.col("t_star").alias("detail"),
        F.col("f1_micro").alias("metric_micro"),
    )
    s4 = corpus.crossJoin(F.broadcast(adm_stats)).select(
        F.lit("4_filter").alias("stage"),
        F.col("n_docs").alias("n_in"),
        F.col("n_admit").alias("n_out"),
        F.col("n_pos").alias("detail"),
        F.expr(f"n_pos * {_SCALE} div n_admit").alias("metric_micro"),
    )
    return reduce(lambda a, b: a.unionByName(b), [s1, s2, s3, s4])
