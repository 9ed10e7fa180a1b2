"""Model-evaluation operators — the measurement half of the learned-filter
loop (train in operators/trees.py, score in operators/mlscore.py, EVALUATE
here). A curation pipeline that deploys a quality model without AUC / PR /
distribution-shift numbers is flying blind; these are the four standard
evaluation shapes, each exact-integer so the DuckDB oracle matches bitwise:

  * q_auc_roc      — per-source ROC AUC of the logistic quality score
                     against y = (lang = 'en'), via the Mann-Whitney
                     rank-sum identity (exact, ties averaged).
  * q_pr_curve     — the full precision/recall/F1 sweep over every
                     distinct score threshold (cumulative confusion
                     counts from one window pass).
  * q_ks_2samp     — two-sample Kolmogorov-Smirnov distance between the
                     en and non-en score distributions (drift / shift
                     detection between corpus slices).
  * q_naive_bayes  — multinomial Naive Bayes language classifier over
                     bucketed integer milli-features, trained and scored
                     in the same query on the Q8 log2 kernel (the third
                     classifier family next to the logistic model and the
                     histogram stumps).
  * q_knn_classify — k-NN majority-vote classification over the
                     embeddings table on exact integer grid dots (the
                     deferred-decision classifier; also the exactness
                     baseline the ANN paths are audited against).

Exactness recipes (all pinned in tests/test_mleval.py):
  - AUC via ranks: with groups of tied scores, the average rank of a tie
    group of size c starting after cb rows is (2*cb + c + 1)/2 — so
    2*sum_of_positive_ranks = sum over groups of p*(2*cb + c + 1) stays
    in BIGINT, and auc_micro = (2R - npos*(npos+1)) * 1e6 //
    (2*npos*nneg). BIGINT-safe up to ~3e6 rows per AUC group; beyond
    that route the two products through DECIMAL(38,0) (documented, not
    needed at any fixture scale).
  - KS via cross-multiplied CDFs: |cum1*n2 - cum2*n1| <= n1*n2 needs no
    division until the final max row.
  - Naive Bayes log-probabilities run every count through the fixed
    log2 kernel (operators/text.py), so scores are Q8 BIGINTs on both
    engines; Laplace +1 smoothing over a dense class x feature x bucket
    grid keeps zero cells well-defined.

The reference (mysql_to_clickhouse_sync) has no evaluation of any kind
(SURVEY.md §2.8); these are north-star pipeline extensions.

Scale notes: AUC/PR/KS aggregate to a per-score-group table whose size is
bounded by the score grid (<= 1001 thresholds for p_milli, ~spread of z_q8
for the others) — the windows run over those tiny tables, never over raw
rows, so each query is scan -> map -> one map-side-combined shuffle ->
tiny-table windows. Naive Bayes' model is a 320-row broadcast. The kNN
declared form restricts queries to a FIXED panel (vec_id % KNN_STRIDE,
capped below KNN_PANEL_MAX) so cost is panel x corpus, linear in the
corpus at every SF; the unrestricted production
path is the IVF/LSH ANN family (operators/ivf.py, similarity.py) with
q_ann_recall auditing against this exact baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.mlscore import (
    SM_GRID,
    logistic_cte,
    logistic_scored,
    milli_feats_sql,
    milli_features,
)
from mysql_to_clickhouse_sync_spark.operators.text import (
    _fixed_log2_q8_sql,
    with_fixed_log2_q8,
)
from mysql_to_clickhouse_sync_spark.registry import declare

EVAL_SCALE = 1_000_000  # rates reported in exact integer micro-units


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, z_q8, p_milli, y) — the logistic quality score
    joined back to the document's source, with y = (lang='en') as the
    shared binary target of the evaluation family."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    sc = logistic_scored(docs).select(
        "doc_id",
        "z_q8",
        "p_milli",
        F.expr("CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)").alias(
            "y"
        ),
    )
    return sc.join(docs.select("doc_id", "source"), "doc_id")


_SCORED_J = """
    j AS (
        SELECT d.source, s.z_q8, s.p_milli,
               CAST(CASE WHEN s.lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
        FROM scored s JOIN documents d USING (doc_id)
    )"""


# --- q_auc_roc ---------------------------------------------------------------


def _auc_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    g AS (
        SELECT source, z_q8, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(y) AS BIGINT) AS p
        FROM j GROUP BY source, z_q8
    ), cw AS (
        SELECT *, COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY z_q8
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM g
    ), a AS (
        SELECT source,
               CAST(sum(p * (2 * cb + c + 1)) AS BIGINT) AS r2,
               CAST(sum(p) AS BIGINT) AS npos,
               CAST(sum(c) AS BIGINT) AS n
        FROM cw GROUP BY source
    )
    SELECT source, npos AS n_pos, (n - npos) AS n_neg,
           CAST((r2 - npos * (npos + 1)) * {EVAL_SCALE}
                // (2 * npos * (n - npos)) AS BIGINT) AS auc_micro,
           CAST(2 * ((r2 - npos * (npos + 1)) * {EVAL_SCALE}
                // (2 * npos * (n - npos))) - {EVAL_SCALE} AS BIGINT)
               AS gini_micro
    FROM a WHERE npos > 0 AND n - npos > 0
    """


@declare("q_auc_roc", oracle=_auc_oracle(), tier="P1")
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC AUC of the logistic quality score against
    y = (lang='en') — the Mann-Whitney rank-sum identity
    AUC = (R_pos - npos(npos+1)/2) / (npos*nneg), with tied scores
    carrying their average rank. Grouping scores first makes the rank
    sum exact in BIGINT (see module docstring), so auc_micro and
    gini_micro (= 2*AUC - 1) are bitwise engine-identical. Sources where
    either class is empty are excluded (AUC is undefined there).

    Scale notes: the logistic score is pure map; ranks come from ONE
    (source, z_q8)-keyed map-side-combined shuffle into a per-source
    score histogram, and the window/final agg run over that histogram
    (bounded by the score grid, not the corpus). Linear at 100 TB."""
    d = _scored_docs(spark, sf_dir)
    g = d.groupBy("source", "z_q8").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("z_q8")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("cb", F.coalesce(F.sum("c").over(w), F.lit(0)))
    a = g.groupBy("source").agg(
        F.sum(F.expr("p * (2 * cb + c + 1)")).cast("long").alias("r2"),
        F.sum("p").cast("long").alias("npos"),
        F.sum("c").cast("long").alias("n"),
    )
    auc = F.expr(
        f"(r2 - npos * (npos + 1)) * {EVAL_SCALE}"
        f" div (2 * npos * (n - npos))"
    )
    return (
        a.filter((F.col("npos") > 0) & (F.col("n") - F.col("npos") > 0))
        .select(
            "source",
            F.col("npos").alias("n_pos"),
            (F.col("n") - F.col("npos")).alias("n_neg"),
            auc.alias("auc_micro"),
            (F.lit(2) * auc - EVAL_SCALE).cast("long").alias("gini_micro"),
        )
    )


# --- q_pr_curve --------------------------------------------------------------


# Shared PR chain: score histogram -> cumulative confusion counts with
# class totals. Used by q_pr_curve and q_opt_threshold (SQL and Spark
# sides mirrored; keep in lockstep).
_PR_CW_CTE = """g AS (
        SELECT p_milli, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(y) AS BIGINT) AS p
        FROM j GROUP BY p_milli
    ), cw AS (
        SELECT p_milli,
               CAST(SUM(p) OVER (ORDER BY p_milli DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS tp,
               CAST(SUM(c - p) OVER (ORDER BY p_milli DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS fp,
               CAST(SUM(p) OVER () AS BIGINT) AS pos,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM g
    )"""


def _pr_cumulative(d: DataFrame) -> DataFrame:
    """(threshold p_milli, tp, fp, pos, n) — the Spark mirror of
    _PR_CW_CTE over the scored-docs frame."""
    g = d.groupBy("p_milli").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    w = Window.orderBy(F.desc("p_milli")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    return g.select(
        "p_milli",
        F.sum("p").over(w).cast("long").alias("tp"),
        F.sum(F.expr("c - p")).over(w).cast("long").alias("fp"),
        F.sum("p").over(wall).cast("long").alias("pos"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )


def _pr_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    {_PR_CW_CTE}
    SELECT p_milli AS threshold_milli, tp, fp,
           CAST(tp * {EVAL_SCALE} // (tp + fp) AS BIGINT) AS precision_micro,
           CAST(tp * {EVAL_SCALE} // pos AS BIGINT) AS recall_micro,
           CAST(2 * tp * {EVAL_SCALE} // (tp + fp + pos) AS BIGINT) AS f1_micro
    FROM cw
    """


@declare("q_pr_curve", oracle=_pr_oracle(), tier="P1")
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full precision/recall/F1 sweep of the logistic quality filter over
    every distinct score threshold ("keep docs with p >= t"): cumulative
    TP/FP from one descending window over the score histogram. All three
    rates are exact integer micro-units (F1 = 2TP / (2TP+FP+FN) avoids
    dividing by derived rates). The operating-point picker of a curation
    pipeline — choose the threshold, read off the trade.

    Scale notes: one map (score), one p_milli-keyed map-side-combined
    shuffle into a <=1001-row histogram; the unpartitioned window runs
    over that histogram only, so the single-reducer stage is bounded by
    the score grid, not the data. Linear at 100 TB."""
    cw = _pr_cumulative(_scored_docs(spark, sf_dir))
    return cw.select(
        F.col("p_milli").alias("threshold_milli"),
        "tp",
        "fp",
        F.expr(f"tp * {EVAL_SCALE} div (tp + fp)").alias("precision_micro"),
        F.expr(f"tp * {EVAL_SCALE} div pos").alias("recall_micro"),
        F.expr(f"2 * tp * {EVAL_SCALE} div (tp + fp + pos)").alias("f1_micro"),
    )


# --- q_ks_2samp --------------------------------------------------------------


def _ks_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    g AS (
        SELECT z_q8, CAST(sum(y) AS BIGINT) AS ce,
               CAST(sum(1 - y) AS BIGINT) AS co
        FROM j GROUP BY z_q8
    ), cw AS (
        SELECT z_q8,
               CAST(SUM(ce) OVER (ORDER BY z_q8) AS BIGINT) AS cume,
               CAST(SUM(co) OVER (ORDER BY z_q8) AS BIGINT) AS cumo,
               CAST(SUM(ce) OVER () AS BIGINT) AS ne,
               CAST(SUM(co) OVER () AS BIGINT) AS no
        FROM g
    ), d AS (
        SELECT *, abs(cume * no - cumo * ne) AS dnum,
               row_number() OVER (ORDER BY abs(cume * no - cumo * ne) DESC,
                                  z_q8) AS rn
        FROM cw
    )
    SELECT ne AS n_en, no AS n_other,
           CAST(dnum * {EVAL_SCALE} // (ne * no) AS BIGINT) AS ks_micro,
           z_q8 AS arg_z_q8
    FROM d WHERE rn = 1
    """


@declare("q_ks_2samp", oracle=_ks_oracle(), tier="P1")
def q_ks_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the en and non-en
    logistic-score distributions — the standard drift/shift detector
    between corpus slices (retrain the filter when KS jumps). The CDF
    gap is cross-multiplied (|cume*no - cumo*ne|) so the max and its
    arg-score are found entirely in BIGINT; only the reported ks_micro
    divides, once. Ties in the gap break toward the smallest score.

    Scale notes: same shape as q_auc_roc — one keyed shuffle into the
    score histogram, windows over the histogram only. The final argmax
    is a 1-row row_number over the histogram. Linear at 100 TB."""
    d = _scored_docs(spark, sf_dir)
    g = d.groupBy("z_q8").agg(
        F.sum("y").cast("long").alias("ce"),
        F.sum(F.expr("1 - y")).cast("long").alias("co"),
    )
    wcum = Window.orderBy("z_q8")
    wall = Window.partitionBy()
    cw = g.select(
        "z_q8",
        F.sum("ce").over(wcum).cast("long").alias("cume"),
        F.sum("co").over(wcum).cast("long").alias("cumo"),
        F.sum("ce").over(wall).cast("long").alias("ne"),
        F.sum("co").over(wall).cast("long").alias("no"),
    ).withColumn("dnum", F.expr("abs(cume * no - cumo * ne)"))
    cw = cw.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("dnum"), F.asc("z_q8")))
    )
    return cw.filter(F.col("rn") == 1).select(
        F.col("ne").alias("n_en"),
        F.col("no").alias("n_other"),
        F.expr(f"dnum * {EVAL_SCALE} div (ne * no)").alias("ks_micro"),
        F.col("z_q8").alias("arg_z_q8"),
    )


# --- q_naive_bayes -----------------------------------------------------------

NB_BUCKETS = 16  # milli-feature histogram buckets (width 64, capped at 15)
_NB_FEATS = ("len", "alpha", "stop", "digit")


def _nb_bucket(col: str) -> str:
    return f"least({col}_milli div 64, 15)"


def _nb_oracle() -> str:
    stack = " UNION ALL ".join(
        f"SELECT doc_id, lang, '{f}' AS f,"
        f" least({f}_milli // 64, 15) AS b FROM feats"
        for f in _NB_FEATS
    )
    vals = ", ".join(f"('{f}')" for f in _NB_FEATS)
    return f"""
    WITH feats AS (
        {milli_feats_sql('doc_id, lang')}
    ), st AS (
        {stack}
    ), cls AS (
        SELECT lang AS clang, CAST(count(*) AS BIGINT) AS nc
        FROM feats GROUP BY lang
    ), ntab AS (
        SELECT CAST(sum(nc) AS BIGINT) AS n FROM cls
    ), cnts AS (
        SELECT lang AS clang, f, b, CAST(count(*) AS BIGINT) AS cnt
        FROM st GROUP BY lang, f, b
    ), grid AS (
        SELECT cls.clang, cls.nc, fb.f, gs.b
        FROM cls
        CROSS JOIN (VALUES {vals}) AS fb(f)
        CROSS JOIN (SELECT unnest(generate_series(0, {NB_BUCKETS - 1}))
                    AS b) gs
    ), gc AS (
        SELECT grid.clang, grid.nc, grid.f, grid.b,
               COALESCE(cnt, 0) + 1 AS cp1
        FROM grid LEFT JOIN cnts ON cnts.clang = grid.clang
             AND cnts.f = grid.f AND cnts.b = grid.b
    ), args AS (
        SELECT DISTINCT cp1 AS x FROM gc
        UNION SELECT DISTINCT nc + {NB_BUCKETS} FROM cls
        UNION SELECT DISTINCT nc FROM cls
        UNION SELECT n FROM ntab
    ),
    {_fixed_log2_q8_sql('args')},
    model AS (
        SELECT gc.clang, gc.f, gc.b, (l1.lq8 - l2.lq8) AS w_q8
        FROM gc JOIN lg l1 ON l1.x = gc.cp1
             JOIN lg l2 ON l2.x = gc.nc + {NB_BUCKETS}
    ), sc AS (
        SELECT st.doc_id, st.lang, m.clang, CAST(sum(m.w_q8) AS BIGINT) AS sw
        FROM st JOIN model m ON m.f = st.f AND m.b = st.b
        GROUP BY st.doc_id, st.lang, m.clang
    ), pri AS (
        SELECT cls.clang, (lp.lq8 - ln.lq8) AS p_q8
        FROM cls CROSS JOIN ntab
        JOIN lg lp ON lp.x = cls.nc
        JOIN lg ln ON ln.x = ntab.n
    ), fin AS (
        SELECT sc.doc_id, sc.lang, sc.clang,
               CAST(pri.p_q8 + sc.sw AS BIGINT) AS score_q8,
               row_number() OVER (PARTITION BY sc.doc_id
                    ORDER BY (pri.p_q8 + sc.sw) DESC, sc.clang) AS rn
        FROM sc JOIN pri USING (clang)
    )
    SELECT doc_id, lang, clang AS pred_lang, score_q8,
           lang = clang AS correct
    FROM fin WHERE rn = 1
    """


@declare("q_naive_bayes", oracle=_nb_oracle(), tier="P1")
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained AND scored in
    one query: bucket the four integer milli-features (16 buckets of
    width 64), count per (class, feature, bucket) with Laplace +1 over a
    dense grid, convert every count to a Q8 log2 via the fixed kernel,
    and argmax class posterior log2 P(c) + sum_f log2 P(b_f|c) per
    document with a deterministic class-name tiebreak. The third
    classifier family (after the fixed-weight logistic and the trained
    stumps); `correct` makes it its own accuracy audit.

    Scale notes: training is one (class, feature, bucket)-keyed
    map-side-combined shuffle into a 5x4x16 = 320-row model that
    broadcasts; scoring fans each doc's 4 feature rows out by K classes
    against that broadcast and reduces per doc — one doc_id-keyed
    shuffle. Model size is independent of corpus size. Linear at
    100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    # Three consumers (class priors, training counts, scoring) — cache
    # the feature frame so the regex-heavy extraction scan runs once
    # (round 10, guide §1.3 shared subplans).
    feats = milli_features(docs, lang=F.col("lang")).cache()
    stack_expr = ", ".join(
        f"'{f}', {_nb_bucket(f)}" for f in _NB_FEATS
    )
    st = feats.select(
        "doc_id",
        "lang",
        F.expr(f"stack({len(_NB_FEATS)}, {stack_expr}) AS (f, b)"),
    ).withColumn("b", F.col("b").cast("long"))
    cls = feats.groupBy(F.col("lang").alias("clang")).agg(
        F.count("*").cast("long").alias("nc")
    )
    ntab = cls.agg(F.sum("nc").cast("long").alias("n"))
    cnts = st.groupBy(
        F.col("lang").alias("clang"), "f", "b"
    ).agg(F.count("*").cast("long").alias("cnt"))
    grid = (
        cls.select(
            "clang",
            "nc",
            F.explode(F.array(*[F.lit(f) for f in _NB_FEATS])).alias("f"),
        )
        .select(
            "clang",
            "nc",
            "f",
            F.explode(
                F.sequence(F.lit(0), F.lit(NB_BUCKETS - 1))
            ).alias("_b"),
        )
        .withColumn("b", F.col("_b").cast("long"))
        .drop("_b")
        .join(cnts, ["clang", "f", "b"], "left")
        .withColumn("cp1", F.coalesce(F.col("cnt"), F.lit(0)) + 1)
        .withColumn("ncs", F.col("nc") + NB_BUCKETS)
    )
    grid = with_fixed_log2_q8(grid, "cp1", "lc")
    grid = with_fixed_log2_q8(grid, "ncs", "ld")
    model = grid.select(
        "clang", "f", "b", (F.col("lc") - F.col("ld")).alias("w_q8")
    )
    sc = (
        st.join(F.broadcast(model), ["f", "b"])
        .groupBy("doc_id", "lang", "clang")
        .agg(F.sum("w_q8").cast("long").alias("sw"))
    )
    pri = with_fixed_log2_q8(cls, "nc", "lp").crossJoin(
        F.broadcast(with_fixed_log2_q8(ntab, "n", "ln"))
    ).select("clang", (F.col("lp") - F.col("ln")).alias("p_q8"))
    fin = (
        sc.join(F.broadcast(pri), "clang")
        .withColumn("score_q8", (F.col("p_q8") + F.col("sw")).cast("long"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc(F.col("p_q8") + F.col("sw")), F.asc("clang")
                )
            ),
        )
    )
    return fin.filter(F.col("rn") == 1).select(
        "doc_id",
        "lang",
        F.col("clang").alias("pred_lang"),
        "score_q8",
        (F.col("lang") == F.col("clang")).alias("correct"),
    )


# --- q_knn_classify ----------------------------------------------------------

KNN_STRIDE = 20  # query panel: every 20th vector ...
KNN_PANEL_MAX = 2000  # ... capped to vec_id < 2000 (<= 100 queries), so
#                       the panel is FIXED-size and pair cost stays linear
#                       in the corpus at any SF (10x stress: the un-capped
#                       modulus panel grew with the corpus and went
#                       quadratic — 142 s; capped it is flat)
KNN_K = 5


def _knn_oracle() -> str:
    return f"""
    WITH qvs AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label,
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * {SM_GRID}) AS BIGINT))
                   AS qv
        FROM embeddings
    ), qs AS (
        SELECT vec_id AS qid, label AS qlabel, qv AS qqv
        FROM qvs WHERE vec_id % {KNN_STRIDE} = 0 AND vec_id < {KNN_PANEL_MAX}
    ), pairs AS (
        SELECT qs.qid, qs.qlabel, c.vec_id AS cid, c.label AS clabel,
               list_reduce(list_transform(list_zip(qs.qqv, c.qv),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS dot
        FROM qs JOIN qvs c ON c.vec_id <> qs.qid
    ), top AS (
        SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY dot DESC, cid) AS rn
        FROM pairs
    ), votes AS (
        SELECT qid, qlabel, clabel, CAST(count(*) AS BIGINT) AS votes
        FROM top WHERE rn <= {KNN_K} GROUP BY qid, qlabel, clabel
    ), fin AS (
        SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY votes DESC, clabel) AS rn2
        FROM votes
    )
    SELECT qid AS vec_id, qlabel AS label, clabel AS pred_label, votes,
           qlabel = clabel AS correct
    FROM fin WHERE rn2 = 1
    """


@declare("q_knn_classify", oracle=_knn_oracle(), tier="P2")
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=5) majority-vote classification over the embeddings table:
    for every panel query (vec_id % 20 == 0, capped below 2000 so the
    panel is fixed-size at any corpus scale), the 5 nearest other
    vectors by exact integer grid dot (floor(x*1024) elements — the same
    float-exact quantization as q_softmax_topk), then majority label
    with (votes desc, label asc) tiebreak; neighbor ties break on
    (dot desc, vec_id asc). The deferred-decision classifier and the
    exactness baseline for the ANN family.

    Scale notes: the fixed query panel broadcasts; candidates stream
    map-only past it (panel x corpus integer dots inside codegen), then
    one qid-keyed shuffle ranks 5 + votes. Linear in the corpus for a
    fixed panel; for corpus-sized query sets route through IVF/LSH
    (operators/ivf.py) — q_ann_recall audits that trade against this
    exact form."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.expr(
            f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {SM_GRID}) AS BIGINT))"
        ).alias("qv"),
    )
    qs = emb.filter(
        (F.col("vec_id") % KNN_STRIDE == 0)
        & (F.col("vec_id") < KNN_PANEL_MAX)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("qv").alias("qqv"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("qqv", "qv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    top = pairs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vec_id"))
        ),
    ).filter(F.col("rn") <= KNN_K)
    votes = top.groupBy(
        "qid", "qlabel", F.col("label").alias("clabel")
    ).agg(F.count("*").cast("long").alias("votes"))
    fin = votes.withColumn(
        "rn2",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("clabel"))
        ),
    )
    return fin.filter(F.col("rn2") == 1).select(
        F.col("qid").alias("vec_id"),
        F.col("qlabel").alias("label"),
        F.col("clabel").alias("pred_label"),
        "votes",
        (F.col("qlabel") == F.col("clabel")).alias("correct"),
    )


# --- q_calibration_bins -------------------------------------------------------

CAL_BINS = 10  # reliability-diagram deciles over p_milli


def _calibration_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    g AS (
        SELECT least(p_milli // 100, {CAL_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p_milli) AS BIGINT) AS sp,
               CAST(sum(y) AS BIGINT) AS pos
        FROM j GROUP BY bin
    ), r AS (
        SELECT bin, n,
               CAST(sp * 1000 // n AS BIGINT) AS mean_pred_micro,
               CAST(pos * {EVAL_SCALE} // n AS BIGINT) AS obs_rate_micro
        FROM g
    )
    SELECT bin, n, mean_pred_micro, obs_rate_micro,
           CAST(abs(mean_pred_micro - obs_rate_micro) AS BIGINT) AS gap_micro,
           CAST(SUM(n * abs(mean_pred_micro - obs_rate_micro)) OVER ()
                // SUM(n) OVER () AS BIGINT) AS ece_micro
    FROM r
    """


@declare("q_calibration_bins", oracle=_calibration_oracle(), tier="P1")
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the logistic quality score: decile bins of
    p_milli, each reporting mean predicted probability vs observed
    positive rate (y = lang='en') and the calibration gap, plus the
    Expected Calibration Error (bin-weighted mean |gap|) repeated on
    every row — all exact integer micro-units. The standard check
    before treating a learned filter's score as a probability (e.g.
    for threshold transfer or mixture targeting).

    Scale notes: one bin-keyed map-side-combined shuffle into a <=10-row
    table; the ECE window runs over those 10 rows. Linear at 100 TB."""
    d = _scored_docs(spark, sf_dir)
    g = d.groupBy(
        F.expr(f"least(p_milli div 100, {CAL_BINS - 1})").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("p_milli").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("pos"),
    )
    r = g.select(
        "bin",
        "n",
        F.expr("sp * 1000 div n").alias("mean_pred_micro"),
        F.expr(f"pos * {EVAL_SCALE} div n").alias("obs_rate_micro"),
    )
    wall = Window.partitionBy()
    gap = F.expr("abs(mean_pred_micro - obs_rate_micro)")
    return (
        r.select(
            "bin",
            "n",
            "mean_pred_micro",
            "obs_rate_micro",
            gap.alias("gap_micro"),
            # integer div, never float: a double quotient can round UP
            # across an integer boundary where floor would not
            F.sum(F.col("n") * gap).over(wall).cast("long").alias("_num"),
            F.sum("n").over(wall).cast("long").alias("_den"),
        )
        .withColumn("ece_micro", F.expr("_num div _den"))
        .drop("_num", "_den")
    )


# --- q_conformal_threshold ----------------------------------------------------

CONF_LEVEL_NUM = 9  # 1 - alpha = 9/10: the 90% split-conformal guarantee
CONF_LEVEL_DEN = 10


def _conformal_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    cal AS (
        SELECT doc_id, 1000 - p_milli AS s
        FROM scored WHERE doc_id % 2 = 0 AND lang = 'en'
    ), ncal AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cal,
               least(({CONF_LEVEL_NUM} * (count(*) + 1)
                      + {CONF_LEVEL_DEN - 1}) // {CONF_LEVEL_DEN},
                     count(*)) AS q_idx
        FROM cal
    ), ranked AS (
        SELECT s, row_number() OVER (ORDER BY s, doc_id) AS rn FROM cal
    ), thr AS (
        SELECT ncal.n_cal, ncal.q_idx, ranked.s AS thr_milli
        FROM ncal JOIN ranked ON ranked.rn = ncal.q_idx
    ), test AS (
        SELECT doc_id, 1000 - p_milli AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM scored WHERE doc_id % 2 = 1
    )
    SELECT thr.n_cal, thr.q_idx, CAST(thr.thr_milli AS BIGINT) AS thr_milli,
           CAST(sum(test.y) AS BIGINT) AS n_test_en,
           CAST(sum(CASE WHEN test.y = 1 AND test.s <= thr.thr_milli
                    THEN 1 ELSE 0 END) * {EVAL_SCALE}
                // sum(test.y) AS BIGINT) AS coverage_micro,
           CAST(sum(CASE WHEN test.s <= thr.thr_milli THEN 1 ELSE 0 END)
                * {EVAL_SCALE} // count(*) AS BIGINT) AS pred_en_rate_micro
    FROM test CROSS JOIN thr
    GROUP BY thr.n_cal, thr.q_idx, thr.thr_milli
    """


@declare("q_conformal_threshold", oracle=_conformal_oracle(), tier="P1")
def q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the logistic filter: on the
    even-doc_id calibration half, the nonconformity score of true-en
    docs is s = 1000 - p_milli; the threshold is the
    ceil((1-alpha)(n+1))-th smallest s (alpha = 0.1, index clamped to
    n_cal) — the distribution-free 90%-coverage quantile. The odd half
    then reports realized coverage on en docs and the predicted-en rate
    (set size proxy). All integer-exact; the parity split is the same
    disjoint-halves convention as q_stump_cv and q_split_leakage.

    Scale notes: the threshold is one tiny ranked window over the
    calibration SCORE rows (at 100 TB, pre-aggregate to a score
    histogram exactly like q_auc_roc — s has <=1001 values); the test
    pass is a broadcast of the 1-row threshold. Linear."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    sc = logistic_scored(docs).select(
        "doc_id",
        "lang",
        (F.lit(1000) - F.col("p_milli")).alias("s"),
    )
    cal = sc.filter((F.col("doc_id") % 2 == 0) & (F.col("lang") == "en"))
    ncal = cal.agg(
        F.count("*").cast("long").alias("n_cal"),
    ).withColumn(
        "q_idx",
        F.expr(
            f"least(({CONF_LEVEL_NUM} * (n_cal + 1) + {CONF_LEVEL_DEN - 1})"
            f" div {CONF_LEVEL_DEN}, n_cal)"
        ),
    )
    ranked = cal.withColumn(
        "rn", F.row_number().over(Window.orderBy("s", "doc_id"))
    )
    thr = ncal.join(
        ranked.select("rn", F.col("s").alias("thr_milli")),
        F.col("rn") == F.col("q_idx"),
    ).select("n_cal", "q_idx", "thr_milli")
    test = sc.filter(F.col("doc_id") % 2 == 1).select(
        "s", F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y")
    )
    return (
        test.crossJoin(F.broadcast(thr))
        .groupBy("n_cal", "q_idx", "thr_milli")
        .agg(
            F.sum("y").cast("long").alias("n_test_en"),
            F.expr(
                f"CAST(sum(CASE WHEN y = 1 AND s <= thr_milli THEN 1 ELSE 0"
                f" END) * {EVAL_SCALE} div sum(y) AS BIGINT)"
            ).alias("coverage_micro"),
            F.expr(
                f"CAST(sum(CASE WHEN s <= thr_milli THEN 1 ELSE 0 END)"
                f" * {EVAL_SCALE} div count(*) AS BIGINT)"
            ).alias("pred_en_rate_micro"),
        )
        .select(
            "n_cal",
            "q_idx",
            F.col("thr_milli").cast("long").alias("thr_milli"),
            "n_test_en",
            "coverage_micro",
            "pred_en_rate_micro",
        )
    )


# --- q_psi_drift ---------------------------------------------------------------

PSI_OFF = 1 << 40  # final-division positivity offset (PSI sums can dip <0
#                    by floor rounding even though true PSI >= 0)


def _psi_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    sl AS (
        SELECT least(p_milli // 100, {CAL_BINS - 1}) AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
        FROM scored
    ), bins AS (
        SELECT unnest(generate_series(0, {CAL_BINS - 1})) AS bin
    ), g AS (
        SELECT bins.bin,
               CAST(COALESCE(sum(in_a), 0) + 1 AS BIGINT) AS a1,
               CAST(COALESCE(sum(1 - in_a), 0) + 1 AS BIGINT) AS b1
        FROM bins LEFT JOIN sl ON sl.bin = bins.bin
        GROUP BY bins.bin
    ), tot AS (
        SELECT CAST(sum(a1) AS BIGINT) AS na, CAST(sum(b1) AS BIGINT) AS nb
        FROM g
    ), args AS (
        SELECT DISTINCT a1 AS x FROM g
        UNION SELECT DISTINCT b1 FROM g
        UNION SELECT na FROM tot
        UNION SELECT nb FROM tot
    ),
    {_fixed_log2_q8_sql('args')},
    t AS (
        SELECT g.bin, g.a1, g.b1,
               (g.a1 * {EVAL_SCALE} // tot.na
                - g.b1 * {EVAL_SCALE} // tot.nb) AS diff_micro,
               (la.lq8 - lna.lq8 - lb.lq8 + lnb.lq8) AS lr_q8
        FROM g CROSS JOIN tot
        JOIN lg la ON la.x = g.a1
        JOIN lg lb ON lb.x = g.b1
        JOIN lg lna ON lna.x = tot.na
        JOIN lg lnb ON lnb.x = tot.nb
    )
    SELECT bin, a1 - 1 AS n_a, b1 - 1 AS n_b,
           CAST(diff_micro AS BIGINT) AS diff_micro,
           CAST(lr_q8 AS BIGINT) AS log_ratio_q8,
           CAST((SUM(diff_micro * lr_q8) OVER () + {PSI_OFF * 256}) // 256
                - {PSI_OFF} AS BIGINT) AS psi_micro
    FROM t
    """


@declare("q_psi_drift", oracle=_psi_oracle(), tier="P1")
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the even- and odd-doc_id halves
    over logistic-score deciles — the industry-standard drift metric
    (PSI > 0.2 ~= retrain). PSI = sum (p_i - q_i) * log2(p_i / q_i) with
    Laplace +1 cells over a dense bin spine; shares run as integer
    micro-fractions and the log-ratio through the Q8 log2 kernel, so
    every per-bin term and the total are bitwise engine-identical. The
    final /256 carries a positivity offset: floor rounding can push the
    near-zero sum negative, where truncating and floor division differ —
    the offset makes them equal. Complements q_ks_2samp (KS = max gap; PSI
    = mass-weighted divergence).

    Scale notes: one bin-keyed map-side-combined shuffle into 10 cells;
    everything after runs on the 10-row table. Linear at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    sc = logistic_scored(docs).select(
        F.expr(f"least(p_milli div 100, {CAL_BINS - 1})").alias("bin"),
        F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END").alias("in_a"),
    )
    cnt = sc.groupBy("bin").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum(F.expr("1 - in_a")).cast("long").alias("cb"),
    )
    spine = (
        docs.sparkSession.range(CAL_BINS)
        .select(F.col("id").cast("long").alias("bin"))
    )
    # Two consumers (the Laplace totals and the per-bin terms) — cache
    # the 10-row binned frame so the scoring scan runs once (round 10,
    # guide §1.3 shared subplans).
    g = (
        spine.join(cnt, "bin", "left")
        .select(
            "bin",
            (F.coalesce(F.col("ca"), F.lit(0)) + 1).cast("long").alias("a1"),
            (F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("long").alias("b1"),
        )
        .cache()
    )
    tot = g.agg(
        F.sum("a1").cast("long").alias("na"),
        F.sum("b1").cast("long").alias("nb"),
    )
    g = g.crossJoin(F.broadcast(tot))
    g = with_fixed_log2_q8(g, "a1", "la")
    g = with_fixed_log2_q8(g, "b1", "lb")
    g = with_fixed_log2_q8(g, "na", "lna")
    g = with_fixed_log2_q8(g, "nb", "lnb")
    t = g.select(
        "bin",
        "a1",
        "b1",
        F.expr(
            f"a1 * {EVAL_SCALE} div na - b1 * {EVAL_SCALE} div nb"
        ).alias("diff_micro"),
        F.expr("la - lna - lb + lnb").alias("lr_q8"),
    )
    wall = Window.partitionBy()
    return (
        t.select(
            "bin",
            (F.col("a1") - 1).alias("n_a"),
            (F.col("b1") - 1).alias("n_b"),
            "diff_micro",
            F.col("lr_q8").alias("log_ratio_q8"),
            (
                F.sum(F.expr("diff_micro * lr_q8")).over(wall)
                + F.lit(PSI_OFF * 256)
            )
            .cast("long")
            .alias("_num"),
        )
        .withColumn("psi_micro", F.expr(f"_num div 256 - {PSI_OFF}"))
        .drop("_num")
    )


# --- q_bootstrap_ci -------------------------------------------------------------

BOOT_B = 40  # deterministic resamples
# Cumulative Poisson(1) CDF x 1e6 (floor): the per-doc resample multiplicity
# law — P(W=0)=1/e etc. Pinned in tests/test_mleval.py.
BOOT_T0 = 367_879
BOOT_T1 = 735_758
BOOT_T2 = 919_698
BOOT_T3 = 981_011
BOOT_T4 = 996_340


def _boot_w_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {BOOT_T0} THEN 0 WHEN {u} < {BOOT_T1} THEN 1"
        f" WHEN {u} < {BOOT_T2} THEN 2 WHEN {u} < {BOOT_T3} THEN 3"
        f" WHEN {u} < {BOOT_T4} THEN 4 ELSE 5 END"
    )


def _bootstrap_oracle() -> str:
    u = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'"
        " || CAST(b AS VARCHAR)), 1, 12) AS BIGINT) % 1000000"
    )
    return f"""
    WITH bs AS (
        SELECT unnest(generate_series(1, {BOOT_B})) AS b
    ), w AS (
        SELECT b, doc_id, n_chars, {_boot_w_sql(u)} AS w
        FROM documents CROSS JOIN bs
    ), stats AS (
        SELECT b, CAST(sum(w * n_chars) AS BIGINT) AS swx,
               CAST(sum(w) AS BIGINT) AS sw
        FROM w GROUP BY b HAVING sum(w) > 0
    ), ranked AS (
        SELECT b, swx * 1000 // sw AS stat_milli,
               row_number() OVER (ORDER BY swx * 1000 // sw, b) AS rn,
               count(*) OVER () AS nb
        FROM stats
    ), point AS (
        SELECT CAST(sum(n_chars) * 1000 // count(*) AS BIGINT)
                   AS point_milli
        FROM documents
    )
    SELECT CAST(nb AS BIGINT) AS n_resamples, point.point_milli,
           CAST(max(CASE WHEN rn = 2 THEN stat_milli END) AS BIGINT)
               AS lo_milli,
           CAST(max(CASE WHEN rn = nb - 1 THEN stat_milli END) AS BIGINT)
               AS hi_milli
    FROM ranked CROSS JOIN point
    GROUP BY nb, point.point_milli
    """


@declare("q_bootstrap_ci", oracle=_bootstrap_oracle(), tier="P1")
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap CI for the mean document length:
    each of 40 resamples weights every doc by a Poisson(1)-distributed
    multiplicity drawn from a hash (md5(doc_id:b) -> uniform micro ->
    pinned CDF thresholds) — the standard streaming/distributed
    bootstrap (per-doc independent weights instead of an n-way
    multinomial), fully replayable on both engines. Reports the
    trimmed 2nd / (B-1)th order statistics of the resample means as the
    ~95% interval plus the full-data point estimate, all in exact
    integer milli-units.

    Scale notes: the resample fan-out is a map-side B-row explode per
    doc (no shuffle growth beyond B partial sums per resample — the
    aggregation is map-side combined into B rows); the CI is a window
    over B rows. This is THE bootstrap shape that survives 100 TB —
    no per-resample data copies."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',"
        " CAST(b AS STRING))), 1, 12), 16, 10) AS BIGINT) % 1000000"
    )
    w = (
        docs.select("doc_id", "n_chars")
        .select(
            "doc_id",
            "n_chars",
            F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"),
        )
        .withColumn("w", F.expr(_boot_w_sql(u)))
    )
    stats = (
        w.groupBy("b")
        .agg(
            F.sum(F.expr("w * n_chars")).cast("long").alias("swx"),
            F.sum("w").cast("long").alias("sw"),
        )
        .filter(F.col("sw") > 0)
    )
    ranked = stats.select(
        "b", F.expr("swx * 1000 div sw").alias("stat_milli")
    )
    wr = Window.orderBy("stat_milli", "b")
    wall = Window.partitionBy()
    ranked = ranked.withColumn("rn", F.row_number().over(wr)).withColumn(
        "nb", F.count("*").over(wall)
    )
    point = docs.agg(
        F.expr("CAST(sum(n_chars) * 1000 div count(*) AS BIGINT)").alias(
            "point_milli"
        )
    )
    return (
        ranked.crossJoin(F.broadcast(point))
        .groupBy(F.col("nb").cast("long").alias("n_resamples"), "point_milli")
        .agg(
            F.max(F.expr("CASE WHEN rn = 2 THEN stat_milli END"))
            .cast("long")
            .alias("lo_milli"),
            F.max(F.expr("CASE WHEN rn = nb - 1 THEN stat_milli END"))
            .cast("long")
            .alias("hi_milli"),
        )
    )


# --- q_opt_threshold ----------------------------------------------------------


def _opt_threshold_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    {_PR_CW_CTE}, m AS (
        SELECT p_milli AS threshold_milli, tp, fp,
               CAST(2 * tp * {EVAL_SCALE} // (tp + fp + pos) AS BIGINT)
                   AS f1_micro,
               CAST(tp * {EVAL_SCALE} // pos
                    - fp * {EVAL_SCALE} // (n - pos) AS BIGINT)
                   AS youden_micro
        FROM cw
    ), bf AS (
        SELECT 'max_f1' AS criterion, threshold_milli, tp, fp,
               f1_micro AS score_micro,
               row_number() OVER (ORDER BY f1_micro DESC,
                                  threshold_milli DESC) AS rn
        FROM m
    ), bj AS (
        SELECT 'max_youden' AS criterion, threshold_milli, tp, fp,
               youden_micro AS score_micro,
               row_number() OVER (ORDER BY youden_micro DESC,
                                  threshold_milli DESC) AS rn
        FROM m
    )
    SELECT criterion, threshold_milli, tp, fp, score_micro
    FROM bf WHERE rn = 1
    UNION ALL
    SELECT criterion, threshold_milli, tp, fp, score_micro
    FROM bj WHERE rn = 1
    """


@declare("q_opt_threshold", oracle=_opt_threshold_oracle(), tier="P1")
def q_opt_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection over the PR sweep: the thresholds that
    maximize F1 (the balanced operating point) and Youden's J =
    TPR - FPR (the screening operating point), each with its confusion
    counts and exact-integer criterion value, ties broken toward the
    HIGHER threshold (prefer precision at equal score). This is the one
    row a deployment actually consumes from q_pr_curve's sweep.

    Scale notes: identical shape to q_pr_curve — score histogram first,
    windows over the <=1001-row histogram, two 1-row argmaxes."""
    m = _pr_cumulative(_scored_docs(spark, sf_dir)).withColumnRenamed(
        "p_milli", "threshold_milli"
    ).select(
        "threshold_milli",
        "tp",
        "fp",
        F.expr(f"2 * tp * {EVAL_SCALE} div (tp + fp + pos)").alias(
            "f1_micro"
        ),
        F.expr(
            f"tp * {EVAL_SCALE} div pos"
            f" - fp * {EVAL_SCALE} div (n - pos)"
        ).alias("youden_micro"),
    )
    outs = []
    for crit, col in (("max_f1", "f1_micro"), ("max_youden", "youden_micro")):
        outs.append(
            m.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(
                        F.desc(col), F.desc("threshold_milli")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                F.lit(crit).alias("criterion"),
                "threshold_milli",
                "tp",
                "fp",
                F.col(col).alias("score_micro"),
            )
        )
    return outs[0].unionAll(outs[1])


# --- q_mcc_eval ----------------------------------------------------------------


def _mcc_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.stats import _isqrt_sql

    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    cm AS (
        SELECT CAST(sum(CASE WHEN p_milli >= 500 AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN p_milli >= 500 AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN p_milli < 500 AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(sum(CASE WHEN p_milli < 500 AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM j
    ), args AS (
        SELECT (tp + fp) * (tp + fn) AS x FROM cm
        UNION
        SELECT (tn + fp) * (tn + fn) FROM cm
    ),
    {_isqrt_sql('args')}
    SELECT cm.tp, cm.fp, cm.tn, cm.fn,
           CAST(CASE WHEN sa.s * sb.s > 0 THEN
                ((cm.tp * cm.tn - cm.fp * cm.fn) * 1000
                 + 2000 * (sa.s * sb.s)) // (sa.s * sb.s) - 2000
                ELSE NULL END AS BIGINT) AS mcc_milli
    FROM cm
    JOIN sq sa ON sa.x = (cm.tp + cm.fp) * (cm.tp + cm.fn)
    JOIN sq sb ON sb.x = (cm.tn + cm.fp) * (cm.tn + cm.fn)
    """


@declare("q_mcc_eval", oracle=_mcc_oracle(), tier="P1")
def q_mcc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the logistic filter at the
    500-milli operating point — the single-number confusion summary
    that stays honest under class imbalance (accuracy and F1 both
    inflate there). Denominator sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    computes as the PRODUCT OF TWO EXACT isqrt halves (each pair
    product < n^2 stays in BIGINT where the 4-way product would not);
    the composed floor is a DEFINED deterministic program — identical
    on both engines — within ~2 ulps of the true root. The numerator
    tp*tn - fp*fn CAN be negative, so the final division carries a
    positivity offset (|mcc_milli| <= 1000, so offset 2000 suffices)
    making truncating div equal floor div on both engines. A zero
    confusion margin (all predictions on one side of the threshold, or
    single-class labels) zeroes the denominator: that degenerate case
    emits NULL — the conventional undefined MCC — on both engines
    (mirroring q_corr_pearson's zero-variance branch) instead of
    throwing a division error under ANSI.

    Scale notes: one global confusion aggregation (map-side combined),
    then scalar kernel arithmetic on one row."""
    from mysql_to_clickhouse_sync_spark.operators.stats import with_isqrt

    d = _scored_docs(spark, sf_dir)
    cm = d.agg(
        F.sum(F.expr("CASE WHEN p_milli >= 500 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tp"),
        F.sum(F.expr("CASE WHEN p_milli >= 500 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fp"),
        F.sum(F.expr("CASE WHEN p_milli < 500 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tn"),
        F.sum(F.expr("CASE WHEN p_milli < 500 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fn"),
    )
    cm = cm.withColumn("xa", F.expr("(tp + fp) * (tp + fn)")).withColumn(
        "xb", F.expr("(tn + fp) * (tn + fn)")
    )
    cm = with_isqrt(cm, "xa", "sa")
    cm = with_isqrt(cm, "xb", "sb")
    return cm.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr(
            "CAST(CASE WHEN sa * sb > 0 THEN"
            " ((tp * tn - fp * fn) * 1000 + 2000 * (sa * sb))"
            " div (sa * sb) - 2000"
            " ELSE NULL END AS BIGINT)"
        ).alias("mcc_milli"),
    )


# --- q_kappa_agreement -------------------------------------------------------


def _kappa_oracle() -> str:
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div
    from mysql_to_clickhouse_sync_spark.operators.trees import (
        STUMP_FEATURES,
        _stump_sql,
    )

    pe = "((a + b) * (a + c) + (c + d) * (b + d))"
    kappa = floor_div(
        f"1000 * (n * (a + d) - {pe})", f"(n * n - {pe})", "//"
    )
    return f"""
    WITH {logistic_cte()},
    {_stump_sql("TRUE", "k")},
    votes AS (
        SELECT s.doc_id,
               CASE WHEN (CASE WHEN s.val < bk.thr
                          THEN 2 * bk.p_l > bk.n_l
                          ELSE 2 * bk.p_r > bk.n_r END)
                    THEN 1 ELSE 0 END AS v
        FROM stackedk s JOIN bestk bk USING (feat)
    ), tly AS (
        SELECT doc_id, CAST(sum(v) AS BIGINT) AS votes_en
        FROM votes GROUP BY doc_id
    ), pair AS (
        SELECT sc.doc_id,
               CASE WHEN sc.p_milli >= 500 THEN 1 ELSE 0 END AS pa,
               CASE WHEN t.votes_en > {len(STUMP_FEATURES) // 2}
                    THEN 1 ELSE 0 END AS pb
        FROM scored sc JOIN tly t USING (doc_id)
    ), cm AS (
        SELECT CAST(sum(pa * pb) AS BIGINT) AS a,
               CAST(sum(pa * (1 - pb)) AS BIGINT) AS b,
               CAST(sum((1 - pa) * pb) AS BIGINT) AS c,
               CAST(sum((1 - pa) * (1 - pb)) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM pair
    )
    SELECT a, b, c, d,
           CAST((a + d) * 10000 // n AS BIGINT) AS agree_bp,
           CAST(CASE WHEN n * n - {pe} > 0 THEN {kappa}
                ELSE NULL END AS BIGINT) AS kappa_milli,
           CAST(CASE WHEN b + c > 0
                THEN (b - c) * (b - c) * 1000 // (b + c)
                ELSE NULL END AS BIGINT) AS mcnemar_chi2_milli
    FROM cm
    """


@declare("q_kappa_agreement", oracle=_kappa_oracle(), tier="P1")
def q_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-model agreement between the engine's two document filters —
    the logistic quality score at the 500-milli operating point vs the
    full-corpus stump-ensemble majority vote: the 2x2 agreement matrix,
    raw agreement, Cohen's kappa (chance-corrected agreement, exact
    milli-units through the signed floor_div kernel — the numerator
    goes negative when agreement is below chance), and McNemar's chi2
    on the discordant pair (is one filter systematically stricter?).
    The label-model diagnostic a curation pipeline runs before trusting
    ensemble pseudo-labels.

    Degenerate guards mirror q_mcc_eval: chance agreement pe = 1 (both
    filters constant with equal marginals) yields kappa NULL; b+c = 0
    (no discordant pairs) yields McNemar NULL.

    Scale notes: the stump model is a broadcast 4-row table, voting is
    map-side over the stacked features, and the agreement matrix is one
    global map-side-combined aggregation — a single corpus scan feeds
    both classifiers (shared milli-features). Integer-safe to n ~ 3e9
    documents (n^2 * 1000 < 2^63)."""
    from mysql_to_clickhouse_sync_spark.operators.mlscore import (
        logistic_scored,
        milli_features,
    )
    from mysql_to_clickhouse_sync_spark.operators.stats import floor_div
    from mysql_to_clickhouse_sync_spark.operators.trees import (
        STUMP_BUCKET,
        STUMP_FEATURES,
        _TARGET_SQL,
        _stumps,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    best = _stumps(spark, sf_dir).localCheckpoint(eager=True)
    feats = milli_features(docs, y=F.expr(_TARGET_SQL))
    pairs_sql = ", ".join(f"'{f}', {f}" for f in STUMP_FEATURES)
    stacked = feats.selectExpr(
        "doc_id",
        f"stack({len(STUMP_FEATURES)}, {pairs_sql}) AS (feat, val)",
    )
    tly = (
        stacked.join(F.broadcast(best), "feat")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN (CASE WHEN val < thr"
                " THEN 2 * p_l > n_l ELSE 2 * p_r > n_r END)"
                " THEN 1 ELSE 0 END"
            ).alias("v"),
        )
        .groupBy("doc_id")
        .agg(F.sum("v").cast("long").alias("votes_en"))
    )
    la = logistic_scored(docs).select("doc_id", "p_milli")
    pair = la.join(tly, "doc_id").select(
        F.expr("CASE WHEN p_milli >= 500 THEN 1 ELSE 0 END").alias("pa"),
        F.expr(
            f"CASE WHEN votes_en > {len(STUMP_FEATURES) // 2}"
            " THEN 1 ELSE 0 END"
        ).alias("pb"),
    )
    cm = pair.agg(
        F.sum(F.expr("pa * pb")).cast("long").alias("a"),
        F.sum(F.expr("pa * (1 - pb)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - pa) * pb")).cast("long").alias("c"),
        F.sum(F.expr("(1 - pa) * (1 - pb)")).cast("long").alias("d"),
        F.count("*").cast("long").alias("n"),
    )
    pe = "((a + b) * (a + c) + (c + d) * (b + d))"
    kappa = floor_div(f"1000 * (n * (a + d) - {pe})", f"(n * n - {pe})")
    return cm.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("(a + d) * 10000 div n").alias("agree_bp"),
        F.expr(
            f"CAST(CASE WHEN n * n - {pe} > 0 THEN {kappa}"
            " ELSE NULL END AS BIGINT)"
        ).alias("kappa_milli"),
        F.expr(
            "CAST(CASE WHEN b + c > 0"
            " THEN (b - c) * (b - c) * 1000 div (b + c)"
            " ELSE NULL END AS BIGINT)"
        ).alias("mcnemar_chi2_milli"),
    )


# --- q_isotonic_calibration --------------------------------------------------


def _isotonic_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    g AS (
        SELECT least(p_milli // 100, {CAL_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM j GROUP BY bin
    ), c AS (
        SELECT bin, n, pos,
               CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
               CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        FROM g
    ), pairs AS (
        SELECT a.bin AS i, b.bin AS j,
               b.cp - (a.cp - a.pos) AS num,
               b.cn - (a.cn - a.n) AS den,
               CAST(b.cp - (a.cp - a.pos) AS DOUBLE)
                   / (b.cn - (a.cn - a.n)) AS fr
        FROM c a JOIN c b ON a.bin <= b.bin
    ), covering AS (
        SELECT t.bin, p.i, p.j, p.num, p.den, p.fr
        FROM g t JOIN pairs p ON p.i <= t.bin AND p.j >= t.bin
    ), innermin AS (
        SELECT bin, i, num, den, fr FROM (
            SELECT *, row_number() OVER (PARTITION BY bin, i
                                         ORDER BY fr, j) AS rn
            FROM covering
        ) WHERE rn = 1
    ), outermax AS (
        SELECT bin, num, den FROM (
            SELECT *, row_number() OVER (PARTITION BY bin
                                         ORDER BY fr DESC, i) AS rn
            FROM innermin
        ) WHERE rn = 1
    )
    SELECT g.bin, g.n,
           CAST(g.pos * {EVAL_SCALE} // g.n AS BIGINT) AS obs_rate_micro,
           CAST(o.num * {EVAL_SCALE} // o.den AS BIGINT) AS iso_rate_micro
    FROM g JOIN outermax o ON o.bin = g.bin
    """


@declare("q_isotonic_calibration", oracle=_isotonic_oracle(), tier="P1")
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the logistic
    score over its decile bins — the FITTER next to q_calibration_bins'
    reliability REPORT: the pool-adjacent-violators solution computed
    through its closed-form minimax identity, iso(b) = max over i <= b
    of min over j >= b of mean(rate over bins i..j). All pool means are
    exact integer fractions from one cumulative pass; candidate pools
    are ordered by the double quotient of those exact integers
    (identical-operand division — bitwise engine-equal) with (j, i)
    tie-breaks, and the SELECTED pool's exact num/den is floored to
    micro-units, so the fitted curve is hash-stable. Monotonicity is a
    theorem of the minimax form (asserted in tests).

    Scale notes: one bin-keyed map-side-combined shuffle into the
    <=10-row decile table; the 55-pair minimax enumeration is constant
    work — at 100 TB this costs exactly one corpus scan, like every
    histogram-first eval query."""
    d = _scored_docs(spark, sf_dir)
    g = d.groupBy(
        F.expr(f"least(p_milli div 100, {CAL_BINS - 1})").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wcum = Window.orderBy("bin")
    c = g.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(wcum).cast("long").alias("cn"),
        F.sum("pos").over(wcum).cast("long").alias("cp"),
    )
    a = c.select(
        F.col("bin").alias("i"),
        F.col("pos").alias("ai_pos"),
        F.col("n").alias("ai_n"),
        F.col("cn").alias("ai_cn"),
        F.col("cp").alias("ai_cp"),
    )
    b = c.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("bj_cn"),
        F.col("cp").alias("bj_cp"),
    )
    pairs = (
        a.join(b, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            F.expr("bj_cp - (ai_cp - ai_pos)").alias("num"),
            F.expr("bj_cn - (ai_cn - ai_n)").alias("den"),
            F.expr(
                "CAST(bj_cp - (ai_cp - ai_pos) AS DOUBLE)"
                " / (bj_cn - (ai_cn - ai_n))"
            ).alias("fr"),
        )
    )
    covering = g.select("bin").join(
        pairs, (F.col("i") <= F.col("bin")) & (F.col("j") >= F.col("bin"))
    )
    wmin = Window.partitionBy("bin", "i").orderBy("fr", "j")
    innermin = (
        covering.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    wmax = Window.partitionBy("bin").orderBy(F.desc("fr"), "i")
    outermax = (
        innermin.withColumn("rn", F.row_number().over(wmax))
        .filter(F.col("rn") == 1)
        .select("bin", "num", "den")
    )
    return g.join(outermax, "bin").select(
        "bin",
        "n",
        F.expr(f"pos * {EVAL_SCALE} div n").alias("obs_rate_micro"),
        F.expr(f"num * {EVAL_SCALE} div den").alias("iso_rate_micro"),
    )


# --- q_pr_auc (average precision) --------------------------------------------


def _pr_auc_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    {_PR_CW_CTE}, steps AS (
        SELECT p_milli, tp, fp, pos,
               tp - COALESCE(lag(tp) OVER (ORDER BY p_milli DESC), 0)
                   AS dtp,
               CAST(tp * {EVAL_SCALE} // (tp + fp) AS BIGINT) AS prec_micro
        FROM cw
    )
    SELECT CAST(max(pos) AS BIGINT) AS n_pos,
           -- zero-positive guard (the q_mcc_eval pattern): AP is
           -- undefined with no positives, not a division error
           CAST(CASE WHEN max(pos) > 0
                THEN sum(dtp * prec_micro) // max(pos) END
                AS BIGINT) AS ap_micro
    FROM steps
    """


@declare("q_pr_auc", oracle=_pr_auc_oracle(), tier="P1")
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the PR curve by the step-sum
    definition): AP = sum over descending score thresholds of
    (delta recall * precision), computed as sum(dtp * prec_micro) //
    pos over the cumulative-confusion histogram — every term exact
    integers, the per-threshold precision floored to micro identically
    on both engines, so the single-number PR summary is hash-stable.
    The ranking-quality twin of q_auc_roc (AUC weighs all thresholds;
    AP concentrates on the positive-retrieval region — the number
    retrieval papers report).

    Scale notes: identical shape to q_pr_curve — one score-keyed
    map-side-combined shuffle into the <=1001-row histogram; the lag
    window and final sum run over that histogram only."""
    cw = _pr_cumulative(_scored_docs(spark, sf_dir))
    wlag = Window.orderBy(F.desc("p_milli"))
    steps = cw.select(
        "tp",
        "pos",
        (
            F.col("tp")
            - F.coalesce(F.lag("tp").over(wlag), F.lit(0))
        ).alias("dtp"),
        F.expr(f"tp * {EVAL_SCALE} div (tp + fp)").alias("prec_micro"),
    )
    return steps.agg(
        F.max("pos").cast("long").alias("n_pos"),
        F.expr(
            "CAST(CASE WHEN max(pos) > 0"
            " THEN sum(dtp * prec_micro) div max(pos) END AS BIGINT)"
        ).alias("ap_micro"),
    )


# --- q_brier_score -----------------------------------------------------------


def _brier_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J}
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y))
                // count(*) AS BIGINT) AS brier_milli2,
           CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) * 1000
                // (count(*) * 1000000) AS BIGINT) AS brier_milli
    FROM j
    """


@declare("q_brier_score", oracle=_brier_oracle(), tier="P1")
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the logistic filter — mean squared error between
    the predicted probability and the outcome, the PROPER scoring rule
    the calibration family needs as its single number (ECE measures
    binned miscalibration; Brier adds resolution + refinement in one
    strictly-proper quantity). Exact: residuals live on the milli grid,
    so the sum of squares is integer and the mean floors once —
    reported both in squared-milli units and rescaled to milli.

    Scale notes: pure map + one global map-side-combined aggregation.
    Squared milli residuals are <= 1e6, so BIGINT holds ~9e12 rows."""
    d = _scored_docs(spark, sf_dir)
    return d.agg(
        F.count("*").cast("long").alias("n"),
        F.expr(
            "CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y))"
            " div count(*) AS BIGINT)"
        ).alias("brier_milli2"),
        F.expr(
            "CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) * 1000"
            " div (count(*) * 1000000) AS BIGINT)"
        ).alias("brier_milli"),
    )


# --- q_gain_curve ------------------------------------------------------------

GAIN_DECILES = 10


def _gain_oracle() -> str:
    return f"""
    WITH {logistic_cte()},
    {_SCORED_J},
    ranked AS (
        SELECT y, ntile({GAIN_DECILES})
                   OVER (ORDER BY p_milli DESC, z_q8 DESC, y DESC) AS dec
        FROM j
    ), g AS (
        SELECT dec, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM ranked GROUP BY dec
    )
    SELECT dec AS decile, n, pos,
           CAST(SUM(pos) OVER (ORDER BY dec) * {EVAL_SCALE}
                // SUM(pos) OVER () AS BIGINT) AS cum_gain_micro,
           CAST((SUM(pos) OVER (ORDER BY dec) * SUM(n) OVER ())
                * 1000
                // (SUM(n) OVER (ORDER BY dec) * SUM(pos) OVER ())
                AS BIGINT) AS lift_milli
    FROM g
    """


@declare("q_gain_curve", oracle=_gain_oracle(), tier="P1")
def q_gain_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gain / lift chart of the logistic score: documents
    ranked into score deciles (deterministic total order — score, then
    z, then label), each reporting the cumulative share of all
    positives captured and the lift over random targeting. The
    campaign-targeting view of ranking quality next to AUC (threshold-
    free) and AP (retrieval-weighted): "read the top 20% of the corpus
    by score, get X% of the English documents".

    Scale notes: the oracle states the law as a global ntile, but the
    plan NEVER globally sorts the corpus — ntile over a total order of
    homogeneous groups is a pure ARITHMETIC function of the score
    histogram: each (p_milli, z_q8, y) group occupies the rank interval
    (cb, cb+c], each decile k the interval (hi_{{k-1}}, hi_k] (ntile
    sizing: n div 10 (+1 for the first n mod 10 tiles)), and the decile
    stats are interval-overlap sums. One map-side-combined shuffle into
    the histogram, a histogram-sized window, a 10-row broadcast join —
    no WindowExec over raw rows anywhere (the q_auc_roc discipline
    applied to ntile)."""
    d = _scored_docs(spark, sf_dir)
    g = d.groupBy("p_milli", "z_q8", "y").agg(
        F.count("*").cast("long").alias("c")
    )
    word = Window.orderBy(
        F.desc("p_milli"), F.desc("z_q8"), F.desc("y")
    ).rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    h = g.select(
        "y",
        "c",
        F.coalesce(F.sum("c").over(word), F.lit(0)).cast("long").alias("cb"),
        F.sum("c").over(wall).cast("long").alias("n_tot"),
        F.sum(F.expr("y * c")).over(wall).cast("long").alias("pos_tot"),
    )
    dec = spark.range(1, GAIN_DECILES + 1).select(
        F.col("id").cast("long").alias("decile")
    )
    # decile k covers ranks (hi_{k-1}, hi_k]; ntile puts the n mod D
    # remainder one-per-tile at the front
    overlap = (
        f"greatest(0, least(cb + c, decile * (n_tot div {GAIN_DECILES})"
        f" + least(decile, n_tot % {GAIN_DECILES}))"
        f" - greatest(cb, (decile - 1) * (n_tot div {GAIN_DECILES})"
        f" + least(decile - 1, n_tot % {GAIN_DECILES})))"
    )
    per = (
        h.crossJoin(F.broadcast(dec))
        .withColumn("ov", F.expr(overlap))
        .filter(F.col("ov") > 0)
        .groupBy("decile")
        .agg(
            F.sum("ov").cast("long").alias("n"),
            F.sum(F.expr("y * ov")).cast("long").alias("pos"),
            F.max("n_tot").alias("_tn"),
            F.max("pos_tot").alias("_tp"),
        )
    )
    wcum = Window.orderBy("decile")
    return per.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(wcum).cast("long").alias("_cp"),
        F.sum("n").over(wcum).cast("long").alias("_cn"),
        "_tp",
        "_tn",
    ).select(
        "decile",
        "n",
        "pos",
        F.expr(f"_cp * {EVAL_SCALE} div _tp").alias("cum_gain_micro"),
        F.expr("(_cp * _tn) * 1000 div (_cn * _tp)").alias("lift_milli"),
    )
