"""Model-inference scoring operators on a fixed-point exp2 kernel.

The round-5 log2 kernel (operators/text.py `with_fixed_log2_q8`) removed
libm from the *analysis* direction; this module adds its inverse — a Q8→Q30
exp2 kernel — and the model-based scoring operators it unlocks, the three
standard "learned filter" shapes of a pretraining-data pipeline:

  * q_doc_perplexity — per-document char-level perplexity under the corpus
                       unigram char model (the KenLM/CCNet quality-filter
                       shape: ppl = 2^H needs exp2 after the log2 kernel).
  * q_softmax_topk   — nearest-centroid zero-shot classification over the
                       embeddings table with a fixed-point softmax
                       confidence (the classifier-head shape).
  * q_logistic_quality — a fastText-style linear quality model with a
                       base-2 logistic link, hand-set public weights, and
                       exact integer milli-features (the binary-filter
                       shape).

Kernel design (`with_fixed_exp2_q30` / `_fixed_exp2_q30_sql`): for e >= 0
in Q8 units, 2^(±e/256) = 2^(±e div 256) * prod over set bits i of ef =
e mod 256 of 2^(±2^i/256). The eight per-bit factors are fixed public
constants rounded to Q30 (pinned against float recomputation in
tests/test_mlscore.py); the product is eight conditional BIGINT
multiply-truncate steps — the same integer program as a CTE chain in
DuckDB, so both engines agree bitwise, exactly like the log2 kernel.
Max relative error ~1e-8 (8 truncations + 8 half-ulp constants in Q30).

The reference (mysql_to_clickhouse_sync) has no scalar math beyond its
serializer (SURVEY.md §2.8); these are north-star pipeline extensions.

Scale notes: every query here is scan → scalar kernel (whole-stage
codegen, zero Python) → one or two skinny keyed shuffles. The only joins
are broadcasts of tiny model-side tables (a ~40-row char model, a 10-row
centroid table). All shapes are map-dominated and survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.text import (
    _EN_STOPWORDS,
    _TOKEN_COUNT_SQL,
    _fixed_log2_q8_sql,
    token_count,
    with_fixed_log2_q8,
)
from mysql_to_clickhouse_sync_spark.registry import declare

# --- Q8 -> Q30 fixed-point exp2 kernel --------------------------------------

EXP2_ONE = 1 << 30  # Q30 unit (1.0)
# c[i] = round(2^30 * 2^(+2^i/256)) and round(2^30 * 2^(-2^i/256)), i = 0..7.
# Fixed public constants (same table both engines); pinned by
# tests/test_mlscore.py against float recomputation.
EXP2_POS_C = [
    1076653033, 1079572136, 1085434106, 1097253708,
    1121280436, 1170923762, 1276901417, 1518500250,
]
EXP2_NEG_C = [
    1070838486, 1067942999, 1062175491, 1050733751,
    1028218693, 984625594, 902905651, 759250125,
]


def with_fixed_exp2_q30(
    df: DataFrame, ecol: str, out: str, negative: bool = False
) -> DataFrame:
    """Append `out` = floor-ish(2^30 * 2^(sign*e/256)) for `ecol` >= 0 in
    Q8 units, computed ENTIRELY in BIGINT. The integer part of the
    exponent becomes a shift (capped: >>62 for the negative direction —
    underflow to 0 — and <<31 for the positive, so callers must keep
    e < 32*256 when negative=False; every call site here is bounded far
    below that). Mirrored CTE-for-CTE by `_fixed_exp2_q30_sql`; keep the
    two in lockstep."""
    consts = EXP2_NEG_C if negative else EXP2_POS_C
    d = df.withColumn("_ee", F.col(ecol).cast("long"))
    d = d.withColumn("_ei", F.expr("_ee div 256"))
    d = d.withColumn("_ef", F.expr("_ee % 256"))
    d = d.withColumn("_m", F.lit(EXP2_ONE).cast("long"))
    for i in range(7, -1, -1):
        d = d.withColumn(
            "_m",
            F.expr(
                f"CASE WHEN (_ef div {1 << i}) % 2 = 1"
                f" THEN (_m * {consts[i]}) div {EXP2_ONE} ELSE _m END"
            ),
        )
    shift = (
        "shiftright(_m, cast(least(_ei, 62) as int))"
        if negative
        else "shiftleft(_m, cast(least(_ei, 31) as int))"
    )
    return d.withColumn(out, F.expr(shift)).drop("_ee", "_ei", "_ef", "_m")


def _fixed_exp2_q30_sql(src: str, negative: bool = False, final: str = "eg") -> str:
    """DuckDB CTE chain computing w = fixed-point 2^30 * 2^(±x/256) over
    the one-column table `src(x)` — the exact mirror of
    `with_fixed_exp2_q30` (same constants, same bit order, same
    truncating divisions and shift caps)."""
    consts = EXP2_NEG_C if negative else EXP2_POS_C
    ctes = [
        f"x0 AS (SELECT x, x // 256 AS ei, x % 256 AS ef,"
        f" CAST({EXP2_ONE} AS BIGINT) AS m FROM {src})"
    ]
    for step, i in enumerate(range(7, -1, -1)):
        ctes.append(
            f"x{step + 1} AS (SELECT x, ei, ef,"
            f" CASE WHEN (ef // {1 << i}) % 2 = 1"
            f" THEN (m * {consts[i]}) // {EXP2_ONE} ELSE m END AS m"
            f" FROM x{step})"
        )
    shift = "m >> least(ei, 62)" if negative else "m << least(ei, 31)"
    ctes.append(f"{final} AS (SELECT x, {shift} AS w FROM x8)")
    return ",\n    ".join(ctes)


# --- q_doc_perplexity -------------------------------------------------------

PPL_SCALE = 1000  # perplexity and cross-entropy reported in exact milli-units


def _perplexity_oracle() -> str:
    return f"""
    WITH chars AS (
        SELECT doc_id, substr(text, i, 1) AS ch
        FROM documents, unnest(generate_series(1, length(text))) AS t(i)
        WHERE length(text) > 0
    ), corpus AS (
        SELECT ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY ch
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS nt FROM corpus
    ), args AS (
        SELECT DISTINCT c AS x FROM corpus
        UNION
        SELECT nt FROM tot
    ),
    {_fixed_log2_q8_sql('args')},
    cl AS (
        SELECT corpus.ch, lg.lq8 FROM corpus JOIN lg ON lg.x = corpus.c
    ), cc AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cd
        FROM chars GROUP BY doc_id, ch
    ), perdoc AS (
        SELECT cc.doc_id,
               CAST(sum(cc.cd) AS BIGINT) AS n,
               CAST(sum(cc.cd * cl.lq8) AS BIGINT) AS s
        FROM cc JOIN cl USING (ch)
        GROUP BY cc.doc_id
    ), hh AS (
        SELECT perdoc.doc_id, n,
               (n * lt.lq8 - s) AS hnum,
               (n * lt.lq8 - s) // n AS hq8
        FROM perdoc CROSS JOIN tot JOIN lg lt ON lt.x = tot.nt
    ), eargs AS (
        SELECT DISTINCT hq8 AS x FROM hh
    ),
    {_fixed_exp2_q30_sql('eargs', negative=False)}
    SELECT hh.doc_id, hh.n,
           CAST(hnum * {PPL_SCALE} // (256 * n) AS BIGINT) AS h_milli,
           CAST((eg.w * {PPL_SCALE}) // {EXP2_ONE} AS BIGINT) AS ppl_milli
    FROM hh JOIN eg ON eg.x = hh.hq8
    """


@declare("q_doc_perplexity", oracle=_perplexity_oracle(), tier="P1")
def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level perplexity under the corpus unigram
    char model — the KenLM/CCNet quality-filter shape (documents whose
    perplexity under a corpus-level model is extreme are boilerplate or
    noise). Cross-entropy H = (1/n) * sum over doc chars of
    (log2(N) - log2(cnt(c))) runs on the Q8 log2 kernel; perplexity
    2^H runs on the Q8→Q30 exp2 kernel — both pure BIGINT, so
    h_milli (milli-bits/char) and ppl_milli are bitwise engine-exact.

    Scale notes: the char model is a ~charset-sized table (broadcast
    back), per-doc counts are one (doc_id, ch) map-side-combined
    shuffle, and both kernels are scalar integer expressions inside
    whole-stage codegen. No Python, no doubles, no driver collect — at
    100 TB the model table is still tiny and everything else is linear."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # split(text, '') enumerates the same code points as the
    # substring(text, i, 1) transform, but in ONE pass (substring is
    # O(i) per call — the q_char_entropy fix, round 10); and the corpus
    # model folds from the CACHED per-doc counts instead of re-exploding
    # the corpus a second time (guide §1.2 step 1: fewer passes).
    chars = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("bigint").alias("cd")
    ).cache()
    corpus = cc.groupBy("ch").agg(F.sum("cd").cast("bigint").alias("c"))
    corpus = with_fixed_log2_q8(corpus, "c", "lc_q8")
    tot = corpus.agg(F.sum("c").cast("bigint").alias("nt"))
    tot = with_fixed_log2_q8(tot, "nt", "lnt_q8")
    cc = cc.join(F.broadcast(corpus.select("ch", "lc_q8")), "ch")
    perdoc = cc.groupBy("doc_id").agg(
        F.sum("cd").cast("bigint").alias("n"),
        F.sum(F.expr("cd * lc_q8")).cast("bigint").alias("s"),
    )
    hh = perdoc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n",
        F.expr("n * lnt_q8 - s").alias("hnum"),
        F.expr("(n * lnt_q8 - s) div n").alias("hq8"),
    )
    hh = with_fixed_exp2_q30(hh, "hq8", "w", negative=False)
    return hh.select(
        "doc_id",
        "n",
        F.expr(f"CAST(hnum * {PPL_SCALE} div (256 * n) AS BIGINT)").alias(
            "h_milli"
        ),
        F.expr(f"CAST((w * {PPL_SCALE}) div {EXP2_ONE} AS BIGINT)").alias(
            "ppl_milli"
        ),
    )


# --- q_softmax_topk ---------------------------------------------------------

SM_DIM = 64  # embedding width of the fixture table
SM_GRID = 1024  # element quantization: floor(x * 1024) is float-exact
SM_SPREAD_Q8 = 1024  # per-vec score range maps to [0, 4) log2 units


def _softmax_oracle() -> str:
    sums = ", ".join(
        f"CAST(sum(qv[{d + 1}]) AS BIGINT)" for d in range(SM_DIM)
    )
    return f"""
    WITH qvs AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * {SM_GRID}) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent AS (
        SELECT label AS clabel, CAST(count(*) AS BIGINT) AS cnt,
               [{sums}] AS cv
        FROM qvs GROUP BY label
    ), scored AS (
        SELECT vec_id, label, clabel,
               list_reduce(list_transform(list_zip(qv, cv),
                           p -> p[1] * p[2]), (x, y) -> x + y) // cnt
                   AS score
        FROM qvs CROSS JOIN cent
    ), wnd AS (
        SELECT *, max(score) OVER (PARTITION BY vec_id) AS mx,
                  min(score) OVER (PARTITION BY vec_id) AS mn
        FROM scored
    ), ex AS (
        SELECT *, ((mx - score) * {SM_SPREAD_Q8}) // (mx - mn + 1) AS e_q8
        FROM wnd
    ), eargs AS (
        SELECT DISTINCT e_q8 AS x FROM ex
    ),
    {_fixed_exp2_q30_sql('eargs', negative=True)},
    wd AS (
        SELECT ex.*, eg.w FROM ex JOIN eg ON eg.x = ex.e_q8
    ), fin AS (
        SELECT *, CAST(sum(w) OVER (PARTITION BY vec_id) AS BIGINT) AS sumw,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, clabel) AS rn
        FROM wd
    )
    SELECT vec_id, label, clabel AS pred_label, score AS score_top,
           CAST((w * 1000) // sumw AS BIGINT) AS p_top_milli,
           label = clabel AS correct
    FROM fin WHERE rn = 1
    """


@declare("q_softmax_topk", oracle=_softmax_oracle(), tier="P2")
def q_softmax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid zero-shot classification with softmax confidence —
    the classifier-head shape of a curation pipeline (route every
    document/embedding to the closest class prototype and keep a
    calibrated confidence). Per-label centroids are integer per-dim sums
    over grid-quantized elements (floor(x*1024) of bitwise-identical
    doubles — multiplying by a power of two is float-exact); scores are
    integer dots normalized by class count; the per-vec score range maps
    to [0,4) log2 units and the base-2 softmax weights run through the
    Q8→Q30 exp2 kernel, so pred_label, score_top and p_top_milli are
    all exact BIGINT on both engines. `correct` makes the query its own
    accuracy audit (the label column is ground truth).

    Scale notes: the centroid table is K rows (broadcast); scoring is a
    map-side K-fan-out with a 64-term integer dot inside codegen; the
    per-vec softmax is one vec_id-keyed window over K rows per vec. At
    100 TB the only shuffle is the vec_id window (and the K·DIM
    centroid aggregation, map-side combined) — linear scale-out."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {SM_GRID}) AS BIGINT))"
        ).alias("qv"),
    )
    cent = qv.groupBy("label").agg(
        F.count("*").cast("long").alias("cnt"),
        *[
            F.sum(F.col("qv")[d]).cast("long").alias(f"s{d}")
            for d in range(SM_DIM)
        ],
    )
    cent = cent.select(
        F.col("label").alias("clabel"),
        "cnt",
        F.array(*[F.col(f"s{d}") for d in range(SM_DIM)]).alias("cv"),
    )
    scored = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("score", F.expr("dot div cnt"))
    )
    w_vec = Window.partitionBy("vec_id")
    scored = (
        scored.withColumn("mx", F.max("score").over(w_vec))
        .withColumn("mn", F.min("score").over(w_vec))
        .withColumn(
            "e_q8",
            F.expr(f"((mx - score) * {SM_SPREAD_Q8}) div (mx - mn + 1)"),
        )
    )
    scored = with_fixed_exp2_q30(scored, "e_q8", "w", negative=True)
    scored = scored.withColumn("sumw", F.sum("w").over(w_vec)).withColumn(
        "rn",
        F.row_number().over(w_vec.orderBy(F.desc("score"), F.asc("clabel"))),
    )
    return scored.filter(F.col("rn") == 1).select(
        "vec_id",
        "label",
        F.col("clabel").alias("pred_label"),
        F.col("score").alias("score_top"),
        F.expr("(w * 1000) div sumw").alias("p_top_milli"),
        (F.col("label") == F.col("clabel")).alias("correct"),
    )


# --- q_logistic_quality -----------------------------------------------------

# Hand-set public weights of the linear quality model (fastText-style
# proxy): logit_q8 = (bias + sum w_i * feature_milli_i) / 1000, with the
# base-2 logistic link p = 1 / (1 + 2^-z). Units: each weight is the Q8
# logit contribution of a full-scale (1000-milli) feature.
LQ_BIAS = -600_000
LQ_W_LEN = 1500
LQ_W_ALPHA = 400
LQ_W_STOP = 2000
LQ_W_DIGIT = -600
LQ_LEN_CAP = 2000  # chars at which the length feature saturates
_LQ_OFF = 10_000  # positivity offset so truncating div == floor div


def milli_feats_sql(cols: str) -> str:
    """Oracle CTE body for the shared integer milli-feature extraction
    (saturated length, alpha/stopword/digit ratios) with `cols` passed
    through — the exact mirror of `milli_features`. Shared by
    q_logistic_quality and the stump trainer (operators/trees.py)."""
    toks = _TOKEN_COUNT_SQL.format(col="text")
    return f"""
        SELECT {cols},
               least(n_chars, {LQ_LEN_CAP}) * 1000 // {LQ_LEN_CAP}
                   AS len_milli,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    AS BIGINT) * 1000 // length(text) AS alpha_milli,
               CAST(len(regexp_extract_all(lower(text), '{_EN_STOPWORDS}'))
                    AS BIGINT) * 1000 // {toks} AS stop_milli,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) * 1000 // length(text) AS digit_milli
        FROM documents
        WHERE length(trim(text)) > 0
    """


def milli_features(docs: DataFrame, **extra: F.Column) -> DataFrame:
    """doc_id + any named extra columns + the four exact integer
    milli-features. Ratio features stay on integer `div` (never double
    division + cast — that would not mirror DuckDB's `//`). Mirrored by
    `milli_feats_sql`; keep in lockstep."""
    text = F.col("text")
    alpha_n = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    digit_n = F.length(F.regexp_replace(text, "[^0-9]", ""))
    stop_n = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_EN_STOPWORDS), 0)
    )
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in extra.items()],
        F.expr(
            f"least(n_chars, {LQ_LEN_CAP}) * 1000 div {LQ_LEN_CAP}"
        ).alias("len_milli"),
        (alpha_n.cast("long") * 1000).alias("_an"),
        (stop_n.cast("long") * 1000).alias("_sn"),
        (digit_n.cast("long") * 1000).alias("_dn"),
        F.length(text).cast("long").alias("_tl"),
        token_count(text).alias("_tk"),
    ).select(
        "doc_id",
        *extra.keys(),
        "len_milli",
        F.expr("_an div _tl").alias("alpha_milli"),
        F.expr("_sn div _tk").alias("stop_milli"),
        F.expr("_dn div _tl").alias("digit_milli"),
    )


def logistic_cte() -> str:
    """Oracle CTE chain ending in `scored` (doc_id, lang, features,
    z_q8, p_milli, keep) — shared by q_logistic_quality and the
    streaming quality gate (streaming/stateful.py s_quality_stream)."""
    return f"""feats AS (
        {milli_feats_sql('doc_id, lang')}
    ), zz AS (
        SELECT *,
               (({LQ_BIAS} + {LQ_W_LEN} * len_milli
                 + {LQ_W_ALPHA} * alpha_milli + {LQ_W_STOP} * stop_milli
                 + {LQ_W_DIGIT} * digit_milli + {_LQ_OFF} * 1000) // 1000)
                   - {_LQ_OFF} AS z_q8
        FROM feats
    ), eargs AS (
        SELECT DISTINCT abs(z_q8) AS x FROM zz
    ),
    {_fixed_exp2_q30_sql('eargs', negative=True)},
    scored AS (
        SELECT zz.doc_id, zz.lang,
               len_milli, alpha_milli, stop_milli, digit_milli, z_q8,
               CAST(CASE WHEN z_q8 >= 0
                    THEN {1000 * EXP2_ONE} // ({EXP2_ONE} + eg.w)
                    ELSE (1000 * eg.w) // ({EXP2_ONE} + eg.w) END AS BIGINT)
                   AS p_milli,
               CASE WHEN z_q8 >= 0
                    THEN {1000 * EXP2_ONE} // ({EXP2_ONE} + eg.w)
                    ELSE (1000 * eg.w) // ({EXP2_ONE} + eg.w) END >= 500
                   AS keep
        FROM zz JOIN eg ON eg.x = abs(zz.z_q8)
    )"""


def _logistic_oracle() -> str:
    return f"""
    WITH {logistic_cte()}
    SELECT doc_id, len_milli, alpha_milli, stop_milli, digit_milli, z_q8,
           p_milli, keep
    FROM scored
    """


@declare("q_logistic_quality", oracle=_logistic_oracle(), tier="P1")
def q_logistic_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretrained linear quality classifier with a base-2 logistic link —
    the binary learned-filter shape (fastText-style) of a curation
    pipeline, on exact integer milli-features: saturated length, alpha
    ratio, stopword ratio, digit ratio. The logit is a fixed-weight
    integer dot (positivity-offset division so Spark's truncating `div`
    equals DuckDB's floor `//` — the logit CAN be negative); the
    sigmoid 1/(1+2^-z) runs through the Q8→Q30 exp2 kernel on |z| with
    a mirrored sign CASE, so p_milli is bitwise engine-exact.

    Scale notes: pure map — scalar regex counts + the 17-expression
    kernel per row in whole-stage codegen, zero shuffles, zero Python.
    The cheapest possible shape at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    return logistic_scored(docs).drop("lang")


def logistic_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, features, z_q8, p_milli, keep) for a documents
    frame — pure stateless column expressions, so it runs unchanged on
    batch AND streaming DataFrames (s_quality_stream scores arrivals
    with exactly this chain). Mirrored by `logistic_cte`."""
    feats = milli_features(docs, lang=F.col("lang"))
    zz = feats.withColumn(
        "z_q8",
        F.expr(
            f"(({LQ_BIAS} + {LQ_W_LEN} * len_milli"
            f" + {LQ_W_ALPHA} * alpha_milli + {LQ_W_STOP} * stop_milli"
            f" + {LQ_W_DIGIT} * digit_milli + {_LQ_OFF} * 1000) div 1000)"
            f" - {_LQ_OFF}"
        ),
    ).withColumn("_az", F.abs(F.col("z_q8")))
    zz = with_fixed_exp2_q30(zz, "_az", "w", negative=True)
    p = F.expr(
        f"CASE WHEN z_q8 >= 0"
        f" THEN {1000 * EXP2_ONE} div ({EXP2_ONE} + w)"
        f" ELSE (1000 * w) div ({EXP2_ONE} + w) END"
    )
    return zz.select(
        "doc_id",
        "lang",
        "len_milli",
        "alpha_milli",
        "stop_milli",
        "digit_milli",
        "z_q8",
        p.alias("p_milli"),
        (p >= 500).alias("keep"),
    )
