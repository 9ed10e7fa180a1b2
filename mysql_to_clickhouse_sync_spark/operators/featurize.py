"""Feature-engineering operators — the featurizer stage between raw text
and the trainers (operators/trees.py) / scorers (operators/mlscore.py):

  * q_target_encode     — leave-one-out mean-target encoding of `source`
                          with additive smoothing toward the global
                          prior (the categorical-feature staple; LOO +
                          smoothing is what keeps it leakage-safe).
  * q_feature_hash      — the hashing trick: tokens hashed into 64
                          signed dimensions (sign bit from the same
                          hash), the unbounded-vocabulary featurizer
                          that needs no fitted dictionary.
  * q_mutual_info       — mutual information I(feature bucket; label)
                          per milli-feature on the Q8 log2 kernel — the
                          filter-method feature ranking next to the
                          chi-square battery (q_chi2_assoc).
  * q_mixture_diversity — corpus mixture health: Gini-Simpson index,
                          Shannon entropy (log2 kernel) and effective
                          source count 2^H (exp2 kernel) over the
                          source distribution — the number a curation
                          run reports before/after rebalancing.

All exact-integer: encodings and indices in micro-units, entropies in
milli-bits; hash parity uses the md5-hex-prefix recipe (Spark conv /
DuckDB '0x' CAST — identical 48-bit integers). The reference
(mysql_to_clickhouse_sync) has no feature computation (SURVEY.md §2.8);
these are north-star pipeline extensions.

Scale notes: target encoding is one source-keyed map-side-combined
shuffle plus a broadcast of the per-source table; feature hashing is a
token explode into a (doc, dim)-keyed map-side-combined shuffle (64-dim
bound on output width); MI aggregates to a 4 x 16 x 2 cell table;
diversity to one row per source. Nothing here holds state proportional
to the corpus. Overflow bounds: Gini-Simpson multiplies N*(N-1) by 1e6
— BIGINT-safe to ~3e6 rows per corpus slice; beyond that route the one
product through DECIMAL(38,0) (the q_auc_roc note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.mlscore import (
    EXP2_ONE,
    _fixed_exp2_q30_sql,
    milli_feats_sql,
    milli_features,
    with_fixed_exp2_q30,
)
from mysql_to_clickhouse_sync_spark.operators.text import (
    TFIDF_MIN_LEN,
    _fixed_log2_q8_sql,
    with_fixed_log2_q8,
)
from mysql_to_clickhouse_sync_spark.registry import declare

FEAT_SCALE = 1_000_000

# --- q_target_encode ---------------------------------------------------------

TE_SMOOTH = 10  # pseudo-observations of the global prior


def _target_encode_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
        FROM documents
    ), s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(y) AS BIGINT) AS pos_s
        FROM d GROUP BY source
    ), g AS (
        SELECT CAST(sum(y) * {FEAT_SCALE} // count(*) AS BIGINT)
                   AS prior_micro
        FROM d
    )
    SELECT d.doc_id, d.source, d.y,
           CAST(((s.pos_s - d.y) * {FEAT_SCALE}
                 + {TE_SMOOTH} * g.prior_micro)
                // (s.n_s - 1 + {TE_SMOOTH}) AS BIGINT) AS enc_micro
    FROM d JOIN s USING (source) CROSS JOIN g
    """


@declare("q_target_encode", oracle=_target_encode_oracle(), tier="P1")
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out mean-target encoding of `source` against
    y = (lang='en'): enc_i = ((pos_s - y_i) + M*prior) / (n_s - 1 + M)
    in exact integer micro-units, with M = 10 pseudo-counts of the
    global prior. Excluding the row's own label (LOO) plus smoothing is
    the standard leakage-safe way to hand a high-cardinality
    categorical to a model. All operands non-negative, single floor
    division — bitwise engine-identical.

    Scale notes: one source-keyed map-side-combined shuffle into a
    |sources|-row table that broadcasts back, plus a 1-row prior
    broadcast (the chunk-plan pattern). Pure map afterwards. Linear at
    100 TB."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)").alias(
            "y"
        ),
    )
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_s"),
        F.sum("y").cast("long").alias("pos_s"),
    )
    g = d.agg(
        F.expr(f"CAST(sum(y) * {FEAT_SCALE} div count(*) AS BIGINT)").alias(
            "prior_micro"
        )
    )
    return (
        d.join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "source",
            "y",
            F.expr(
                f"((pos_s - y) * {FEAT_SCALE} + {TE_SMOOTH} * prior_micro)"
                f" div (n_s - 1 + {TE_SMOOTH})"
            ).alias("enc_micro"),
        )
    )


# --- q_feature_hash ----------------------------------------------------------

FH_DIMS = 64  # hashed feature width


def _feature_hash_oracle() -> str:
    u = "CAST('0x' || substr(md5(token), 1, 12) AS BIGINT)"
    return f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
                   AS token
        FROM documents
    ), clean AS (
        SELECT doc_id, token FROM tokens
        WHERE length(token) >= {TFIDF_MIN_LEN}
    ), hashed AS (
        SELECT doc_id, {u} % {FH_DIMS} AS dim,
               CASE WHEN ({u} // {FH_DIMS}) % 2 = 1 THEN 1 ELSE -1 END AS sgn
        FROM clean
    )
    SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS val,
           CAST(count(*) AS BIGINT) AS n_tok
    FROM hashed GROUP BY doc_id, dim
    """


@declare("q_feature_hash", oracle=_feature_hash_oracle(), tier="P1")
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every token (the q_tfidf tokenizer — lowercase
    [a-z]+, length >= 3) maps to one of 64 signed dimensions via
    md5-prefix arithmetic (index = h % 64, sign = next bit — the
    sign trick keeps hashed collisions zero-mean). Emits the sparse
    (doc, dim) -> (signed sum, token count) representation — the
    dictionary-free featurizer for unbounded vocabularies, identical
    48-bit hash integers on both engines (Spark conv / DuckDB '0x'
    CAST).

    Scale notes: token explode -> one (doc_id, dim)-keyed
    map-side-combined shuffle; output width is bounded by 64 dims per
    doc regardless of vocabulary. No fitted state at all — the whole
    point of hashing features at 100 TB."""
    u = (
        f"CAST(conv(substr(md5(token), 1, 12), 16, 10) AS BIGINT)"
    )
    tokens = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "token"
            ),
        )
        .filter(F.length("token") >= TFIDF_MIN_LEN)
    )
    hashed = tokens.select(
        "doc_id",
        F.expr(f"{u} % {FH_DIMS}").alias("dim"),
        F.expr(
            f"CASE WHEN ({u} div {FH_DIMS}) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    return hashed.groupBy("doc_id", "dim").agg(
        F.sum("sgn").cast("long").alias("val"),
        F.count("*").cast("long").alias("n_tok"),
    )


# --- q_mutual_info -----------------------------------------------------------

MI_BUCKETS = 16
# Two-step final division with n-INDEPENDENT positivity offsets (the
# one-step form needed an offset scaled by n and overflowed at 10x):
# per-doc q8 term |sum(t)/n| <= 4 * 256 * log2-range < 2^16, so
# MI_OFF1 covers the /n floor-div; the q8 -> micro step is then bounded
# by 2^16 * 1e6 < 2^47, covered by MI_OFF2. Costs <= 1 q8 unit (~3.9k
# micro-bits) of extra truncation — under the kernel's own error bound.
MI_OFF1 = 1 << 16
MI_OFF2 = 1 << 28
_MI_FEATS = ("len", "alpha", "stop", "digit")
_MI_Y = "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)"


def _mutual_info_oracle() -> str:
    stack = " UNION ALL ".join(
        f"SELECT doc_id, y, '{f}' AS feat,"
        f" least({f}_milli // 64, {MI_BUCKETS - 1}) AS b FROM feats"
        for f in _MI_FEATS
    )
    return f"""
    WITH feats AS (
        {milli_feats_sql(f'doc_id, {_MI_Y} AS y')}
    ), st AS (
        {stack}
    ), cells AS (
        SELECT feat, b, y, CAST(count(*) AS BIGINT) AS cxy
        FROM st GROUP BY feat, b, y
    ), mx AS (
        SELECT feat, b, CAST(sum(cxy) AS BIGINT) AS cx
        FROM cells GROUP BY feat, b
    ), my AS (
        SELECT feat, y, CAST(sum(cxy) AS BIGINT) AS cy
        FROM cells GROUP BY feat, y
    ), nt AS (
        SELECT feat, CAST(sum(cxy) AS BIGINT) AS n FROM cells GROUP BY feat
    ), args AS (
        SELECT DISTINCT cxy AS x FROM cells
        UNION SELECT DISTINCT cx FROM mx
        UNION SELECT DISTINCT cy FROM my
        UNION SELECT DISTINCT n FROM nt
    ),
    {_fixed_log2_q8_sql('args')},
    terms AS (
        SELECT cells.feat,
               cells.cxy * (lxy.lq8 + ln.lq8 - lx.lq8 - ly.lq8) AS t,
               nt.n
        FROM cells
        JOIN mx ON mx.feat = cells.feat AND mx.b = cells.b
        JOIN my ON my.feat = cells.feat AND my.y = cells.y
        JOIN nt ON nt.feat = cells.feat
        JOIN lg lxy ON lxy.x = cells.cxy
        JOIN lg lx ON lx.x = mx.cx
        JOIN lg ly ON ly.x = my.cy
        JOIN lg ln ON ln.x = nt.n
    )
    SELECT feat, n,
           CAST((((sum(t) + {MI_OFF1} * n) // n - {MI_OFF1})
                 * {FEAT_SCALE} + {MI_OFF2 * 256}) // 256
                - {MI_OFF2} AS BIGINT) AS mi_micro
    FROM terms GROUP BY feat, n
    """


@declare("q_mutual_info", oracle=_mutual_info_oracle(), tier="P1")
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(bucketed feature; y = lang='en') per
    milli-feature — the filter-method feature ranking (complement to
    q_chi2_assoc's independence test): MI = sum over non-empty cells of
    (c_xy/n) * log2(c_xy * n / (c_x * c_y)), every count through the Q8
    log2 kernel so the per-cell integer terms are engine-exact; empty
    cells contribute 0 by the standard convention (no smoothing
    needed). The final /n then /256 steps carry positivity offsets — floor
    rounding can push a near-zero MI a hair negative.

    Scale notes: one (feat, bucket, y)-keyed map-side-combined shuffle
    into a <= 4 x 16 x 2 cell table; margins, kernel and the sum all run
    on that table. Linear at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = milli_features(docs, y=F.expr(_MI_Y))
    stack_expr = ", ".join(
        f"'{f}', least({f}_milli div 64, {MI_BUCKETS - 1})" for f in _MI_FEATS
    )
    st = feats.selectExpr(
        "doc_id", "y", f"stack({len(_MI_FEATS)}, {stack_expr}) AS (feat, b)"
    )
    # Four consumers (three margins + the cell join) — cache the <=128-
    # row cell table so the featurize scan runs once (round 10, §1.3).
    cells = st.groupBy("feat", "b", "y").agg(
        F.count("*").cast("long").alias("cxy")
    ).cache()
    mx = cells.groupBy("feat", "b").agg(F.sum("cxy").cast("long").alias("cx"))
    my = cells.groupBy("feat", "y").agg(F.sum("cxy").cast("long").alias("cy"))
    nt = cells.groupBy("feat").agg(F.sum("cxy").cast("long").alias("n"))
    j = (
        cells.join(mx, ["feat", "b"])
        .join(my, ["feat", "y"])
        .join(nt, "feat")
    )
    j = with_fixed_log2_q8(j, "cxy", "lxy")
    j = with_fixed_log2_q8(j, "cx", "lx")
    j = with_fixed_log2_q8(j, "cy", "ly")
    j = with_fixed_log2_q8(j, "n", "ln")
    terms = j.select(
        "feat",
        "n",
        F.expr("cxy * (lxy + ln - lx - ly)").alias("t"),
    )
    return terms.groupBy("feat", "n").agg(
        F.expr(
            f"CAST((((sum(t) + {MI_OFF1} * n) div n - {MI_OFF1})"
            f" * {FEAT_SCALE} + {MI_OFF2 * 256}) div 256"
            f" - {MI_OFF2} AS BIGINT)"
        ).alias("mi_micro")
    )


# --- q_mixture_diversity -----------------------------------------------------


def _diversity_oracle() -> str:
    return f"""
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_i
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_i) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_sources,
               CAST(sum(n_i * (n_i - 1)) AS BIGINT) AS same_pairs
        FROM s
    ), args AS (
        SELECT DISTINCT n_i AS x FROM s
        UNION SELECT n FROM tot
    ),
    {_fixed_log2_q8_sql('args')},
    hsum AS (
        SELECT CAST(sum(s.n_i * (ln.lq8 - li.lq8)) AS BIGINT) AS hnum
        FROM s CROSS JOIN tot
        JOIN lg li ON li.x = s.n_i
        JOIN lg ln ON ln.x = tot.n
    ), hq AS (
        SELECT tot.n, tot.n_sources, tot.same_pairs, hsum.hnum,
               hsum.hnum // tot.n AS hq8
        FROM tot CROSS JOIN hsum
    ), eargs AS (
        SELECT DISTINCT hq8 AS x FROM hq
    ),
    {_fixed_exp2_q30_sql('eargs', negative=False)}
    SELECT hq.n AS n_docs, hq.n_sources,
           CAST((hq.n * (hq.n - 1) - hq.same_pairs) * {FEAT_SCALE}
                // (hq.n * (hq.n - 1)) AS BIGINT) AS gini_simpson_micro,
           CAST(hq.hnum * 1000 // (256 * hq.n) AS BIGINT) AS shannon_milli,
           CAST(eg.w * 1000 // {EXP2_ONE} AS BIGINT)
               AS effective_sources_milli
    FROM hq JOIN eg ON eg.x = hq.hq8
    """


@declare("q_mixture_diversity", oracle=_diversity_oracle(), tier="P1")
def q_mixture_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture health over the source distribution, in one row:
    Gini-Simpson index 1 - sum n_i(n_i-1)/(N(N-1)) (probability two
    random docs differ in source — exact single-floor rational),
    Shannon entropy H = sum (n_i/N) log2(N/n_i) in exact milli-bits via
    the Q8 log2 kernel, and the effective source count 2^H ("this
    20-source corpus mixes like k.x equal sources") via the Q8->Q30
    exp2 kernel — the before/after number of every rebalancing run
    (cf. q_domain_mixture). Both kernels in one query, all BIGINT.

    Scale notes: one source-keyed map-side-combined shuffle into a
    |sources|-row table; kernels run on that table and a 1-row
    aggregate. N*(N-1)*1e6 is BIGINT-safe to ~3e6 docs per slice —
    beyond that, DECIMAL(38,0) (module docstring). Linear at 100 TB."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_i"))
    )
    tot = s.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_sources"),
        F.sum(F.expr("n_i * (n_i - 1)")).cast("long").alias("same_pairs"),
    )
    s = with_fixed_log2_q8(s, "n_i", "li")
    tot = with_fixed_log2_q8(tot, "n", "ln")
    hsum = (
        s.crossJoin(F.broadcast(tot))
        .agg(F.sum(F.expr("n_i * (ln - li)")).cast("long").alias("hnum"))
    )
    hq = tot.crossJoin(F.broadcast(hsum)).withColumn(
        "hq8", F.expr("hnum div n")
    )
    hq = with_fixed_exp2_q30(hq, "hq8", "w", negative=False)
    return hq.select(
        F.col("n").alias("n_docs"),
        "n_sources",
        F.expr(
            f"(n * (n - 1) - same_pairs) * {FEAT_SCALE} div (n * (n - 1))"
        ).alias("gini_simpson_micro"),
        F.expr("hnum * 1000 div (256 * n)").alias("shannon_milli"),
        F.expr(f"w * 1000 div {EXP2_ONE}").alias("effective_sources_milli"),
    )


# --- q_mixture_rebalance -------------------------------------------------------


@declare(
    "q_mixture_rebalance",
    oracle=f"""
    WITH s AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_i
        FROM documents GROUP BY lang
    ), tot AS (
        SELECT CAST(sum(n_i) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM s
    )
    SELECT lang, n_i,
           CAST(n_i * {FEAT_SCALE} // tot.n AS BIGINT) AS actual_micro,
           CAST({FEAT_SCALE} // tot.k AS BIGINT) AS target_micro,
           CAST(least((({FEAT_SCALE} // tot.k) * tot.n * 1000)
                // (n_i * {FEAT_SCALE}), 1000) AS BIGINT) AS rate_milli,
           CAST(n_i * least((({FEAT_SCALE} // tot.k) * tot.n * 1000)
                // (n_i * {FEAT_SCALE}), 1000) // 1000 AS BIGINT)
               AS expect_kept
    FROM s CROSS JOIN tot
    """,
    tier="P1",
)
def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sampling rates that rebalance the language mixture toward
    uniform: rate_i = min(1, target_share / actual_share) in exact
    milli-units, plus the expected kept count per language — the plan a
    curation run feeds into q_stratified_sample / q_token_budget_sample
    (never up-samples; over-represented languages are thinned to the
    target). Multiply-before-divide keeps the rate exact; the min
    clamps under-represented languages at keep-everything.

    Scale notes: one lang-keyed map-side-combined shuffle + a 1-row
    broadcast total. Linear at 100 TB."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_i"))
    )
    tot = s.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    rate = (
        f"least((({FEAT_SCALE} div k) * n * 1000)"
        f" div (n_i * {FEAT_SCALE}), 1000)"
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_i",
        F.expr(f"n_i * {FEAT_SCALE} div n").alias("actual_micro"),
        F.expr(f"{FEAT_SCALE} div k").alias("target_micro"),
        F.expr(rate).alias("rate_milli"),
        F.expr(f"n_i * {rate} div 1000").alias("expect_kept"),
    )
