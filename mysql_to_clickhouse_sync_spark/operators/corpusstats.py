"""Corpus-statistics operators — the distribution-shape diagnostics a
curation run reports next to the mixture numbers (operators/featurize.py):

  * q_gini_concentration — per-language Gini coefficient of document
                           length (is the token budget concentrated in
                           a few giant docs?), exact from the sorted
                           cumulative identity.
  * q_vocab_growth       — the Heaps-law curve: cumulative distinct
                           vocabulary vs cumulative tokens over the
                           doc_id order, bucketed to a bounded spine.
  * q_zipf_slope         — the Zipf exponent: exact-integer OLS of
                           log2(freq) on log2(rank) over the top-256
                           tokens, both logs through the Q8 kernel.
  * q_kaplan_meier       — Kaplan-Meier survival over user event
                           lifetimes with right-censoring (the
                           retention curve with the statistics done
                           right), survival as a sequential integer
                           product fold.

The reference (mysql_to_clickhouse_sync) has no analytics (SURVEY.md
§2.8); these are north-star pipeline extensions.

Scale notes: Gini needs one per-lang sort (rank window) — at 100 TB
that's the standard sort-based shuffle, one pass; vocab growth
aggregates to a 100-bucket spine before any window; Zipf runs on a
256-row head; Kaplan-Meier folds over the distinct-duration table
(bounded by the calendar, not by users). Nothing quadratic, nothing
driver-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.text import (
    TFIDF_MIN_LEN,
    _fixed_log2_q8_sql,
    with_fixed_log2_q8,
)
from mysql_to_clickhouse_sync_spark.registry import declare

CS_SCALE = 1_000_000

# --- q_gini_concentration ----------------------------------------------------


@declare(
    "q_gini_concentration",
    oracle=f"""
    WITH r AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS x,
               row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars, doc_id) AS i
        FROM documents
    ), a AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(i * x) AS BIGINT) AS six
        FROM r GROUP BY lang
    )
    SELECT lang, n, sx AS total_chars,
           CAST((2 * six - (n + 1) * sx) * {CS_SCALE} // (n * sx) AS BIGINT)
               AS gini_micro
    FROM a WHERE sx > 0
    """,
    tier="P1",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gini coefficient of document length — how
    concentrated the char budget is in a few giant documents (a
    curation run watching for "one source dominates the tokens" reads
    this next to q_mixture_diversity). Exact via the sorted identity
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x ascending and
    a doc_id tiebreak; the numerator is non-negative for an ascending
    sort, so one floor division, bitwise engine-identical.

    Scale notes: one per-lang rank window (sort shuffle — the
    unavoidable cost of any order statistic) and one per-lang
    aggregation. BIGINT-safe while n * total_chars < 2^63 (~1e9 docs of
    1e4 chars); beyond that, DECIMAL(38,0) for the two products."""
    r = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("i"),
    )
    a = r.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.expr("i * x")).cast("long").alias("six"),
    )
    return a.filter(F.col("sx") > 0).select(
        "lang",
        "n",
        F.col("sx").alias("total_chars"),
        F.expr(
            f"(2 * six - (n + 1) * sx) * {CS_SCALE} div (n * sx)"
        ).alias("gini_micro"),
    )


# --- q_vocab_growth ----------------------------------------------------------

VG_BUCKETS = 100


@declare(
    "q_vocab_growth",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
                   AS token
        FROM documents
    ), clean AS (
        SELECT doc_id, token FROM tokens
        WHERE length(token) >= {TFIDF_MIN_LEN}
    ), mx AS (
        SELECT CAST(max(doc_id) + 1 AS BIGINT) AS m FROM clean
    ), firsts AS (
        SELECT token, CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM clean GROUP BY token
    ), newb AS (
        SELECT first_doc * {VG_BUCKETS} // m AS bucket,
               CAST(count(*) AS BIGINT) AS new_types
        FROM firsts CROSS JOIN mx GROUP BY bucket
    ), tokb AS (
        SELECT doc_id * {VG_BUCKETS} // m AS bucket,
               CAST(count(*) AS BIGINT) AS toks
        FROM clean CROSS JOIN mx GROUP BY bucket
    )
    SELECT tokb.bucket,
           CAST(SUM(tokb.toks) OVER (ORDER BY tokb.bucket) AS BIGINT)
               AS cum_tokens,
           CAST(SUM(COALESCE(newb.new_types, 0))
                OVER (ORDER BY tokb.bucket) AS BIGINT) AS cum_types
    FROM tokb LEFT JOIN newb ON newb.bucket = tokb.bucket
    """,
    tier="P1",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Heaps-law vocabulary-growth curve: cumulative distinct types
    vs cumulative tokens over the doc_id ingestion order, reported on a
    bounded 100-bucket spine (each token's contribution to "new
    vocabulary" lands in the bucket of its FIRST document). The curve a
    corpus builder reads to decide whether more data still buys new
    vocabulary — flattening means diminishing type returns.

    Scale notes: first-seen is one token-keyed min aggregation; both
    series then collapse to the 100-bucket spine BEFORE the cumulative
    window, so the single-partition window touches 100 rows regardless
    of corpus size."""
    clean = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "token"
            ),
        )
        .filter(F.length("token") >= TFIDF_MIN_LEN)
    )
    mx = clean.agg((F.max("doc_id") + 1).cast("long").alias("m"))
    firsts = clean.groupBy("token").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    newb = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(F.expr(f"first_doc * {VG_BUCKETS} div m").alias("bucket"))
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    tokb = (
        clean.crossJoin(F.broadcast(mx))
        .groupBy(F.expr(f"doc_id * {VG_BUCKETS} div m").alias("bucket"))
        .agg(F.count("*").cast("long").alias("toks"))
    )
    w = Window.orderBy("bucket")
    return (
        tokb.join(newb, "bucket", "left")
        .select(
            "bucket",
            F.col("toks"),
            F.coalesce(F.col("new_types"), F.lit(0)).alias("nt"),
        )
        .select(
            "bucket",
            F.sum("toks").over(w).cast("long").alias("cum_tokens"),
            F.sum("nt").over(w).cast("long").alias("cum_types"),
        )
    )


# --- q_zipf_slope ------------------------------------------------------------

ZIPF_TOP = 256
# Slope numerator is negative by nature -> positivity offset. Bounds are
# CONSTANT (the head is fixed at 256 rows, lq8 <= 2048 there): |slope_micro|
# < ~4e6 and den = r*sxx - sx^2 < ~2.7e11, so 2^23 * den < 2^62. Pinned by
# the fixed ZIPF_TOP, independent of corpus size.
_Z_OFF = 1 << 23


@declare(
    "q_zipf_slope",
    oracle=f"""
    WITH tokens AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents
    ), tf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS f
        FROM tokens WHERE length(token) >= {TFIDF_MIN_LEN}
        GROUP BY token
    ), head AS (
        SELECT f, CAST(row_number() OVER (ORDER BY f DESC, token) AS BIGINT)
                   AS rnk
        FROM tf
        QUALIFY rnk <= {ZIPF_TOP}
    ), args AS (
        SELECT DISTINCT f AS x FROM head
        UNION SELECT DISTINCT rnk FROM head
    ),
    {_fixed_log2_q8_sql('args')},
    xy AS (
        SELECT lr.lq8 AS x, lf.lq8 AS y
        FROM head JOIN lg lr ON lr.x = head.rnk
                  JOIN lg lf ON lf.x = head.f
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS r,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM xy
    )
    SELECT r AS n_ranks,
           CAST(((r * sxy - sx * sy) * {CS_SCALE}
                 + {_Z_OFF} * (r * sxx - sx * sx)) // (r * sxx - sx * sx)
                - {_Z_OFF} AS BIGINT) AS slope_micro
    FROM s
    """,
    tier="P1",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zipf exponent of the corpus: exact-integer OLS slope of
    log2(frequency) on log2(rank) over the top-256 tokens, both logs
    through the Q8 kernel (natural text lands near -1; a corpus of
    templated/duplicated text drifts shallower — a cheap but sharp
    "does this read like language?" diagnostic). The slope numerator is
    negative by nature, so the single division carries a positivity
    offset (floor == truncate after offset).

    Scale notes: one token count shuffle, a top-256 head (rank window
    over the frequency table — at 100 TB prune with a frequency
    threshold first), then all arithmetic on 256 rows."""
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "token"
            )
        )
        .filter(F.length("token") >= TFIDF_MIN_LEN)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("f"))
    )
    head = (
        tf.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("f"), F.asc("token")))
            .cast("long"),
        )
        .filter(F.col("rnk") <= ZIPF_TOP)
    )
    head = with_fixed_log2_q8(head, "rnk", "x")
    head = with_fixed_log2_q8(head, "f", "y")
    s = head.agg(
        F.count("*").cast("long").alias("r"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
    )
    return s.select(
        F.col("r").alias("n_ranks"),
        F.expr(
            f"((r * sxy - sx * sy) * {CS_SCALE}"
            f" + {_Z_OFF} * (r * sxx - sx * sx)) div (r * sxx - sx * sx)"
            f" - {_Z_OFF}"
        ).alias("slope_micro"),
    )


# --- q_kaplan_meier ----------------------------------------------------------

KM_CENSOR_DAYS = 2  # users active within this many days of the window end
#                     are right-censored (their churn is not yet observed)
_US_PER_DAY = 86_400_000_000


def _km_oracle() -> str:
    return f"""
    WITH RECURSIVE ud AS (
        SELECT user_id,
               CAST(min(epoch_us(ts) // {_US_PER_DAY}) AS BIGINT) AS d0,
               CAST(max(epoch_us(ts) // {_US_PER_DAY}) AS BIGINT) AS d1
        FROM events GROUP BY user_id
    ), w AS (
        SELECT CAST(max(d1) AS BIGINT) AS wend FROM ud
    ), life AS (
        SELECT user_id, (d1 - d0 + 1) AS dur,
               CASE WHEN d1 >= w.wend - {KM_CENSOR_DAYS} THEN 1 ELSE 0 END
                   AS censored
        FROM ud CROSS JOIN w
    ), tbl AS (
        SELECT dur, CAST(sum(1 - censored) AS BIGINT) AS d,
               CAST(sum(censored) AS BIGINT) AS c,
               CAST(count(*) AS BIGINT) AS total
        FROM life GROUP BY dur
    ), ord AS (
        SELECT dur, d, c,
               CAST((SELECT count(*) FROM life) AS BIGINT)
                   - CAST(COALESCE(SUM(d + c) OVER (ORDER BY dur
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS n_risk,
               row_number() OVER (ORDER BY dur) AS rn
        FROM tbl
    ), st AS (
        SELECT dur, d, c, n_risk, rn,
               CAST({CS_SCALE} AS BIGINT) * (n_risk - d) // n_risk AS s
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.dur, o.d, o.c, o.n_risk, o.rn,
               st.s * (o.n_risk - o.d) // o.n_risk AS s
        FROM st JOIN ord o ON o.rn = st.rn + 1
    )
    SELECT dur AS duration_days, n_risk, d AS n_events, c AS n_censored,
           CAST(s AS BIGINT) AS surv_micro
    FROM st
    """


@declare("q_kaplan_meier", oracle=_km_oracle(), tier="P1")
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user event lifetimes (duration = days
    between first and last event, inclusive), with right-censoring for
    users still active within KM_CENSOR_DAYS of the observation window
    end — the retention curve with the statistics done right (censored
    users leave the risk set without counting as churn). Survival is
    the sequential integer product S_k = S_{{k-1}} * (n_k - d_k) / n_k
    in micro-units, one floor per step — the Spark side folds the
    sorted distinct-duration table with ONE aggregate() (the
    q_holt_linear recipe), the oracle unrolls the same recurrence as a
    recursive CTE. All operands non-negative.

    Scale notes: per-user min/max is one user-keyed map-side-combined
    shuffle; everything after runs on the distinct-duration table
    (bounded by the calendar span). The fold state is one BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id").agg(
        F.expr(f"CAST(min(unix_micros(ts) div {_US_PER_DAY}) AS BIGINT)")
        .alias("d0"),
        F.expr(f"CAST(max(unix_micros(ts) div {_US_PER_DAY}) AS BIGINT)")
        .alias("d1"),
    )
    w = ud.agg(F.max("d1").cast("long").alias("wend"))
    life = ud.crossJoin(F.broadcast(w)).select(
        (F.col("d1") - F.col("d0") + 1).alias("dur"),
        F.expr(
            f"CASE WHEN d1 >= wend - {KM_CENSOR_DAYS} THEN 1 ELSE 0 END"
        ).cast("long").alias("censored"),
    )
    tbl = life.groupBy("dur").agg(
        F.sum(F.expr("1 - censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
    )
    tot = life.agg(F.count("*").cast("long").alias("total"))
    wcum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    ord_ = (
        tbl.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("total")
            - F.coalesce(
                F.sum(F.expr("d + c")).over(wcum), F.lit(0)
            ).cast("long"),
        )
    )
    # sequential survival product: one fold over the sorted duration table
    fold = f"""
        aggregate(
            sort_array(collect_list(named_struct(
                'dur', dur, 'd', d, 'c', c, 'n_risk', n_risk))),
            CAST(array() AS ARRAY<STRUCT<dur: BIGINT, d: BIGINT, c: BIGINT,
                                         n_risk: BIGINT, s: BIGINT>>),
            (acc, o) -> array_append(acc, named_struct(
                'dur', o.dur, 'd', o.d, 'c', o.c, 'n_risk', o.n_risk,
                's', CASE WHEN size(acc) = 0
                     THEN CAST({CS_SCALE} AS BIGINT) * (o.n_risk - o.d)
                          div o.n_risk
                     ELSE element_at(acc, -1).s * (o.n_risk - o.d)
                          div o.n_risk END)))
    """
    folded = ord_.agg(F.expr(fold).alias("rows"))
    return folded.select(F.explode("rows").alias("r")).select(
        F.col("r.dur").alias("duration_days"),
        F.col("r.n_risk").alias("n_risk"),
        F.col("r.d").alias("n_events"),
        F.col("r.c").alias("n_censored"),
        F.col("r.s").alias("surv_micro"),
    )


# --- q_tail_index ------------------------------------------------------------

HILL_K = 100  # order statistics in the tail estimate
HILL_LOG2E_MICRO = 1_442_695  # floor(log2(e) * 1e6): converts the base-2
#                               log sum to the conventional natural-log
#                               Hill exponent (pinned public constant)


@declare(
    "q_tail_index",
    oracle=f"""
    WITH r AS (
        SELECT CAST(n_chars AS BIGINT) AS x,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS i
        FROM documents WHERE n_chars > 0
    ), head AS (
        SELECT x, i FROM r WHERE i <= {HILL_K + 1}
    ), xk AS (
        SELECT x AS xk FROM head WHERE i = {HILL_K + 1}
    ), args AS (
        SELECT DISTINCT x FROM head
    ),
    {_fixed_log2_q8_sql('args')},
    s AS (
        SELECT CAST(sum(lh.lq8 - lk.lq8) AS BIGINT) AS slog,
               CAST(count(*) AS BIGINT) AS k
        FROM head
        JOIN lg lh ON lh.x = head.x
        CROSS JOIN xk
        JOIN lg lk ON lk.x = xk.xk
        WHERE head.i <= {HILL_K}
    )
    SELECT k, slog AS sum_log2_q8,
           CAST(k * 256 * {HILL_LOG2E_MICRO} // (slog * 1000) AS BIGINT)
               AS hill_alpha_milli
    FROM s WHERE slog > 0
    """,
    tier="P1",
)
def q_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail exponent over the top
    k = 100 order statistics: alpha_hat = k / sum(ln(x_i / x_{{k+1}}))
    — computed base-2 (the ratio of logs cancels the base) on the Q8
    kernel, so hill_alpha_milli is exact BIGINT. The heavy-tail
    diagnostic that closes the distribution battery (Gini = inequality,
    Zipf = rank decay, Hill = tail thickness): alpha < 2 means the
    length distribution has infinite variance and mean-based budget
    planning is unsafe.

    Scale notes: one top-(k+1) head (rank window over doc lengths — at
    100 TB pre-filter with an approximate quantile first), then all
    arithmetic on 101 rows with constant bounds."""
    r = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            F.col("n_chars").cast("long").alias("x"),
            F.row_number()
            .over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
            .alias("i"),
        )
        .filter(F.col("i") <= HILL_K + 1)
    )
    r = with_fixed_log2_q8(r, "x", "lx")
    xk = r.filter(F.col("i") == HILL_K + 1).select(
        F.col("lx").alias("lk")
    )
    s = (
        r.filter(F.col("i") <= HILL_K)
        .crossJoin(F.broadcast(xk))
        .agg(
            F.sum(F.expr("lx - lk")).cast("long").alias("slog"),
            F.count("*").cast("long").alias("k"),
        )
    )
    return s.filter(F.col("slog") > 0).select(
        "k",
        F.col("slog").alias("sum_log2_q8"),
        F.expr(
            f"k * 256 * {HILL_LOG2E_MICRO} div (slog * 1000)"
        ).alias("hill_alpha_milli"),
    )
