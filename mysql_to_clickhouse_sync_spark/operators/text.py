"""Text-analysis operators for the training-data pipeline (north-star
extensions; the reference has no scalar functions beyond its serializer,
SURVEY.md §2.8).

  * q_text_stats     — per-language corpus stats (count / avg chars / bytes)
  * q_token_count    — whitespace tokenization counts
  * q_lang_id        — stopword-heuristic language identification, reported
                       as a (labeled lang x predicted lang) confusion matrix
  * q_quality_score  — per-document quality signals: token count, punctuation
                       ratio, alpha ratio, stopword ratio, and a keep flag

All are single-pass scalar expressions + one groupBy — whole-stage codegen,
no Python in the hot path, linear scale-out. The same expressions run in
DuckDB (regexp_replace uses the 'g' flag there; Spark's is global already).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

# Tiny per-language stopword markers for the n-gram/stopword heuristic.
_LANG_MARKERS = [
    ("en", r"\b(the|and|of|to)\b"),
    ("de", r"\b(der|die|das|und)\b"),
    ("es", r"\b(el|la|los|que)\b"),
    ("fr", r"\b(le|les|des|est)\b"),
    ("zh", r"[一-鿿]"),
]

_EN_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it)\b"


@declare(
    "q_text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len
    FROM documents
    GROUP BY lang
    """,
    tier="P1",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language. Integer sums are exact; the average is
    one double division of identical operands on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
    )


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("bigint")


_TOKEN_COUNT_SQL = """
    CAST(CASE WHEN length(trim({col})) = 0 THEN 0
         ELSE len(string_split_regex(trim({col}), '\\s+')) END AS BIGINT)
"""


@declare(
    "q_token_count",
    oracle=f"""
    SELECT lang,
           CAST(sum({_TOKEN_COUNT_SQL.format(col='text')}) AS BIGINT)
               AS total_tokens,
           CAST(sum({_TOKEN_COUNT_SQL.format(col='text')}) AS DOUBLE)
               / count(*) AS avg_tokens,
           max({_TOKEN_COUNT_SQL.format(col='text')}) AS max_tokens
    FROM documents
    GROUP BY lang
    """,
    tier="P1",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = token_count(F.col("text"))
    return docs.groupBy("lang").agg(
        F.sum(toks).alias("total_tokens"),
        (F.sum(toks).cast("double") / F.count("*")).alias("avg_tokens"),
        F.max(toks).alias("max_tokens"),
    )


def predict_lang(col: Column) -> Column:
    """First-match stopword/script heuristic language ID."""
    expr = F.lit("unknown")
    for lang, pattern in reversed(_LANG_MARKERS):
        expr = F.when(col.rlike(pattern), F.lit(lang)).otherwise(expr)
    return expr


def _predict_lang_sql(col: str) -> str:
    whens = "\n        ".join(
        f"WHEN regexp_matches({col}, '{pat}') THEN '{lang}'"
        for lang, pat in _LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'unknown' END"


@declare(
    "q_lang_id",
    oracle=f"""
    SELECT lang, {_predict_lang_sql('text')} AS pred_lang, count(*) AS n_docs
    FROM documents
    GROUP BY lang, pred_lang
    """,
    tier="P1",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang vs stopword-heuristic
    prediction."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        "lang", predict_lang(F.col("text")).alias("pred_lang")
    ).agg(F.count("*").alias("n_docs"))


@declare(
    "q_quality_score",
    oracle=f"""
    SELECT doc_id,
           {_TOKEN_COUNT_SQL.format(col='text')} AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                AS DOUBLE) / nullif(length(text), 0) AS punct_ratio,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / nullif(length(text), 0) AS alpha_ratio,
           CAST(len(regexp_extract_all(lower(text), '{_EN_STOPWORDS}')) AS DOUBLE)
               / nullif({_TOKEN_COUNT_SQL.format(col='text')}, 0) AS stopword_ratio,
           (n_chars BETWEEN 50 AND 100000
            AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                / nullif(length(text), 0) > 0.5) AS keep
    FROM documents
    """,
    tier="P1",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: the standard length / punctuation /
    alpha / stopword filters of a pretraining-data pipeline, plus a keep
    flag. Ratios are single double divisions of identical integer operands
    (nullif guards ANSI division-by-zero)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    tlen = F.nullif(F.length(text), F.lit(0))
    punct_n = F.length(text) - F.length(F.regexp_replace(text, r"[\p{Punct}]", ""))
    alpha_n = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    alpha_ratio = alpha_n.cast("double") / tlen
    stop_n = F.size(F.regexp_extract_all(F.lower(text), F.lit(_EN_STOPWORDS), 0))
    toks = token_count(text)
    return docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        (punct_n.cast("double") / tlen).alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        (stop_n.cast("double") / F.nullif(toks, F.lit(0))).alias("stopword_ratio"),
        (F.col("n_chars").between(50, 100000) & (alpha_ratio > 0.5)).alias("keep"),
    )


TFIDF_DOC_BOUND = 200  # doc_id bound for the reported query set
TFIDF_TOPK = 3
TFIDF_MIN_LEN = 3


@declare(
    "q_tfidf",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
                   AS token
        FROM documents
    ), clean AS (
        SELECT doc_id, token FROM tokens
        WHERE length(token) >= {TFIDF_MIN_LEN}
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM clean GROUP BY doc_id, token
    ), df AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM clean GROUP BY token
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE tf.doc_id < {TFIDF_DOC_BOUND}
    )
    SELECT doc_id, token, tf, df, score FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, token ASC) AS rn
        FROM scored
    ) WHERE rn <= {TFIDF_TOPK}
    """,
    tier="P1",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 most-characteristic tokens per
    document. The idf is kept as the exact rational tf*N/df (one double
    multiply + divide of identical integer operands on both engines) —
    log-free, because libm's and the JVM's ln() differ in the last ulp and
    monotone transforms don't change the ranking anyway.

    Scale notes: tf is a map-side-combined (doc_id, token) count off the
    token explode; df aggregates the same pairs by token. The df join
    shuffles on token — at 100 TB vocabulary, broadcast only a pruned df
    (stopword/min-df filtered), or bucket both sides by token. N arrives
    via a 1-row broadcast cross join (the chunk-plan pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
    ).filter(F.length("token") >= TFIDF_MIN_LEN)
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < TFIDF_DOC_BOUND)
        .join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df", "score")
    )


FUZZY_BOUND = 150  # c_custkey bound for the exact all-pairs demonstration


@declare(
    "q_fuzzy_match",
    oracle=f"""
    WITH pairs AS (
        SELECT a.c_custkey AS custkey,
               b.c_custkey AS other,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM customer a
        JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
        WHERE a.c_custkey < {FUZZY_BOUND} AND b.c_custkey < {FUZZY_BOUND}
    ),
    ranked AS (
        SELECT custkey, other AS best_match, dist,
               row_number() OVER (PARTITION BY custkey
                                  ORDER BY dist, other) AS rn
        FROM pairs
    )
    SELECT custkey, best_match, dist FROM ranked WHERE rn = 1
    """,
    tier="P2",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage: nearest name by Levenshtein distance within a
    blocking key (nation). Both engines implement classic unit-cost edit
    distance, so distances are integer-identical; the (dist, other) window
    order makes the winner deterministic.

    Scale notes: the blocking key turns O(n^2) global pairs into
    sum-of-squares per block — the standard record-linkage shape. At 100 TB
    block on a cheap canopy (sorted-neighborhood key, phonetic code, or an
    LSH bucket from operators/dedup.py) so block sizes stay bounded; the
    id-bound here is the fixture-scale stand-in for that."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < FUZZY_BOUND)
        .select("c_custkey", "c_nationkey", "c_name")
    )
    a, b = cust.alias("a"), cust.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") != F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("custkey"),
        F.col("b.c_custkey").alias("other"),
        F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
    )
    w = Window.partitionBy("custkey").orderBy("dist", "other")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("custkey", F.col("other").alias("best_match"), "dist")
    )


VOCAB_K = 64  # tokenizer vocabulary budget (top-K corpus tokens)


@declare(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(text)) > 0
    ), freq AS (
        SELECT t, count(*) AS n FROM tok GROUP BY t
    ), vocab AS (
        SELECT t FROM freq
        ORDER BY n DESC, t ASC
        LIMIT {VOCAB_K}
    )
    SELECT lang,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           CAST(sum(CASE WHEN v.t IS NOT NULL THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS coverage_bp,
           CAST(count(DISTINCT CASE WHEN v.t IS NULL THEN tok.t END)
               AS BIGINT) AS n_oov_types
    FROM tok LEFT JOIN vocab v USING (t)
    GROUP BY lang
    """,
    tier="P1",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-K corpus vocabulary
    (global frequency, deterministic (count desc, token) tiebreak), then
    measure per-language what fraction of token OCCURRENCES it covers and
    how many out-of-vocabulary token TYPES remain — the OOV-rate study
    that sizes a tokenizer's vocab before training.

    Plan: one token explode feeds both phases; frequencies map-side
    combine into a token-keyed aggregate; the top-K vocab is a
    TakeOrderedAndProject (per-partition top-K, single merge — never a
    global sort) broadcast back against the occurrence stream as a LEFT
    join; coverage is integer arithmetic (basis points by floor div). At
    100 TB the vocab side stays K rows regardless of corpus size — the
    only corpus-sized shuffle is the frequency aggregation, bounded by
    distinct-token cardinality, not occurrences."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
    )
    freq = tok.groupBy("t").agg(F.count("*").alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("t").asc())
        .limit(VOCAB_K)
        .select("t")
        .withColumn("in_vocab", F.lit(1))
    )
    joined = tok.join(F.broadcast(vocab), "t", "left")
    covered = F.col("in_vocab").isNotNull()
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum(covered.cast("bigint")).alias("n_covered"),
        F.expr(
            "CAST(sum(CASE WHEN in_vocab IS NOT NULL THEN 1 ELSE 0 END)"
            " * 10000 div count(*) AS BIGINT)"
        ).alias("coverage_bp"),
        F.count_distinct(F.when(~covered, F.col("t"))).alias("n_oov_types"),
    )


NGRAM_MIN_COUNT = 2  # LM count-table pruning threshold


@declare(
    "q_ngram_lm_counts",
    oracle=f"""
    WITH toks AS (
        SELECT lang, doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents WHERE length(trim(text)) > 0
    ), uni AS (
        SELECT lang, unnest(w) AS g FROM toks
    ), bi AS (
        SELECT lang,
               unnest(list_transform(
                   generate_series(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i + 1])) AS g
        FROM toks WHERE len(w) >= 2
    ), uc AS (
        SELECT lang, g, count(*) AS n FROM uni GROUP BY lang, g
    ), bc AS (
        SELECT lang, g, count(*) AS n FROM bi GROUP BY lang, g
    )
    SELECT lang,
           CAST((SELECT count(*) FROM uc u WHERE u.lang = l.lang) AS BIGINT)
               AS n_unigram_types,
           CAST((SELECT coalesce(sum(n), 0) FROM uc u WHERE u.lang = l.lang)
               AS BIGINT) AS n_unigram_occ,
           CAST((SELECT count(*) FROM bc b
                 WHERE b.lang = l.lang AND b.n >= {NGRAM_MIN_COUNT})
               AS BIGINT) AS n_bigram_types_kept,
           CAST((SELECT coalesce(sum(n), 0) FROM bc b
                 WHERE b.lang = l.lang AND b.n >= {NGRAM_MIN_COUNT})
               AS BIGINT) AS n_bigram_occ_kept,
           (SELECT min(g) FROM bc b
            WHERE b.lang = l.lang
              AND b.n = (SELECT max(n) FROM bc b2 WHERE b2.lang = l.lang))
               AS top_bigram
    FROM (SELECT DISTINCT lang FROM toks) l
    """,
    tier="P1",
)
def q_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram count tables — the canonical MapReduce-era language-
    model workload, Spark-first: unigram and bigram counts per language
    with min-count pruning (count >= 2 survives, the classic LM-table
    cutoff), plus the modal bigram (deterministic min-tiebreak).

    Bigrams are built RELATIONALLY (posexplode + lead over (doc, pos)),
    not with array lambdas — the same lesson as the minhash shingles
    (PLANS.md: lambda shingling re-evaluated the tokenizer per element,
    26s -> 2s when moved to the window form). Counting is two map-side-
    combined aggregates keyed on (lang, gram) — shuffle volume is type
    cardinality, not occurrence count; pruning drops the long tail BEFORE
    any downstream join would see it. At 100 TB this is the exact shape
    of web-scale LM count tables (hash-partitioned by gram)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "lang",
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "t"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "lang",
        F.col("t").alias("uni"),
        F.when(
            F.lead("t", 1).over(w).isNotNull(),
            F.concat_ws(" ", F.col("t"), F.lead("t", 1).over(w)),
        ).alias("bi"),
    )
    uc = grams.groupBy("lang", F.col("uni").alias("g")).agg(
        F.count("*").alias("n")
    )
    bc = (
        grams.filter(F.col("bi").isNotNull())
        .groupBy("lang", F.col("bi").alias("g"))
        .agg(F.count("*").alias("n"))
    )
    uni_stats = uc.groupBy("lang").agg(
        F.count("*").alias("n_unigram_types"),
        F.sum("n").cast("bigint").alias("n_unigram_occ"),
    )
    kept = bc.filter(F.col("n") >= NGRAM_MIN_COUNT)
    bi_stats = kept.groupBy("lang").agg(
        F.count("*").alias("n_bigram_types_kept"),
        F.sum("n").cast("bigint").alias("n_bigram_occ_kept"),
    )
    top = (
        bc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("g"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("lang", F.col("g").alias("top_bigram"))
    )
    return (
        uni_stats.join(bi_stats, "lang", "left")
        .join(top, "lang", "left")
        .select(
            "lang",
            "n_unigram_types",
            "n_unigram_occ",
            F.coalesce(F.col("n_bigram_types_kept"), F.lit(0)).alias(
                "n_bigram_types_kept"
            ),
            F.coalesce(F.col("n_bigram_occ_kept"), F.lit(0)).alias(
                "n_bigram_occ_kept"
            ),
            "top_bigram",
        )
    )


# GPT-2-style pre-tokenizer (simplified to the fixture's character classes;
# the full pattern adds contraction branches). Java regex and RE2 agree on
# this subset — pinned by the oracle hash itself.
BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    """Pre-tokenizer unit count over lowercased text. Column-API regexp
    (NOT an F.expr splice): a SQL string literal would unescape \\s to a
    bare 's' and silently count whitespace runs as tokens — pinned by the
    whitespace regression test, which the fixture sweep cannot catch (the
    fixtures contain no tabs/double spaces)."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(BPE_PAT), F.lit(0))
    ).cast("bigint")


@declare(
    "q_bpe_token_count",
    oracle=f"""
    SELECT doc_id, lang,
           {_TOKEN_COUNT_SQL.format(col='text')} AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+', 0)) AS BIGINT)
               AS n_bpe_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE)
               / len(regexp_extract_all(lower(text),
                     ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+', 0))
               AS chars_per_token
    FROM documents
    WHERE length(trim(text)) > 0
    """,
    tier="P1",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer token counting, the BPE-ish complement to
    q_token_count's whitespace split: a GPT-2-style alternation regex
    (word / number / punctuation runs, each with its leading-space
    convention) counts the units a byte-pair tokenizer would start from —
    the standard way to budget training tokens before the real tokenizer
    runs. chars_per_token is the compression-rate proxy used to convert
    char budgets to token budgets (one double division of identical
    integer operands).

    Scale notes: map-only — one regexp_extract_all per document inside
    whole-stage codegen, no shuffle at all (the output is per-document).
    At 100 TB this is the cheapest shape there is; the regex cost is
    linear in chars and the scan prunes to (doc_id, lang, text,
    n_chars)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    bpe = bpe_token_count(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / bpe).alias("chars_per_token"),
    )


# --- BM25 ranking with fixed-point integer log2 -----------------------------

BM25_TERMS = ("dup", "join", "batch", "vector")
BM25_SCALE = 1000  # score reported in exact milli-units
_LOG2_ROUNDS = 8  # Q8: eight fractional bits
_LOG2_HALF = 1 << 29  # mantissa normalization scale
_LOG2_FULL = 1 << 30  # round threshold: mantissa crossed 2.0


def with_fixed_log2_q8(df: DataFrame, xcol: str, out: str) -> DataFrame:
    """Append `out` = floor-ish(256 * log2(xcol)) computed ENTIRELY in
    BIGINT — the engine-parity answer to libm: ln()/log2() differ in the
    last ulp between DuckDB and the JVM, but exponent-extract
    (length(bin(x))-1) plus eight mantissa squaring rounds is the same
    integer expression tree on both engines, so the result is bitwise
    identical by construction. Max error vs true 256*log2 is < 1.0
    (measured 0.004 log2 units over 1..2^40). Mirrored CTE-for-CTE by
    `_fixed_log2_q8_sql`; keep the two in lockstep."""
    # _x: the input widened to BIGINT first — an INT input (e.g. a
    # row_number position) would keep shiftleft/_m*_m in 32-bit and
    # overflow under ANSI mode.
    d = df.withColumn("_x", F.col(xcol).cast("long"))
    d = d.withColumn("_e", (F.length(F.bin(F.col("_x"))) - 1).cast("long"))
    # Normalize the mantissa to [2^29, 2^30) by SHIFTING, not by
    # multiply-then-divide — x * 2^29 overflows BIGINT for x >= 2^34,
    # while a single shift is exact at any magnitude (right shift ==
    # floor division by a power of two for positive x).
    d = d.withColumn(
        "_m",
        F.expr(
            "CASE WHEN _e <= 29 THEN shiftleft(_x, cast(29 - _e as int))"
            " ELSE shiftright(_x, cast(_e - 29 as int)) END"
        ),
    )
    d = d.withColumn("_f", F.lit(0).cast("long"))
    for _ in range(_LOG2_ROUNDS):
        d = d.withColumn("_t", F.expr(f"(_m * _m) div {_LOG2_HALF}"))
        d = d.withColumn(
            "_f",
            F.expr(f"_f * 2 + CASE WHEN _t >= {_LOG2_FULL} THEN 1 ELSE 0 END"),
        )
        d = d.withColumn(
            "_m", F.expr(f"CASE WHEN _t >= {_LOG2_FULL} THEN _t div 2 ELSE _t END")
        )
    return d.withColumn(out, F.expr("_e * 256 + _f")).drop(
        "_x", "_e", "_m", "_f", "_t"
    )


def _fixed_log2_q8_sql(src: str) -> str:
    """DuckDB CTE chain computing lq8 = fixed-point 256*log2(x) over the
    one-column table `src(x)` — the exact mirror of
    `with_fixed_log2_q8` (same constants, same truncating divisions, two
    CTEs per round so no same-SELECT alias ambiguity)."""
    ctes = [
        f"l0 AS (SELECT x, length(bin(x)) - 1 AS e,"
        f" CASE WHEN length(bin(x)) - 1 <= 29"
        f" THEN x << (29 - (length(bin(x)) - 1))"
        f" ELSE x >> ((length(bin(x)) - 1) - 29) END AS m,"
        f" 0 AS f FROM {src})"
    ]
    for r in range(_LOG2_ROUNDS):
        ctes.append(
            f"t{r} AS (SELECT x, e, f, (m * m) // {_LOG2_HALF} AS t"
            f" FROM l{r})"
        )
        ctes.append(
            f"l{r + 1} AS (SELECT x, e,"
            f" CASE WHEN t >= {_LOG2_FULL} THEN t // 2 ELSE t END AS m,"
            f" f * 2 + CASE WHEN t >= {_LOG2_FULL} THEN 1 ELSE 0 END AS f"
            f" FROM t{r})"
        )
    ctes.append(
        f"lg AS (SELECT x, e * 256 + f AS lq8 FROM l{_LOG2_ROUNDS})"
    )
    return ",\n    ".join(ctes)


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
                   AS token
        FROM documents
    ), clean AS (
        SELECT doc_id, token FROM tokens
        WHERE length(token) >= {TFIDF_MIN_LEN}
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM clean GROUP BY doc_id
    ), nl AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM clean) AS biglen
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM clean
        WHERE token IN ({terms}) GROUP BY doc_id, token
    ), dfs AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ), args AS (
        SELECT DISTINCT 2 * df + 1 AS x FROM dfs
        UNION
        SELECT DISTINCT 2 * n_docs + 2 FROM nl
    ),
    {_fixed_log2_q8_sql('args')},
    idf AS (
        SELECT dfs.token, dfs.df, ln_.lq8 - ld.lq8 AS idf_q8
        FROM dfs
        JOIN lg ld ON ld.x = 2 * dfs.df + 1
        CROSS JOIN nl
        JOIN lg ln_ ON ln_.x = 2 * nl.n_docs + 2
    )
    SELECT tf.doc_id, tf.token, tf.tf, idf.df,
           CAST((idf.idf_q8 * 22 * tf.tf * nl.biglen * {BM25_SCALE})
                // (256 * (10 * tf.tf * nl.biglen + 3 * nl.biglen
                           + 9 * dl.dl * nl.n_docs)) AS BIGINT)
               AS score_milli
    FROM tf
    JOIN dl USING (doc_id)
    JOIN idf ON idf.token = tf.token
    CROSS JOIN nl
    """


@declare("q_bm25", oracle=_bm25_oracle(), tier="P2")
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scores (k1 = 1.2, b = 0.75, Lucene-style
    always-positive idf = log2((N + 1) / (df + 0.5))) for a fixed query
    term set over the document corpus — the search-ranking companion to
    q_tfidf, sharing its tokenization law.

    Everything is EXACT integer arithmetic: the tf-normalization
    denominator tf + k1*(1 - b + b*dl/avgdl) is cleared of fractions
    (k1 = 6/5, b = 3/4, avgdl = biglen/n_docs) into
    (10*tf*L + 3*L + 9*dl*N) / (10*L), and the idf log2 runs in Q8
    fixed point via `with_fixed_log2_q8` (exponent from bin-length,
    eight mantissa squaring rounds — pure BIGINT, so both engines agree
    bitwise where libm would not). score_milli stays below 2^63 through
    ~10x the sf1 corpus (bound in the expression comment).

    Scale notes: tf and df are map-side-combined token-keyed aggregates
    off one token explode; the idf table is |terms| rows and broadcast;
    the dl join is doc-keyed; the log2 kernel runs on <= |terms|+1
    distinct integers. No Python, no doubles until nothing is left to
    compute."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
    ).filter(F.length("token") >= TFIDF_MIN_LEN)
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    nl = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        tokens.agg(F.count("*").alias("biglen"))
    )
    tf = (
        tokens.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = with_fixed_log2_q8(
        dfs.withColumn("x", F.expr("2 * df + 1")), "x", "l_df"
    )
    idf = with_fixed_log2_q8(
        idf.crossJoin(F.broadcast(nl.select("n_docs"))).withColumn(
            "x", F.expr("2 * n_docs + 2")
        ),
        "x",
        "l_n",
    )
    idf = idf.select(
        "token", "df", (F.col("l_n") - F.col("l_df")).alias("idf_q8")
    )
    # Overflow bound: idf_q8 <= 256*log2(2N+2) (~5.4e3 at 1.5M docs),
    # tf <= dl (~2e3), biglen ~ 9e7 at 10x sf1 -> numerator < 6e17 <
    # 2^63; the denominator is ~1e13. All factors positive, so Spark's
    # truncating `div` equals DuckDB's floor `//`.
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "token")
        .crossJoin(F.broadcast(nl))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.expr(
                f"(idf_q8 * 22 * tf * biglen * {BM25_SCALE})"
                f" div (256 * (10 * tf * biglen + 3 * biglen"
                f" + 9 * dl * n_docs))"
            ).alias("score_milli"),
        )
    )


# --- Shannon character entropy (Q8 fixed point) -----------------------------

ENTROPY_SCALE = 1000  # entropy reported in exact milli-bits


def _char_entropy_oracle() -> str:
    return f"""
    WITH chars AS (
        SELECT doc_id, substr(text, i, 1) AS ch
        FROM documents, unnest(generate_series(1, length(text))) AS t(i)
        WHERE length(text) > 0
    ), cc AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM chars GROUP BY doc_id, ch
    ), args AS (
        SELECT DISTINCT c AS x FROM cc
        UNION
        SELECT DISTINCT sum(c) FROM cc GROUP BY doc_id
    ),
    {{LOG2}},
    perdoc AS (
        SELECT cc.doc_id,
               CAST(sum(cc.c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(cc.c * lc.lq8) AS BIGINT) AS sum_clq8
        FROM cc JOIN lg lc ON lc.x = cc.c
        GROUP BY cc.doc_id
    )
    SELECT perdoc.doc_id, n, n_distinct,
           CAST((n * ln_.lq8 - sum_clq8) * {ENTROPY_SCALE}
                // (256 * n) AS BIGINT) AS entropy_milli
    FROM perdoc JOIN lg ln_ ON ln_.x = perdoc.n
    """


@declare(
    "q_char_entropy",
    oracle=_char_entropy_oracle().replace("{LOG2}", _fixed_log2_q8_sql("args")),
    tier="P2",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy in milli-bits — the classic
    corpus-quality signal (natural text sits near 4–4.5 bits/char;
    boilerplate, padding, and degenerate repetition fall well below).
    H = log2(n) - (1/n) * sum c_i*log2(c_i), computed ENTIRELY in BIGINT
    via the Q8 fixed-point log2 kernel (`with_fixed_log2_q8`), so both
    engines agree bitwise where libm would not:
    entropy_milli = (n*L(n) - sum c_i*L(c_i)) * 1000 // (256 * n).

    Scale notes: the char explode is map-side (length(text) rows per
    doc), counts are one (doc_id, ch)-keyed map-side-combined shuffle,
    and the log2 kernel is 17 scalar integer expressions applied
    per-row inside whole-stage codegen — no joins, no Python, no
    doubles. The oracle computes L once over DISTINCT counts and joins;
    same function, different (equally exact) shape."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    # split(text, '') enumerates the same code points as the
    # substring(text, i, 1) transform, but in ONE pass — substring is
    # O(i) per call (UTF8 byte scan from the start), so the transform
    # was O(len^2) per document (round 10, guide §1.2 step 2;
    # equivalence pinned in tests/test_bm25.py).
    chars = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("bigint").alias("c")
    )
    cc = with_fixed_log2_q8(cc, "c", "lc_q8")
    perdoc = cc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.expr("c * lc_q8")).cast("bigint").alias("sum_clq8"),
    )
    perdoc = with_fixed_log2_q8(perdoc, "n", "ln_q8")
    return perdoc.select(
        "doc_id",
        "n",
        "n_distinct",
        F.expr(
            f"CAST((n * ln_q8 - sum_clq8) * {ENTROPY_SCALE}"
            f" div (256 * n) AS BIGINT)"
        ).alias("entropy_milli"),
    )


# --- PPMI word association (Q8 fixed point) ---------------------------------

PPMI_MIN_COUNT = 5  # bigram support floor — prunes the long tail up front


def _ppmi_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents WHERE length(trim(text)) > 0
    ), bi AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
        FROM bi GROUP BY w1, w2
    ), lc AS (
        SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bc GROUP BY w1
    ), rc AS (
        SELECT w2, CAST(sum(c_xy) AS BIGINT) AS c_y FROM bc GROUP BY w2
    ), nb AS (
        SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM bc
    ), pruned AS (
        SELECT bc.w1, bc.w2, bc.c_xy, lc.c_x, rc.c_y, nb.n_bi
        FROM bc JOIN lc USING (w1) JOIN rc USING (w2) CROSS JOIN nb
        WHERE bc.c_xy >= {PPMI_MIN_COUNT}
    ), args AS (
        SELECT DISTINCT n_bi * c_xy AS x FROM pruned
        UNION
        SELECT DISTINCT c_x * c_y FROM pruned
    ),
    {{LOG2}}
    SELECT w1, w2, c_xy, c_x, c_y,
           CAST(greatest(0, ln_.lq8 - ld.lq8) AS BIGINT) AS ppmi_q8
    FROM pruned
    JOIN lg ln_ ON ln_.x = pruned.n_bi * pruned.c_xy
    JOIN lg ld ON ld.x = pruned.c_x * pruned.c_y
    """


@declare(
    "q_ppmi",
    oracle=_ppmi_oracle().replace("{LOG2}", _fixed_log2_q8_sql("args")),
    tier="P2",
)
def q_ppmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive pointwise mutual information over adjacent word bigrams
    — the word-association table word2vec-era embeddings implicitly
    factorize (Levy & Goldberg 2014). PMI(x,y) = log2(N*c_xy/(c_x*c_y))
    with directional margins (x as left word, y as right word), clamped
    at zero, in Q8 fixed point: ppmi_q8 = max(0, L(N*c_xy) - L(c_x*c_y))
    — pure BIGINT end to end (products stay below 2^63 through ~10x sf1;
    the log2 kernel normalizes by shifting, so magnitude is safe).

    Scale notes: bigram counting is one (w1, w2)-keyed map-side-combined
    shuffle; margins re-aggregate the COUNT table (type cardinality, not
    occurrence volume); the support floor prunes before any join; the
    two margin joins are token-keyed equi-joins (broadcastable when the
    vocabulary fits, shuffle joins otherwise). The log2 kernel is
    applied per-row in codegen — no libm, no Python."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("w"),
    ).filter(F.expr("size(w) >= 2"))
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> struct(element_at(w, i) AS w1,"
                " element_at(w, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c_xy"))
    lc = bc.groupBy("w1").agg(F.sum("c_xy").cast("bigint").alias("c_x"))
    rc = bc.groupBy("w2").agg(F.sum("c_xy").cast("bigint").alias("c_y"))
    nb = bc.agg(F.sum("c_xy").cast("bigint").alias("n_bi"))
    pruned = (
        bc.filter(F.col("c_xy") >= PPMI_MIN_COUNT)
        .join(lc, "w1")
        .join(rc, "w2")
        .crossJoin(F.broadcast(nb))
    )
    d = with_fixed_log2_q8(
        pruned.withColumn("x", F.expr("n_bi * c_xy")), "x", "l_num"
    )
    d = with_fixed_log2_q8(
        d.withColumn("x", F.expr("c_x * c_y")), "x", "l_den"
    )
    return d.select(
        "w1",
        "w2",
        "c_xy",
        "c_x",
        "c_y",
        F.expr("CAST(greatest(0, l_num - l_den) AS BIGINT)").alias("ppmi_q8"),
    )


# --- q_kn_bigram -------------------------------------------------------------

KN_D_MILLI = 750  # absolute discount D = 0.75, the standard KN value
KN_TOP = 100  # bounded output head


def _kn_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           t -> length(t) >= {TFIDF_MIN_LEN}) AS w
        FROM documents
    ), bi AS (
        SELECT w[i] AS v, w[i + 1] AS wd
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    ), bc AS (
        SELECT v, wd, CAST(count(*) AS BIGINT) AS c_vw
        FROM bi GROUP BY v, wd
    ), cv AS (
        SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v,
               CAST(count(*) AS BIGINT) AS n1post
        FROM bc GROUP BY v
    ), cw AS (
        SELECT wd, CAST(count(*) AS BIGINT) AS n1pre FROM bc GROUP BY wd
    ), tt AS (
        SELECT CAST(count(*) AS BIGINT) AS t FROM bc
    ), head AS (
        SELECT bc.v, bc.wd, bc.c_vw, cv.c_v, cv.n1post, cw.n1pre, tt.t,
               row_number() OVER (ORDER BY bc.c_vw DESC, bc.v, bc.wd) AS rn
        FROM bc JOIN cv USING (v) JOIN cw USING (wd) CROSS JOIN tt
    )
    SELECT v, wd AS w, c_vw,
           CAST((c_vw * 1000 - {KN_D_MILLI}) * 1000000 // (c_v * 1000)
                + ({KN_D_MILLI} * n1post * ((n1pre * 1000000) // t))
                  // (c_v * 1000) AS BIGINT) AS p_kn_micro
    FROM head WHERE rn <= {KN_TOP}
    """


@declare("q_kn_bigram", oracle=_kn_oracle(), tier="P1")
def q_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities (absolute discount
    D = 0.75, interpolated form) for the top-100 corpus bigrams:
    p_KN(w|v) = max(c(vw) - D, 0)/c(v) + D*N1+(v.)/c(v) * N1+(.w)/T —
    THE standard n-gram LM smoothing (continuation counts make rare
    continuations of promiscuous words cheap), completing the LM family
    next to q_ngram_lm_counts / q_doc_perplexity / q_unigram_lm. All
    terms in exact integer micro-units (c(vw) >= 1 keeps the discounted
    numerator positive; one floor per term, identical program both
    engines). Bigrams run over the length-filtered token stream.

    Scale notes: one (v, w)-keyed map-side-combined shuffle for bigram
    counts, two marginal aggregations of THAT table, a broadcast scalar
    T, and a top-100 head. Linear at 100 TB."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.expr(
            f"filter(split(lower(text), '[^a-z]+'),"
            f" t -> length(t) >= {TFIDF_MIN_LEN})"
        ).alias("w")
    )
    bi = (
        toks.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                )
            ).alias("z")
        )
        .select(F.col("z.0").alias("v"), F.col("z.1").alias("wd"))
    )
    bc = bi.groupBy("v", "wd").agg(F.count("*").cast("long").alias("c_vw"))
    cv = bc.groupBy("v").agg(
        F.sum("c_vw").cast("long").alias("c_v"),
        F.count("*").cast("long").alias("n1post"),
    )
    cw = bc.groupBy("wd").agg(F.count("*").cast("long").alias("n1pre"))
    tt = bc.agg(F.count("*").cast("long").alias("t"))
    head = (
        bc.join(cv, "v")
        .join(cw, "wd")
        .crossJoin(F.broadcast(tt))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("c_vw"), F.asc("v"), F.asc("wd"))
            ),
        )
        .filter(F.col("rn") <= KN_TOP)
    )
    return head.select(
        "v",
        F.col("wd").alias("w"),
        "c_vw",
        F.expr(
            f"(c_vw * 1000 - {KN_D_MILLI}) * 1000000 div (c_v * 1000)"
            f" + ({KN_D_MILLI} * n1post * ((n1pre * 1000000) div t))"
            f" div (c_v * 1000)"
        ).alias("p_kn_micro"),
    )
