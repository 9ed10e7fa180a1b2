"""Deterministic sampling and quantile binning (north-star extensions —
SURVEY.md §2.3/§2.6; the reference never samples, it bulk-copies
everything, mysql_to_clickhouse_sync.py:44).

  * q_stratified_sample — exact N-per-stratum sample, deterministic: rank
    documents inside each language by md5(doc_id) and keep the first 10.
    The hash order is a reproducible uniform permutation, so this IS a
    simple random sample per stratum, yet it is a pure function of the
    data — stable under re-runs, repartitioning, and appends, with no
    RNG state to ship to executors (the distributed-sampling analog of
    q_hash_split's Bernoulli split).
  * q_ntile_binning — exact quartile binning of order totals with
    per-bucket stats (row counts, decimal min/max/sum). ntile over a
    total order (price, then unique key) is identically defined in Spark
    and DuckDB.

Scale notes: the stratified sample is rank-per-partition — Spark 3.5+
pushes the `row_number <= k` predicate into a WindowGroupLimit that
top-k-prunes BEFORE the shuffle, so each stratum moves only ~k rows.
Exact global ntile requires a single ordered partition (the declared
semantic); at 100 TB you bin against approx_percentile boundaries instead
— one scan for the sketch, one map-only pass to assign, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.text import _TOKEN_COUNT_SQL
from mysql_to_clickhouse_sync_spark.registry import declare

_PER_STRATUM = 10


@declare(
    "q_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS sample_rank
        FROM documents
    )
    SELECT doc_id, lang, source, n_chars, sample_rank
    FROM ranked WHERE sample_rank <= {_PER_STRATUM}
    """,
    tier="P1",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-per-language document sample ordered by a reproducible
    md5 permutation (doc_id tiebreak for hash stability)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _PER_STRATUM)
        .select("doc_id", "lang", "source", "n_chars", "sample_rank")
    )


@declare(
    "q_balanced_sample",
    oracle="""
    WITH quota AS (
        SELECT min(cnt) AS q FROM (
            SELECT count(*) AS cnt FROM documents GROUP BY lang
        )
    ), ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS sample_rank
        FROM documents
    )
    SELECT doc_id, lang, n_chars, sample_rank, CAST(q AS BIGINT) AS quota
    FROM ranked, quota WHERE sample_rank <= q
    """,
    tier="P1",
)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced-corpus mixture sampling: the per-language quota is
    DATA-DEPENDENT — min(count) across languages — so every language
    contributes equally many documents (the training-data rebalancing
    step; a target-proportion vector drops into the same plan as a
    per-stratum quota column). Deterministic md5-permutation order makes
    the sample a pure function of the data, stable under repartitioning
    and appends. Plan: the quota is a two-level aggregate collapsing to
    ONE row, broadcast back; the rank predicate pushes into a
    WindowGroupLimit only for constant limits, so here the filter runs
    post-window — still one shuffle on lang."""
    docs = load_table(spark, sf_dir, "documents")
    quota = (
        docs.groupBy("lang")
        .count()
        .agg(F.min("count").cast("bigint").alias("quota"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select("doc_id", "lang", "n_chars", "sample_rank", "quota")
    )


@declare(
    "q_ntile_binning",
    oracle="""
    WITH binned AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    SELECT quartile,
           count(*) AS n_orders,
           CAST(min(price) AS DOUBLE) AS min_price,
           CAST(max(price) AS DOUBLE) AS max_price,
           CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM binned
    GROUP BY quartile
    """,
    tier="P2",
)
def q_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bins of order totals: exact ntile over (price, key), then
    per-bucket decimal stats."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.select(
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("price").cast("double").alias("min_price"),
            F.max("price").cast("double").alias("max_price"),
            F.sum("price").cast("decimal(18,2)").cast("double").alias("total_price"),
        )
    )


TOKEN_BUDGET = 500  # tokens per language — bites at every fixture SF


@declare(
    "q_token_budget_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, n_chars,
               {_TOKEN_COUNT_SQL.format(col='text')} AS tok
        FROM documents
    ), cum AS (
        SELECT lang, tok,
               sum(tok) OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
        FROM toks
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN c <= {TOKEN_BUDGET} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN c <= {TOKEN_BUDGET} THEN tok ELSE 0 END)
               AS BIGINT) AS tokens_kept,
           CAST(sum(CASE WHEN c <= {TOKEN_BUDGET} THEN tok ELSE 0 END)
               * 10000 // {TOKEN_BUDGET} AS BIGINT) AS utilization_bp
    FROM cum
    GROUP BY lang
    """,
    tier="P1",
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: per language, greedily admit
    documents in (n_chars DESC, doc_id) priority order until the token
    budget is exhausted — the mixture-building step of assembling a
    pretraining corpus under a fixed per-language token allocation
    (complement of q_balanced_sample's count-based quota).

    The admission rule is a running token sum compared to the budget —
    deterministic, re-runnable, append-stable for the admitted prefix.
    All integer arithmetic (token counts, basis points by floor division).
    Scale: the per-language running sum is the same global-prefix-sum
    shape as q_sequence_pack; at 100 TB languages span blocks and the
    two-level decomposition in operators/packing.py applies verbatim."""
    from mysql_to_clickhouse_sync_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "n_chars", "doc_id", token_count(F.col("text")).alias("tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("c", F.sum("tok").over(w))
    kept = F.col("c") <= TOKEN_BUDGET
    return cum.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.sum(F.when(kept, F.col("tok")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("tokens_kept"),
        F.expr(
            f"CAST(sum(CASE WHEN c <= {TOKEN_BUDGET} THEN tok ELSE 0 END)"
            f" * 10000 div {TOKEN_BUDGET} AS BIGINT)"
        ).alias("utilization_bp"),
    )


@declare(
    "q_domain_mixture",
    oracle="""
    WITH weighted AS (
        SELECT doc_id, source, n_chars,
               (TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4) + 1
                   AS weight
        FROM documents
    ), wsum AS (
        SELECT CAST(sum(weight) AS BIGINT) AS w FROM (
            SELECT source, any_value(weight) AS weight
            FROM weighted GROUP BY source)
    ), budget AS (
        SELECT CAST(sum(n_chars) // 2 AS BIGINT) AS b FROM documents
    ), cum AS (
        SELECT source, weight, n_chars,
               (budget.b * weight) // wsum.w AS src_budget,
               sum(n_chars) OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
        FROM weighted CROSS JOIN wsum CROSS JOIN budget
    )
    SELECT source,
           any_value(weight) AS weight,
           CAST(any_value(src_budget) AS BIGINT) AS src_budget,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN c <= src_budget THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN c <= src_budget THEN n_chars ELSE 0 END)
               AS BIGINT) AS chars_kept,
           CAST(sum(CASE WHEN c <= src_budget THEN n_chars ELSE 0 END)
               * 10000 // any_value(src_budget) AS BIGINT) AS fill_bp
    FROM cum
    GROUP BY source
    """,
    tier="P1",
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture construction: split a global token budget (half the
    corpus, by chars) across sources according to a TARGET WEIGHT VECTOR
    (here a deterministic 1..4 weight derived from the source id — in
    production the pipeline's mixture config), then greedily admit each
    source's documents in reproducible md5-permutation order until its
    share is filled. Reports per-source budget, admitted docs/chars, and
    fill basis points — the numbers a data-mixing run is judged by.
    Complements q_balanced_sample (equal doc counts) and
    q_token_budget_sample (fixed per-language budget): here the budget
    vector itself is data-dependent (total-corpus chars x weights).

    All admission arithmetic is exact integers (floor divisions), so the
    oracle hash-matches at any scale. Scale: two 1-row broadcast aggregates
    (weight sum, global budget), one per-source running-sum window (the
    q_sequence_pack two-level decomposition applies when a source spans
    blocks), map-side-combined final aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        "source",
        "n_chars",
        # try_cast on BOTH engines (ADVICE r3): a digitless source makes
        # regexp_extract return '', which ANSI-mode Spark CAST and DuckDB
        # CAST both throw on — try_cast degrades it to NULL weight / NULL
        # budget / zero keeps identically (pinned in test_robust_sampling).
        (
            (
                F.expr(
                    "try_cast(regexp_extract(source, '(\\\\d+)', 1) AS int)"
                )
                % 4
            )
            + 1
        ).alias("weight"),
    )
    wsum = (
        weighted.groupBy("source")
        .agg(F.any_value("weight").alias("weight"))
        .agg(F.sum("weight").cast("bigint").alias("w"))
    )
    budget = docs.agg(
        F.expr("CAST(sum(n_chars) div 2 AS BIGINT)").alias("b")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        weighted.crossJoin(F.broadcast(wsum))
        .crossJoin(F.broadcast(budget))
        .withColumn("src_budget", F.expr("(b * weight) div w"))
        .withColumn("c", F.sum("n_chars").over(w))
    )
    kept = F.col("c") <= F.col("src_budget")
    return cum.groupBy("source").agg(
        F.any_value("weight").alias("weight"),
        F.any_value("src_budget").cast("bigint").alias("src_budget"),
        F.count("*").alias("n_docs"),
        # when/otherwise, not a bare boolean cast: a NULL-budget source
        # makes `kept` NULL per row, and sum over all-NULL is NULL while
        # the oracle's CASE yields 0 — the otherwise(0) matches the CASE.
        F.sum(F.when(kept, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("chars_kept"),
        F.expr(
            "CAST(sum(CASE WHEN c <= src_budget THEN n_chars ELSE 0 END)"
            " * 10000 div any_value(src_budget) AS BIGINT)"
        ).alias("fill_bp"),
    )
