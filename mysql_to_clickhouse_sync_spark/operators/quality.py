"""Corpus-quality operators: intra-document repetition scoring and
benchmark decontamination (north-star training-data extensions — the
reference has no text surface at all; SURVEY.md §2.8 declares the
category).

  * q_repetition_score — Gopher-style repetition signals per document,
    audited per language: word count, distinct-word count, a "repetitive"
    flag (less than half the words are distinct) and a "top-heavy" flag
    (the single most frequent word exceeds 20 % of the document). Both
    flags are integer-ratio predicates (2·distinct < words;
    5·top_count > words) so no float division ever happens — the hash-
    stability rule from SURVEY.md §2.
  * q_decontaminate — test-set decontamination: documents from one held-out
    source play the benchmark; any training document sharing an 8-word
    shingle with the benchmark is flagged contaminated. This is the
    standard n-gram-overlap decontamination recipe (shingle → hash →
    semi-join) used before LLM pretraining.

Scale notes: repetition scoring is map-only — the word-frequency profile is
computed with nested higher-order functions over the already-split array
(no explode, no shuffle), so the whole signal stays inside one codegen'd
scan; the only shuffle is the per-language audit rows. Decontamination
explodes ~one shingle per word, but each shingle is reduced to a 128-bit
md5 before the exchange, the benchmark side is distinct-ed (tiny — one
source out of twenty) and broadcast, and the contaminated-id set collapses
via left-semi before the flag join; at 100 TB you would additionally
truncate the hash to 64 bits and pre-filter through a Bloom filter built
from the benchmark shingles — same plan shape, smaller exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

# Word-frequency profile without exploding: for each distinct word, count
# its occurrences in the full word array. O(distinct·words) per row, all
# inside whole-stage codegen — no shuffle, no UDF.
_TOP_COUNT_EXPR = (
    "array_max(transform(array_distinct(words), "
    "d -> size(filter(words, x -> x = d))))"
)


@declare(
    "q_repetition_score",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               list_max(list_transform(
                   list_distinct(string_split(text, ' ')),
                   d -> len(list_filter(string_split(text, ' '),
                                        x -> x = d)))) AS top_count
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           -- CASTs: DuckDB integer sums widen to HUGEINT → pandas float64;
           -- Spark stays int64. Pin BIGINT for the driver's dtype-sensitive
           -- canonicalization.
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_distinct) AS BIGINT) AS total_distinct,
           CAST(sum(CASE WHEN 2 * n_distinct < n_words THEN 1 ELSE 0 END)
               AS BIGINT) AS n_repetitive,
           CAST(sum(CASE WHEN 5 * top_count > n_words THEN 1 ELSE 0 END)
               AS BIGINT) AS n_topheavy
    FROM scored
    GROUP BY lang
    """,
    tier="P1",
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language repetition audit: documents whose word-level
    duplication (overall or single-word concentration) marks them as
    low-quality for pretraining."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("words", F.split(F.col("text"), " ")).select(
        "lang",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.expr(_TOP_COUNT_EXPR).alias("top_count"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_distinct").alias("total_distinct"),
        F.sum(
            (2 * F.col("n_distinct") < F.col("n_words")).cast("int")
        ).alias("n_repetitive"),
        F.sum(
            (5 * F.col("top_count") > F.col("n_words")).cast("int")
        ).alias("n_topheavy"),
    )


_BENCH_SOURCE = "src0"  # held-out "benchmark" slice of the corpus
_SHINGLE = 8

# Guarded shingle list: Spark's sequence(1, n) DESCENDS when n < 1, so an
# under-length document must short-circuit to an empty array instead.
_SHINGLES_EXPR = f"""
    CASE WHEN size(words) >= {_SHINGLE}
         THEN transform(sequence(1, size(words) - {_SHINGLE - 1}),
                        i -> md5(concat_ws(' ', slice(words, i, {_SHINGLE}))))
         ELSE array()
    END
"""


@declare(
    "q_decontaminate",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   range(1, greatest(len(w) - {_SHINGLE - 1}, 0) + 1),
                   i -> md5(array_to_string(w[i:i + {_SHINGLE - 1}], ' '))))
                   AS h
        FROM words
    ),
    bench AS (
        SELECT DISTINCT h FROM sh WHERE source = '{_BENCH_SOURCE}'
    ),
    cont AS (
        SELECT DISTINCT s.doc_id
        FROM sh s JOIN bench b USING (h)
        WHERE s.source <> '{_BENCH_SOURCE}'
    )
    SELECT d.lang,
           count(*) AS n_train,
           CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_contaminated
    FROM documents d LEFT JOIN cont c USING (doc_id)
    WHERE d.source <> '{_BENCH_SOURCE}'
    GROUP BY d.lang
    """,
    tier="P1",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap decontamination: per language, how many training
    documents share at least one 8-word shingle with the held-out
    benchmark source."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.withColumn("words", F.split(F.col("text"), " "))
        .select("doc_id", "source", F.expr(_SHINGLES_EXPR).alias("shingles"))
        .select("doc_id", "source", F.explode("shingles").alias("h"))
    )
    bench = (
        sh.filter(F.col("source") == _BENCH_SOURCE).select("h").distinct()
    )
    contaminated = (
        sh.filter(F.col("source") != _BENCH_SOURCE)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = docs.filter(F.col("source") != _BENCH_SOURCE)
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
