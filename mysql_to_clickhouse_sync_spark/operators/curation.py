"""Corpus curation funnel — the training-data pipeline end to end as ONE
declarative query.

Chains the individual operators (exact dedup -> fingerprint near-dup ->
quality filters) the way a production pretraining pipeline does, and reports
the stage-by-stage survivor counts per language — the number every data
curator actually watches. Because each stage is a column predicate or a
window over the previous stage, Catalyst fuses the whole funnel into a
couple of shuffles; nothing materializes between stages.

Stages (cumulative):
  1. raw          — all documents
  2. exact_kept   — first copy per exact md5(text) (min doc_id wins)
  3. neardup_kept — first copy per normalized fingerprint
  4. quality_kept — length + alpha-ratio gate (the q_quality_score keep flag)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

_NORM_SQL = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"
_ALPHA_SQL = (
    "CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
    " / nullif(length(text), 0)"
)


def curate(docs: DataFrame) -> DataFrame:
    """Per-document curation flags (all stages evaluated, cumulative keep)."""
    w_exact = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    w_fp = Window.partitionBy(F.md5(norm.cast("binary"))).orderBy("doc_id")
    alpha = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.nullif(F.length("text"), F.lit(0))
    )
    return docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w_exact).alias("__exact_rn"),
        F.row_number().over(w_fp).alias("__fp_rn"),
        (F.col("n_chars").between(50, 100000) & (alpha > 0.5)).alias("__quality"),
    ).select(
        "doc_id",
        "lang",
        (F.col("__exact_rn") == 1).alias("exact_kept"),
        ((F.col("__exact_rn") == 1) & (F.col("__fp_rn") == 1)).alias(
            "neardup_kept"
        ),
        (
            (F.col("__exact_rn") == 1)
            & (F.col("__fp_rn") == 1)
            & F.col("__quality")
        ).alias("quality_kept"),
    )


@declare(
    "q_curation_funnel",
    oracle=f"""
    WITH flags AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) = 1 AS exact_kept,
               row_number() OVER (PARTITION BY md5({_NORM_SQL})
                                  ORDER BY doc_id) = 1 AS fp_first,
               (n_chars BETWEEN 50 AND 100000 AND {_ALPHA_SQL} > 0.5)
                   AS quality_ok
        FROM documents
    )
    SELECT lang,
           count(*) AS raw,
           CAST(sum(CASE WHEN exact_kept THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_kept,
           CAST(sum(CASE WHEN exact_kept AND fp_first THEN 1 ELSE 0 END)
                AS BIGINT) AS neardup_kept,
           CAST(sum(CASE WHEN exact_kept AND fp_first AND quality_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS quality_kept
    FROM flags
    GROUP BY lang
    """,
    tier="P1",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts per language through the curation
    funnel (raw -> exact dedup -> fingerprint dedup -> quality gate)."""
    docs = load_table(spark, sf_dir, "documents")
    flags = curate(docs)
    b = lambda c: F.sum(F.col(c).cast("int")).cast("bigint")  # noqa: E731
    return flags.groupBy("lang").agg(
        F.count("*").alias("raw"),
        b("exact_kept").alias("exact_kept"),
        b("neardup_kept").alias("neardup_kept"),
        b("quality_kept").alias("quality_kept"),
    )
