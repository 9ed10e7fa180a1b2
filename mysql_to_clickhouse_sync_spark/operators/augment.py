"""Deterministic text-augmentation operators — the augmentation stage of a
training-data pipeline, REPLAYABLE by construction (every random choice is
an md5 hash of (doc_id, position), the same 48-bit integers on both
engines via the Spark-conv / DuckDB-'0x'-CAST recipe), so an augmented
corpus can be re-derived bit-for-bit from the raw corpus + the recipe —
the property that makes augmented training data auditable.

  * q_word_dropout — classic word dropout at a pinned 15% rate: each
                     whitespace token survives iff
                     md5(doc_id:pos) % 1000 >= 150; emits the augmented
                     text plus kept/dropped counts per doc.

The reference (mysql_to_clickhouse_sync) copies rows verbatim
(SURVEY.md §2.8); augmentation is a north-star pipeline extension.

Scale notes: posexplode -> scalar hash filter -> one doc_id-keyed
map-side-combined regroup that rebuilds the string. Pure map + one
shuffle, linear at 100 TB; the per-doc sort is within collect_list
arrays bounded by doc length."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

DROP_PERMILLE = 150  # 15% word dropout


def _dropout_oracle() -> str:
    u = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'"
        " || CAST(i - 1 AS VARCHAR)), 1, 12) AS BIGINT) % 1000"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE length(trim(text)) > 0
    ), pos AS (
        SELECT doc_id, i, w[i] AS tok, {u} AS u
        FROM toks, unnest(generate_series(1, len(w))) AS t(i)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN u < {DROP_PERMILLE} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           COALESCE(string_agg(CASE WHEN u >= {DROP_PERMILLE} THEN tok
                      END, ' ' ORDER BY i), '') AS aug_text
    FROM pos GROUP BY doc_id
    """


@declare("q_word_dropout", oracle=_dropout_oracle(), tier="P1")
def q_word_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 15% word dropout over whitespace tokens:
    drop token iff md5(doc_id:pos) % 1000 < 150 — replayable
    augmentation (the augmented corpus is a pure function of the raw
    corpus), with the rebuilt text and kept/dropped tallies per doc.
    DuckDB's string_agg skips NULLs, Spark's concat_ws skips NULLs —
    the same kept-token join on both engines.

    Scale notes: posexplode, codegen hash filter, one doc_id-keyed
    map-side-combined regroup. Linear at 100 TB."""
    u = (
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',"
        " CAST(pos AS STRING))), 1, 12), 16, 10) AS BIGINT) % 1000"
    )
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
        )
        .withColumn("u", F.expr(u))
    )
    return toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.expr(f"CASE WHEN u < {DROP_PERMILLE} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_dropped"),
        F.expr(
            f"""array_join(transform(
                array_sort(collect_list(CASE WHEN u >= {DROP_PERMILLE}
                    THEN named_struct('pos', pos, 'tok', tok) END)),
                s -> s.tok), ' ')"""
        ).alias("aug_text"),
    )
