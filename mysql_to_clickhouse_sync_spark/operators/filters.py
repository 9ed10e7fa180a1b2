"""Regex include/exclude filtering.

The reference filters *table names* through compiled include/exclude regexes
(compile mysql_to_clickhouse_sync.py:143-144; filter :158-159 — keep iff
``not exclude.search(name) and (no include or include.search(name))``).
Python ``re.search`` is unanchored, matching Spark ``rlike`` / DuckDB
``regexp_matches`` semantics. The fixture analog filters ``documents.source``.

At scale the rlike predicates are evaluated inside whole-stage codegen and
(for parquet) cannot push to row-group stats, but they prune early in the
scan stage — no shuffle is involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

INCLUDE_RE = "src1"  # matches src1, src10..src19 (unanchored, like re.search)
EXCLUDE_RE = "3"  # drops src13 (and src3, already outside include)


def include_exclude(col: Column, include: str | None, exclude: str | None) -> Column:
    """The reference's keep-predicate (S:158-159) as a Column expression."""
    keep = F.lit(True)
    if exclude:
        keep = keep & ~col.rlike(exclude)
    if include:
        keep = keep & col.rlike(include)
    return keep


@declare(
    "q_regex_include_exclude",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE regexp_matches(source, '{INCLUDE_RE}')
      AND NOT regexp_matches(source, '{EXCLUDE_RE}')
    """,
    tier="P0",
)
def q_regex_include_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        include_exclude(F.col("source"), INCLUDE_RE, EXCLUDE_RE)
    ).select("doc_id", "source", "lang")
