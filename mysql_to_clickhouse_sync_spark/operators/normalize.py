"""Type-normalization — the reference's value serializer as column expressions.

The reference turns every Python value into a SQL literal for its string-built
INSERT (mysql_to_clickhouse_sync.py:58-76):
  * str: escape ``'`` -> ``''`` and quote (S:62-64)
  * datetime/date: ``str(value)`` -> 'YYYY-MM-DD HH:MM:SS' (S:65-66)
  * None: literal NULL (S:67-68)
  * numerics: bare str; decimals keep trailing zeros via the session setting
    ``output_format_decimal_trailing_zeros=1`` (S:69-74, S:77-83)

The engine writes typed rows (no string-built SQL — the reference's approach
is injection-prone, S:44/S:76), but the *semantics* are preserved as
expressions so downstream systems see identical literal forms. All of this is
whole-stage-codegen'd scalar work: zero shuffle, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare


def quote_escape(col: Column) -> Column:
    """S:63 — double embedded single quotes."""
    return F.replace(col, F.lit("'"), F.lit("''"))


def datetime_literal(col: Column) -> Column:
    """S:65-66 — canonical 'YYYY-MM-DD HH:MM:SS' form."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def decimal_literal(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """S:71-83 — fixed scale with trailing zeros preserved."""
    return col.cast(f"decimal({precision},{scale})").cast("string")


def string_literal(col: Column) -> Column:
    """Full literal form: quoted+escaped, or bare NULL (S:62-68)."""
    return F.coalesce(
        F.concat(F.lit("'"), quote_escape(col), F.lit("'")), F.lit("NULL")
    )


@declare(
    "q_type_normalize",
    oracle="""
    SELECT o_orderkey,
           replace(o_orderpriority, '''', '''''') AS priority_escaped,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice_str,
           coalesce('''' || replace(nullif(o_orderstatus, 'F'), '''', '''''') || '''',
                    'NULL') AS status_literal
    FROM orders
    """,
    tier="P0",
)
def q_type_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serializer semantics over orders: quote-escape, datetime format,
    decimal-scale preservation, and NULL passthrough (nullif simulates the
    None branch — fixtures have no NULLs)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        quote_escape(F.col("o_orderpriority")).alias("priority_escaped"),
        datetime_literal(F.col("o_orderdate")).alias("orderdate_str"),
        decimal_literal(F.col("o_totalprice")).alias("totalprice_str"),
        string_literal(F.nullif(F.col("o_orderstatus"), F.lit("F"))).alias(
            "status_literal"
        ),
    )


DRIFT_SPLIT = 2  # key parity: even keys arrive as "v1" (pre-ALTER) rows — scale-independent


@declare(
    "q_schema_drift",
    oracle=f"""
    WITH v1 AS (
        -- rows extracted before the upstream ALTER TABLE: no priority col
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE o_orderkey % {DRIFT_SPLIT} = 0
    ), v2 AS (
        -- rows extracted after: schema gained o_orderpriority
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % {DRIFT_SPLIT} <> 0
    ), unified AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS src_schema
        FROM v1
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, 'v2'
        FROM v2
    )
    SELECT src_schema, o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_priority,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM unified
    GROUP BY src_schema, o_orderstatus
    """,
    tier="P1",
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: merge extracts taken before and after an
    upstream ALTER TABLE ADD COLUMN (the mid-sync drift every long-running
    copy of a live MySQL database eventually hits — the reference re-derives
    columns per batch from dict keys, mysql_to_clickhouse_sync.py:56, and
    would silently produce ragged INSERTs). Spark's
    unionByName(allowMissingColumns=True) aligns by NAME and NULL-fills the
    missing column — position-based UNION would mis-bind or reject. The
    audit aggregate proves which slice carries NULLs. Pure map-side union:
    no shuffle beyond the final audit groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = (
        orders.filter(F.col("o_orderkey") % DRIFT_SPLIT == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .withColumn("src_schema", F.lit("v1"))
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % DRIFT_SPLIT != 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .withColumn("src_schema", F.lit("v2"))
    )
    unified = v1.unionByName(v2, allowMissingColumns=True)
    return unified.groupBy("src_schema", "o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint")).alias(
            "n_null_priority"
        ),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
