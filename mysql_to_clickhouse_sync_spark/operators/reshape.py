"""Reshape operators — unpivot/melt (extension; the inverse of q_pivot,
SURVEY.md §2.3 table shapes). Wide measure columns become (measure, val)
rows via `stack()`, the zero-shuffle JVM-side melt: each input row expands
to K output rows inside the same whole-stage-codegen span, so at 100 TB the
operator is a pure map — no exchange, no UDF, and column pruning still
reaches the scan (only the 4 measure columns + keys are read)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

_MEASURES = ("quantity", "extendedprice", "discount", "tax")


@declare(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    WHERE l_orderkey < 500
    """,
    tier="P2",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt lineitem's four money/measure columns into (measure, val) rows —
    `stack()` emits all four per input row in one codegen pass (the oracle's
    4-way UNION ALL rescans; Spark does not). Values pass through the
    doubles untouched, so no rounding concern."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    stack_args = ", ".join(f"'{m}', l_{m}" for m in _MEASURES)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        f"stack({len(_MEASURES)}, {stack_args}) AS (measure, val)",
    )
