"""Scan operators — the reference's extract paths re-expressed on Spark.

Reference behavior (citations into /root/reference/):
  * full scan:   ``SELECT * FROM {table}`` — mysql_to_clickhouse_sync.py:44
  * range scan:  chunked ``WHERE _rowid >= a AND _rowid < b`` — half-open per
    mysql_to_clickhouse_sync_pagination.py:44 (the non-pagination variant uses
    inclusive ``<=`` at mysql_to_clickhouse_sync.py:44, a boundary-duplication
    bug this engine does not copy)
  * offset page: ``SELECT * LIMIT offset, n`` for PK-less tables —
    mysql_to_clickhouse_sync_pagination.py:64-74, :130-142. MySQL LIMIT
    without ORDER BY is nondeterministic; the engine imposes PK order.

Scale notes: the filters below compile to parquet PushedFilters (verified via
.explain), so at 100 TB a range scan touches only matching row groups. The
offset-page shape is inherently sequential (a global sort + offset); it exists
for parity with the reference's PK-less fallback — at scale prefer the
key-range path, which is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare

RANGE_LO, RANGE_HI = 1000, 3000
PAGE_OFFSET, PAGE_SIZE = 1000, 1000


@declare(
    "q_full_scan",
    oracle="SELECT * FROM lineitem",
    tier="P0",
)
def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table extract (mysql_to_clickhouse_sync.py:40-50)."""
    return load_table(spark, sf_dir, "lineitem")


@declare(
    "q_range_scan",
    oracle=f"""
    SELECT * FROM lineitem
    WHERE l_orderkey >= {RANGE_LO} AND l_orderkey < {RANGE_HI}
    """,
    tier="P0",
)
def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open key-range chunk read (pagination.py:44); filter is pushed to
    the parquet scan, the distributed analog of shipping the predicate to
    MySQL inside the chunk SELECT."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((li.l_orderkey >= RANGE_LO) & (li.l_orderkey < RANGE_HI))


@declare(
    "q_limit_page",
    oracle=f"""
    SELECT * FROM orders
    ORDER BY o_orderkey
    OFFSET {PAGE_OFFSET} ROWS FETCH NEXT {PAGE_SIZE} ROWS ONLY
    """,
    tier="P0",
)
def q_limit_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-paged read (pagination.py:64-74) with the engine's added
    determinism: total order on the PK before offset/limit.

    Scale note: Spark executes this as TakeOrderedAndProject with an
    offset — each partition keeps its top-(offset+limit), one merge skips
    the offset. Cost grows with page depth (the classic deep-paging trap,
    same as MySQL's own LIMIT offset,n the reference paginates with,
    P:68). The 100 TB path for a FULL paged extract is keyset pagination
    — `WHERE pk > last_seen ORDER BY pk LIMIT n` — which is exactly
    q_range_scan's pushed-predicate shape; offset paging is declared for
    parity with the reference's PK-less fallback, where no keyset
    exists."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy("o_orderkey").offset(PAGE_OFFSET).limit(PAGE_SIZE)
