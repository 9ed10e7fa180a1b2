"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``mysql_to_clickhouse_sync_spark`` package;
this module is a thin adapter. Every declared query was verified locally
against DuckDB at sf0.001 and sf0.01 before being declared
(tools/verify_local.py mirrors the driver's comparison).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_to_clickhouse_sync_spark import registry as _registry

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: q_dedup_latest — latest event per user, the
    ReplacingMergeTree/CDC-upsert semantic that is the reference pipeline's
    north-star endpoint (SURVEY.md §7 step 1)."""
    qs = _registry.queries()
    return qs["q_dedup_latest"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; streaming/non-SQL ops are omitted and
    fall back to the driver's rows-only check."""
    return _registry.oracle_sql()
