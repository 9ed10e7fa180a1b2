"""Oracle-differential tests: every declared query's Spark result must equal
its DuckDB oracle on the sf0.001 fixtures — the same comparison the driver
runs at sf0.01 (row count + column names + order-insensitive values).
Streaming (oracle-less) queries are rows-only smoke-checked here.
"""

from __future__ import annotations

import datetime
import decimal
import math
from collections import Counter

import pytest

from mysql_to_clickhouse_sync_spark.registry import REGISTRY, queries
from tests.conftest import SF_DIR

# Heavier pair-join queries are exercised at sf0.001 only (still full oracle
# checks — the driver repeats them at sf0.01).
ALL = sorted(queries())


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _multiset(cols, rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck):
    decl = REGISTRY[name]
    sdf = decl.fn(spark, SF_DIR)
    s_rows = sdf.collect()
    if decl.oracle is None:
        assert len(s_rows) >= 0  # rows-only: ran to completion with a schema
        assert sdf.columns
        return
    rel = duck.sql(decl.oracle)
    d_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), "schema mismatch"
    assert len(s_rows) == len(d_rows), "row count mismatch"
    assert _multiset(sdf.columns, s_rows) == _multiset(rel.columns, d_rows)
