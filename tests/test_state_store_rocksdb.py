"""RocksDB state store coverage: at 100 TB/day the HDFS-backed in-memory
state store OOMs on large stateful joins/dedup — RocksDB spills to disk and
is the production choice. The provider is a session config baked in at
query start; this test pins that our streaming queries run (and produce
identical results) under it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.registry import queries
from tests.conftest import SF_DIR

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.mark.slow
def test_tumbling_stream_identical_under_rocksdb(spark):
    prev = spark.conf.get(_KEY, None)
    qs = queries()
    baseline = {
        tuple(r) for r in qs["s_tumbling_stream"](spark, SF_DIR).collect()
    }
    try:
        spark.conf.set(_KEY, ROCKSDB)
        rocks = {
            tuple(r) for r in qs["s_tumbling_stream"](spark, SF_DIR).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prev)
    assert rocks == baseline
