"""Bucketing evidence: pre-bucketed tables joined on the bucket key must
produce a plan with NO shuffle exchange on either side — the co-located
join that makes repeated 100 TB fact/fact joins affordable."""

from __future__ import annotations

import pytest

from mysql_to_clickhouse_sync_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # Tables land in the session's default warehouse dir (./spark-warehouse,
    # gitignored) — spark.sql.warehouse.dir is static, not settable here.
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bucketed")
        c = spark.table("customer_bucketed")
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # The whole point: no shuffle exchange feeding the join.
        assert "Exchange hashpartitioning" not in plan
        # And it still returns the right rows.
        assert joined.count() == 1500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_for_contrast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        plan = (
            o.join(c, o.o_custkey == c.c_custkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
