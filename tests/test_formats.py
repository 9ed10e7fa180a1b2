"""Source/sink format coverage: the engine must round-trip its tables
through CSV, JSON-lines and ORC without value drift (the reference moves
rows as SQL text, mysql_to_clickhouse_sync.py:56-66 — these are the
Spark-native equivalents a user would swap in).

Doubles survive CSV/JSON because Spark writes the shortest round-trip
representation; timestamps are written/parsed as microsecond ISO strings.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from tests.conftest import SF_DIR


def _roundtrip(spark, df, fmt: str, **read_opts):
    workdir = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        path = f"{workdir}/data"
        writer = df.write.mode("overwrite")
        reader = spark.read.schema(df.schema)
        if fmt in ("csv", "json"):
            # default text-format timestamp precision is ms; force µs.
            # NTZ columns (parquet nanos read natively as timestamp_ntz on
            # pyspark >= 4.1) use the separate timestampNTZFormat option.
            opts = {
                "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
                "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
            }
            if fmt == "csv":
                opts["header"] = "true"
            writer = writer.options(**opts)
            reader = reader.options(**opts)
        writer.format(fmt).save(path)
        back = reader.format(fmt).load(path)
        return back.collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _as_multiset(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_orders_roundtrip(spark, fmt):
    orders = load_table(spark, SF_DIR, "orders")
    assert _as_multiset(_roundtrip(spark, orders, fmt)) == _as_multiset(
        orders.collect()
    )


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_events_roundtrip_microsecond_timestamps(spark, fmt):
    # events carries µs-precision timestamps (floored from nanos) — the
    # formats must not truncate them. CSV is covered by orders above;
    # events' props map column is not CSV-representable, so skip csv here.
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    assert _as_multiset(_roundtrip(spark, events, fmt)) == _as_multiset(
        events.collect()
    )


def test_lineitem_orc_predicate_pushdown(spark):
    """ORC reads must accept pushed filters like parquet does (scan-level
    row-group pruning at scale)."""
    li = load_table(spark, SF_DIR, "lineitem")
    workdir = tempfile.mkdtemp(prefix="fmt_orc_pd_")
    try:
        path = f"{workdir}/li"
        li.write.mode("overwrite").format("orc").save(path)
        back = spark.read.format("orc").load(path).filter(
            F.col("l_orderkey") < 100
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "l_orderkey" in plan
        assert back.count() == li.filter(F.col("l_orderkey") < 100).count()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    # The 100 TB layout contract: a ts-date/type-partitioned landing zone
    # must let a filtered read touch ONLY matching partition directories —
    # Catalyst partition pruning, visible as PartitionFilters in the scan
    # and an input row count equal to the partition's rows.
    import io
    from contextlib import redirect_stdout

    from mysql_to_clickhouse_sync_spark.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_part")
    events.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    import re

    assert "PartitionFilters" in plan
    # attribute ids decorate the column name (event_type#14 = click)
    assert re.search(r"PartitionFilters:.*event_type#\d+ = click", plan), plan
    # pruned read returns exactly the partition's rows
    expected = events.filter(F.col("event_type") == "click").count()
    assert back.count() == expected
    # and the pushed filter must NOT appear as a data filter on the scan —
    # pruning happens at the directory level, no row-level work
    scan_section = plan.split("PartitionFilters", 1)[1]
    assert "PushedFilters: []" in scan_section or "PushedFilters" not in scan_section
