"""Malformed-input handling: a production feed always contains bad rows.
The reference crashes the whole batch on one bad value (single INSERT per
1000 rows, mysql_to_clickhouse_sync.py:85-91); Spark's reader modes give
the engine a policy: PERMISSIVE quarantines bad rows into a corrupt-record
column (pipeline keeps flowing, bad rows are auditable), FAILFAST surfaces
them loudly. Both are pinned here."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

GOOD = '{"event_id": 1, "event_type": "click"}'
BAD = '{"event_id": oops not json'
SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def _write_feed(lines) -> str:
    workdir = tempfile.mkdtemp(prefix="corrupt_")
    with open(os.path.join(workdir, "feed.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return workdir


def test_permissive_quarantines_bad_rows(spark):
    workdir = _write_feed([GOOD, BAD, GOOD])
    try:
        df = (
            spark.read.schema(SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(workdir)
        ).cache()
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        # the quarantined row preserves the raw line for auditing
        assert bad.collect()[0]["_corrupt_record"].startswith('{"event_id": oops')
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_failfast_raises_on_bad_row(spark):
    workdir = _write_feed([GOOD, BAD])
    try:
        df = (
            spark.read.schema(SCHEMA)
            .option("mode", "FAILFAST")
            .json(workdir)
        )
        with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
            df.collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
