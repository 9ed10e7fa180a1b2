"""Serializer-semantics unit tests (SURVEY.md §5.2): the reference's value
normalization edge cases (mysql_to_clickhouse_sync.py:58-83) as column
expressions — quote escaping, NULL literal, datetime form, decimal scale."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mysql_to_clickhouse_sync_spark.operators.normalize import (
    datetime_literal,
    decimal_literal,
    quote_escape,
    string_literal,
)


def test_quote_escape_doubles_single_quotes(spark):
    # S:63 — value.replace("'", "''")
    df = spark.createDataFrame(
        [("it's a 'test'",), ("no quotes",), ("''",)], ["s"]
    )
    out = [r.e for r in df.select(quote_escape(F.col("s")).alias("e")).collect()]
    assert out == ["it''s a ''test''", "no quotes", "''''"]


def test_string_literal_null_becomes_bare_null(spark):
    # S:67-68 — None -> literal NULL (unquoted); strings quoted+escaped.
    schema = StructType([StructField("s", StringType(), True)])
    df = spark.createDataFrame([("a'b",), (None,)], schema)
    out = [r.l for r in df.select(string_literal(F.col("s")).alias("l")).collect()]
    assert out == ["'a''b'", "NULL"]


def test_datetime_literal_is_mysql_str_form(spark):
    # S:65-66 — str(datetime) form 'YYYY-MM-DD HH:MM:SS'.
    schema = StructType([StructField("t", TimestampType(), True)])
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 5, 7, 9, 11),)], schema
    )
    out = df.select(datetime_literal(F.col("t")).alias("d")).collect()[0].d
    assert out == "2024-03-05 07:09:11"


def test_decimal_literal_preserves_trailing_zeros(spark):
    # S:77-83 — output_format_decimal_trailing_zeros: 4 -> '4.00'.
    schema = StructType([StructField("x", DoubleType(), True)])
    df = spark.createDataFrame([(4.0,), (12.5,), (0.031,)], schema)
    out = [r.d for r in df.select(decimal_literal(F.col("x")).alias("d")).collect()]
    assert out == ["4.00", "12.50", "0.03"]


def test_decimal_literal_scale_param(spark):
    df = spark.createDataFrame([(Decimal("4.1000"),)], "x decimal(10,4)")
    out = df.select(decimal_literal(F.col("x"), scale=4).alias("d")).collect()[0].d
    assert out == "4.1000"
