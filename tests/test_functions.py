"""The shared expression library (functions/): engine-portability contracts.

Each builder pairs a Spark Column with a DuckDB-SQL twin; these tests pin
that the pair computes bitwise-identical values — the invariant every
declared-query oracle leans on."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.functions import (
    DOT_SQL,
    NORM_TEXT_SQL,
    dot,
    md5_hash64,
    md5_hash64_sql,
    norm_text,
    tokens,
    with_norm,
)

VECS = [
    (1, [1.5, -2.25, 3.0], [4.0, 0.5, -1.125]),
    (2, [0.1, 0.2, 0.3], [0.3, 0.2, 0.1]),
]


def test_dot_matches_duckdb_bitwise(spark):
    df = spark.createDataFrame(
        VECS, "id long, a array<double>, b array<double>"
    )
    got = {
        r["id"]: r["d"]
        for r in df.select("id", dot(F.col("a"), F.col("b")).alias("d")).collect()
    }
    for vid, a, b in VECS:
        want = duckdb.sql(
            f"SELECT {DOT_SQL.format(a=str(a), b=str(b))} AS d"
        ).fetchone()[0]
        assert got[vid] == want  # bitwise, no tolerance


def test_with_norm_is_sqrt_self_dot(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    assert with_norm(df).collect()[0]["norm"] == 5.0


def test_md5_hash64_matches_duckdb(spark):
    df = spark.createDataFrame([("hello world",)], "s string")
    got = df.select(md5_hash64(F.col("s")).alias("h")).collect()[0]["h"]
    want = duckdb.sql(
        f"SELECT {md5_hash64_sql(chr(39) + 'hello world' + chr(39))} AS h"
    ).fetchone()[0]
    assert got == want
    # seed changes the hash
    seeded = df.select(md5_hash64(F.col("s"), seed="x").alias("h")).collect()[0]["h"]
    assert seeded != got


def test_norm_text_and_tokens_match_duckdb(spark):
    raw = "Hello, World!  Mixed-CASE 42."
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(norm_text(F.col("t")).alias("n")).collect()[0]["n"]
    want = duckdb.sql(
        "SELECT " + NORM_TEXT_SQL.format(col=chr(39) + raw + chr(39)) + " AS n"
    ).fetchone()[0]
    assert got == want == "hello world  mixedcase 42"
    toks = df.select(tokens(F.col("t")).alias("tk")).collect()[0]["tk"]
    assert toks == ["hello", "world", "mixedcase", "42"]
