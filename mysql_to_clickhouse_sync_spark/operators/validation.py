"""Sync-validation operators: did the copy converge, and which rows differ?

The reference copies tables and hopes (its error policy is log-and-continue,
mysql_to_clickhouse_sync.py:87-89 — a failed chunk is silently missing, and
nothing ever verifies the target). The MySQL ecosystem's answer is
pt-table-checksum: chunk the table by the same key ranges used for the copy,
checksum each chunk on both sides, and re-copy only the chunks that
disagree. These operators are that recipe, Spark-side:

  * q_sync_checksum — per-chunk row counts + order-insensitive checksums
    (bit_xor and exact decimal sum of a portable 60-bit row fingerprint)
    over the reference's own chunk grid (floor(key/batch), S:109-112).
    Comparing two runs of this query — one per side — localizes divergence
    to 1000-row chunks without moving row data.
  * q_snapshot_diff — the repair step: keyed full-outer diff of a snapshot
    against a (deterministically simulated) drifted replica, classifying
    every key as match / mismatch / missing_in_target / extra_in_target.

Scale notes: the checksum is one scan + one narrow shuffle of (chunk,
fingerprint) pairs — at 100 TB each side computes independently and only
chunk digests cross the network (the pt-table-checksum property). The diff
is a single full-outer sort-merge join on the copy key with map-side
fingerprinting; its output is the repair worklist, which AQE keeps
proportional to the drift, not the table.

Fingerprints render every column deterministically (decimal(12,2) for money
— both engines round-trip 2-decimal doubles exactly; µs-formatted
timestamps) and hash through md5 (functions/hashing.py) so DuckDB computes
bit-identical values; the xor and decimal-sum aggregates are
order-insensitive, so partitioning never changes a digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
)
from mysql_to_clickhouse_sync_spark.registry import declare

CHUNK_SIZE = 1000  # the reference's --batch_size default (S:236)

_ROW_RENDER = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
    " o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),"
    " strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), o_orderpriority)"
)


def _row_fingerprint() -> Column:
    rendered = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.col("o_orderpriority"),
    )
    return md5_hash64(rendered)


@declare(
    "q_sync_checksum",
    oracle=f"""
    WITH fp AS (
        SELECT CAST(o_orderkey // {CHUNK_SIZE} AS BIGINT) AS chunk,
               o_orderkey,
               {md5_hash64_sql(_ROW_RENDER)} AS fingerprint
        FROM orders
    )
    SELECT chunk,
           count(*) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key,
           bit_xor(fingerprint) AS xor_checksum,
           -- String output: a 21-digit digest overflows float64, and the
           -- driver's pandas canonicalization maps DuckDB DECIMAL to
           -- float64 (precision loss) while Spark keeps Decimal. Plain
           -- digit strings are lossless and render identically.
           CAST(sum(CAST(fingerprint AS DECIMAL(38, 0))) AS VARCHAR)
               AS sum_checksum
    FROM fp
    GROUP BY chunk
    """,
    tier="P1",
)
def q_sync_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pt-table-checksum over the reference's chunk grid: per 1000-key chunk,
    count + key bounds + two order-insensitive digests. Run on source and
    target; chunks whose digests differ are the re-copy set."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            (F.floor(F.col("o_orderkey") / CHUNK_SIZE)).alias("chunk"),
            F.col("o_orderkey"),
            _row_fingerprint().alias("fingerprint"),
        )
        .groupBy("chunk")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.bit_xor("fingerprint").alias("xor_checksum"),
            F.sum(F.col("fingerprint").cast("decimal(38,0)"))
            .cast("string")
            .alias("sum_checksum"),
        )
    )


# Deterministic simulated drift — the target replica is the source minus
# every 97th key (lost chunk writes), with every (key % 101 == 3) row's
# price bumped (update that never replicated), plus key-shifted phantom rows
# (deletes that never replicated — their keys sit past the source's max).
# Parameters are arbitrary primes so the classes overlap nothing
# systematically, and every classifier branch fires on the fixtures.
_DROP_MOD = 97
_BUMP_MOD = 101
_BUMP_REM = 3
_EXTRA_MOD = 103
_EXTRA_REM = 5
_EXTRA_SHIFT = 10_000_000


@declare(
    "q_snapshot_diff",
    oracle=f"""
    WITH source AS (
        SELECT o_orderkey,
               {md5_hash64_sql(_ROW_RENDER)} AS fingerprint
        FROM orders
    ),
    target AS (
        SELECT o_orderkey,
               {md5_hash64_sql(_ROW_RENDER.replace(
                   "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)",
                   f"CAST(CAST(o_totalprice AS DECIMAL(12,2))"
                   f" + CASE WHEN o_orderkey % {_BUMP_MOD} = {_BUMP_REM}"
                   " THEN 1.00 ELSE 0.00 END AS VARCHAR)"))} AS fingerprint
        FROM orders
        WHERE o_orderkey % {_DROP_MOD} != 0
        UNION ALL
        SELECT o_orderkey + {_EXTRA_SHIFT} AS o_orderkey,
               {md5_hash64_sql(f"CAST(o_orderkey + {_EXTRA_SHIFT} AS VARCHAR)")}
                   AS fingerprint
        FROM orders
        WHERE o_orderkey % {_EXTRA_MOD} = {_EXTRA_REM}
    )
    SELECT CASE
             WHEN t.o_orderkey IS NULL THEN 'missing_in_target'
             WHEN s.o_orderkey IS NULL THEN 'extra_in_target'
             WHEN s.fingerprint = t.fingerprint THEN 'match'
             ELSE 'mismatch'
           END AS status,
           count(*) AS n_rows
    FROM source s
    FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
    GROUP BY 1
    """,
    tier="P1",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff of source vs drifted-target fingerprints: the repair
    worklist classifier. Full-outer sort-merge join on the copy key; the
    fingerprints are computed map-side so only (key, 8-byte hash) pairs
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    source = orders.select(
        "o_orderkey", _row_fingerprint().alias("fingerprint")
    )
    one = F.lit("1.00").cast("decimal(3,2)")  # decimal literal: a double
    zero = F.lit("0.00").cast("decimal(3,2)")  # would poison the arithmetic
    bumped_price = (
        F.col("o_totalprice").cast("decimal(12,2)")
        + F.when(F.col("o_orderkey") % _BUMP_MOD == _BUMP_REM, one).otherwise(
            zero
        )
    ).cast("string")
    target_fp = md5_hash64(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            bumped_price,
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            F.col("o_orderpriority"),
        )
    )
    drifted = orders.filter(F.col("o_orderkey") % _DROP_MOD != 0).select(
        "o_orderkey", target_fp.alias("fingerprint")
    )
    shifted_key = F.col("o_orderkey") + F.lit(_EXTRA_SHIFT)
    extras = orders.filter(
        F.col("o_orderkey") % _EXTRA_MOD == _EXTRA_REM
    ).select(
        shifted_key.alias("o_orderkey"),
        md5_hash64(shifted_key.cast("string")).alias("fingerprint"),
    )
    target = drifted.unionAll(extras)
    s, t = source.alias("s"), target.alias("t")
    joined = s.join(t, F.col("s.o_orderkey") == F.col("t.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("t.o_orderkey").isNull(), F.lit("missing_in_target"))
        .when(F.col("s.o_orderkey").isNull(), F.lit("extra_in_target"))
        .when(
            F.col("s.fingerprint") == F.col("t.fingerprint"), F.lit("match")
        )
        .otherwise(F.lit("mismatch"))
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_rows")
    )
