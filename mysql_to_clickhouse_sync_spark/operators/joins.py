"""Join operators (extensions — the reference performs zero joins; each table
ships independently, mysql_to_clickhouse_sync.py:192-199. Declared for the
north star's CDC-enrichment shape and relational completeness, SURVEY.md §2.4).

Scale notes: region/nation/customer are dimensions — broadcast them so the
fact side (orders) never shuffles for the join. At 100 TB the fact table
streams through executors once; AQE would pick broadcast automatically below
the threshold, but we hint explicitly since dim-ness is known statically.
Semi/anti joins keep only the left side's columns and short-circuit per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.operators.aggregates import (
    DECIMAL_SUM_SQL,
    decimal_sum,
)
from mysql_to_clickhouse_sync_spark.registry import declare


@declare(
    "q_join_enrich",
    oracle=f"""
    SELECT r_name, n_name, c_mktsegment,
           count(*) AS n_orders,
           {DECIMAL_SUM_SQL.format(col='o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name, c_mktsegment
    """,
    tier="P2",
)
def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: orders joined through customer -> nation ->
    region with all dims broadcast, aggregated per (region, nation, segment)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice", "revenue"),
        )
    )


# -- runtime bloom-filter join pruning ------------------------------------

# Bloom sizing: k=2 positions per key, m = 10 bits/key (~2.4% expected
# false-positive rate at this load factor with k=2). Both positions come
# from ONE md5 digest (two disjoint 12-hex slices — double hashing): the
# md5 is the dominant per-fact-row cost, so one digest instead of two
# seeded ones halves the probe work (measured at 100x).
BJ_BITS_PER_KEY = 10
BJ_SLICES = (1, 13)  # 1-based start of each 12-hex slice in the digest
# Selective dim predicate: a 2-month order window (~2.3% of orders).
BJ_LO = "1998-01-01 00:00:00"
BJ_HI = "1998-03-01 00:00:00"


def _bj_pos_spark(key: Column, start: int, m: int) -> Column:
    """Portable bloom position: md5(key) hex digits [start, start+12) as
    an integer, mod m — identical in Spark (conv) and DuckDB ('0x' cast),
    the q_countmin_heavy hash idiom."""
    h = F.md5(key.cast("string"))
    return F.pmod(
        F.conv(F.substring(h, start, 12), 16, 10).cast("long"), F.lit(m)
    )


def _bj_pos_sql(key: str, start) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({key} AS VARCHAR)),"
        f" {start}, 12) AS BIGINT) % (SELECT m FROM sz)"
    )


def _bj_build_bitmap(
    spark: SparkSession, keys: DataFrame, key_col: str, m: int
) -> DataFrame:
    """Build the k=2 Bloom bitmap over `keys[key_col]` as a ONE-ROW
    DataFrame `bits array<long>` ready to crossJoin-broadcast.

    Fully executor-side: the position set aggregates distributed
    (map-side-combined distinct, then bit_or per 64-bit word over a
    dense range-union zero-fill), and the final global aggregate lays
    the words out as ONE array<long> value via
    sort_array(collect_list(...)) — the treeAggregate-to-one-value
    shape of Spark's own runtime BloomFilter aggregate. The bitmap then
    travels driver->executors inside the JVM broadcast relation as
    compact UnsafeRow bytes (~m/8 bytes for the 125 MB filter the
    docstring regime implies). Nothing per-word EVER exists in Python:
    no Row-per-word collect (multi-GB of driver Row overhead at 100M
    keys), no 15M-element Python list pickled into a rebroadcast, not
    even a bytes round-trip (a binary-blob rebroadcast was measured
    superlinear: each element access of a lambda over the blob re-copies
    the whole binary out of the UnsafeRow)."""
    n_words = (m + 63) // 64
    spark = keys.sparkSession
    # Dense zero-fill BEFORE the per-word bit_or: every word index then
    # exists exactly once, so the final layout is a sort + project —
    # never a per-index map lookup (Spark's GetMapValue is a linear
    # scan; a map-based layout measured O(n^2) and unusable at 10M
    # keys). The filler is m/64 skinny rows from a range scan.
    filler = spark.range(n_words).select(
        F.col("id").cast("int").alias("w"),
        F.lit(0).cast("long").alias("mask"),
    )
    return (
        keys.select(
            F.explode(
                F.array(
                    *[
                        _bj_pos_spark(F.col(key_col), s, m)
                        for s in BJ_SLICES
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("mask"),
        )
        .unionByName(filler)
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .groupBy()
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(w, word))),"
                " e -> e.word)"
            ).alias("bits")
        )
    )


@declare(
    "q_bloom_join",
    oracle=f"""
    WITH okeys AS (
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '{BJ_LO}'
          AND o_orderdate <  TIMESTAMP '{BJ_HI}'
    ), sz AS (
        SELECT greatest(64, {BJ_BITS_PER_KEY} * count(*)) AS m FROM okeys
    ), bits AS (
        SELECT DISTINCT {_bj_pos_sql('o_orderkey', 's')} AS p
        FROM okeys, (SELECT unnest([{BJ_SLICES[0]}, {BJ_SLICES[1]}]) AS s)
            slices
    ), probed AS (
        SELECT l_orderkey, l_extendedprice, l_discount,
               {_bj_pos_sql('l_orderkey', BJ_SLICES[0])}
                   IN (SELECT p FROM bits)
               AND {_bj_pos_sql('l_orderkey', BJ_SLICES[1])}
                   IN (SELECT p FROM bits)
                   AS bloom_hit
        FROM lineitem
    ), acc AS (
        SELECT CAST(count(*) AS BIGINT) AS n_fact_total,
               CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fact_after_bloom
        FROM probed
    ), j AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               {{revenue}} AS revenue
        FROM probed JOIN okeys ON l_orderkey = o_orderkey
        WHERE bloom_hit
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_lineitems, revenue,
           acc.n_fact_total, acc.n_fact_after_bloom
    FROM j, acc
    """.format(
        revenue="""CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)"""
    ),
    tier="P2",
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning, built explicitly: a selective
    predicate on the dim side (orders in a 2-month window) folds into a
    Bloom filter over the surviving join keys; the fact side (lineitem)
    probes the broadcast filter BEFORE the shuffle join, so only
    bloom-surviving fact rows shuffle. Bloom false positives are removed
    by the exact join, so the join result is IDENTICAL to the unpruned
    plan — and because the hash is the portable md5 idiom, the pruning
    accounting itself (n_fact_total vs n_fact_after_bloom) is re-derived
    bit-for-bit by the DuckDB oracle, not just the final aggregate.

    This is the optimization Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter) performs inside the
    optimizer, demonstrated from first principles where it is visible
    and verifiable.

    Scale notes (100 TB): the regime where this wins is a filtered dim
    too LARGE to broadcast-hash-join (say 100M surviving keys) but whose
    Bloom filter is small (10 bits/key = ~125 MB bitmap — one broadcast);
    fact shuffle volume drops from |fact| to selectivity x |fact| x
    (1 + fp_rate). The filter build is one map-side-combined distinct on
    positions folded to 64-bit words and laid out as ONE array<long>
    value ENTIRELY in the JVM (see _bj_build_bitmap) — the broadcast
    ships ~m/8 bytes of UnsafeRow, and nothing per-word ever exists in
    Python (the old Row-per-word collect was a multi-GB driver
    bottleneck at the 100M-key regime); the probe is map-only O(1) per
    row (element_at + mask, whole-stage codegen)."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(BJ_LO))
            & (F.col("o_orderdate") < F.lit(BJ_HI))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    # plan-time sizing scalar (the reference's S:163 bounds pattern)
    m = max(64, BJ_BITS_PER_KEY * orders_f.count())
    bitmap = _bj_build_bitmap(spark, orders_f, "o_orderkey", m)

    def bit_set(p: str) -> str:
        return (
            f"(element_at(bits, CAST({p} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({p} % 64 AS INT))) != 0L"
        )

    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    p1, p2 = (
        _bj_pos_spark(F.col("l_orderkey"), s, m) for s in BJ_SLICES
    )
    # probed feeds the audit aggregate and the pruned join. It is NOT
    # materialized: recomputing it costs one extra parquet scan + one md5
    # pass (cheap, parallel), while checkpointing it writes O(|fact|)
    # rows — measured at 100x the checkpoint saves nothing and adds
    # storage churn, and at 100 TB it would be pure write amplification.
    probed = (
        fact.withColumn("_p1", p1)
        .withColumn("_p2", p2)
        .crossJoin(F.broadcast(bitmap))
        .withColumn(
            "bloom_hit",
            F.expr(f"{bit_set('_p1')} AND {bit_set('_p2')}"),
        )
        .drop("_p1", "_p2", "bits")
    )
    audit = probed.agg(
        F.count("*").alias("n_fact_total"),
        F.sum(F.col("bloom_hit").cast("bigint")).alias("n_fact_after_bloom"),
    )
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    revenue = (price * (F.lit(1) - disc)).cast("decimal(18,6)")
    joined = (
        probed.filter(F.col("bloom_hit"))
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(revenue)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("revenue"),
        )
    )
    return joined.crossJoin(F.broadcast(audit)).select(
        "o_orderpriority",
        "n_lineitems",
        "revenue",
        "n_fact_total",
        "n_fact_after_bloom",
    )


@declare(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS kind
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS kind
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tier="P2",
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti in one result: customers with >=1 order vs
    none, tagged. The orders side is reduced to its join key before the
    semi/anti join, so the probe input is minimal."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = customer.c_custkey == orders.o_custkey
    semi = customer.join(orders, cond, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("kind")
    )
    anti = customer.join(orders, cond, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("kind")
    )
    return semi.unionAll(anti)
