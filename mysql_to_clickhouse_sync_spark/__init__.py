"""mysql_to_clickhouse_sync_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of hcymysql/mysql_to_clickhouse_sync.

The reference (/root/reference/mysql_to_clickhouse_sync.py, ~540 LoC total) is
a snapshot loader: consistent MySQL snapshot -> key-range chunked extract ->
type-normalized batched insert into ClickHouse, with a binlog checkpoint for a
future CDC phase. This package re-expresses that capability surface — and the
north-star extensions (CDC streaming, dedup, similarity search, text analysis)
— Spark-first: declarative DataFrame plans, Catalyst-optimized, designed for
100 TB / 1000-executor scale while tested on local[32] parquet fixtures.

Layout:
  session.py    SparkSession factory with scale-appropriate defaults
  catalog.py    fixture table loader (parquet) + nanos-timestamp handling
  registry.py   the declared-query registry (queries() / oracle_sql() surface)
  shipping.py   package distribution to Python UDF workers (addPyFile)
  operators/    one module per operator family (SURVEY.md §2); reusable
                column expressions (hashing, shingling, cosine, normalize)
                live beside the operators that own them
  sources/      chunk-partitioned JDBC source mirroring the reference extract
  sinks/        ClickHouse JDBC writer + parquet twin
  plans/        pure-python chunk planner (reference S:109-112 semantics)
  streaming/    CDC changelog merge, declared streams, stateful operator
  sync.py       the reference's end-to-end job: snapshot -> extract -> load
"""

from mysql_to_clickhouse_sync_spark.registry import REGISTRY, queries, oracle_sql

__all__ = ["REGISTRY", "queries", "oracle_sql"]
