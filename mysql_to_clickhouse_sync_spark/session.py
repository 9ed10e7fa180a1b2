"""SparkSession factory.

Local testing runs one JVM with N threads (local[N]); the configuration is
nevertheless written for a real cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), shuffle partitions sized to cores rather
than the 200 default, Arrow enabled for the pandas-UDF paths, and UTC session
timezone so results are oracle-comparable (fixtures hold naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mysql_to_clickhouse_sync_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ~1 shuffle partition per core locally; on a real cluster this is
        # sized to total executor cores (AQE coalesces the excess anyway).
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
