"""Semi-structured (JSON) extraction — north-star extension (SURVEY.md §2.8).

The events fixture carries a JSON `props` column (e.g. '{"k": 87}'), standing
in for the loosely-typed payloads a CDC stream ships. Extraction stays
JVM-side (get_json_object) — no Python in the path; at 100 TB prefer parsing
once with from_json into a struct column over repeated path extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import load_table
from mysql_to_clickhouse_sync_spark.registry import declare


@declare(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
    tier="P2",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return events.select(
        "event_id",
        k.alias("k_str"),
        k.try_cast("bigint").alias("k_int"),
    )
