"""Small-file compaction — the maintenance job every streaming sink needs.

Micro-batch writers (foreachBatch parquet appends, the reference's
1000-row INSERT batches at mysql_to_clickhouse_sync.py:97-116) accumulate
many small files; at 100 TB that kills scan throughput (per-file open cost,
tiny row groups defeat row-group pruning and vectorized reads). Compaction
rewrites a directory into ~target-sized files using the same
write-audit-publish generation scheme as sinks/merge.py: the compacted
generation is written alongside, then the pointer flips — readers never see
a half-compacted table and a crash leaves the previous generation intact.

File count is chosen from MEASURED bytes (directory size / target), not
row counts — parquet compression makes row-based sizing wrong by 10x+.
coalesce() (not repartition()) does the rewrite without a shuffle: at
100 TB the job is pure read+write, network-free; use repartition(col)
instead only when changing the layout (e.g. clustering by key for
downstream bucket joins) is itself the goal.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # HDFS-block-ish target


def data_file_sizes(path: str) -> list[int]:
    """Sizes of the parquet data files under one generation directory."""
    return [
        e.stat().st_size
        for e in os.scandir(path)
        if e.is_file() and e.name.endswith(".parquet")
    ]


def plan_file_count(total_bytes: int, target: int = TARGET_FILE_BYTES) -> int:
    return max(1, -(-total_bytes // target))  # ceil div


def compact_generation(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    retention: int = 1,
) -> tuple[str, int, int]:
    """Compact the current generation of a pointer-directory table (as laid
    out by sinks/merge.py) into ceil(bytes/target) files. Returns
    (new_generation_path, files_before, files_after). No-op (returns the
    current generation) if already at or below the planned count.

    Routed through LakeTable._commit so the superseded generation obeys
    the same reference-counted `retention` discipline as every other
    commit: an in-flight reader bound to the pre-compaction snapshot
    keeps its files (the legacy path deleted them at publish — the
    round-6 snapshot-isolation hole, closed). Works on legacy
    manifest-less tables via LakeTable's bootstrap fallback."""
    from mysql_to_clickhouse_sync_spark.sinks.merge import (
        LakeTable,
        _current_generation,
    )

    gen_path = _current_generation(table_dir)
    if gen_path is None:
        raise FileNotFoundError(f"no published generation under {table_dir}")
    sizes = data_file_sizes(gen_path)
    n_before = len(sizes)
    n_target = plan_file_count(sum(sizes), target_file_bytes)
    if n_before <= n_target:
        return gen_path, n_before, n_before
    table = LakeTable(
        spark, table_dir, keys=[], version_cols=[], retention=retention
    )
    v = table.current_version()
    m = table.manifest(v)
    df = spark.read.parquet(gen_path)
    new_v = table._commit(
        lambda p: df.coalesce(n_target).write.parquet(p),
        {
            "operation": "compact",
            "compacted_from": v,
            "last_batch": m.get("last_batch"),
            "schema_version": m.get("schema_version", 0),
            "schema": m.get("schema"),
        },
        expected_parent=v,
    )
    new_path = table._gen_dir(new_v)
    n_after = len(data_file_sizes(new_path))
    return new_path, n_before, n_after
