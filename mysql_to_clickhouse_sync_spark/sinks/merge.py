"""MERGE-INTO emulation for parquet state — the storage half of CDC apply.

Lakehouse formats (Delta/Iceberg/Hudi) provide transactional MERGE; their
jars are not in this environment, so this implements the classic emulation:
read current state -> apply the changelog merge (streaming/cdc.py) -> write
a new generation directory -> flip a pointer file atomically. Readers
resolve the pointer first, so a crash mid-write leaves the previous
generation intact (write-audit-publish, not in-place mutation).

Scale notes: each merge rewrites only the state table (latest-per-key — far
smaller than the event history). For 100 TB state, partition the state by
key-hash directory and merge only partitions the changelog touches (the
changelog's distinct key-hash set prunes the rewrite); generations make
that incremental rewrite safe too.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from mysql_to_clickhouse_sync_spark.streaming.cdc import (
    apply_changelog,
    as_state,
    live_rows,
)

_POINTER = "_CURRENT"


def _current_generation(path: str) -> str | None:
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        gen = fh.read().strip()
    return os.path.join(path, gen) if gen else None


def _publish_generation(path: str, write_fn) -> str:
    """Write-audit-publish: write the next generation via write_fn(gen_path),
    atomically flip the pointer, retire the old generation. Returns the new
    generation path."""
    old_gen = _current_generation(path)
    gen_name = (
        f"gen-{0 if old_gen is None else int(os.path.basename(old_gen).split('-')[1]) + 1:06d}"
    )
    gen_path = os.path.join(path, gen_name)
    write_fn(gen_path)
    tmp_ptr = os.path.join(path, _POINTER + ".tmp")
    with open(tmp_ptr, "w") as fh:
        fh.write(gen_name)
    os.replace(tmp_ptr, os.path.join(path, _POINTER))  # atomic publish
    if old_gen is not None:
        shutil.rmtree(old_gen, ignore_errors=True)  # retire old generation
    return gen_path


def _read_raw(spark: SparkSession, path: str) -> DataFrame | None:
    """The stored state INCLUDING tombstone rows (op column), or None."""
    gen = _current_generation(path)
    if gen is None:
        return None
    return spark.read.parquet(gen)


def read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Current live rows, or None if the table doesn't exist yet."""
    raw = _read_raw(spark, path)
    return None if raw is None else live_rows(raw)


def merge_into_parquet(
    spark: SparkSession,
    path: str,
    changelog: DataFrame,
    keys: list[str],
    version_cols: list[str],
) -> DataFrame:
    """Merge a changelog into the parquet-backed state table at `path` and
    publish the new generation. Returns the new live state. First call
    bootstraps the table from the changelog alone."""
    os.makedirs(path, exist_ok=True)
    state = _read_raw(spark, path)
    payload_cols = [c for c in changelog.columns if c != "op"]
    if state is None:
        state = as_state(
            spark.createDataFrame([], changelog.select(*payload_cols).schema)
        )

    new_state = apply_changelog(state, changelog, keys, version_cols)
    # Persist WITH tombstones (op column) so later out-of-order upserts
    # cannot revive deleted keys across merges; readers get live_rows.
    gen_path = _publish_generation(
        path, lambda p: new_state.write.mode("overwrite").parquet(p)
    )
    return live_rows(spark.read.parquet(gen_path))
