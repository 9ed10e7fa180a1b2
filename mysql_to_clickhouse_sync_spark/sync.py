"""The reference's end-to-end job, runnable: snapshot -> chunk-planned
extract -> normalize -> batched load + resume checkpoint.

Reference pipeline (mysql_to_clickhouse_sync.py main(), :123-222):
  1. consistent snapshot + binlog position to metadata.txt (:152-183)
  2. SHOW TABLES + regex include/exclude (:155-159)
  3. per-table IFNULL MIN/MAX bounds (:163)
  4. chunked extract, type-normalize, 1000-row batched INSERTs (:93-116)

Spark-first shape: the "snapshot" is the source catalog (parquet fixtures
locally; the chunk-partitioned JDBC source in sources/jdbc.py against a real
MySQL); the extract is a declarative per-table plan whose partitioning IS the
chunk plan; the sink is parquet locally (ClickHouse JDBC in production —
swap `write.parquet` for `write.format('jdbc')` options); the checkpoint is
a JSON manifest recording per-table bounds + row counts — the analog of
metadata.txt's binlog position, from which the streaming CDC phase
(streaming/cdc.py) resumes.

Error policy deliberately diverges from the reference: it logs-and-continues,
returning [] on failed reads (S:48-50 — silent data loss). Here a failed
table fails the job; Spark's task retry handles transient faults.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.catalog import ROWID, TABLES, load_table
from mysql_to_clickhouse_sync_spark.sources.jdbc import filter_tables

DEFAULT_BATCH_SIZE = 1000  # reference --batch_size default (S:236)
MAX_OUTPUT_PARTITIONS = 64


def table_bounds(df: DataFrame, rowid: str) -> tuple[int, int, int]:
    """(min, max, count) with the reference's IFNULL-0 empty-table sentinel."""
    row = df.agg(
        F.coalesce(F.min(rowid), F.lit(0)).alias("mn"),
        F.coalesce(F.max(rowid), F.lit(0)).alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row.mn), int(row.mx), int(row.n)


def _load_any(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Catalog tables go through load_table (NTZ normalization etc.);
    discovered tables outside the static catalog read directly — the
    analog of a SHOW TABLES hit the metadata query knows nothing about."""
    if name in TABLES:
        return load_table(spark, sf_dir, name)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def discover_tables(sf_dir: str) -> list[str]:
    """SHOW TABLES analog (S:155-157): list the source's tables from the
    directory, not a hardcoded catalog — a fixture dir with extra tables
    syncs them too."""
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    return names


def sync_table(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    name: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    lake: bool = False,
) -> dict:
    """Extract one table chunk-parallel and load it to the sink, returning
    its manifest entry (the resume-point metadata).

    Tables with an integer rowid get the keyset path: range bounds + key-
    range partitioning (the chunk plan, P:119-129). A table with NO
    auto-increment PK — absent from the ROWID map or missing the column —
    takes the reference's fallback (P:200-211): the (0,0) bounds sentinel
    and offset paging (P:130-142). Spark-first, that is a plain parallel
    scan hash-spread over ceil(n/batch) output chunks: MySQL's LIMIT
    paging without ORDER BY carries no row order contract anyway, and the
    scan needs no key to parallelize. Such tables cannot resume by key —
    incremental_sync re-extracts them in full (mode == "offset").

    ``lake=True`` lands keyset tables through the sinks/merge.py
    LakeTable instead of a plain parquet overwrite: the snapshot is
    commit 0 of a versioned table (atomic publish, manifest stats) and
    every later incremental delta is a MERGE commit — so the synced
    target gains time travel and crash-safe resume for free, the
    production landing zone the reference's TRUNCATE-and-recopy
    recovery lacks. The key-chunk output layout is traded for the
    merge's key-hash shuffle; offset-mode (PK-less) tables keep the
    plain overwrite (no key, no merge)."""
    rowid = ROWID.get(name)
    df = _load_any(spark, sf_dir, name)
    out_path = os.path.join(out_dir, name)
    if rowid is not None and rowid in df.columns:
        mn, mx, n = table_bounds(df, rowid)
        mode = "keyset"
    else:
        rowid = None
        mn, mx, n = 0, 0, df.count()  # the reference's (0,0) sentinel
        mode = "offset"

    # Chunk plan -> physical partitioning: ceil(n/batch) ranges on the key,
    # capped so a 100 TB table yields a sane task count (each partition then
    # covers a wider stride — same plan, coarser granularity).
    n_chunks = max(1, min(MAX_OUTPUT_PARTITIONS, math.ceil(max(n, 1) / batch_size)))
    if n == 0:
        extracted = df
    elif mode == "keyset":
        extracted = df.repartitionByRange(n_chunks, F.col(rowid))
    else:
        extracted = df.repartition(n_chunks)
    entry = {
        "table": name,
        "rowid": rowid,
        "mode": mode,
        "min_id": mn,
        "max_id": mx,
        "rows": n,
        "chunks": n_chunks,
        "path": out_path,
    }
    if lake and mode == "keyset":
        from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable
        from mysql_to_clickhouse_sync_spark.streaming.cdc import as_state

        table = LakeTable(
            spark, out_path, keys=[rowid], version_cols=[rowid]
        )
        table.merge(as_state(extracted))
        entry["lake_version"] = table.current_version()
    else:
        extracted.write.mode("overwrite").parquet(out_path)
    return entry


def snapshot_sync(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    include: str | None = None,
    exclude: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    binlog_dir: str | None = None,
    lake: bool = False,
) -> dict:
    """Full-database sync: discover + filter tables, extract each, write the
    resume manifest (metadata.txt analog).

    When ``binlog_dir`` is given (the changelog feed the CDC phase will
    tail), the manifest also records its end offset — the full
    (file, pos, gtid) triple the reference captures under the snapshot lock
    (S:175-181). The offset is captured BEFORE any table is extracted,
    mirroring the reference's ordering: events that land mid-extraction
    are then covered by the stream (idempotent replay into the latest-
    per-key merge), whereas a late capture would put them in neither
    snapshot nor stream — a permanent gap. Start the stream with
    ``.option("startingOffset", json.dumps(manifest["binlog_offset"]))``:
    file+pos is the fast resume, gtid survives a failover rename
    (sources/binlog_datasource._scan)."""
    binlog_offset = None
    if binlog_dir is not None:
        from mysql_to_clickhouse_sync_spark.sources.binlog_datasource import (
            current_offset,
        )

        binlog_offset = current_offset(binlog_dir)
    discovered = discover_tables(sf_dir) or list(TABLES)
    names = filter_tables(discovered, include, exclude)
    entries = [
        sync_table(spark, sf_dir, out_dir, name, batch_size, lake=lake)
        for name in names
    ]
    manifest = {
        # The reference stores the binlog position captured under the
        # snapshot lock (S:175-181), BEFORE the copy starts.
        "source": sf_dir,
        "completed_unix": int(time.time()),
        "batch_size": batch_size,
        "tables": entries,
    }
    if binlog_offset is not None:
        manifest["binlog_offset"] = binlog_offset
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def incremental_sync(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict:
    """Resume from the manifest: extract only rows whose key is beyond each
    table's recorded max_id (the append-only half of CDC — the reference's
    binlog replay covers updates/deletes; see streaming/cdc.py for those).

    Reads out_dir/manifest.json, appends the delta per table, and rewrites
    the manifest with advanced bounds. Tables without new rows are skipped
    entirely (the predicate prunes at the scan, so a no-op sync reads only
    footers + the bounds aggregate).
    """
    manifest_path = os.path.join(out_dir, "manifest.json")
    with open(manifest_path) as fh:
        manifest = json.load(fh)

    new_entries = []
    for entry in manifest["tables"]:
        name, rowid, last_max = entry["table"], entry["rowid"], entry["max_id"]
        if entry.get("mode", "keyset") == "offset" or rowid is None:
            # PK-less table: no key to resume by (the reference's offset-
            # paged tables have the same property) — full re-extract.
            new_entries.append(
                sync_table(spark, sf_dir, out_dir, name, batch_size)
            )
            continue
        df = _load_any(spark, sf_dir, name)
        delta = df.filter(F.col(rowid) > last_max)
        mn, mx, n = table_bounds(delta, rowid)
        if n > 0:
            n_chunks = max(
                1, min(MAX_OUTPUT_PARTITIONS, math.ceil(n / batch_size))
            )
            chunked = delta.repartitionByRange(n_chunks, F.col(rowid))
            if "lake_version" in entry:
                from mysql_to_clickhouse_sync_spark.sinks.merge import (
                    LakeTable,
                )
                from mysql_to_clickhouse_sync_spark.streaming.cdc import (
                    as_state,
                )

                table = LakeTable(
                    spark, entry["path"], keys=[rowid], version_cols=[rowid]
                )
                table.merge(as_state(chunked))
                entry = {**entry, "lake_version": table.current_version()}
            else:
                chunked.write.mode("append").parquet(entry["path"])
            entry = {
                **entry,
                "max_id": mx,
                "rows": entry["rows"] + n,
                "last_delta_rows": n,
            }
        else:
            entry = {**entry, "last_delta_rows": 0}
        new_entries.append(entry)

    manifest = {
        **manifest,
        "completed_unix": int(time.time()),
        "tables": new_entries,
    }
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def main() -> None:
    from mysql_to_clickhouse_sync_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--include", default=None, help="table-name include regex")
    ap.add_argument("--exclude", default=None, help="table-name exclude regex")
    ap.add_argument("--batch-size", type=int, default=DEFAULT_BATCH_SIZE)
    ap.add_argument(
        "--lake",
        action="store_true",
        help="land keyset tables as versioned LakeTables (time travel,"
        " MERGE-committed incremental resume)",
    )
    args = ap.parse_args()
    spark = get_spark("snapshot_sync")
    manifest = snapshot_sync(
        spark,
        args.source,
        args.out,
        args.include,
        args.exclude,
        args.batch_size,
        lake=args.lake,
    )
    print(json.dumps({t["table"]: t["rows"] for t in manifest["tables"]}))


if __name__ == "__main__":
    main()
