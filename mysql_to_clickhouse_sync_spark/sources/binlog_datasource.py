"""Custom Spark Python DataSource whose streaming offset IS the reference's
binlog checkpoint.

The reference records ``(binlog_file, binlog_position)`` to metadata.txt at
snapshot time (mysql_to_clickhouse_sync.py:175-183) precisely so a future
replayer can resume from that point — SURVEY.md §1.1 maps that checkpoint to
"Structured Streaming custom source Offset", and this module closes the
loop: a Spark 4 Python DataSource (``spark.dataSource.register``) that tails
a directory of rotated envelope files (``*.jsonl``, Debezium/Maxwell lines —
the wire format of sources/binlog.py) with offsets of exactly that shape::

    {"file": "binlog.000002.jsonl", "pos": 1842, "gtid": 3420}

``pos`` is the line index within the file (the envelope analog of the byte
position in a real binlog); ``gtid`` is the monotonic count of txn events
applied since the beginning of the stream — the GTID analog the reference
records alongside file/pos (S:175-181). File+pos is the fast resume path;
gtid is the FAILOVER-SAFE one: it names a point in the transaction sequence
independent of file naming, so when the recorded file no longer exists
(primary switch renamed the binlogs), the reader relocates the resume point
by skipping the first ``gtid`` events in replay order — no replays, no
gaps. Offsets from older checkpoints without a gtid are migrated in place
(the prefix count is derived once on the next batch). Spark persists the
offset in its checkpoint log — the engine-native metadata.txt — giving
exactly-once replay across query restarts; ``readBetweenOffsets`` re-serves
any window deterministically for failure recovery.

Snapshot→stream handoff (the reference's whole architecture): run the bulk
snapshot, call ``current_offset(path)`` (the SHOW MASTER STATUS analog,
S:175-177), and start the stream with ``.option("startingOffset",
json.dumps(offset))`` — rows appended before the snapshot's offset are never
replayed.

File-rotation contract (same as MySQL binlogs): files sort by name in write
order; only the newest file may grow; older files are immutable. The reader
therefore never re-lists content behind the committed offset.

Scale notes: a ``SimpleDataSourceStreamReader`` prefetches on the driver and
ships batches to executors — right for a changelog (ordered, modest rate;
the partition-parallel path is the batch ``reader()``, one partition per
rotated file). At production scale the same offset shape rides a
Kafka/Debezium topic instead (sources/binlog.py's gated Kafka transport);
this source exists so the full pipeline — wire envelopes → offsets →
exactly-once merge — runs and is tested with zero external services.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "binlogdir"
SCHEMA = "file string, pos bigint, value string"

_BEGINNING = {"file": "", "pos": 0, "gtid": 0}


def _list_files(path: str) -> list[str]:
    """Rotated envelope files in replay order (name order = write order)."""
    try:
        return sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    except FileNotFoundError:
        return []


def _read_lines(path: str, fname: str) -> list[str]:
    with open(os.path.join(path, fname), encoding="utf-8") as fh:
        return fh.read().splitlines()


def _prefix_count(path: str, files: list[str], start: dict) -> int:
    """Events strictly before a (file, pos) cursor — derives the gtid for
    offsets written by pre-gtid checkpoints (one-time migration cost)."""
    if not start.get("file"):
        return 0
    n = 0
    for fname in files:
        if fname < start["file"]:
            n += len(_read_lines(path, fname))
        elif fname == start["file"]:
            n += min(start["pos"], len(_read_lines(path, fname)))
            break
    return n


def _scan(path: str, start: dict) -> tuple[list[tuple], dict]:
    """All (file, pos, value) rows at or after `start`, plus the offset one
    past the last row — the pure function both the stream and batch readers
    (and current_offset) share.

    Resume rules (the reference's S:175-181 triple, in order of trust):
      1. (file, pos) when the recorded file still exists — O(tail) fast path.
      2. gtid when it doesn't (failover rename): replay order is rescanned
         and the first `gtid` events — already applied under the old names —
         are skipped. The returned offset carries the NEW file names, so
         subsequent batches are back on the fast path.
    """
    files = _list_files(path)
    gtid = start.get("gtid")
    file_missing = bool(start.get("file")) and start["file"] not in files
    # gtid-skip also covers the collapsed case (file == "" with gtid > 0):
    # a failover poll that raced an empty directory must still not replay
    # the first `gtid` events once history reappears under new names.
    if gtid is not None and (file_missing or (not start.get("file") and gtid > 0)):
        all_rows: list[tuple] = []
        for fname in files:
            for i, line in enumerate(_read_lines(path, fname)):
                all_rows.append((fname, i, line))
        rows = all_rows[gtid:]
        if rows:
            last_f, last_i, _ = all_rows[-1]
            end = {"file": last_f, "pos": last_i + 1, "gtid": len(all_rows)}
        else:
            # Nothing new (directory empty, or shorter than the applied
            # prefix — e.g. renamed history not yet re-served): keep the
            # ORIGINAL offset verbatim so the gtid skip re-arms on the
            # next poll instead of collapsing to "beginning".
            end = dict(start)
        return rows, end
    if gtid is None:
        gtid = _prefix_count(path, files, start)
    rows = []
    cur = {"file": start.get("file", ""), "pos": start.get("pos", 0)}
    for fname in files:
        if cur["file"] and fname < cur["file"]:
            continue  # behind the committed offset: immutable, skip unread
        first = cur["pos"] if fname == cur["file"] else 0
        lines = _read_lines(path, fname)
        for i in range(first, len(lines)):
            rows.append((fname, i, lines[i]))
        cur = {"file": fname, "pos": max(first, len(lines))}
    return rows, {**cur, "gtid": gtid + len(rows)}


def current_offset(path: str) -> dict:
    """The directory's live end position — what a snapshot records as its
    resume point (the SHOW MASTER STATUS analog, S:175-177)."""
    _, end = _scan(path, _BEGINNING)
    return end


class _BinlogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, starting: dict | None):
        self._path = path
        self._starting = starting

    def initialOffset(self) -> dict:
        # Only consulted when the checkpoint is empty: a recorded
        # startingOffset (snapshot handoff) wins over "beginning".
        return dict(self._starting) if self._starting else dict(_BEGINNING)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, end = _scan(self._path, start)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay of a committed window (recovery path).
        rows, _ = _scan(self._path, start)
        bound = (end["file"], end["pos"])
        return iter(r for r in rows if (r[0], r[1]) < bound)


class _FilePartition(InputPartition):
    def __init__(self, fname: str):
        self.fname = fname


class _BinlogBatchReader(DataSourceReader):
    """Batch twin: full replay of the directory, one partition per rotated
    file — executor-parallel, unlike the driver-prefetching stream path."""

    def __init__(self, path: str):
        self._path = path

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(f) for f in _list_files(self._path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        for i, line in enumerate(_read_lines(self._path, partition.fname)):
            yield (partition.fname, i, line)


class BinlogDirDataSource(DataSource):
    """format("binlogdir").option("path", dir)[.option("startingOffset", j)]"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def _path(self) -> str:
        if "path" not in self.options:
            raise ValueError("binlogdir requires .option('path', <dir>)")
        return self.options["path"]

    def simpleStreamReader(self, schema: StructType) -> _BinlogStreamReader:
        raw = self.options.get("startingoffset")  # options are lower-cased
        return _BinlogStreamReader(self._path(), json.loads(raw) if raw else None)

    def reader(self, schema: StructType) -> _BinlogBatchReader:
        return _BinlogBatchReader(self._path())


def register(spark: SparkSession) -> None:
    """Register the format with this session.

    The streaming source runner is a separate Python process that unpickles
    the DataSource; unlike UDF workers it does NOT pick up addPyFile paths,
    so a by-reference pickle of this class dies with ModuleNotFoundError
    when the driver found the package via a sys.path edit (foreign-cwd
    drive). Registering the module for pickle-BY-VALUE makes the serialized
    source self-contained — it only needs stdlib + pyspark on the runner
    side. ensure_package_shipped still runs for the executor-side batch
    reader partitions."""
    import mysql_to_clickhouse_sync_spark.sources.binlog_datasource as _self
    from mysql_to_clickhouse_sync_spark.shipping import ensure_package_shipped
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_self)
    ensure_package_shipped(spark)
    spark.dataSource.register(BinlogDirDataSource)
