"""Tests for the custom binlogdir Python DataSource
(sources/binlog_datasource.py): exactly-once delivery across file rotation,
checkpoint resume, snapshot→stream handoff via startingOffset, and the
partition-per-file batch reader.
"""

from __future__ import annotations

import json
import os

import pytest

from mysql_to_clickhouse_sync_spark.sources.binlog_datasource import (
    FORMAT_NAME,
    _scan,
    current_offset,
    register,
)


@pytest.fixture()
def feed(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    return str(d)


def _write(feed: str, fname: str, lines: list[str]) -> None:
    with open(os.path.join(feed, fname), "w") as fh:
        fh.write("".join(line + "\n" for line in lines))


def _append(feed: str, fname: str, lines: list[str]) -> None:
    with open(os.path.join(feed, fname), "a") as fh:
        fh.write("".join(line + "\n" for line in lines))


def _stream_collect(spark, feed: str, ckpt: str, got: list, offset: str | None = None):
    reader = spark.readStream.format(FORMAT_NAME).option("path", feed)
    if offset is not None:
        reader = reader.option("startingOffset", offset)
    return (
        reader.load()
        .writeStream.foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_scan_pure_function(feed):
    assert _scan(feed, {"file": "", "pos": 0, "gtid": 0}) == (
        [],
        {"file": "", "pos": 0, "gtid": 0},
    )
    _write(feed, "binlog.000001.jsonl", ["a", "b"])
    rows, end = _scan(feed, {"file": "", "pos": 0, "gtid": 0})
    assert rows == [("binlog.000001.jsonl", 0, "a"), ("binlog.000001.jsonl", 1, "b")]
    assert end == {"file": "binlog.000001.jsonl", "pos": 2, "gtid": 2}
    # Resume mid-file: only the tail; gtid advances from the recorded point.
    rows, end = _scan(feed, {"file": "binlog.000001.jsonl", "pos": 1, "gtid": 1})
    assert rows == [("binlog.000001.jsonl", 1, "b")]
    assert end["gtid"] == 2
    # Pre-gtid checkpoint (old offset shape): the prefix count migrates it.
    rows, end = _scan(feed, {"file": "binlog.000001.jsonl", "pos": 1})
    assert rows == [("binlog.000001.jsonl", 1, "b")]
    assert end == {"file": "binlog.000001.jsonl", "pos": 2, "gtid": 2}


def test_gtid_failover_rename(feed):
    """A primary switch renames the binlogs: (file, pos) dangles, but the
    gtid names the same point in the txn sequence — resume must deliver
    exactly the unapplied tail under the NEW names, then get back on the
    (file, pos) fast path."""
    _write(feed, "binlog.000001.jsonl", ["t1", "t2", "t3"])
    _, ckpt = _scan(feed, {"file": "", "pos": 0, "gtid": 0})
    assert ckpt == {"file": "binlog.000001.jsonl", "pos": 3, "gtid": 3}
    # failover: same history re-served under a new basename + new txns
    os.rename(
        os.path.join(feed, "binlog.000001.jsonl"),
        os.path.join(feed, "mysql-bin.000001.jsonl"),
    )
    _append(feed, "mysql-bin.000001.jsonl", ["t4"])
    _write(feed, "mysql-bin.000002.jsonl", ["t5"])
    rows, end = _scan(feed, ckpt)
    assert [(r[0], r[2]) for r in rows] == [
        ("mysql-bin.000001.jsonl", "t4"),
        ("mysql-bin.000002.jsonl", "t5"),
    ]
    assert end == {"file": "mysql-bin.000002.jsonl", "pos": 1, "gtid": 5}
    # next batch: fast path under the new names, nothing replayed
    rows, end = _scan(feed, end)
    assert rows == [] and end["gtid"] == 5


def test_stream_exactly_once_across_rotation(spark, feed, tmp_path):
    register(spark)
    _write(feed, "binlog.000001.jsonl", ["r1", "r2"])
    got: list = []
    q = _stream_collect(spark, feed, str(tmp_path / "ckpt"), got)
    q.processAllAvailable()
    # Grow the current file, then rotate to a new one.
    _append(feed, "binlog.000001.jsonl", ["r3"])
    q.processAllAvailable()
    _write(feed, "binlog.000002.jsonl", ["r4"])
    q.processAllAvailable()
    q.stop()
    assert sorted((r.file, r.pos, r.value) for r in got) == [
        ("binlog.000001.jsonl", 0, "r1"),
        ("binlog.000001.jsonl", 1, "r2"),
        ("binlog.000001.jsonl", 2, "r3"),
        ("binlog.000002.jsonl", 0, "r4"),
    ]


def test_restart_resumes_from_checkpoint(spark, feed, tmp_path):
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    _write(feed, "binlog.000001.jsonl", ["r1"])
    got1: list = []
    q = _stream_collect(spark, feed, ckpt, got1)
    q.processAllAvailable()
    q.stop()
    assert [r.value for r in got1] == ["r1"]
    # New rows while the query is down; restart with the same checkpoint.
    _write(feed, "binlog.000002.jsonl", ["r2", "r3"])
    got2: list = []
    q = _stream_collect(spark, feed, ckpt, got2)
    q.processAllAvailable()
    q.stop()
    assert sorted(r.value for r in got2) == ["r2", "r3"]  # r1 NOT replayed


def test_starting_offset_handoff(spark, feed, tmp_path):
    """The reference's snapshot recipe: record the position under the lock,
    stream only what came after (metadata.txt, S:175-183)."""
    register(spark)
    _write(feed, "binlog.000001.jsonl", ["pre1", "pre2"])
    snap = current_offset(feed)  # SHOW MASTER STATUS analog
    assert snap == {"file": "binlog.000001.jsonl", "pos": 2, "gtid": 2}
    _append(feed, "binlog.000001.jsonl", ["post1"])
    _write(feed, "binlog.000002.jsonl", ["post2"])
    got: list = []
    q = _stream_collect(
        spark, feed, str(tmp_path / "ckpt"), got, offset=json.dumps(snap)
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.value for r in got) == ["post1", "post2"]


def test_gtid_survives_empty_directory_window(feed):
    """The review-confirmed repro: a poll that races the failover window
    (old file gone, new history not yet re-served) must NOT collapse the
    offset to 'beginning' — when history reappears, already-applied
    events stay applied and the gtid never double-counts."""
    _write(feed, "binlog.000001.jsonl", ["t1", "t2", "t3"])
    _, ckpt = _scan(feed, {"file": "", "pos": 0, "gtid": 0})
    os.remove(os.path.join(feed, "binlog.000001.jsonl"))
    # poll during the empty window: nothing new, offset preserved verbatim
    rows, mid = _scan(feed, ckpt)
    assert rows == [] and mid == ckpt
    # renamed history reappears with one new event
    _write(feed, "mysql-bin.000001.jsonl", ["t1", "t2", "t3", "t4"])
    rows, end = _scan(feed, mid)
    assert [r[2] for r in rows] == ["t4"]  # t1..t3 NOT replayed
    assert end == {"file": "mysql-bin.000001.jsonl", "pos": 4, "gtid": 4}


def test_stream_resumes_after_failover_rename(spark, feed, tmp_path):
    """End-to-end: a checkpointed stream survives a binlog rename (primary
    failover) — the persisted GTID-bearing offset relocates the resume
    point; applied rows are not replayed, new rows are not lost."""
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    _write(feed, "binlog.000001.jsonl", ["r1", "r2"])
    got1: list = []
    q = _stream_collect(spark, feed, ckpt, got1)
    q.processAllAvailable()
    q.stop()
    assert sorted(r.value for r in got1) == ["r1", "r2"]
    # failover while the query is down: history under a new basename
    os.rename(
        os.path.join(feed, "binlog.000001.jsonl"),
        os.path.join(feed, "mysql-bin.000001.jsonl"),
    )
    _append(feed, "mysql-bin.000001.jsonl", ["r3"])
    _write(feed, "mysql-bin.000002.jsonl", ["r4"])
    got2: list = []
    q = _stream_collect(spark, feed, ckpt, got2)
    q.processAllAvailable()
    q.stop()
    assert sorted(r.value for r in got2) == ["r3", "r4"]  # exactly the tail


def test_snapshot_manifest_records_gtid_offset(spark, feed, tmp_path):
    """snapshot_sync's manifest carries the full (file, pos, gtid) resume
    triple — the reference's metadata.txt content (S:175-181)."""
    from mysql_to_clickhouse_sync_spark.sync import snapshot_sync

    _write(feed, "binlog.000001.jsonl", ["t1", "t2"])
    manifest = snapshot_sync(
        spark,
        "/root/testdata/sf0.001",
        str(tmp_path / "out"),
        include="region",
        binlog_dir=feed,
    )
    assert manifest["binlog_offset"] == {
        "file": "binlog.000001.jsonl",
        "pos": 2,
        "gtid": 2,
    }


def test_scan_exactly_once_under_churn(tmp_path):
    """Property: under ANY sequence of appends, rotations, failover
    renames and polls, the concatenation of _scan deliveries equals the
    full event sequence exactly once, in order — no replay, no gap, at
    any poll cadence. Exercises the fast path, the gtid failover path,
    and the empty-window race together."""
    import shutil

    from hypothesis import given, settings
    from hypothesis import strategies as st

    op = st.one_of(
        st.just(("append",)),
        st.just(("rotate",)),
        st.just(("rename",)),
        st.just(("poll",)),
    )

    @given(st.lists(op, min_size=1, max_size=30))
    @settings(max_examples=60, deadline=None)
    def run(ops):
        d = tmp_path / "churn"
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir()
        feed = str(d)
        prefix, file_no, seq = "a", 0, 0
        expected: list[str] = []
        delivered: list[str] = []
        offset = {"file": "", "pos": 0, "gtid": 0}
        current = None  # newest file name

        for o in ops:
            if o[0] == "append":
                if current is None:
                    file_no += 1
                    current = f"{prefix}-{file_no:06d}.jsonl"
                _append(feed, current, [f"e{seq}"])
                expected.append(f"e{seq}")
                seq += 1
            elif o[0] == "rotate":
                if current is not None:
                    file_no += 1
                    current = f"{prefix}-{file_no:06d}.jsonl"
                    _write(feed, current, [])
            elif o[0] == "rename":
                # failover: all history re-served under a LATER prefix
                # (same relative order — the rotation contract)
                new_prefix = chr(ord(prefix) + 1)
                for f in sorted(os.listdir(feed)):
                    os.rename(
                        os.path.join(feed, f),
                        os.path.join(feed, new_prefix + f[1:]),
                    )
                if current is not None:
                    current = new_prefix + current[1:]
                prefix = new_prefix
            else:  # poll
                rows, offset = _scan(feed, offset)
                delivered.extend(r[2] for r in rows)
        rows, offset = _scan(feed, offset)
        delivered.extend(r[2] for r in rows)
        assert delivered == expected
        # and a further poll with no changes delivers nothing
        rows, _ = _scan(feed, offset)
        assert rows == []

    run()


def test_batch_reader_partition_per_file(spark, feed):
    register(spark)
    _write(feed, "binlog.000001.jsonl", ["a", "b"])
    _write(feed, "binlog.000002.jsonl", ["c"])
    df = spark.read.format(FORMAT_NAME).option("path", feed).load()
    assert df.rdd.getNumPartitions() == 2  # one per rotated file
    assert sorted((r.file, r.pos, r.value) for r in df.collect()) == [
        ("binlog.000001.jsonl", 0, "a"),
        ("binlog.000001.jsonl", 1, "b"),
        ("binlog.000002.jsonl", 0, "c"),
    ]
