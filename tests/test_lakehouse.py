"""LakeTable lakehouse-sink tests: time travel, snapshot isolation,
retention, exactly-once batch commits across crash windows (the
test_matview.py crash-injection style), and manifest-preserving
compaction."""

from __future__ import annotations

import datetime
import os

from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable

LOG_SCHEMA = "k bigint, seq bigint, ts timestamp, v double, op string"


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def _log(spark, rows):
    return spark.createDataFrame(
        [(k, seq, _ts(seq), v, op) for k, seq, v, op in rows], LOG_SCHEMA
    )


def _state(table, version=None):
    return {r.k: r.v for r in table.read(version).collect()}


def _table(spark, tmp_path, **kw):
    return LakeTable(
        spark,
        str(tmp_path / "state"),
        keys=["k"],
        version_cols=["ts", "seq"],
        **kw,
    )


def test_time_travel_reads_every_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert"), (2, 2, 2.0, "upsert")]))
    t.merge(_log(spark, [(1, 3, 9.0, "upsert"), (3, 4, 3.0, "upsert")]))
    t.merge(_log(spark, [(2, 5, 0.0, "delete")]))
    assert t.versions() == [0, 1, 2]
    assert _state(t, 0) == {1: 1.0, 2: 2.0}
    assert _state(t, 1) == {1: 9.0, 2: 2.0, 3: 3.0}
    assert _state(t, 2) == {1: 9.0, 3: 3.0}
    assert _state(t) == _state(t, 2)  # default read = current
    hist = t.history()
    assert [m["version"] for m in hist] == [0, 1, 2]
    assert [m["parent"] for m in hist] == [None, 0, 1]
    assert all(m["operation"] == "merge" for m in hist)
    # manifest row stats include the tombstone (footer-derived, no scan):
    # keys 1 and 3 live + key 2's delete tombstone = 3 stored rows
    assert hist[2]["rows"] == 3


def test_snapshot_isolation_pins_readers(spark, tmp_path):
    """A DataFrame handed out before a later merge keeps reading ITS
    generation — commits never mutate a published directory."""
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert")]))
    pinned = t.read()  # resolves the pointer now, binds gen-000000
    t.merge(_log(spark, [(1, 2, 99.0, "upsert")]))
    assert {r.k: r.v for r in pinned.collect()} == {1: 1.0}
    assert _state(t) == {1: 99.0}


def test_retention_prunes_beyond_window(spark, tmp_path):
    import pytest

    t = _table(spark, tmp_path, retention=1)
    for seq in range(4):
        t.merge(_log(spark, [(1, seq + 1, float(seq), "upsert")]))
    assert t.current_version() == 3
    assert t.versions() == [2, 3]  # current + 1 superseded
    on_disk = sorted(
        d for d in os.listdir(t.path) if d.startswith("gen-")
    )
    assert on_disk == ["gen-000002", "gen-000003"]
    with pytest.raises(ValueError, match="not retained"):
        t.read(version=0)


def test_redelivered_batch_is_skipped(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert")]), batch_id=0)
    t.merge(_log(spark, [(2, 2, 2.0, "upsert")]), batch_id=1)
    once = _state(t)
    # retry storm: both batches re-delivered, out of order
    t.merge(_log(spark, [(2, 2, 2.0, "upsert")]), batch_id=1)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert")]), batch_id=0)
    assert _state(t) == once
    assert t.current_version() == 1  # skips committed nothing
    assert t.last_batch() == 1


def test_crash_before_pointer_flip_is_exactly_once(spark, tmp_path):
    """Crash BETWEEN writing the new generation (data + manifest) and the
    pointer flip: the un-flipped generation must be invisible (state,
    versions, and watermark all unchanged), and redelivery through a
    fresh LakeTable (fresh driver) must merge the batch exactly once."""
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert")]), batch_id=0)

    real_replace = os.replace

    def boom(src, dst):
        raise RuntimeError("simulated crash before commit")

    os.replace = boom
    try:
        try:
            t.merge(_log(spark, [(2, 2, 2.0, "upsert")]), batch_id=1)
            assert False, "crash injection did not fire"
        except RuntimeError:
            pass
    finally:
        os.replace = real_replace

    # uncommitted: every read surface still shows only batch 0
    assert t.current_version() == 0
    assert t.versions() == [0]
    assert t.last_batch() == 0
    assert _state(t) == {1: 1.0}

    # redelivery on a fresh instance applies the batch exactly once
    t2 = _table(spark, tmp_path)
    t2.merge(_log(spark, [(2, 2, 2.0, "upsert")]), batch_id=1)
    assert _state(t2) == {1: 1.0, 2: 2.0}
    assert t2.current_version() == 1
    t2.merge(_log(spark, [(2, 2, 2.0, "upsert")]), batch_id=1)  # retry no-op
    assert t2.current_version() == 1


def test_tombstone_survives_time_travel_window(spark, tmp_path):
    """An out-of-order OLDER upsert in a later commit must not revive a
    deleted key — and the pre-delete version must still show it."""
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 5, 5.0, "upsert")]))
    t.merge(_log(spark, [(1, 8, 0.0, "delete")]))
    t.merge(_log(spark, [(1, 3, 3.0, "upsert")]))  # older than the delete
    assert _state(t, 0) == {1: 5.0}
    assert _state(t, 1) == {}
    assert _state(t, 2) == {}  # tombstone won: key stays dead


def test_compact_preserves_state_lineage_and_watermark(spark, tmp_path):
    t = _table(spark, tmp_path)
    many = _log(
        spark, [(k, k + 1, float(k), "upsert") for k in range(20)]
    ).repartition(8)
    # AQE would coalesce this tiny merge to one file — hold it off so the
    # generation actually lands small-file-fragmented
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t.merge(many, batch_id=7)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    gen0 = os.path.join(t.path, "gen-000000")
    n_before = len(
        [f for f in os.listdir(gen0) if f.endswith(".parquet")]
    )
    assert n_before > 1
    before = _state(t)
    v = t.compact()  # tiny table -> one target file
    assert v == 1
    assert _state(t) == before
    m = t.manifest(1)
    assert m["operation"] == "compact"
    assert m["compacted_from"] == 0
    assert m["last_batch"] == 7  # exactly-once watermark carried forward
    assert m["n_files"] == 1
    # a re-delivered batch 7 is still skipped after compaction
    t.merge(_log(spark, [(99, 1, 1.0, "upsert")]), batch_id=7)
    assert t.current_version() == 1
    # the pre-compaction version remains time-travel readable
    assert _state(t, 0) == before
    # compacting an already-compact table is a no-op commit-wise
    assert t.compact() == 1


def _btable(spark, tmp_path, **kw):
    return LakeTable(
        spark,
        str(tmp_path / "bstate"),
        keys=["k"],
        version_cols=["ts", "seq"],
        n_buckets=4,
        **kw,
    )


def test_bucketed_merge_matches_unbucketed(spark, tmp_path):
    """Bucketing is storage layout, never semantics: the same commit
    sequence must produce identical states at every version."""
    t = _table(spark, tmp_path)
    b = _btable(spark, tmp_path)
    batches = [
        [(1, 1, 1.0, "upsert"), (2, 2, 2.0, "upsert"), (7, 3, 7.0, "upsert")],
        [(1, 4, 9.0, "upsert"), (2, 5, 0.0, "delete")],
        [(9, 6, 3.0, "upsert"), (7, 7, 0.0, "delete")],
    ]
    for i, rows in enumerate(batches):
        t.merge(_log(spark, rows), batch_id=i)
        b.merge(_log(spark, rows), batch_id=i)
    for v in (0, 1, 2):
        assert _state(b, v) == _state(t, v), f"version {v} diverged"
    assert b.last_batch() == 2


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The pruned-rewrite contract: a changelog touching one key must
    rewrite only that key's hash bucket; every other bucket stays OWNED
    by the generation that last wrote it, and read() unions through the
    manifest references."""
    b = _btable(spark, tmp_path)
    seed = [(k, k + 1, float(k), "upsert") for k in range(12)]
    b.merge(_log(spark, seed), batch_id=0)
    m0 = b.manifest(0)
    owners0 = m0["buckets"]
    assert set(owners0.values()) == {"gen-000000"}
    n_buckets0 = len(owners0)
    assert n_buckets0 > 1  # 12 keys spread over >1 of 4 buckets

    # single-key update -> exactly one bucket rewritten
    b.merge(_log(spark, [(5, 45, 55.0, "upsert")]), batch_id=1)
    m1 = b.manifest(1)
    owners1 = m1["buckets"]
    moved = {k for k in owners1 if owners1[k] != owners0.get(k)}
    assert len(moved) == 1  # only key 5's bucket changed owner
    assert owners1[next(iter(moved))] == "gen-000001"
    # on disk, gen-000001 holds exactly that one bucket directory
    gen1 = str(tmp_path / "bstate" / "gen-000001")
    assert sorted(
        d for d in os.listdir(gen1) if d.startswith("bucket=")
    ) == [f"bucket={next(iter(moved))}"]
    # semantics intact across the reference union
    expect = {k: float(k) for k in range(12)}
    expect[5] = 55.0
    assert _state(b) == expect
    # time travel reads the pre-update bucket through the old owner
    assert _state(b, 0) == {k: float(k) for k in range(12)}


def test_bucketed_referenced_generation_survives_retention(spark, tmp_path):
    """A generation older than the retention window must survive while a
    retained manifest still references one of its buckets (Iceberg
    expire-snapshots rule)."""
    b = _btable(spark, tmp_path, retention=1)
    b.merge(_log(spark, [(k, k + 1, float(k), "upsert") for k in range(12)]))
    # three single-key updates to the SAME key: gen-0 keeps owning the
    # other buckets the whole time
    for i in range(3):
        b.merge(_log(spark, [(5, 50 + i, 50.0 + i, "upsert")]))
    assert b.current_version() == 3
    on_disk = sorted(d for d in os.listdir(b.path) if d.startswith("gen-"))
    # gen-0 referenced (untouched buckets) though v0 is beyond retention;
    # gen-1 unreferenced and out of window -> pruned
    assert "gen-000000" in on_disk
    assert "gen-000001" not in on_disk
    expect = {k: float(k) for k in range(12)}
    expect[5] = 52.0
    assert _state(b) == expect


def test_bucketed_compact_rewrites_only_fragmented_buckets(spark, tmp_path):
    b = _btable(spark, tmp_path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        b.merge(
            _log(
                spark, [(k, k + 1, float(k), "upsert") for k in range(24)]
            ).repartition(6),
            batch_id=3,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    before = _state(b)
    m0 = b.manifest(0)
    frag_buckets = [
        x
        for x in m0["buckets"]
        if len(
            [
                f
                for f in os.listdir(
                    os.path.join(b.path, "gen-000000", f"bucket={x}")
                )
                if f.endswith(".parquet")
            ]
        )
        > 1
    ]
    assert frag_buckets  # the repartition(6) write fragmented something
    v = b.compact()
    assert v == 1
    m1 = b.manifest(1)
    assert m1["operation"] == "compact"
    assert m1["last_batch"] == 3
    for x, owner in m1["buckets"].items():
        assert owner == ("gen-000001" if x in frag_buckets else "gen-000000")
    assert _state(b) == before
    # idempotent: nothing fragmented remains
    assert b.compact() == 1


def test_change_data_feed_classifies_all_transitions(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert"), (2, 2, 2.0, "upsert")]))
    t.merge(
        _log(
            spark,
            [
                (1, 3, 9.0, "upsert"),  # update key 1
                (2, 4, 0.0, "delete"),  # delete key 2
                (3, 5, 3.0, "upsert"),  # insert key 3
            ],
        )
    )
    # bootstrap commit: all-insert
    c0 = {(r._change_type, r.k, r.v) for r in t.changes(0).collect()}
    assert c0 == {("insert", 1, 1.0), ("insert", 2, 2.0)}
    c1 = {(r._change_type, r.k, r.v) for r in t.changes(1).collect()}
    assert c1 == {
        ("update_preimage", 1, 1.0),
        ("update_postimage", 1, 9.0),
        ("delete", 2, 2.0),
        ("insert", 3, 3.0),
    }
    assert {r._commit_version for r in t.changes(1).collect()} == {1}
    # an untouched-key commit yields an empty feed
    t.merge(_log(spark, [(1, 3, 9.0, "upsert")]))  # same winner re-sent
    assert t.changes(2).count() == 0


def test_lake_sink_stream_restart_resumes_exactly_once(spark, tmp_path):
    """A Structured Streaming query writing through LakeTable.writer()
    is stopped and RESTARTED on the same checkpoint: batch numbering
    continues, the manifest watermark keeps redelivered batches out,
    and the final table equals the one-shot batch merge."""
    import os

    from pyspark.sql import functions as F

    from mysql_to_clickhouse_sync_spark.catalog import load_table
    from tests.conftest import SF_DIR

    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("op", F.lit("upsert"))
    )
    slices = [
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
    ]
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    table = LakeTable(
        spark,
        str(tmp_path / "state"),
        keys=["user_id"],
        version_cols=["ts", "event_id"],
    )

    def start():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(table.writer())
            .option("checkpointLocation", ckpt)
            .start()
        )

    slices[0].coalesce(1).write.mode("append").parquet(in_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    assert table.last_batch() == 0

    # restart on the same checkpoint with new input waiting
    slices[1].coalesce(1).write.mode("append").parquet(in_dir)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert table.last_batch() == 1
    assert table.current_version() == 1

    # converged state equals the one-shot batch merge of everything
    expect = {
        (r.user_id, r.event_id)
        for r in events.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    got = {(r.user_id, r.event_id) for r in table.read().collect()}
    assert got == expect


def test_range_cdf_collapses_intermediate_flipflops(spark, tmp_path):
    """changes(v, since=older) must be the NET diff: a key updated twice
    shows one pre/post pair, a key inserted-then-deleted shows nothing,
    and per-commit feeds still work unchanged."""
    import pytest

    t = _table(spark, tmp_path)
    t.merge(_log(spark, [(1, 1, 1.0, "upsert"), (2, 2, 2.0, "upsert")]))
    t.merge(_log(spark, [(1, 3, 5.0, "upsert"), (3, 4, 3.0, "upsert")]))
    t.merge(_log(spark, [(1, 5, 9.0, "upsert"), (3, 6, 0.0, "delete")]))
    net = {
        (r._change_type, r.k, r.v)
        for r in t.changes(2, since=0).collect()
    }
    # key 1: net update 1.0 -> 9.0 (the 5.0 hop cancels); key 3:
    # inserted then deleted -> absent; key 2 untouched -> absent
    assert net == {
        ("update_preimage", 1, 1.0),
        ("update_postimage", 1, 9.0),
    }
    assert {r._commit_version for r in t.changes(2, since=0).collect()} == {2}
    with pytest.raises(ValueError, match="precede"):
        t.changes(1, since=1)
    with pytest.raises(ValueError, match="not a retained"):
        t.changes(2, since=99)


def test_clustered_compaction_sorts_by_key_and_commits(spark, tmp_path):
    t = _table(spark, tmp_path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t.merge(
            _log(
                spark,
                [(k, k + 1, float(k), "upsert") for k in range(40)],
            ).repartition(8),
            batch_id=0,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    before = _state(t)
    v = t.compact(cluster_by=["k"])
    assert v == 1
    assert t.manifest(1)["clustered_by"] == ["k"]
    assert t.manifest(1)["last_batch"] == 0
    assert _state(t) == before
    # within every data file, keys are sorted (row-group pruning works)
    import os

    import pyarrow.parquet as pq

    gen = os.path.join(t.path, "gen-000001")
    for f in os.listdir(gen):
        if f.endswith(".parquet"):
            ks = pq.read_table(os.path.join(gen, f), columns=["k"])[
                "k"
            ].to_pylist()
            assert ks == sorted(ks)
    # bucketed tables refuse clustering
    import pytest

    b = _btable(spark, tmp_path)
    b.merge(_log(spark, [(1, 1, 1.0, "upsert")]))
    with pytest.raises(ValueError, match="unbucketed"):
        b.compact(cluster_by=["k"])
