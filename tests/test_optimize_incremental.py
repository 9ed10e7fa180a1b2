"""Incremental, scoped OPTIMIZE (round 10): per-bucket commits on the
bucketed layout, zcube file-refs chunks on the unbucketed one. The pins:

  * each scope is its OWN optimistic commit — a crash between scopes
    loses nothing, a fresh LakeTable handle resumes from the manifest
    markers and never redoes committed work;
  * reads (plain, pruned, bloom-pruned, time-traveled, dv-layered) are
    row-identical across every intermediate refs snapshot;
  * a later merge stales exactly the markers of the buckets/files it
    rewrote, so the next optimize revisits only what drifted;
  * retention reference-counts refs owners: a generation whose files a
    retained manifest still references is never swept.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable

SCHEMA = "k bigint, seq bigint, a bigint, b bigint, op string"


def _seed_rows(n: int = 160) -> list[tuple]:
    # a/b are the z-order dims; arrival bands (k % 8) span BOTH fully,
    # the worst layout for a 2-d box predicate
    return [
        (k, 1, k * 7 % 997, (k * k + 3) % 991, "upsert") for k in range(n)
    ]


def _banded(spark, rows):
    return (
        spark.createDataFrame(rows, SCHEMA)
        .withColumn("band", F.expr("k % 8"))
    )


@pytest.fixture
def banded_table(spark, tmp_path):
    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        version_cols=["seq"],
        retention=2,
        partition_files_by="band",
    )
    t.merge(_banded(spark, _seed_rows()), batch_id=0)
    return t


def test_unbucketed_chunks_commit_and_resume(spark, tmp_path, banded_table):
    t = banded_table
    rows0 = t.read().count()
    n_files = len(t.data_files())
    assert n_files == 8
    _, tot_b, read_b = t.read_pruned_all([("a", 200, 400), ("b", 200, 400)])
    assert (tot_b, read_b) == (8, 8)  # full-width bands: nothing prunes

    recs = t.optimize_incremental(["a", "b"], chunk_files=3, max_scopes=2)
    assert [r["files_in"] for r in recs] == [3, 3]
    m = t.manifest(t.current_version())
    assert m["operation"] == "optimize-chunk"
    assert len(m["zcubes"]) == 2
    # mid-flight snapshot is row-identical and still fully readable
    assert t.read().count() == rows0

    # CRASH/RESUME: a fresh handle (no in-memory state) picks up from
    # the manifest and completes without redoing committed cubes
    t2 = LakeTable(
        spark, t.path, keys=["k"], version_cols=["seq"], retention=2
    )
    recs2 = t2.optimize_incremental(["a", "b"], chunk_files=3)
    assert [r["files_in"] for r in recs2] == [2]
    assert sum(r["files_in"] for r in recs + recs2) == n_files
    assert t2.read().count() == rows0
    # a further run is a no-op (all files cubed)
    assert t2.optimize_incremental(["a", "b"], chunk_files=3) == []

    # the clustered layout prunes the 2-d box strictly better
    _, tot_a, read_a = t2.read_pruned_all(
        [("a", 200, 400), ("b", 200, 400)]
    )
    assert read_a < read_b
    # every retained version (plain seed + refs snapshots) reads whole
    for v in t2.versions():
        assert t2.read(v).count() == rows0


def test_refs_snapshot_dv_delete_and_fold(spark, tmp_path, banded_table):
    t = banded_table
    rows0 = t.read().count()
    t.optimize_incremental(["a", "b"], chunk_files=3, max_scopes=1)
    assert t.manifest(t.current_version()).get("file_refs") is not None

    dels = spark.createDataFrame(
        [(k, 2, 0, 0, "delete") for k in range(0, 160, 16)], SCHEMA
    ).withColumn("band", F.expr("k % 8"))
    t.delete(dels, batch_id=1)
    m = t.manifest(t.current_version())
    assert m["operation"] == "delete-vector"
    assert m.get("file_refs") is not None  # layout carried forward
    assert t.read().count() == rows0 - 10
    st = t.dv_stats()
    assert st["dv_rows"] == 10 and st["base_rows"] == rows0

    # maintenance folds the vectors through merge(), clearing the refs
    acct = t.maintenance()
    assert acct["folded"]
    m2 = t.manifest(t.current_version())
    assert m2.get("dv") in (None, []) and m2.get("file_refs") is None
    assert t.read().count() == rows0 - 10


def test_refs_owner_generations_survive_retention(spark, tmp_path):
    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        version_cols=["seq"],
        retention=1,
        partition_files_by="band",
    )
    t.merge(_banded(spark, _seed_rows()), batch_id=0)
    rows0 = t.read().count()
    # three chunk commits; retention=1 keeps window {2, 3}, and v2's refs
    # still point INTO gen-000000 — it must survive the retention sweep
    # (reference-counted pruning, like bucket owners)
    t.optimize_incremental(["a", "b"], chunk_files=3)
    assert {2, 3} <= set(t.versions())
    assert all(
        o != "gen-000000"
        for o, _r in t.manifest(3).get("file_refs") or []
    )  # all 8 files cubed by v3: gen0 no longer referenced by it
    # v2 (retained) still references gen0's last kept files
    ref_owners = {o for o, _r in t.manifest(2)["file_refs"]}
    assert "gen-000000" in ref_owners
    assert os.path.isdir(os.path.join(t.path, "gen-000000"))
    assert t.read(2).count() == rows0
    assert t.read(3).count() == rows0
    # one more commit ages v2 out; gen0 is unreferenced and swept
    t.merge(
        spark.createDataFrame([(0, 9, 1, 1, "upsert")], SCHEMA).withColumn(
            "band", F.expr("k % 8")
        ),
        batch_id=1,
    )
    assert not os.path.isdir(os.path.join(t.path, "gen-000000"))
    assert t.read().count() == rows0


def test_bucketed_per_bucket_resume_and_marker_staleness(spark, tmp_path):
    t = LakeTable(
        spark,
        str(tmp_path / "b"),
        keys=["k"],
        version_cols=["seq"],
        retention=2,
        n_buckets=4,
    )
    t.merge(spark.createDataFrame(_seed_rows(), SCHEMA), batch_id=0)
    rows0 = t.read().count()
    v0 = t.current_version()

    # partial: exactly 2 per-bucket commits, 2 markers current
    v1 = t.optimize(["a", "b"], max_scopes=2)
    assert v1 - v0 == 2
    m = t.manifest(v1)
    cur = {
        b
        for b, mk in m["bucket_zorder"].items()
        if mk[0] == m["buckets"][b]
    }
    assert len(cur) == 2
    assert t.read().count() == rows0

    # resume from a FRESH handle; all markers current; idempotent after
    t2 = LakeTable(
        spark,
        t.path,
        keys=["k"],
        version_cols=["seq"],
        retention=2,
        n_buckets=4,
    )
    v2 = t2.optimize(["a", "b"])
    m = t2.manifest(v2)
    assert all(
        m["bucket_zorder"].get(b, [None])[0] == o
        for b, o in m["buckets"].items()
    )
    assert t2.optimize(["a", "b"]) == v2  # no pending: version unchanged
    assert t2.read().count() == rows0

    # a merge stales exactly the buckets it rewrote
    upd = spark.createDataFrame([(3, 5, 9, 9, "upsert")], SCHEMA)
    t2.merge(upd, batch_id=1)
    m = t2.manifest(t2.current_version())
    stale = {
        b
        for b, o in m["buckets"].items()
        if (m.get("bucket_zorder") or {}).get(b, [None])[0] != o
    }
    assert len(stale) == 1  # one key -> one bucket rewritten
    # re-optimize revisits ONLY the stale bucket (one commit)
    v3 = t2.optimize(["a", "b"])
    assert v3 == t2.manifest(v3)["version"]
    assert v3 - m["version"] == 1
    m = t2.manifest(v3)
    assert all(
        m["bucket_zorder"].get(b, [None])[0] == o
        for b, o in m["buckets"].items()
    )
    got = {(r["k"], r["seq"], r["a"], r["b"]) for r in t2.read().collect()}
    assert (3, 5, 9, 9) in got and len(got) == rows0


def test_zorder_cols_change_recubes(spark, tmp_path, banded_table):
    t = banded_table
    rows0 = t.read().count()
    t.optimize_incremental(["a", "b"], chunk_files=8)
    assert t.optimize_incremental(["a", "b"], chunk_files=8) == []
    # asking for a different clustering re-takes every file
    recs = t.optimize_incremental(["b", "a"], chunk_files=8)
    assert sum(r["files_in"] for r in recs) >= 1
    m = t.manifest(t.current_version())
    assert all(
        c["zordered_by"] == ["b", "a"]
        for c in m["zcubes"].values()
        if c["files"]
    ) or any(
        c["zordered_by"] == ["b", "a"] for c in m["zcubes"].values()
    )
    assert t.read().count() == rows0
