"""Deletion-vector auto-fold policy pins: a delete-heavy, merge-quiet
workload must keep read-side apply cost BOUNDED when dv_fold_ratio is
armed (the round-8 verdict's 'first real wall' — without a trigger,
vectors accumulate O(total deleted keys) forever)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable

SCHEMA = "k bigint, seq bigint, v double, op string"


def _seed(spark, n=200):
    return spark.createDataFrame(
        [(k, 0, float(k), "upsert") for k in range(n)], SCHEMA
    )


def _wave(spark, w, per_wave=10):
    ks = range(w * per_wave, (w + 1) * per_wave)
    return spark.createDataFrame(
        [(k, w + 1, 0.0, "delete") for k in ks], SCHEMA
    )


@pytest.mark.slow
def test_armed_ratio_bounds_outstanding_vectors(spark, tmp_path):
    t = LakeTable(
        spark,
        str(tmp_path / "armed"),
        keys=["k"],
        version_cols=["seq"],
        dv_fold_ratio=0.25,
    )
    t.merge(_seed(spark), batch_id=0)
    folds = 0
    max_outstanding = 0
    for w in range(20):  # 20 waves x 5% of base each, zero merges
        t.delete(_wave(spark, w), batch_id=w + 1)
        m = t.manifest(t.current_version())
        n_dv = len(m.get("dv") or [])
        max_outstanding = max(max_outstanding, n_dv)
        if m["operation"] == "merge":
            folds += 1
    # read amplification is bounded by the LAW: outstanding dv rows
    # stay < ratio x base + one wave, so <= ceil(0.25/0.05) vectors
    assert max_outstanding <= 5, max_outstanding
    assert folds >= 3, folds  # the trigger actually fired, repeatedly
    # correctness unchanged: everything deleted
    assert t.read().count() == 0
    # tombstones persisted through the folds
    assert t.raw().count() == 200


def test_unarmed_table_accumulates_vectors(spark, tmp_path):
    """The contrast run: without the policy the dv list grows linearly
    — exactly the unbounded read-amp the trigger exists to stop."""
    t = LakeTable(
        spark, str(tmp_path / "unarmed"), keys=["k"], version_cols=["seq"]
    )
    t.merge(_seed(spark), batch_id=0)
    for w in range(8):
        t.delete(_wave(spark, w), batch_id=w + 1)
    assert len(t.manifest(t.current_version())["dv"]) == 8
    # manual sweep folds them all regardless of ratio
    acct = t.maintenance()
    assert acct["folded"] and acct["dv_rows"] == 80
    assert not t.manifest(t.current_version()).get("dv")
    assert t.read().count() == 120


def test_maintenance_below_ratio_is_a_no_op(spark, tmp_path):
    t = LakeTable(
        spark, str(tmp_path / "noop"), keys=["k"], version_cols=["seq"]
    )
    t.merge(_seed(spark), batch_id=0)
    t.delete(_wave(spark, 0), batch_id=1)  # 5% < 25%
    v_before = t.current_version()
    acct = t.maintenance(0.25)
    assert not acct["folded"]
    assert acct["dv_rows"] == 10 and acct["base_rows"] == 200
    assert t.current_version() == v_before
    # and with nothing outstanding, even the unconditional sweep no-ops
    t2 = LakeTable(
        spark, str(tmp_path / "clean"), keys=["k"], version_cols=["seq"]
    )
    t2.merge(_seed(spark), batch_id=0)
    acct2 = t2.maintenance()
    assert not acct2["folded"] and acct2["dv_rows"] == 0


def test_writer_routes_sparse_deletes_through_dv(spark, tmp_path):
    """writer(dv_deletes=True): an all-delete micro-batch commits as a
    deletion vector with commit_bytes O(deleted keys) — a small fraction
    of the table's data bytes — while mixed batches keep the merge
    path; the empty batch short-circuits entirely."""
    import os

    t = LakeTable(
        spark, str(tmp_path / "t"), keys=["k"], version_cols=["seq"]
    )
    apply = t.writer(dv_deletes=True)
    apply(_seed(spark, 2000), 0)
    v_seed = t.current_version()
    data_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d in t.data_paths(v_seed)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    # all-delete batch -> dv path
    apply(_wave(spark, 0), 1)
    m = t.manifest(t.current_version())
    assert m["operation"] == "delete-vector"
    assert m["commit_bytes"] < max(4096, data_bytes // 10), (
        m["commit_bytes"],
        data_bytes,
    )
    # empty batch -> guard, no commit
    v = t.current_version()
    apply(spark.createDataFrame([], SCHEMA), 2)
    assert t.current_version() == v
    # mixed batch -> merge path, folds the vector
    mixed = _wave(spark, 1).union(
        spark.createDataFrame([(5000, 99, 1.0, "upsert")], SCHEMA)
    )
    apply(mixed, 3)
    m = t.manifest(t.current_version())
    assert m["operation"] == "merge"
    assert not m.get("dv")
    assert t.read().count() == 2000 - 20 + 1
