"""Bucket-granular logical conflict detection (round 10): a bucketed
merge racing a competitor commit REBASES onto the new head instead of
redoing its write when — and only when — that is provably safe. The
closure rules pinned here deterministically (the N-writer soak
exercises them under real contention):

  * disjoint intervening MERGE  -> rebase (head owners + mine)
  * overlapping intervening MERGE (incl. a maintenance dv-FOLD, which
    applies deletions this writer never saw) -> refuse
  * intervening OPTIMIZE/COMPACT -> rebase even on overlap (they are
    row-identical no-ops; the merge's snapshot was row-identical)
  * intervening dv commit -> rebase, carrying the unseen vectors
  * head already covering this batch id -> refuse
  * racing bootstraps (parent None) -> refuse
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable

SCHEMA = "k bigint, seq bigint, v double, op string"
NB = 8


def _bucket_of(spark, k: int) -> int:
    return (
        spark.range(1)
        .select(F.pmod(F.hash(F.lit(k).cast("bigint")), F.lit(NB)))
        .first()[0]
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table(spark, path):
    return LakeTable(
        spark, path, keys=["k"], version_cols=["seq"], n_buckets=NB
    )


def _proto_meta(t: LakeTable, mine: dict, schema_version=0, batch_id=None):
    """A working meta as merge()'s write closure leaves it: this
    writer's buckets name a stage dir, the rest the parent's owners."""
    m = t.manifest(t.current_version())
    buckets = dict(m["buckets"])
    buckets.update(mine)
    return {
        "operation": "merge",
        "schema_version": schema_version,
        "buckets": buckets,
        "last_batch": batch_id,
    }


def test_disjoint_merge_rebases_overlap_refuses(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.merge(_mk(spark, [(k, 1, 1.0, "upsert") for k in range(32)]), 0)
    v0 = t.current_version()
    # competitor rewrites the bucket of key 0
    t.merge(_mk(spark, [(0, 2, 2.0, "upsert")]), 1)
    v1 = t.current_version()
    b_used = _bucket_of(spark, 0)
    b_other = next(b for b in range(NB) if b != b_used)

    # disjoint: my touched bucket differs -> rebase succeeds
    rb = t._bucket_merge_rebase(
        my_touched={b_other}, batch_id=2, folded_dv=[], schema_version=0
    )
    meta = _proto_meta(
        t, {str(b_other): "_stage-gen-000099-abc"}, batch_id=2
    )
    out = rb(meta, v0, v1)
    assert out is not None
    head = t.manifest(v1)
    # untouched buckets take the HEAD's owners, mine stays staged
    assert out["buckets"][str(b_used)] == head["buckets"][str(b_used)]
    assert out["buckets"][str(b_other)] == "_stage-gen-000099-abc"
    assert out["last_batch"] == 2

    # overlap: same touched bucket as the intervening merge -> refuse
    rb2 = t._bucket_merge_rebase(
        my_touched={b_used}, batch_id=2, folded_dv=[], schema_version=0
    )
    assert rb2(_proto_meta(t, {str(b_used): "_stage-x"}, batch_id=2), v0, v1) is None

    # stale batch id: head already covers it -> refuse
    rb3 = t._bucket_merge_rebase(
        my_touched={b_other}, batch_id=1, folded_dv=[], schema_version=0
    )
    assert rb3(meta, v0, v1) is None

    # racing bootstraps -> refuse
    assert rb(meta, None, v1) is None


def test_optimize_and_compact_never_conflict(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.merge(_mk(spark, [(k, 1, 1.0, "upsert") for k in range(32)]), 0)
    v0 = t.current_version()
    # intervening per-bucket optimize scopes (row-identical no-ops)
    v1 = t.optimize(["k", "seq"], max_scopes=2)
    assert v1 - v0 == 2
    scoped = {
        t.manifest(v)["optimize_scope"]["bucket"]
        for v in range(v0 + 1, v1 + 1)
    }
    rb = t._bucket_merge_rebase(
        my_touched=scoped, batch_id=1, folded_dv=[], schema_version=0
    )
    mine = {str(b): "_stage-y" for b in scoped}
    out = rb(_proto_meta(t, mine, batch_id=1), v0, v1)
    # rebase allowed even though the optimize rewrote MY buckets —
    # and my rewrite supersedes, staling those markers
    assert out is not None
    for b in scoped:
        assert out["buckets"][str(b)] == "_stage-y"
        assert str(b) not in (out.get("bucket_zorder") or {})


def test_intervening_dv_carries_unseen_vectors(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.merge(_mk(spark, [(k, 1, 1.0, "upsert") for k in range(32)]), 0)
    v0 = t.current_version()
    t.delete(_mk(spark, [(5, 2, 0.0, "delete")]), batch_id=1)
    v1 = t.current_version()
    dv_name = t.manifest(v1)["dv"][-1]
    b_other = next(
        b for b in range(NB) if b != _bucket_of(spark, 5)
    )
    rb = t._bucket_merge_rebase(
        my_touched={b_other}, batch_id=2, folded_dv=[], schema_version=0
    )
    out = rb(_proto_meta(t, {str(b_other): "_stage-z"}, batch_id=2), v0, v1)
    assert out is not None
    assert dv_name in out["dv"]  # the unseen vector survives the rebase
    # a vector MY snapshot already folded does not reappear
    rb2 = t._bucket_merge_rebase(
        my_touched={b_other},
        batch_id=2,
        folded_dv=[dv_name],
        schema_version=0,
    )
    out2 = rb2(
        _proto_meta(t, {str(b_other): "_stage-z"}, batch_id=2), v0, v1
    )
    assert out2 is not None and "dv" not in out2


def test_end_to_end_rebase_preserves_fold(spark, tmp_path):
    """Integration: a merge whose pre-publish window contains a
    disjoint competitor commit lands WITHOUT retry (the rebase path in
    _commit), and the final state equals the serial fold."""
    path = str(tmp_path / "t")
    t = _table(spark, path)
    t.merge(_mk(spark, [(k, 1, 1.0, "upsert") for k in range(32)]), 0)

    k_mine, k_other = 3, 0
    while _bucket_of(spark, k_mine) == _bucket_of(spark, k_other):
        k_mine += 1
    competitor = _table(spark, path)

    t.merge(_mk(spark, [(k_mine, 2, 2.0, "upsert")]), batch_id=None)
    v_before = t.current_version()

    # inject the competitor's commit inside t's commit loop, after t's
    # stage is written but before its pre-publish check — the window
    # the rebase exists for
    state = {"injected": False}
    orig_rm = LakeTable._resolved_manifest

    def hooked(self, *a, **kw):
        if self is t and not state["injected"]:
            state["injected"] = True
            competitor.merge(
                _mk(spark, [(k_other, 9, 9.0, "upsert")]), batch_id=None
            )
        return orig_rm(self, *a, **kw)

    LakeTable._resolved_manifest = hooked
    try:
        t.merge(_mk(spark, [(k_mine, 3, 3.0, "upsert")]), batch_id=None)
    finally:
        LakeTable._resolved_manifest = orig_rm
    assert state["injected"]
    # both commits landed: competitor's + mine (rebased, not retried)
    assert t.current_version() == v_before + 2
    got = {(r["k"], r["seq"], r["v"]) for r in t.read().collect()}
    assert (k_mine, 3, 3.0) in got
    assert (k_other, 9, 9.0) in got
