"""LakeTable.optimize(zorder_cols) pins: semantic no-op (same rows,
same schema), concrete 2-d pruning improvement over an arrival-order
layout, readers of the prior version survive, lineage/watermark carried,
dv vectors folded first."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_sync_spark.sinks.merge import LakeTable

SCHEMA = "k bigint, seq bigint, u bigint, v bigint, op string"
N = 4096


def _table(spark, path, **kw):
    return LakeTable(
        spark, path, keys=["k"], version_cols=["seq"], **kw
    )


def _seed(spark):
    # arrival order: k is the arrival sequence; (u, v) are independent
    # dimensions laid out so every arrival-order file spans both nearly
    # fully (u strides, v reverses) — the worst case for 2-d pruning
    rows = [
        (k, 0, (k * 37) % N, (N - 1) - ((k * 101) % N), "upsert")
        for k in range(N)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_optimize_zorder_improves_pruning_and_preserves_rows(
    spark, tmp_path
):
    t = _table(spark, str(tmp_path / "t"), retention=1)
    # land in 16 arrival-order files
    t.merge(
        _seed(spark).withColumn("band", (F.col("k") / (N // 16)).cast("int")),
        batch_id=7,
    )
    # give the files an arrival-clustered layout via compact(cluster_by)
    t.compact(cluster_by=["k"], target_file_bytes=4096)
    boxes = [("u", N // 8, N // 4), ("v", N // 8, N // 4)]
    before_rows = {
        (r["k"], r["seq"]) for r in t.read().collect()
    }
    _, total_b, read_b = t.read_pruned_all(boxes)
    v_before = t.current_version()
    old_reader = t.read(v_before)

    v_after = t.optimize(["u", "v"], target_file_bytes=2048)
    assert v_after == v_before + 1
    m = t.manifest(v_after)
    assert m["operation"] == "optimize"
    assert m["zordered_by"] == ["u", "v"]
    assert m["compacted_from"] == v_before
    assert m["last_batch"] == 7  # the exactly-once watermark survives

    # semantic no-op: identical rows and schema
    after_rows = {(r["k"], r["seq"]) for r in t.read().collect()}
    assert after_rows == before_rows
    # the prior version's reader still works (retention keeps parent)
    assert old_reader.count() == len(before_rows)

    # the point: multiplicative 2-d pruning the arrival layout can't do
    pruned, total_a, read_a = t.read_pruned_all(boxes)
    assert read_b >= total_b - 2, (read_b, total_b)  # before: ~no pruning
    assert read_a <= max(2, total_a // 3), (read_a, total_a)
    got = pruned.filter(
        F.col("u").between(N // 8, N // 4) & F.col("v").between(N // 8, N // 4)
    ).count()
    want = sum(
        1
        for k in range(N)
        if N // 8 <= (k * 37) % N <= N // 4
        and N // 8 <= (N - 1) - ((k * 101) % N) <= N // 4
    )
    assert got == want  # no false negatives through the re-cluster


def test_optimize_folds_outstanding_vectors_first(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.merge(_seed(spark), batch_id=0)
    dels = spark.createDataFrame(
        [(k, 1, 0, 0, "delete") for k in range(100)], SCHEMA
    )
    t.delete(dels, batch_id=1)
    assert t.manifest(t.current_version())["dv"]
    v = t.optimize(["u", "v"])
    m = t.manifest(v)
    assert m["operation"] == "optimize"
    assert not m.get("dv")
    assert t.read().count() == N - 100
