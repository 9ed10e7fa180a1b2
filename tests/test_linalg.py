"""Linear-algebra operator tests (operators/linalg.py + s_holt_stream).
Oracle parity is covered by the roster sweep; these pin the math against
numpy and the streaming state against the batch recurrence."""

import math

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _collect(spark, name):
    from mysql_to_clickhouse_sync_spark.registry import (
        REGISTRY,
        _load_all_modules,
    )

    _load_all_modules()
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def _grid_matrix(spark):
    from mysql_to_clickhouse_sync_spark.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    return np.array(
        [[math.floor(float(v) * 1024) for v in r.embedding] for r in rows],
        dtype=np.int64,
    )


def test_cov_matrix_matches_numpy(spark):
    x = _grid_matrix(spark)
    n = x.shape[0]
    g = x.T @ x
    s = x.sum(axis=0)
    got = {(r.i, r.j): r for r in _collect(spark, "q_cov_matrix")}
    assert len(got) == 64 * 65 // 2
    for (i, j), r in got.items():
        assert r.n == n
        assert r.cov_num == n * int(g[i, j]) - int(s[i]) * int(s[j]), (i, j)


def test_pca_power_matches_numpy_iteration(spark):
    """Replay the exact integer program in numpy-free Python and compare;
    also check the direction against numpy's true dominant eigenvector."""
    x = _grid_matrix(spark)
    n = x.shape[0]
    g = x.T @ x
    s = x.sum(axis=0)
    cov = n * g - np.outer(s, s)  # full symmetric integer covariance
    ds = (int(np.abs(cov).max()) + 1023) // 1024
    a = (cov + 2048 * ds) // ds - 2048  # floor div (numpy // floors)
    v = np.full(64, 16384, dtype=object)
    m = None
    for _ in range(3):
        u = a.astype(object) @ v
        m = max(abs(int(t)) for t in u)
        v = np.array(
            [(int(t) * 16384 + (1 << 15) * m) // m - (1 << 15) for t in u],
            dtype=object,
        )
    got = sorted(_collect(spark, "q_pca_power"), key=lambda r: r.dim)
    assert [r.v_q14 for r in got] == [int(t) for t in v]
    assert all(r.iter_norm == m for r in got)
    # Power iteration monotonically increases the Rayleigh quotient —
    # true on ANY spectrum (the fixture covariance is near-isotropic,
    # lam1/lam2 ~ 1.07, so convergence-to-eigenvector is not testable
    # here; see test_pca_program_converges_on_spiked_spectrum).
    c = cov.astype(np.float64)
    v0 = np.ones(64)
    mine = np.array([float(r.v_q14) for r in got])
    rq = lambda t: (t @ c @ t) / (t @ t)  # noqa: E731
    assert rq(mine) > rq(v0)


def _integer_power(cov, rounds=3):
    """The exact q_pca_power integer program on an arbitrary int matrix."""
    ds = (int(np.abs(cov).max()) + 1023) // 1024
    a = (cov + 2048 * ds) // ds - 2048
    v = np.full(cov.shape[0], 16384, dtype=object)
    for _ in range(rounds):
        u = a.astype(object) @ v
        m = max(abs(int(t)) for t in u)
        v = np.array(
            [(int(t) * 16384 + (1 << 15) * m) // m - (1 << 15) for t in u],
            dtype=object,
        )
    return v


def test_pca_program_converges_on_spiked_spectrum(spark):
    """On a covariance with a real gap (rank-1 spike, lam1/lam2 >= 4)
    the SAME integer program reaches cosine > 0.99 in 3 rounds —
    convergence is a property of the spectrum, pinned here since the
    fixture data can't show it. (test_pca_power_matches_numpy_iteration
    proves Spark runs exactly this program.)"""
    rng = np.random.default_rng(7)
    spike = rng.integers(-1000, 1000, 64)
    noise = rng.integers(-50, 50, (64, 64))
    cov = 4 * np.outer(spike, spike) + noise @ noise.T
    v = _integer_power(cov.astype(object))
    mine = np.array([float(t) for t in v])
    top = spike.astype(np.float64)
    w, vecs = np.linalg.eigh(cov.astype(np.float64))
    top = vecs[:, np.argmax(np.abs(w))]
    cos = abs(mine @ top) / (np.linalg.norm(mine) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_jl_distortion_bounded(spark):
    """JL with K=16 is noisy per pair, but the median relative error over
    the panel should be well under 1 for high-similarity pairs, and the
    estimate must be exactly floor(dot_proj / K) by construction."""
    rows = _collect(spark, "q_jl_project")
    assert len(rows) > 100
    assert all(r.abs_err == abs(r.dot_est - r.dot_true) for r in rows)
    # unbiasedness proxy: mean signed error is small vs the dot scale
    errs = [r.dot_est - r.dot_true for r in rows]
    scale = max(abs(r.dot_true) for r in rows)
    assert abs(sum(errs) / len(errs)) < 0.2 * scale


def test_holt_stream_equals_batch(spark):
    batch = {r.event_type: r for r in _collect(spark, "q_holt_linear")}
    stream = {r.event_type: r for r in _collect(spark, "s_holt_stream")}
    assert set(batch) == set(stream)
    for t, b in batch.items():
        s = stream[t]
        assert (
            s.n_days,
            s.level_milli,
            s.trend_milli,
            s.forecast_milli,
            s.sse,
        ) == (b.n_days, b.level_milli, b.trend_milli, b.forecast_milli, b.sse)
