"""q_sequence_pack: the two-level prefix-sum decomposition.

At the production BLOCK size (1e6 docs) the fixture corpus fits in one
block per language, so the decomposition's rebasing path is trivially
exercised. This test shrinks BLOCK so every language spans MANY blocks and
asserts the result is bit-identical to the production-BLOCK run — the
cumulative-sum decomposition must be invisible at every block size (the
DuckDB oracle in the @declare covers the single-window ground truth).
"""

from __future__ import annotations

from mysql_to_clickhouse_sync_spark.operators import packing
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_block_size_invisible_in_result(spark, monkeypatch):
    base = _rows(packing.q_sequence_pack(spark, SF_DIR))
    monkeypatch.setattr(packing, "BLOCK", 7)  # ~dozens of blocks per lang
    small = _rows(packing.q_sequence_pack(spark, SF_DIR))
    assert base == small
    assert len(base) > 0


def test_boundary_docs_bounded_by_seqs(spark):
    # A document can straddle a boundary only where a boundary exists:
    # boundary_docs < n_seqs, and totals are self-consistent.
    for r in packing.q_sequence_pack(spark, SF_DIR).collect():
        assert 0 <= r.boundary_docs < max(r.n_seqs, 1)
        assert r.n_seqs == (r.total_tokens + packing.SEQ_LEN - 1) // packing.SEQ_LEN
        assert 0 <= r.last_fill_bp <= 10_000
