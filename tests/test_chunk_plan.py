"""Chunk-planner unit + property tests (SURVEY.md §5.2): half-open chunks
must cover [min,max] exactly once — the regression the reference fixed
between its two variants (inclusive <= at mysql_to_clickhouse_sync.py:44
double-fetches boundary rows; pagination.py:44 is half-open)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_to_clickhouse_sync_spark.plans.chunks import Chunk, chunk_predicates, chunk_ranges


def test_basic_plan():
    chunks = chunk_ranges(1, 10, 4)
    assert chunks == [
        Chunk(0, 1, 5),
        Chunk(1, 5, 9),
        Chunk(2, 9, 11),
    ]


def test_single_row_table():
    # The reference's single-row fast path (S:95-100): min == max.
    assert chunk_ranges(7, 7, 1000) == [Chunk(0, 7, 8)]


def test_empty_table_sentinel():
    # IFNULL(...,0) bounds for an empty table (S:163) -> (0,0).
    assert chunk_ranges(0, 0, 1000) == [Chunk(0, 0, 1)]


def test_exact_multiple_boundary():
    chunks = chunk_ranges(0, 999, 1000)
    assert len(chunks) == 1 and chunks[0].end == 1000


def test_invalid_args():
    with pytest.raises(ValueError):
        chunk_ranges(0, 10, 0)
    with pytest.raises(ValueError):
        chunk_ranges(10, 0, 5)


@settings(max_examples=200, deadline=None)
@given(
    mn=st.integers(-10**6, 10**6),
    width=st.integers(0, 10**5),
    batch=st.integers(1, 10**4),
)
def test_cover_every_key_exactly_once(mn, width, batch):
    mx = mn + width
    chunks = chunk_ranges(mn, mx, batch)
    # Contiguous, ordered, half-open, covering [mn, mx+1).
    assert chunks[0].start == mn
    assert chunks[-1].end == mx + 1
    for prev, cur in zip(chunks, chunks[1:]):
        assert prev.end == cur.start
    assert all(c.start < c.end for c in chunks)


def test_predicates_render_half_open():
    preds = chunk_predicates("id", 0, 2500, 1000)
    assert preds == [
        "id >= 0 AND id < 1000",
        "id >= 1000 AND id < 2000",
        "id >= 2000 AND id < 2501",
    ]
