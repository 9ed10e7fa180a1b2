"""Key-range chunk planning — the reference's partitioned-extract planner.

The reference splits [min_id, max_id] into fixed-width strides
(mysql_to_clickhouse_sync.py:109-112: ``for start in range(min_id, max_id+1,
batch_size)``) and reads each with a BETWEEN predicate. The original uses an
inclusive upper bound (S:44 ``<=``), so adjacent chunks both fetch the
boundary row — a duplication bug fixed in the pagination variant
(mysql_to_clickhouse_sync_pagination.py:44 ``<``). This planner implements
the fixed half-open semantics: every key in [min_id, max_id] lands in exactly
one chunk.

In the Spark engine these ranges become JDBC partition predicates
(sources/jdbc.py) — the distributed analog of the reference's chunk loop, with
Spark executors replacing its thread pool.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Chunk:
    index: int
    start: int  # inclusive
    end: int  # exclusive


def chunk_ranges(min_id: int, max_id: int, batch_size: int) -> list[Chunk]:
    """Half-open chunks covering [min_id, max_id] exactly once.

    Empty-table sentinel (0, 0) from the bounds query (S:163 IFNULL(...,0))
    yields a single degenerate chunk covering just key 0, mirroring the
    reference's single-row fast path (S:95-100).
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if max_id < min_id:
        raise ValueError(f"max_id {max_id} < min_id {min_id}")
    chunks = []
    for i, start in enumerate(range(min_id, max_id + 1, batch_size)):
        chunks.append(Chunk(index=i, start=start, end=min(start + batch_size, max_id + 1)))
    return chunks


def chunk_predicates(
    column: str, min_id: int, max_id: int, batch_size: int
) -> list[str]:
    """SQL predicates for a predicate-partitioned JDBC read — one per chunk,
    shipped to the source exactly like the reference ships its chunk SELECTs
    (S:44), but executed by Spark tasks in parallel."""
    return [
        f"{column} >= {c.start} AND {column} < {c.end}"
        for c in chunk_ranges(min_id, max_id, batch_size)
    ]
