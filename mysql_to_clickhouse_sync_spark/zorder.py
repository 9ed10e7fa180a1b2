"""Morton (z-order) interleaving shared by write-time z-clustering
(operators/lakehouse.py q_lake_zorder_skipping) and the maintenance-time
re-cluster (sinks/merge.py LakeTable.optimize).

Pure integer arithmetic so Spark (`div`) and DuckDB (`//`) compute the
same value — every z-cell assignment stays oracle-checkable."""

from __future__ import annotations

ZBITS = 3  # 3 bits per dimension -> up to 64 z-cells / data files


def z_expr(u3: str, v3: str, div: str, zbits: int = ZBITS) -> str:
    """Bit-interleave two `zbits`-bit cell coordinates into the Morton
    z-value."""
    terms = [
        f"((({u3}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + ((({v3}) {div} {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(zbits)
    ]
    return " + ".join(terms)
