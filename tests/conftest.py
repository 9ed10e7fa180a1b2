from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mysql_to_clickhouse_sync_spark.catalog import TABLES  # noqa: E402
from mysql_to_clickhouse_sync_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("pytest")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow stress/soak tests unless opted in: the two
    heaviest (multi-writer soak ~9 min, dv-ratio soak ~2 min) put the
    default suite over the driver's pytest budget (round-10 verdict item 2).
    SPARK_GRAFT_SLOW_TESTS=1 runs them; the round closeout does."""
    import os

    import pytest as _pytest

    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = _pytest.mark.skip(reason="slow soak test; SPARK_GRAFT_SLOW_TESTS=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
