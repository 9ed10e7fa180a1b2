"""Local mirror of the driver's correctness gate.

Runs each declared query in PySpark and its oracle in DuckDB over the same
parquet fixtures; compares row count, column-name set, and the order-
insensitive multiset of value-normalized rows (columns sorted by name). This
is stricter than a hash compare — if this passes, a value-hash passes.

Usage: python tools/verify_local.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from mysql_to_clickhouse_sync_spark.catalog import TABLES
from mysql_to_clickhouse_sync_spark.registry import REGISTRY, queries
from mysql_to_clickhouse_sync_spark.session import get_spark


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def to_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(row[i]) for i in order) for row in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    qs = queries()
    names = args.names or list(qs)
    spark = get_spark("verify_local")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        decl = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = decl.fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if decl.oracle is None:
            print(f"ok*   {name}: rows-only ({len(s_rows)} rows, {t_spark:.1f}s spark)")
            continue
        t0 = time.time()
        try:
            rel = con.sql(decl.oracle)
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t0

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            ms, md = to_multiset(s_cols, s_rows), to_multiset(d_cols, d_rows)
            if ms != md:
                only_s = list((ms - md).items())[:3]
                only_d = list((md - ms).items())[:3]
                problems.append(f"values spark-only={only_s} duckdb-only={only_d}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(
                f"ok    {name}: {len(s_rows)} rows match"
                f" (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
            )

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
