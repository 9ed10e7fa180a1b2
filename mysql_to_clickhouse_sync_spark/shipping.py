"""Ship this package to Spark's Python workers.

The driver process finds the package via sys.path, but spawned Python UDF
workers (mapInPandas / pandas UDFs) import from their own interpreter whose
path does NOT inherit driver-side sys.path mutations — a query driven from a
foreign cwd fails with ModuleNotFoundError inside the worker. Any operator
that crosses into Python workers calls ensure_package_shipped(spark) first:
it zips the package once per session and registers it with addPyFile, which
distributes it to every worker's import path (locally and on a cluster).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    pkg_name = os.path.basename(pkg_root)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}_{os.getpid()}_{key}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_root):
                for fn in filenames:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, parent))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)
