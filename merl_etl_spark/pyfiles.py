"""Ship this package to Spark Python workers.

Queries that run Python kernels on executors (mapInPandas / pandas_udf)
pickle closures that reference this package by module name; workers
un-pickle them by *importing* it.  The driver process's ``sys.path`` does
not propagate to worker processes, so any caller whose cwd is not the repo
root (the external driver harness, a real cluster) would hit
``ModuleNotFoundError``.  ``ensure_package_on_workers`` zips the package
and registers it with ``addPyFile`` — the supported way to distribute
Python dependencies to executors, identical on local mode and a cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[str] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _ADDED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"merl_etl_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _ADDED.add(app_id)
