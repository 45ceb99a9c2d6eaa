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
import threading
import uuid
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[str] = set()
_LOCK = threading.Lock()


def ensure_package_on_workers(spark: SparkSession) -> None:
    # lock: two kernel queries racing on first use would otherwise both
    # pass the membership check and interleave writes into one zip path,
    # shipping a corrupt archive to executors
    with _LOCK:
        app_id = spark.sparkContext.applicationId
        if app_id in _ADDED:
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        # unique temp name + atomic rename so no reader ever sees a
        # partially-written archive
        final_path = os.path.join(
            tempfile.gettempdir(), f"merl_etl_spark_pyfiles_{os.getpid()}.zip"
        )
        tmp_path = f"{final_path}.{uuid.uuid4().hex[:8]}.tmp"
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp_path, final_path)
        spark.sparkContext.addPyFile(final_path)
        _ADDED.add(app_id)
