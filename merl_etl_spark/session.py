"""SparkSession builder tuned for this engine.

Local test profile runs on ``local[N]`` (single JVM), but every setting here
is chosen to also be the right default on a large cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast decisions replace hand-tuned partition counts at scale.
- ``spark.sql.shuffle.partitions`` matches the executor thread count
  (``SPARK_GRAFT_CPUS``, defaulting to this environment's 32); on a real
  cluster AQE coalescing makes the initial number mostly irrelevant.
- Session time zone pinned to UTC: the reference stores all instants as UTC
  (merlin_etl.py:180-182, schema.sql TIMESTAMPTZ columns) and every bucket
  computation assumes it.
- Arrow enabled: pandas_udf / mapInPandas paths are Arrow-batched.
- ANSI off: decimal overflow yields NULL rather than error, matching the
  documented uint256 overflow policy (SURVEY.md §1.3 option 2 cliff).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "merl_etl_spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Fixture parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert in the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # catalog home for bucketed tables (static conf — must be set here)
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), f"merl_spark_warehouse_{os.getpid()}"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
