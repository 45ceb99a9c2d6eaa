"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

At 100 TB these would be partitioned parquet/lakehouse datasets; a plain
``spark.read.parquet`` keeps partition pruning, predicate pushdown, and
column pruning intact because every downstream operator expresses its
filters/projections declaratively (Catalyst pushes them into the scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as
# nanosecond longs (spark.sql.legacy.parquet.nanosAsLong) and we truncate
# to microsecond TimestampType here — same floor-truncation DuckDB applies,
# so oracle comparisons agree.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Runtime session requirements.  The external driver hands queries its OWN
# SparkSession (built without this engine's session.py), so every entry
# point must self-configure:
# - nanosAsLong: without it the events table errors with PARQUET_TYPE_ILLEGAL;
# - UTC session tz: all reference semantics and formatted outputs are UTC;
# - ANSI off: the documented decimal overflow→NULL policy (SURVEY §1.3).
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    # Arrow: pandas interchange for the UDF kernels and fixture frames
    # (vanilla sessions default it off, where nullable-int pandas columns
    # fail row-wise type verification)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # floor division via exact pmod split: `div` truncates toward
            # zero (wrong for pre-1970 nanos), and double division loses
            # precision at int64 magnitudes
            df = df.withColumn(
                col,
                F.timestamp_micros(
                    F.expr(f"(`{col}` - pmod(`{col}`, 1000)) div 1000")
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API.

    Mirrors the reference's compatibility view pattern
    (CREATE OR REPLACE VIEW, schema.sql:34-35 → sink-view).
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
