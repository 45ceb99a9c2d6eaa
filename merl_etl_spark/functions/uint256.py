"""Exact uint256 arithmetic (SURVEY.md §1.3 option 3 — the escape hatch
for amounts beyond DecimalType's precision-38 ceiling).

ERC-20 raw amounts are uint256: up to 78 decimal digits
(schema.sql:49,77,108 NUMERIC(78,0)).  The engine's default policy keeps
``*_raw`` as exact decimal strings and computes in DecimalType(38,18)
human units (covers every real 18-decimal token).  When full-range exact
math IS required — supply audits, checksum reconciliation — these
Arrow-batched pandas UDFs do arbitrary-precision integer arithmetic with
Python ints and return decimal strings.

Scale shape: grouped-agg UDFs partial-aggregate per Arrow batch on the
executors; only per-group digit strings cross the shuffle.  ~10-100×
slower per row than JVM decimals — use for the audit path, not the hot
path (which is exactly the reference's split: generated columns for
queries, exact strings as source of truth).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


def _uint_sum_py(raw: pd.Series) -> str:
    """Grouped-agg exact sum of decimal-string integers (any width)."""
    total = 0
    for v in raw:
        if v is not None:
            total += int(v)
    return str(total)


def _uint_scale_down_py(raw: pd.Series, decimals: pd.Series) -> pd.Series:
    """Exact integer division by 10^decimals, rendered as a full-precision
    decimal string (the true ``raw / 10^token_decimal`` with no float or
    precision-38 loss)."""
    out = []
    for v, d in zip(raw, decimals):
        if v is None:
            out.append(None)
            continue
        n, d = int(v), int(d)
        scale = 10**d
        # divmod on negatives floors (divmod(-150,100) = (-2, 50) → the
        # wrong '-2.50' for -1.5); split sign first
        sign = "-" if n < 0 else ""
        whole, frac = divmod(abs(n), scale)
        out.append(f"{sign}{whole}.{frac:0{d}d}" if d else f"{sign}{whole}")
    return pd.Series(out)


def uint_sum():
    """pandas_udf built lazily — type parsing needs an active session."""
    return pandas_udf(_uint_sum_py, "string")


def uint_scale_down():
    return pandas_udf(_uint_scale_down_py, "string")


@register(
    "uint256-exact-sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
                    * CAST('1000000000000000000' AS HUGEINT)) AS VARCHAR) AS total_raw
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def uint256_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact big-integer aggregation: synthetic 24-digit raw amounts
    (price cents × 10^18 — the uint256 wei convention) summed with
    arbitrary-precision Python ints inside a grouped-agg pandas UDF.
    The sums (~10^29) overflow DecimalType(38) intermediate products in
    naive plans but are exact here; DuckDB's HUGEINT (128-bit) covers the
    oracle at this scale."""
    from merl_etl_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(spark)
    li = load_table(spark, sf_dir, "lineitem")
    raw = F.concat(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
        F.lit("0" * 18),
    )
    return (
        li.withColumn("raw", raw)
        .groupBy("l_returnflag")
        .agg(uint_sum()(F.col("raw")).alias("total_raw"))
    )


@register(
    "uint256-exact-scale",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
             || '000000000000000000' AS raw,
           CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS VARCHAR) || '.' ||
             lpad(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0')
             || '000000000000000000' AS human_units
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def uint256_exact_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact scale-down of 24-digit raws by 10^20 (cents×10^18 → whole
    units at 20 fractional digits) — full-precision string rendering that
    DecimalType(38,18) could not represent for >10^20 unit balances.
    Oracle reconstructs the same digits with integer string arithmetic."""
    from merl_etl_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    raw = F.concat(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
        F.lit("0" * 18),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        raw.alias("raw"),
        uint_scale_down()(raw, F.lit(20)).alias("human_units"),
    )
