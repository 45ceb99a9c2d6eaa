"""Spark SQL API parity (SURVEY.md §4: DataFrame and SQL text compile to
the same Catalyst plans).  The engine is DataFrame-first; this module
proves the SQL door is open — the same op expressed as SQL text over
registered views, byte-identical results to the DataFrame form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

TOP100_SQL = """
    SELECT c_nationkey, rnk, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM {table}
    )
    WHERE rnk <= 100
"""


@register(
    "sql-api-top100",
    oracle=TOP100_SQL.format(table="customer"),
)
def sql_api_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win-rank-top100 expressed as SQL text over a registered view —
    same ANSI string serves as both the Spark query and the DuckDB oracle
    (modulo RANK's 64-bit type, which Spark narrows to int)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_sql")
    df = spark.sql(TOP100_SQL.format(table="v_customer_sql"))
    return df.withColumn("rnk", df["rnk"].cast("long"))
