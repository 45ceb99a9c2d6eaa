"""Sort / limit / top-k operators (SURVEY.md §2.G).

Every LIMIT query carries the reference's full tie-break chain so the
result set is a total order — Spark's TakeOrderedAndProject then returns
the same rows at any parallelism (and the oracle hash is stable).
At scale, ORDER BY + LIMIT n is a per-partition bounded heap followed by a
driver-side merge of n·#partitions candidates — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.operators.aggregates import FLOW_ORACLE_CTE, conditional_flow
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "sort-limit-top10",
    oracle="""
    SELECT rnk, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_custkey, c_name, c_acctbal,
             RANK() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM customer
    )
    ORDER BY rnk ASC LIMIT 10
    """,
)
def sort_limit_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 holders report slice: ORDER BY rnk ASC LIMIT 10
    (scripts/run_holders_and_report.sh:49-50)."""
    from merl_etl_spark.operators.ranking import rank_top_k

    customer = load_table(spark, sf_dir, "customer")
    ranked = rank_top_k(
        customer,
        partition_by=[],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=10,
    )
    return ranked.select("rnk", "c_custkey", "c_name", "c_acctbal").orderBy("rnk").limit(10)


@register(
    "sort-movers-multi",
    oracle=FLOW_ORACLE_CTE
    + """
    , movers AS (
      SELECT user_id, in_amt, out_amt, txs,
             GREATEST(in_amt, out_amt) AS max_flow
      FROM agg_per_wallet
      ORDER BY max_flow DESC NULLS LAST, txs DESC, user_id ASC
      LIMIT 10
    )
    SELECT user_id,
           CAST(in_amt AS DOUBLE) AS in_amt,
           CAST(out_amt AS DOUBLE) AS out_amt,
           txs,
           CAST(max_flow AS DOUBLE) AS max_flow
    FROM movers
    """,
)
def sort_movers_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movers: 3-key sort with explicit null placement + LIMIT 10
    (scripts/ingest_activity_and_report.sh:99-100).  The sort and limit run
    on the exact decimals; the terminal projection casts to double so the
    output hashes identically across engines."""
    events = load_table(spark, sf_dir, "events")
    movers = conditional_flow(events).withColumn(
        "max_flow", F.greatest(F.col("in_amt"), F.col("out_amt"))
    )
    return (
        movers.orderBy(
            F.col("max_flow").desc_nulls_last(),
            F.col("txs").desc(),
            F.col("user_id").asc(),
        )
        .limit(10)
        .select(
            "user_id",
            F.col("in_amt").cast("double").alias("in_amt"),
            F.col("out_amt").cast("double").alias("out_amt"),
            "txs",
            F.col("max_flow").cast("double").alias("max_flow"),
        )
    )


@register(
    "sort-source-asc",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id = 7
    ORDER BY event_id ASC
    """,
)
def sort_source_asc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ascending block-ordered scan of one stream (the API-side sort=asc,
    merlin_etl.py:374, combined with filter-blockrange shape)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id") == 7)
        .select("event_id", "user_id", "event_type")
        .orderBy(F.col("event_id").asc())
    )
