"""Ranking / top-k operators (SURVEY.md §2.F, §2.G).

Re-expresses the reference's Top-100 derivation
(``RANK() OVER (ORDER BY balance DESC, holder_address ASC)`` then
``rnk <= 100`` — sql/top100_compute.sql:17-18,29 and
sql/top100_from_latest_bucket.sql:28,31) as a Spark window.

Scale notes: the partition keys go INTO the window spec so a single pass
ranks every (partition) slice — no driver loop over tokens/buckets.  Spark
≥3.5 rewrites rank-then-filter into ``WindowGroupLimit`` (per-partition
top-k without a full sort of each partition), so the k<=100 filter is
physically a bounded heap per group, which survives a 1000× scale-up as
long as no single group is skew-huge; the deterministic tie-break also
makes re-runs idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


def rank_top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Generic deterministic per-group top-k via a RANK window.

    ``order_by`` must end with a unique tie-break column (the reference uses
    ``holder_address ASC``) — without it rank order across shuffles is
    nondeterministic and idempotent re-derivation breaks.
    """
    w = (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()).orderBy(
        *order_by
    )
    # long: SQL engines type RANK() as 64-bit; keeps oracle schemas aligned
    return df.withColumn(rank_col, F.rank().over(w).cast("long")).filter(F.col(rank_col) <= k)


@register(
    "win-rank-top100",
    oracle="""
    SELECT c_nationkey, rnk, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM customer
    )
    WHERE rnk <= 100
    """,
)
def win_rank_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: Top-100 per group by balance with deterministic tie-break.

    customer ↔ holders_raw role mapping (FIXTURES.md §7): c_nationkey plays
    (contract_address, bucket) slice key, c_acctbal plays scaled balance,
    c_custkey plays holder_address tie-break.
    Mirrors sql/top100_compute.sql:9-29.
    """
    customer = load_table(spark, sf_dir, "customer")
    ranked = rank_top_k(
        customer,
        partition_by=["c_nationkey"],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=100,
    )
    return ranked.select("c_nationkey", "rnk", "c_custkey", "c_name", "c_acctbal")


@register(
    "sort-topk-rank100",
    oracle="""
    SELECT user_id, rnk, CAST(total_value AS DOUBLE) AS total_value
    FROM (
      SELECT user_id, total_value,
             RANK() OVER (ORDER BY total_value DESC, user_id ASC) AS rnk
      FROM (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
        FROM events GROUP BY user_id
      )
    )
    WHERE rnk <= 100
    """,
)
def sort_topk_rank100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Top-100 after an aggregation — the exact shape of the
    reference's holders→top100 derivation (aggregate balance, global rank,
    keep 100).  Decimal sum keeps the ranking deterministic; the terminal
    select casts to double for engine-portable hashing.

    Scale shape: a single global RANK window over the per-user totals.
    Spark ≥3.5 rewrites rank-then-filter into ``WindowGroupLimit`` with a
    Partial (map-side) pass, so each shuffle partition forwards only its
    own top-(100+ties) rows and the final single-partition window sees at
    most ~k·P rows (P = shuffle partitions) — bounded at any data scale.
    A TakeOrdered(3000) prelimit (used in round 2) shuffles MORE (3000
    rows/partition vs ~100) and is silently WRONG when a rank tie at the
    100-boundary spans past candidate 3000 (ADVICE r2): rank over a
    row-limit-cut candidate set drops tied rows the full window keeps.
    The unlimited window is exact by construction; a plan probe pytest
    pins the WindowGroupLimit rewrite."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").alias("total_value")
    )
    ranked = rank_top_k(
        totals,
        partition_by=[],
        order_by=[F.col("total_value").desc(), F.col("user_id").asc()],
        k=100,
    )
    return ranked.select("user_id", "rnk", F.col("total_value").cast("double").alias("total_value"))
