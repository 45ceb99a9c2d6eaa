"""Set operations (SURVEY.md §2.H — absent in the reference, free in Spark).

Listed for engine completeness: UNION / INTERSECT / EXCEPT over compatible
schemas.  All are shuffle-based distinct ops; at scale prefer UNION ALL +
downstream aggregation when duplicates are acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "setop-union-intersect-except",
    oracle="""
    WITH purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         erroring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'union' AS op, user_id FROM (SELECT user_id FROM purchasers UNION SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'intersect' AS op, user_id FROM (SELECT user_id FROM purchasers INTERSECT SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'except' AS op, user_id FROM (SELECT user_id FROM purchasers EXCEPT SELECT user_id FROM erroring)
    """,
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def ids(t: str) -> DataFrame:
        return events.filter(F.col("event_type") == t).select("user_id").distinct()

    purchasers, clickers, erroring = ids("purchase"), ids("click"), ids("error")
    return (
        purchasers.union(clickers)
        .distinct()
        .select(F.lit("union").alias("op"), "user_id")
        .unionAll(
            purchasers.intersect(clickers).select(F.lit("intersect").alias("op"), "user_id")
        )
        .unionAll(
            # EXCEPT DISTINCT in one operator (inputs already distinct;
            # exceptAll + distinct would add a shuffle)
            purchasers.subtract(erroring).select(F.lit("except").alias("op"), "user_id")
        )
    )
